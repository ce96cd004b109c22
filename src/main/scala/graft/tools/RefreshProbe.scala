package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Curation

/** Dev probe: incremental cluster refresh vs full CC recompute — the
  * continuous-ingest claim measured. A chained-quad base graph is
  * labelled once (the maintained state, untimed); then a fixed 1k-pair
  * merge batch is folded in via (a) `Curation.refreshClusters` and
  * (b) full `connectedComponents` over old ∪ new pairs. Equality is
  * asserted by distributed checksum (node⊕label hash sum — collecting
  * multi-million-row labellings is not a plan), then both are timed.
  *
  * Usage: runMain graft.tools.RefreshProbe [millionsOfNodes...]
  */
object RefreshProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong * 1000000L) else Seq(4000000L)
    val spark = GraftSession.local(32, "refresh-probe")

    // clusters of 4 chained nodes: (i, i+1) for i % 4 != 3
    def basePairs(n: Long): DataFrame = spark.range(n - 1)
      .filter(col("id") % 4 =!= 3)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    // merge batch: 1k pairs each bridging two adjacent quads
    def newPairs(n: Long): DataFrame = spark.range(1000)
      .select((col("id") * ((n / 8000) * 8) + 3).as("a"),
        (col("id") * ((n / 8000) * 8) + 4).as("b"))

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    def checksum(labels: DataFrame): (Long, Long) = {
      // XOR-fold, not sum: summing 4M+ 64-bit hashes overflows ANSI longs
      val r = labels.select(xxhash64(col("node"), col("cluster_id")).as("h"))
        .agg(expr("bit_xor(h)").as("h"), count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    for (n <- sizes) {
      val base = basePairs(n)
      val batch = newPairs(n).localCheckpoint()
      // the maintained state: labelled once, untimed (a real pipeline
      // holds this as its keep-list side table)
      val existing = Curation.connectedComponents(base, "a", "b").localCheckpoint()

      val merged = new java.util.concurrent.atomic.AtomicLong()
      val incr = Curation.refreshClusters(existing, batch,
        mergeEdgesOut = Some(merged))
      val full = Curation.connectedComponents(base.unionByName(batch), "a", "b")
      require(checksum(incr) == checksum(full),
        s"n=$n: incremental refresh != full CC")

      val ti = med(mat(Curation.refreshClusters(existing, batch)))
      val tf = med(mat(Curation.connectedComponents(base.unionByName(batch), "a", "b")))
      println(f"[refresh] n=$n merge_edges=${merged.get()} " +
        f"incremental=$ti%.2f full_cc=$tf%.2f")
    }
    spark.stop()
  }
}

package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

/** Prices cluster retraction (`Curation.refreshClustersRetract`) at
  * corpus scale — the evidence behind its "cost = affected clusters'
  * members, never the corpus" claim, and the retraction analog of
  * [[DeletionProbe]]:
  *
  *   - a synthetic corpus with planted 3-doc near-dup TRIOS (ids
  *     `50k`, `50k+1`, `50k+2` share words 0..10, last word differs —
  *     deleting the representative leaves a surviving pair, so the
  *     re-solve is non-trivial) is LSH-indexed and CC-labelled; all
  *     other vocabulary is per-doc-unique, so the planted structure is
  *     the ONLY structure;
  *   - a FIXED 20-representative delete set is retracted at 1x and 10x
  *     corpus size (largest first, after a discarded warm-up, so JIT
  *     bias works against the flat claim);
  *   - each leg reports the index-delete wall, the retraction wall, the
  *     merge-graph edge count (`mergeEdgesOut` — the affected-bound
  *     proof), and the wall of the alternative the operator avoids: a
  *     COLD re-label over ALL surviving pairs.
  *
  * Expected shape: the retraction pays the corpus-proportional
  * pairs-discovery scan (the DeletionProbe discovery term — cheap
  * columns, broadcast semi-join) but its re-solve stays delete-bounded,
  * while the cold re-label's pair generation + CC rounds grow with the
  * corpus.
  *
  * Usage: runMain graft.tools.RetractionProbe [baseDocs]
  */
object RetractionProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "retraction-probe")
    val base = args.headOption.map(_.toLong).getOrElse(20000L)
    val dedup = graft.functions.Dedup
    val cur = graft.functions.Curation

    def corpus(n: Long) = {
      // planted TRIOS (ids 50k, 50k+1, 50k+2 share words 0..10): deleting
      // the representative leaves a surviving pair to re-solve, so the
      // merge graph is non-trivially affected-bounded
      val baseId = when(pmod(col("id"), lit(50L)) <= 2L,
        col("id") - pmod(col("id"), lit(50L))).otherwise(col("id"))
      // per-doc-unique vocabulary (word j of doc b is "w<b>x<j>") so the
      // ONLY near-dups are the planted pairs — a bounded shared
      // vocabulary collides at scale and collapses the corpus into
      // mega-clusters, breaking the fixture, not the operator
      val words = (0 until 11).map(j =>
        concat(lit("w"), baseId, lit(s"x$j"))) :+
        concat(lit("t"), col("id"))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", words: _*).as("text"))
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    import spark.implicits._
    def leg(n: Long, label: String): Unit = {
      val docs = corpus(n).localCheckpoint()
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-retract-$label").toString
      dedup.writeLshIndex(docs, "text", "doc_id", idx,
        n = 3, bands = 4, rowsPerBand = 4, buckets = 64)
      val state0 = cur.connectedComponents(
        dedup.pairsAmongFromIndex(spark, docs.select(col("doc_id")), idx, 500),
        "a", "b").localCheckpoint()
      val nClusters = state0.select(col("cluster_id")).distinct().count()
      // 20 cluster representatives, spread across the id range
      val dead = (0 until 20).map(i => (i.toLong * (n / 20) / 50L) * 50L)
        .distinct.toDF("doc_id")
      val (_, tDel) = timed(dedup.deleteFromLshIndex(spark, dead, idx))
      val merge = new AtomicLong(-1)
      val (retracted, tRet) = timed {
        val r = cur.refreshClustersRetract(state0, dead,
          s => dedup.pairsAmongFromIndex(spark, s, idx, 500),
          Some(merge)).localCheckpoint()
        r.count()
        r
      }
      // the avoided alternative: cold re-label over ALL surviving pairs
      val survivors = docs.join(broadcast(dead), Seq("doc_id"), "left_anti")
      val (_, tCold) = timed {
        cur.connectedComponents(
          dedup.pairsAmongFromIndex(spark,
            survivors.select(col("doc_id")), idx, 500),
          "a", "b").count()
      }
      println(f"[retraction] $label n=$n clusters=$nClusters " +
        f"index_delete=$tDel%.2f s retract=$tRet%.2f s " +
        f"(merge_edges=${merge.get()}) vs cold_relabel=$tCold%.2f s " +
        f"(${tCold / tRet}%.2fx)")
      graft.functions.Checkpoints.unpersist(retracted)
      graft.functions.Checkpoints.unpersist(state0)
      graft.functions.Checkpoints.unpersist(docs)
      ()
    }

    // warm-up leg, never reported
    leg(base / 4, "warm")
    // largest first (see honesty note)
    leg(base * 10, "10x")
    leg(base, "1x")
    spark.stop()
  }
}

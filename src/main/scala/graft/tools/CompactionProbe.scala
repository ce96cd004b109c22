package graft.tools

import org.apache.spark.sql.functions._

/** Measures what index compaction BUYS at serving time — the evidence
  * behind the lifecycle claim ("partition discovery, the per-search
  * stats collect, and file-open cost grow with batch count"): a BM25
  * index fragmented across many append batches is searched against an
  * identical-content ONE-SHOT build (the compacted layout's shape), in
  * ALTERNATING order so neither arm owns the JIT/page-cache advantage;
  * then the fragmented index is compacted and must converge to the
  * one-shot arm's latency (and its exact ranking — asserted, not
  * assumed). File/dir counts are reported alongside, since at 100 TB
  * the fragmented tree's open cost is the scan's floor.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.CompactionProbe [nBatches]
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "compaction-probe")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = args.headOption.map(_.toInt).getOrElse(60)
    val docs = graft.sources.Tables.documents(spark, sf).localCheckpoint()
    val ta = graft.functions.TextAnalysis

    val frag = java.nio.file.Files.createTempDirectory("graft-cmp-frag").toString
    val oneshot = java.nio.file.Files.createTempDirectory("graft-cmp-one").toString
    ta.writeInvertedIndex(docs, "text", "doc_id", oneshot, buckets = 64)
    ta.writeInvertedIndex(docs.filter(pmod(col("doc_id"), lit(5)) === 0),
      "text", "doc_id", frag, buckets = 64)
    val rest = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0).localCheckpoint()
    // batching key independent of the mod-5 base/rest split (doc_id %
    // nBatches would leave every i % 5 == 0 batch empty — the configured
    // and MEASURED batch counts must agree)
    for (i <- 0 until nBatches)
      ta.appendToInvertedIndex(
        rest.filter(pmod((col("doc_id") / 5).cast("long"), lit(nBatches)) === i),
        "text", "doc_id", frag, buckets = 64, batchId = Some(i.toLong))

    def tree(p: String): (Long, Long) = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try {
        val it = walk.iterator()
        var dirs = 0L; var files = 0L
        while (it.hasNext) {
          val x = it.next()
          if (java.nio.file.Files.isDirectory(x)) dirs += 1
          else if (x.toString.endsWith(".parquet")) files += 1
        }
        (dirs, files)
      } finally walk.close()
    }
    val q = Seq("window", "hash", "stream", "dup")
    def search(p: String): Seq[(Long, Long)] =
      ta.bm25SearchFromIndex(spark, p, q, topK = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    require(search(frag) == search(oneshot),
      "fragmented and one-shot rankings diverge before any timing")
    // alternate arms; per-arm median of 3
    def med3(p: String, other: String): Double = {
      val ts = (1 to 3).map { _ =>
        search(other) // interleave: the other arm absorbs cache drift
        val t0 = System.nanoTime(); search(p); (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    val tFrag = med3(frag, oneshot)
    val tOne = med3(oneshot, frag)
    val (dF, fF) = tree(s"$frag/postings")
    val (dO, fO) = tree(s"$oneshot/postings")
    println(f"[compaction] fragmented ($nBatches batches): dirs=$dF files=$fF " +
      f"search=$tFrag%.2f s; one-shot: dirs=$dO files=$fO search=$tOne%.2f s " +
      f"(fragmentation tax ${tFrag / tOne}%.2fx)")
    val t0 = System.nanoTime()
    ta.compactInvertedIndex(spark, frag)
    val tCompact = (System.nanoTime() - t0) / 1e9
    require(search(frag) == search(oneshot),
      "compaction changed the ranking")
    val tAfter = med3(frag, oneshot)
    val (dA, fA) = tree(s"$frag/postings")
    println(f"[compaction] compacted: dirs=$dA files=$fA search=$tAfter%.2f s " +
      f"(vs one-shot $tOne%.2f s; compaction itself cost $tCompact%.1f s, " +
      f"amortized over every search after)")
    spark.stop()
  }
}

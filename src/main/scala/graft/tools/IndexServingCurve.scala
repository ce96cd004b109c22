package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{Dedup, Similarity, TextAnalysis}

/** Serving-cost measurement for the three materialized-index families —
  * the numbers the 100 TB serving story rests on (the parity specs prove
  * the index paths return IDENTICAL results; this tool measures that they
  * are also CHEAPER, and by how much):
  *
  *  - LSH dedup index: a fixed 1k-doc arrival batch checked via
  *    `nearDupsAgainstIndex` (bucket-pruned reads of the stored corpus)
  *    vs the one-shot `minhashLshPairs` over corpus+batch that an
  *    index-less pipeline would have to re-run per arrival. Batch cost
  *    must stay ~FLAT as the indexed corpus grows (the corpus is never
  *    re-shingled); the one-shot cost grows with the corpus.
  *  - BM25 inverted index: `bm25SearchFromIndex` (term-bucket partition
  *    pruning) vs `bm25Search` re-tokenizing the corpus per query.
  *  - IVF+PQ ANN index: `ivfPqTopKFromIndex` (probed cells = partition
  *    filter) vs `ivfPqTopK` re-encoding the corpus per query batch.
  *
  * For each from-index query the tool also records the PRUNED-READ
  * fraction: index partitions actually opened / total partitions
  * (pre-execution `FileSourceScanExec.selectedPartitions`, the same
  * API the LayoutSpec assertions use).
  *
  * Corpora are the DedupScaleCurve generators (deterministic, parquet-
  * materialized so the planner sees real stats). Results land in
  * SCALING.md.
  *
  * Usage: runMain graft.tools.IndexServingCurve [docSizesK] [vecSizesK]
  *   default: 50,150,500 20,100,200
  */
object IndexServingCurve {
  def main(args: Array[String]): Unit = {
    val docSizes = args.headOption.getOrElse("50,150,500")
      .split(",").map(_.trim.toLong * 1000L).toSeq
    val vecSizes = args.drop(1).headOption.getOrElse("20,100,200")
      .split(",").map(_.trim.toLong * 1000L).toSeq
    val spark = GraftSession.local(32, "index-serving-curve")
    val base = "/tmp/graft_serving"

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def med3(f: => Long): (Long, Double) = {
      val runs = (1 to 3).map(_ => time(f))
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }
    def materialize(df: DataFrame, path: String): DataFrame = {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    /** (partitions read, total partitions) for the index scan under
      * `pathFrag` in `df`'s physical plan (pre-execution, so the
      * FileSourceScanExec is still visible under AQE).
      */
    def pruned(df: DataFrame, pathFrag: String, indexDir: String): (Long, Long) = {
      val phys = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scan = phys.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(pathFrag)) => f
      }
      val read = scan.map(_.selectedPartitions.partitionCount.toLong).getOrElse(-1L)
      val total = Option(new java.io.File(indexDir).listFiles())
        .map(_.count(f => f.isDirectory && f.getName.contains("=")).toLong)
        .getOrElse(-1L)
      (read, total)
    }

    // same deterministic corpus family as DedupScaleCurve: doc k's text
    // is a pure function of k, so a planted dup just reuses the content id
    val words = array((0 until 4096).map(i => lit(s"w$i")): _*)
    def textOf(cid: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(80)),
        i => element_at(words, (pmod(xxhash64(cid, i), lit(4096)) + 1).cast("int"))))
    def docs(n: Long) =
      spark.range(n).select(col("id").as("doc_id"), textOf(col("id")).as("text"))
    def vecs(n: Long) =
      spark.range(n)
        .select(
          col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)),
            i => (pmod(xxhash64(col("id"), i), lit(2000)).cast("double") / 1000.0 - 1.0)
              .cast("float")).as("vec"))

    println("family,corpus_n,build_s,oneshot_s,from_index_s,parts_read,parts_total,rows")

    docSizes.foreach { n =>
      val d = materialize(docs(n), s"$base/docs_$n")
      // arrival batch: 1k fresh docs; every 10th is an exact dup of a
      // corpus doc (content id = doc_id % n), the rest are unique
      val dupBatch = materialize(
        spark.range(n, n + 1000).select(
          col("id").as("doc_id"),
          textOf(when(pmod(col("id"), lit(10)) === 0, pmod(col("id"), lit(n)))
            .otherwise(col("id"))).as("text")),
        s"$base/dupbatch_$n")

      val idx = s"$base/lsh_$n"
      val (_, buildS) = time {
        Dedup.writeLshIndex(d, "text", "doc_id", idx, n = 3, bands = 4, rowsPerBand = 4)
        1L
      }
      val (_, oneshotS) = med3(
        Dedup.minhashLshPairs(d.union(dupBatch), "text", "doc_id",
          n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 900).count())
      val q = Dedup.nearDupsAgainstIndex(spark, dupBatch, "text", "doc_id", idx,
        n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 900)
      val (pr, pt) = pruned(q, s"lsh_$n/bands", s"$idx/bands")
      val (rows, fromIdxS) = med3(
        Dedup.nearDupsAgainstIndex(spark, dupBatch, "text", "doc_id", idx,
          n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 900).count())
      println(f"lsh_dedup,$n,$buildS%.1f,$oneshotS%.1f,$fromIdxS%.1f,$pr,$pt,$rows")

      // per-arrival micro-batch (10 docs) against a 512-bucket index:
      // 40 band keys touch ~37 buckets, so THIS is where bucket pruning
      // shows (a 1k batch's 4k keys saturate any practical bucket count —
      // its win is not re-shingling the corpus, measured above)
      val idxWide = s"$base/lsh_wide_$n"
      Dedup.writeLshIndex(d, "text", "doc_id", idxWide,
        n = 3, bands = 4, rowsPerBand = 4, buckets = 512)
      val micro = dupBatch.filter(col("doc_id") < n + 10)
      val mq = Dedup.nearDupsAgainstIndex(spark, micro, "text", "doc_id", idxWide,
        n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 900, buckets = 512)
      val (mpr, mpt) = pruned(mq, s"lsh_wide_$n/bands", s"$idxWide/bands")
      val (mrows, microS) = med3(
        Dedup.nearDupsAgainstIndex(spark, micro, "text", "doc_id", idxWide,
          n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 900, buckets = 512).count())
      println(f"lsh_dedup_micro,$n,-,-,$microS%.1f,$mpr,$mpt,$mrows")

      val inv = s"$base/inv_$n"
      val (_, invBuildS) = time {
        TextAnalysis.writeInvertedIndex(d, "text", "doc_id", inv)
        1L
      }
      val terms = Seq("w17", "w42") // every doc draws from the same vocab
      val (_, directS) = med3(
        TextAnalysis.bm25Search(d, "text", "doc_id", terms).count())
      val bq = TextAnalysis.bm25SearchFromIndex(spark, inv, terms)
      val (bpr, bpt) = pruned(bq, s"inv_$n/postings", s"$inv/postings")
      val (brows, bIdxS) = med3(
        TextAnalysis.bm25SearchFromIndex(spark, inv, terms).count())
      println(f"bm25,$n,$invBuildS%.1f,$directS%.1f,$bIdxS%.1f,$bpr,$bpt,$brows")
    }

    vecSizes.foreach { n =>
      val v = materialize(vecs(n), s"$base/vecs_$n")
      // int8: no pruning key (flat compressed scan) — the fraction column
      // reports BYTES (codes vs floats) instead of partitions
      val i8 = s"$base/int8_$n"
      val (_, i8BuildS) = time { Similarity.writeInt8Index(v, i8); 1L }
      val q10 = materialize(
        vecs(n).filter(col("vec_id") % (n / 10) === 0)
          .select(col("vec_id").as("qid"), col("vec").as("qvec")),
        s"$base/q10_$n")
      val (_, i8OneS) = med3(Similarity.int8TopK(q10, v, k = 5).count())
      val (i8rows, i8IdxS) = med3(
        Similarity.int8TopKFromIndex(spark, q10, i8, k = 5).count())
      def dirBytes(p: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
          else if (f.getName.endsWith(".parquet")) f.length() else 0L
        walk(new java.io.File(p))
      }
      println(f"int8,$n,$i8BuildS%.1f,$i8OneS%.1f,$i8IdxS%.1f,${dirBytes(i8)},${dirBytes(s"$base/vecs_$n")},$i8rows")
      val queries = materialize(
        vecs(n).filter(col("vec_id") % (n / 10) === 0)
          .select(col("vec_id").as("qid"), col("vec").as("qvec")),
        s"$base/queries_$n") // ~10 queries x nprobe 3 of ~200 cells
      val centroidEvery = math.max(1L, n / 200L).toInt // ~200 cells
      val idx = s"$base/ivfpq_$n"
      val (_, buildS) = time {
        Similarity.writeIvfPqIndex(v, idx, centroidEvery, m = 8, dim = 64)
        1L
      }
      val (_, oneshotS) = med3(
        Similarity.ivfPqTopK(queries, v, k = 5, centroidEvery, nprobe = 3,
          m = 8, dim = 64).count())
      val q = Similarity.ivfPqTopKFromIndex(spark, queries, v, idx,
        k = 5, centroidEvery, nprobe = 3, m = 8, dim = 64)
      val (pr, pt) = pruned(q, s"ivfpq_$n", idx)
      val (rows, fromIdxS) = med3(
        Similarity.ivfPqTopKFromIndex(spark, queries, v, idx,
          k = 5, centroidEvery, nprobe = 3, m = 8, dim = 64).count())
      println(f"ivfpq,$n,$buildS%.1f,$oneshotS%.1f,$fromIdxS%.1f,$pr,$pt,$rows")
    }
    spark.stop()
  }
}

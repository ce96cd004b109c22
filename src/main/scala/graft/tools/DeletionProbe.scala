package graft.tools

import org.apache.spark.sql.functions._

/** Prices the delete family's two cost components at scale — the
  * evidence behind the `deleteMatchingNested` cost model ("one
  * column-pruned discovery scan, then an affected-partition rewrite"):
  *
  *   1. **Growth curve.** An int8 codes index with FIXED-SIZE batch
  *      partitions (the streaming-ingest reality: batch size is the
  *      micro-batch, so the batch COUNT grows with the corpus) takes a
  *      fixed 16-id delete at 1x / 10x / 50x corpus size. Discovery
  *      (the semi-join scan over id + partition columns) must grow
  *      ~linearly with the corpus; the rewrite must stay FLAT — it
  *      re-reads and rewrites only the <= 16 affected fixed-size
  *      partitions, whatever the corpus grew to.
  *   2. **Batching rule.** N ids deleted in ONE call pay ONE discovery
  *      scan; the same ids across N calls pay N. Measured as one
  *      160-id delete vs 10 sequential 16-id deletes on byte-identical
  *      index copies — the number an operator needs to size GDPR
  *      delete batching.
  *
  * Honesty notes: a full warm-up delete runs first (JIT + codegen), and
  * the growth legs run LARGEST FIRST so any residual warm-up benefit
  * lands on the small legs — overstating large-scale cost, i.e. biasing
  * AGAINST the flat-rewrite claim. The index layout is written directly
  * with the batch column (byte-equivalent to N sequential
  * `appendToInt8Index` calls, which have no per-batch marker protocol)
  * so the 50x leg's setup is one write, not 244 jobs.
  *
  * Usage: runMain graft.tools.DeletionProbe [baseVectors] [dim]
  */
object DeletionProbe {
  private val BatchSize = 4096L

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "deletion-probe")
    val base = args.headOption.map(_.toLong).getOrElse(20000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val sim = graft.functions.Similarity

    def writeIndex(n: Long, path: String): Unit = {
      val q8 = sim.quantizeInt8(col("vec"))
      spark.range(n).select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${dim - 1}), " +
            "j -> cast(((id * 31 + j * 17) % 23 - 11) / 7.0 as float))")
            .as("vec"))
        .select(col("vec_id"), q8.getField("scale").as("scale"),
          q8.getField("q").as("code"),
          (col("vec_id") / lit(BatchSize)).cast("long").as("batch"))
        .write.mode("overwrite").partitionBy("batch").parquet(path)
    }
    def spreadIds(n: Long, k: Int): Seq[Long] =
      (0 until k).map(i => i.toLong * (n / k) + 3L)
    // the discovery half of deleteMatchingNested, timed in isolation:
    // one semi-join scan collecting the affected partition tuples
    def discover(path: String, ids: Seq[Long]): Int = {
      import spark.implicits._
      spark.read.parquet(path)
        .join(broadcast(ids.toDF("vec_id")), Seq("vec_id"), "left_semi")
        .select(col("batch").cast("string")).distinct()
        .collect().length
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // warm-up: JIT + codegen on a throwaway copy, never reported
    locally {
      val w = java.nio.file.Files.createTempDirectory("graft-del-warm").toString
      writeIndex(base, w)
      discover(w, spreadIds(base, 16))
      sim.deleteFromInt8Index(spark, spreadIds(base, 16), w)
      ()
    }

    // growth legs, LARGEST FIRST (see honesty note)
    for (scale <- Seq(50L, 10L, 1L)) {
      val n = base * scale
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-del-$scale").toString
      writeIndex(n, path)
      val ids = spreadIds(n, 16)
      val (nAff, tDisc) = timed(discover(path, ids))
      val (st, tDel) = timed(sim.deleteFromInt8Index(spark, ids, path))
      println(f"[deletion] scale=${scale}x n=$n batches=${n / BatchSize + 1} " +
        f"discovery=$tDisc%.2f s (affected=$nAff) " +
        f"delete=$tDel%.2f s (rewrite~=${tDel - tDisc}%.2f s, " +
        f"rows=${st.rowsDeleted} rewritten=${st.partitionsRewritten} " +
        f"untouched=${st.partitionsUntouched})")
    }

    // batching rule at 10x: one 160-id call vs 10 sequential 16-id calls
    val n10 = base * 10L
    val one = java.nio.file.Files.createTempDirectory("graft-del-one").toString
    val ten = java.nio.file.Files.createTempDirectory("graft-del-ten").toString
    writeIndex(n10, one)
    writeIndex(n10, ten)
    val ids160 = spreadIds(n10, 160)
    val (stOne, tOne) = timed(sim.deleteFromInt8Index(spark, ids160, one))
    val (_, tTen) = timed {
      ids160.grouped(16).foreach(g =>
        sim.deleteFromInt8Index(spark, g, ten))
    }
    println(f"[deletion] batching at 10x: 160 ids in ONE call $tOne%.2f s " +
      f"(rewritten=${stOne.partitionsRewritten}); same ids across 10 calls " +
      f"$tTen%.2f s (${tTen / tOne}%.2fx) — N deletes batched into one call " +
      "pay one discovery scan")
    spark.stop()
  }
}

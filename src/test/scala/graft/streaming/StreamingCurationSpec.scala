package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class CurDoc(doc_id: Long, source: String, text: String, ts: Timestamp)

/** The curation pipeline running as a stream: quality gate, exact dedup
  * within the watermark horizon, deterministic sampling and PII scrub all
  * compose on a MemoryStream of documents, with duplicates dropped across
  * micro-batches.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(sec: Long) = new Timestamp(sec * 1000)
  private val goodText =
    "the quick brown fox jumps over the lazy dog while we watch it run " +
      "through the field and the sun is warm on the grass today"

  test("streaming pipeline gates, dedups across batches, samples and scrubs") {
    val input = MemoryStream[CurDoc]
    val out = StreamingCuration.pipeline(
      input.toDF(), "doc_id", "text", "source", "ts",
      minQualityMilli = 400,
      ratesMilli = Map("keepall" -> 1000), defaultRateMilli = 1000,
      horizon = "1 minute")
    val q = out.writeStream.format("memory").queryName("cur_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        CurDoc(1L, "keepall", goodText + " mail me a@b.co", t(10)),
        CurDoc(2L, "keepall", "x", t(11))) // one-token doc -> gated out
      q.processAllAvailable()
      input.addData(
        CurDoc(3L, "keepall", goodText + " mail me a@b.co", t(20)), // dup of 1 (normalized)
        CurDoc(4L, "keepall", goodText + " but different tail", t(21)))
      q.processAllAvailable()
      val rows = spark.table("cur_out")
        .select("doc_id", "scrubbed", "n_emails").as[(Long, String, Long)]
        .collect().sortBy(_._1)
      assert(rows.map(_._1).toSeq === Seq(1L, 4L), s"got: ${rows.toSeq}")
      assert(rows(0)._2.endsWith("mail me <EMAIL>"))
      assert(rows(0)._3 === 1L)
    } finally q.stop()
  }

  test("streaming sample equals the batch sample on the same rows") {
    val docs = (1L to 200L).map(i =>
      CurDoc(i, if (i % 2 == 0) "even" else "odd", goodText + " " + i, t(i)))
    val input = MemoryStream[CurDoc]
    val out = StreamingCuration.pipeline(
      input.toDF(), "doc_id", "text", "source", "ts",
      minQualityMilli = 1,
      ratesMilli = Map("even" -> 300), defaultRateMilli = 700,
      horizon = "1 minute")
    val q = out.writeStream.format("memory").queryName("cur_sample")
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(50).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("cur_sample").select("doc_id").as[Long]
        .collect().toSet
      val batch = graft.functions.Curation.stratifiedSample(
        docs.toDF(), "doc_id", "source", Map("even" -> 300), 700)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming contamination gate holds out bench-overlapping docs") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("bench_id", "text")
    val bloom = graft.functions.Curation.benchShingleBloom(bench, "text", n = 3)

    val leaky = "intro words then alpha beta gamma delta epsilon as in the benchmark"
    val clean = "wholly unrelated content about rivers mountains and weather patterns"
    val input = MemoryStream[CurDoc]
    val out = StreamingCuration.contaminationGate(
      input.toDF(), "text", bloom, n = 3, maxBenchShingles = 1)
    val q = out.writeStream.format("memory").queryName("cont_gate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(CurDoc(10L, "s", leaky, t(1)), CurDoc(11L, "s", clean, t(2)))
      q.processAllAvailable()
      input.addData(CurDoc(12L, "s", clean + " again", t(3)))
      q.processAllAvailable()
      val kept = spark.table("cont_gate").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(11L, 12L), "leaky doc must be held out")
      // the kept docs' hit counts are zero (bloom has no false negatives,
      // and these shingle sets are disjoint from the bench)
      val hits = spark.table("cont_gate").select("bench_hits").as[Int].collect()
      assert(hits.forall(_ === 0))
    } finally q.stop()
  }
}

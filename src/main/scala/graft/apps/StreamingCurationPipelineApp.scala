package graft.apps

import java.nio.file.Files

import scala.util.Try

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.functions.Dedup
import graft.streaming.CurationPipeline

/** CAPSTONE app: continuous document ingest through the streaming
  * curation fanout — the one-source / two-pipeline composite shape of the
  * reference's `chapter6/CourseUseCase.java`, over the curation operators:
  * a file-drop doc stream is quality-gated once, then fanned (single
  * source read per micro-batch) into
  *
  *   1. the CURATE pipeline: near-dup probe against the materialized LSH
  *      index, dup log, kept corpus, index append — each write an
  *      idempotent `batch=<id>` partition overwrite, so the outputs are
  *      exactly-once and a checkpoint restart resumes cleanly; and
  *   2. the METRICS pipeline: per-batch per-language doc/token/quality
  *      aggregates.
  *
  * The LSH index is SEEDED by the batch tier ([[Dedup.writeLshIndex]])
  * and grown by the stream — the batch-builds / stream-maintains split a
  * 100 TB ingest runs.
  *
  * Usage: runMain graft.apps.StreamingCurationPipelineApp [records]
  */
object StreamingCurationPipelineApp {
  def main(args: Array[String]): Unit = {
    val records = args.headOption.map(_.toInt).getOrElse(40)
    val spark = GraftSession.local(8, "streaming-curation-pipeline")
    import spark.implicits._

    val root = Files.createTempDirectory("curation_pipeline").toString
    val (src, ckpt) = (s"$root/src", s"$root/ckpt")
    val (kept, dups, idx, metrics) =
      (s"$root/kept", s"$root/dups", s"$root/index", s"$root/metrics")

    // batch tier: seed the index with the existing (here: 1-doc) corpus
    Dedup.writeLshIndex(
      Seq((-1L, "seed corpus document about entirely unrelated matters and topics"))
        .toDF("doc_id", "text"),
      "text", "doc_id", idx, n = 3, bands = 4, rowsPerBand = 4, buckets = 16)

    val gen = DataGenerators.docFiles(src, records, intervalMs = 25)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType),
      StructField("text", StringType)))
    val docs = spark.readStream.schema(schema).csv(src)

    val q = CurationPipeline.start(
      docs, "text", "doc_id", minQualityMilli = 400,
      kept, dups, idx, metrics, buckets = 16)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      gen.await() // all `records` docs written, however slow the host
      q.processAllAvailable()
    } finally q.stop()

    val keptN = Try(spark.read.parquet(kept).count()).getOrElse(0L)
    val dupN = Try(spark.read.parquet(dups).select("new_id").distinct().count())
      .getOrElse(0L)
    val indexed = spark.read.parquet(s"$idx/shingles").select("doc").distinct().count()
    println(s"[curation-stream] $records docs in -> $keptN kept, " +
      s"$dupN near-dups held out, $indexed docs indexed -> $root")
    Try(spark.read.parquet(metrics)
      .groupBy("lang_pred")
      .agg(sum("docs").as("docs"), sum("tokens").as("tokens"))
      .orderBy("lang_pred").collect()
      .foreach(r => println(
        s"[curation-stream]   ${r.getString(0)}: ${r.getLong(1)} docs, ${r.getLong(2)} tokens")))
    spark.stop()
  }
}

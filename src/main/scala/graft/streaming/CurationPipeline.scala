package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.{Dedup, IndexLayout}
import graft.sinks.Sinks

/** The streaming-curation CAPSTONE: one document stream fanned into the
  * two pipelines a training-data ingest actually runs, from a single
  * source read — the streaming analogue of the reference's one-source /
  * two-pipeline composite (`chapter6/CourseUseCase.java:1-214`, which
  * fans one browser stream into a keyed window agg and a stateful
  * sessionization), re-expressed over the curation operators:
  *
  *   - CURATE branch: quality-gated docs are scored against the
  *     materialized LSH dedup index ([[graft.functions.Dedup.nearDupsAgainstIndex]],
  *     excluding the batch's own rows so replays are deterministic),
  *     near-dups land in a dup log, clean docs land in the kept corpus
  *     AND grow the index ([[graft.functions.Dedup.appendToLshIndex]]) —
  *     so a duplicate arriving minutes after its original is caught.
  *   - METRICS branch: per-batch per-language counts / token sums /
  *     mean quality — the ops dashboard feed.
  *
  * Every write in both branches is a `batch=<id>` dynamic-partition
  * overwrite ([[graft.functions.IndexLayout]]), so foreachBatch's
  * at-least-once replay yields exactly-once CONTENTS in all four outputs
  * (kept corpus, dup log, LSH index, metrics) — and a crash-restart from
  * the checkpoint converges to the never-crashed run's outputs
  * (spec: `CurationPipelineSpec`).
  *
  * At 100 TB/day this shape holds: the gate is a narrow per-row
  * transform, the dedup probe reads only the (<= `buckets`) index
  * partitions the batch's band hashes touch, and the index append
  * shuffles only the batch — no stage scans history.
  */
object CurationPipeline {

  /** Per-batch body of the curate branch (public so specs and batch
    * backfills can run one batch directly).
    */
  def curateBatch(
      gated: DataFrame,
      batchId: Long,
      textCol: String,
      idCol: String,
      keptPath: String,
      dupsPath: String,
      indexPath: String,
      n: Int,
      bands: Int,
      rowsPerBand: Int,
      minJaccardMilli: Int,
      buckets: Int): Unit = {
    // localCheckpoint: the batch feeds the dup probe (twice: bucket
    // collect + candidate join), the anti-join, and the index append
    val b = gated.localCheckpoint()
    try {
      val dups = Dedup.nearDupsAgainstIndex(
        b.sparkSession, b, textCol, idCol, indexPath,
        n, bands, rowsPerBand, minJaccardMilli, buckets,
        excludeBatchId = Some(batchId)).localCheckpoint()
      try {
        IndexLayout.overwriteBatchPartitions(
          dups.withColumn("batch", lit(batchId)), dupsPath, Seq("batch"))
        val clean = b.join(
          dups.select(col("new_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
        IndexLayout.overwriteBatchPartitions(
          clean.withColumn("batch", lit(batchId)), keptPath, Seq("batch"))
        Dedup.appendToLshIndex(
          clean, textCol, idCol, indexPath, n, bands, rowsPerBand, buckets,
          batchId = Some(batchId))
      } finally { graft.functions.Checkpoints.unpersist(dups); () }
    } finally { graft.functions.Checkpoints.unpersist(b); () }
  }

  /** Per-batch body of the metrics branch: per-language doc/token counts
    * and mean quality, one row set per micro-batch.
    *
    * `nbRouting = Some((model, classes))` swaps the heuristic `lang_pred`
    * for the TRAINED router's prediction
    * ([[graft.functions.TextAnalysis.nbScoreAgainst]] against a frozen,
    * e.g. [[graft.functions.CurationArtifacts]]-loaded, model) — the
    * serving-position classifier inside the live pipeline. Docs the
    * scorer can't place (no trigrams) keep the heuristic label, so the
    * branch stays total.
    */
  def metricsBatch(
      gated: DataFrame,
      batchId: Long,
      metricsPath: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      nbRouting: Option[(DataFrame, DataFrame)] = None): Unit = {
    val routed = nbRouting match {
      case Some((model, classes)) =>
        gated.join(
          // the scorer normalizes its id column to "doc_id"
          graft.functions.TextAnalysis.nbScoreAgainst(
            gated, textCol, idCol, model, classes)
            .select(col("doc_id").as(idCol), col("pred_label")),
          Seq(idCol), "left")
          .withColumn("lang_pred",
            coalesce(col("pred_label"), col("lang_pred")))
          .drop("pred_label")
      case None => gated
    }
    IndexLayout.overwriteBatchPartitions(
      routed.groupBy("lang_pred")
        .agg(
          count(lit(1)).as("docs"),
          sum("n_tokens").as("tokens"),
          floor(avg("quality_milli")).cast("long").as("avg_quality_milli"))
        .withColumn("batch", lit(batchId)),
      metricsPath, Seq("batch"))
  }

  /** One gated doc stream fanned into curate + metrics. Caller sets the
    * checkpoint location and starts the returned writer; restarting from
    * the same checkpoint resumes exactly where the crash left off.
    */
  def start(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minQualityMilli: Int,
      keptPath: String,
      dupsPath: String,
      indexPath: String,
      metricsPath: String,
      n: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minJaccardMilli: Int = 600,
      buckets: Int = 16,
      nbRouting: Option[(DataFrame, DataFrame)] = None): DataStreamWriter[Row] = {
    val gated = StreamingCuration.annotateAndGate(docs, textCol, minQualityMilli)
    Sinks.fanoutSinkById(gated, Seq(
      "curate" -> ((b: DataFrame, id: Long) =>
        if (!b.isEmpty)
          curateBatch(b, id, textCol, idCol, keptPath, dupsPath, indexPath,
            n, bands, rowsPerBand, minJaccardMilli, buckets)),
      "metrics" -> ((b: DataFrame, id: Long) =>
        if (!b.isEmpty)
          metricsBatch(b, id, metricsPath, textCol, idCol, nbRouting))))
  }
}

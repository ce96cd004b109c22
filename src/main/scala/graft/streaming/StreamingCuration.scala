package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Curation, Dedup, TextAnalysis}

/** The curation pipeline as a STREAMING flow — documents arriving
  * continuously (file drops, a queue) are annotated, gated, deduplicated
  * within the watermark horizon, sampled and scrubbed incrementally.
  *
  * Everything except the dedup stage is a narrow per-row transform, so the
  * batch operators compose unchanged on a streaming DataFrame; dedup uses
  * `dropDuplicatesWithinWatermark` on the normalized fingerprint, which is
  * the streaming-correct form of exact dedup (state bounded by the
  * watermark horizon — a global-history dedup would grow state without
  * bound; dedupe of the backlog belongs to the batch pipeline).
  *
  * The reference has no streaming-ingest curation analogue — this is part
  * of the beyond-reference surface; the batch twin is
  * `apps/TrainingDataPipelineApp`.
  */
object StreamingCuration {

  /** Annotate + quality-gate + fingerprint: narrow, streaming-safe. */
  def annotateAndGate(docs: DataFrame, textCol: String, minQualityMilli: Int): DataFrame =
    docs
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("quality_milli", TextAnalysis.qualityMilli(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("fp", Dedup.normalizedFingerprint(col(textCol)))
      .filter(col("quality_milli") >= minQualityMilli)

  /** Full streaming flow: gate -> watermark-bounded exact dedup ->
    * deterministic stratified sample -> PII scrub.
    *
    * @param tsCol     event-time column used to bound dedup state
    * @param horizon   watermark delay (how long a duplicate can lag its
    *                  original and still be dropped)
    */
  def pipeline(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stratCol: String,
      tsCol: String,
      minQualityMilli: Int,
      ratesMilli: Map[String, Int],
      defaultRateMilli: Int,
      horizon: String = "10 minutes"): DataFrame = {
    val gated = annotateAndGate(docs, textCol, minQualityMilli)
    val deduped = gated
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")
    val sampled = Curation.stratifiedSample(
      deduped, idCol, stratCol, ratesMilli, defaultRateMilli)
    Curation.piiScrub(sampled, textCol)
  }
}

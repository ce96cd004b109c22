package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{Dedup, TextAnalysis}
import graft.sources.Tables

/** End-to-end LLM training-data curation pipeline over the `documents`
  * table — the composite the individual operators exist for:
  *
  *   1. annotate: language ID, quality score, token counts, fingerprint
  *   2. quality gate: drop low-quality docs — heuristic signals AND the
  *      corpus-LM surprisal score (fluency outliers out)
  *   3. exact dedup with SOURCE PRIORITY: keep the most-trusted source's
  *      copy per fingerprint, not just the lowest id
  *   4. near-dup removal: MinHash+LSH pairs; drop the higher id of each
  *      verified pair (union-find-free greedy, deterministic)
  *   5. write the cleaned corpus + per-language stats
  *
  * Every stage is a narrow transform or a keyed shuffle on digests/hashed
  * shingles — the same plan scales to a 1000-executor cluster unchanged.
  *
  * Usage: runMain graft.apps.TrainingDataPipelineApp [sfDir] [outDir]
  */
object TrainingDataPipelineApp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption
      .getOrElse(Files.createTempDirectory("cleaned_corpus").toString)
    val spark = GraftSession.local(16, "training-data-pipeline")

    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()

    // 1. annotate
    val annotated = docs
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("quality_milli", TextAnalysis.qualityMilli(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))

    // 2. quality gate: heuristics + corpus-LM fluency (drop the most
    // surprising 3 bits-above-nothing tail — encoding garbage, wrong-
    // script noise; the LM is trained on the corpus itself, one agg)
    val lm = TextAnalysis.lmSurprisalScore(docs, "text", "doc_id")
      .select(col("doc_id"), col("avg_surprisal_q10"))
    val qualityOk = annotated
      .join(lm, Seq("doc_id"), "left")
      .filter(col("quality_milli") >= 400 &&
        coalesce(col("avg_surprisal_q10"), lit(0L)) < lit(14L * 1024L))

    // 3. exact dedup on the NORMALIZED fingerprint annotated in step 1
    // (case/whitespace variants collapse), resolved by source priority
    // (curated sources win over crawl copies; min id breaks ties)
    val keepIds = Dedup.priorityResolvedGroupsByKey(qualityOk, col("fp"),
        "doc_id", "source", priority = Map("src2" -> 0, "src0" -> 1), defaultRank = 2)
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = qualityOk.join(keepIds, Seq("doc_id"))

    // 4. near-dup removal (drop the higher id of every verified LSH pair)
    val nearDupLosers = Dedup
      .minhashLshPairs(exactDeduped, "text", "doc_id",
        n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 600)
      .select(col("b").as("doc_id")).distinct()
    val cleaned = exactDeduped
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .cache()

    // 5. write + stats
    cleaned
      .select("doc_id", "text", "lang_pred", "quality_milli", "n_tokens", "source")
      .write.mode("overwrite").partitionBy("lang_pred").parquet(outDir)

    val kept = cleaned.count()
    val stats = cleaned.groupBy("lang_pred")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .orderBy("lang_pred").collect()
    println(s"[pipeline] $total docs -> $kept kept (${total - kept} dropped) -> $outDir")
    stats.foreach(r => println(
      s"[pipeline]   ${r.getString(0)}: ${r.getLong(1)} docs, ${r.getLong(2)} tokens"))
    spark.stop()
  }
}

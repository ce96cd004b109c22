package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CoreOps

/** Incremental view maintenance (IVM) for the distributive aggregates —
  * the 100 TB answer to "a 1 GB delta arrived; do not rescan the lake".
  *
  * The TPC-H Q1 pricing summary is all integer SUMs and COUNTs (the
  * engine's centi-scaled fixed-point convention), so it is a
  * commutative monoid per (returnflag, linestatus) key: the summary of
  * `base ∪ delta` is the key-wise ADDITION of the two summaries — the
  * same algebra Spark's own partial aggregates exploit map-side, lifted
  * to a STORED summary table. Maintenance cost is sized by the delta
  * (one scan of the new rows + a merge on |keys| rows), never the lake.
  * Deletions/retractions follow the same algebra with negated counts —
  * out of scope here because the corpus is append-only.
  *
  * `IncrementalSpec` proves merge(base, delta) is bit-identical to the
  * full recompute, and the `tpch_q1_incremental` gate row proves it
  * against the independent DuckDB oracle (whose SQL is the PLAIN full
  * aggregate — the merged path must land on the same hash).
  */
object Incremental {

  /** The Q1 pricing summary over any lineitem slice, unordered —
    * centi-scaled integer sums + count per (returnflag, linestatus),
    * exactly the `tpch_q1_pricing` aggregate.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= expr("TIMESTAMP '2000-09-02 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(CoreOps.scaledCenti(col("l_quantity"))).as("sum_qty_c"),
        sum(CoreOps.scaledCenti(col("l_extendedprice"))).as("sum_base_c"),
        sum(CoreOps.scaledCenti(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_c"),
        sum(CoreOps.scaledCenti(
          col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))
          .as("sum_charge_c"),
        count(lit(1)).as("n"))

  /** Streaming IVM: maintain the pricing summary under a micro-batched
    * lineitem delta stream. Every micro-batch computes its own
    * delta-sized summary, merges it with the LATEST summary version
    * written by an EARLIER batch, and overwrites `summaryDir/v=<batchId>`
    * — deterministic per batch id, so an at-least-once foreachBatch
    * replay re-reads exactly the pre-batch state (its own half-written
    * version is excluded by `v < batchId`) and re-produces identical
    * contents: exactly-once summary state without transactions, the
    * [[graft.streaming.StreamOps.dedupIngestStream]] `excludeBatchId`
    * idea applied to a summary table.
    *
    * Scale shape per micro-batch: one delta-sized aggregate + a merge
    * over two |keys|-row frames + one |keys|-row snapshot write. The
    * version listing is one driver-side directory scan (one entry per
    * micro-batch — compact by deleting versions below the last commit
    * on whatever retention the caller runs). Read the current summary
    * with [[latestSummary]].
    */
  def maintainPricingSummary(
      deltaLineitem: DataFrame,
      summaryDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deltaLineitem.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val delta = pricingSummary(batch.toDF())
        val merged = latestSummary(batch.sparkSession, summaryDir,
            beforeBatch = Some(batchId))
          .map(mergePricingSummaries(_, delta)).getOrElse(delta)
        // |keys| rows: one file is the right layout for a summary table
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$summaryDir/v=$batchId")
        ()
      }

  /** Newest summary snapshot under `summaryDir` (strictly below
    * `beforeBatch` when given — the replay-exclusion read). None before
    * the first commit. One bounded driver-side listing, never data-sized.
    */
  def latestSummary(
      spark: org.apache.spark.sql.SparkSession,
      summaryDir: String,
      beforeBatch: Option[Long] = None): Option[DataFrame] = {
    val dir = new java.io.File(summaryDir)
    val versions = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(v => beforeBatch.forall(v < _))
    if (versions.isEmpty) None
    else Some(spark.read.parquet(s"$summaryDir/v=${versions.max}"))
  }

  /** Key-wise monoid merge of two pricing summaries: integer sums and
    * counts add; keys present in only one side pass through (the union +
    * re-aggregate form — associative, order-free, and the plan is a
    * partial-agg groupBy over |keys_a| + |keys_b| SUMMARY rows, not data
    * rows). Chain it to fold any number of per-batch summaries.
    */
  def mergePricingSummaries(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = Seq("l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_c",
      "sum_disc_c", "sum_charge_c", "n").map(col)
    a.select(cols: _*).unionAll(b.select(cols: _*))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("sum_qty_c")).as("sum_qty_c"),
        sum(col("sum_base_c")).as("sum_base_c"),
        sum(col("sum_disc_c")).as("sum_disc_c"),
        sum(col("sum_charge_c")).as("sum_charge_c"),
        sum(col("n")).as("n"))
  }
}

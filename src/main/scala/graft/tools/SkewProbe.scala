package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.CoreOps

/** Dev probe: direct vs time-chunked sessionization on a planted-hot-key
  * corpus — 3 reps, median, two bucket widths.
  * Usage: runMain graft.tools.SkewProbe [millions...]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong * 1000000L) else Seq(8000000L)
    val spark = GraftSession.local(32, "skew-probe")
    def corpus(n: Long) = spark.range(n).select(
      timestamp_micros(lit(1704067200000000L) +
        pmod(col("id") * 7919L, lit(30L * 86400000000L))).as("ts"),
      when(pmod(col("id"), lit(100)) < 99, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(5000))).as("user_id"),
      (pmod(xxhash64(col("id") + 1), lit(1000)) / lit(1000.0)).as("value"))
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (n <- sizes) {
      val df = corpus(n)
      mat(CoreOps.sessionSummary(df, "user_id", "ts", "4 hours", "value")) // warm
      mat(CoreOps.sessionSummaryChunked(df, "user_id", "ts", 14400000000L, 86400000000L, "value"))
      val d = med(mat(CoreOps.sessionSummary(df, "user_id", "ts", "4 hours", "value")))
      val c24 = med(mat(CoreOps.sessionSummaryChunked(df, "user_id", "ts", 14400000000L, 86400000000L, "value")))
      val c6 = med(mat(CoreOps.sessionSummaryChunked(df, "user_id", "ts", 14400000000L, 21600000000L, "value")))
      println(f"[skew] n=$n direct=$d%.2f chunked24h=$c24%.2f chunked6h=$c6%.2f")

      // same planted-hot-key corpus through the J3 pair: left = every
      // row, right = ~1% of rows (unique per (key, ts) by construction
      // of distinct ids -> pre-agg is a cheap exact dedup)
      val l = df.withColumn("lid", monotonically_increasing_id())
      val r = df.filter(pmod(xxhash64(col("ts").cast("long")), lit(100)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(unix_micros(col("ts"))).as("rid"))
      mat(CoreOps.asofJoin(l, r, "user_id", "ts")) // warm
      mat(CoreOps.asofJoinChunked(l, r, "user_id", "ts", 21600000000L))
      val ad = med(mat(CoreOps.asofJoin(l, r, "user_id", "ts")))
      val ac = med(mat(CoreOps.asofJoinChunked(l, r, "user_id", "ts", 21600000000L)))
      println(f"[skew] n=$n asof_direct=$ad%.2f asof_chunked6h=$ac%.2f")
    }
    spark.stop()
  }
}

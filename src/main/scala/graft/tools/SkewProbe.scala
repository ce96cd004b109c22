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
    def med(f: => Long): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (n <- sizes) {
      val df = corpus(n)
      CoreOps.sessionSummary(df, "user_id", "ts", "4 hours", "value").count() // warm
      CoreOps.sessionSummaryChunked(df, "user_id", "ts", 14400000000L, 86400000000L, "value").count()
      val d = med(CoreOps.sessionSummary(df, "user_id", "ts", "4 hours", "value").count())
      val c24 = med(CoreOps.sessionSummaryChunked(df, "user_id", "ts", 14400000000L, 86400000000L, "value").count())
      val c6 = med(CoreOps.sessionSummaryChunked(df, "user_id", "ts", 14400000000L, 21600000000L, "value").count())
      println(f"[skew] n=$n direct=$d%.2f chunked24h=$c24%.2f chunked6h=$c6%.2f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.CoreOps

/** Dev probe: direct vs time-chunked vs skew-routed-auto forms on a
  * planted-hot-key corpus (99% of rows on one key) and its uniform twin
  * (~5000 keys) — 3 reps, median. The as-of corpora are written to (and
  * read back from) PARQUET first: the real-world input is a stored
  * table, and the auto form's routing probe is a column-pruned scan of
  * the key column alone — timing it against a generator (or a
  * full-row localCheckpoint) billed the probe 2-10x its real cost.
  * Usage: runMain graft.tools.SkewProbe [millions...]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong * 1000000L) else Seq(8000000L)
    val spark = GraftSession.local(32, "skew-probe")
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-skew-probe"
    def store(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      spark.read.parquet(s"$tmp/$name")
    }
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
      // of distinct ids -> pre-agg is a cheap exact dedup); both sides
      // stored as parquet tables (see object doc)
      val l = store(df.withColumn("lid", monotonically_increasing_id()), "hot_l")
      val r = store(df.filter(pmod(xxhash64(col("ts").cast("long")), lit(100)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(unix_micros(col("ts"))).as("rid")), "hot_r")
      mat(CoreOps.asofJoin(l, r, "user_id", "ts")) // warm
      mat(CoreOps.asofJoinChunked(l, r, "user_id", "ts", 21600000000L))
      val ad = med(mat(CoreOps.asofJoin(l, r, "user_id", "ts")))
      val ac = med(mat(CoreOps.asofJoinChunked(l, r, "user_id", "ts", 21600000000L)))
      // the skew-routed dispatcher on the same hot corpus: must track the
      // chunked twin plus one pruned-column probe scan
      val aa = med(mat(CoreOps.asofJoinAuto(l, r, "user_id", "ts", 21600000000L)))
      println(f"[skew] n=$n asof_direct=$ad%.2f asof_chunked6h=$ac%.2f asof_auto=$aa%.2f")

      // uniform twin corpus (same size, ~5000 keys, no hot key): the
      // dispatcher must route DIRECT and track the direct twin there
      val u = spark.range(n).select(
        timestamp_micros(lit(1704067200000000L) +
          pmod(col("id") * 7919L, lit(30L * 86400000000L))).as("ts"),
        pmod(xxhash64(col("id")), lit(5000)).as("user_id"),
        (pmod(xxhash64(col("id") + 1), lit(1000)) / lit(1000.0)).as("value"))
      val ul = store(u.withColumn("lid", monotonically_increasing_id()), "uni_l")
      val ur = store(u.filter(pmod(xxhash64(col("ts").cast("long")), lit(100)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(unix_micros(col("ts"))).as("rid")), "uni_r")
      mat(CoreOps.asofJoin(ul, ur, "user_id", "ts")) // warm
      val ud = med(mat(CoreOps.asofJoin(ul, ur, "user_id", "ts")))
      val uc = med(mat(CoreOps.asofJoinChunked(ul, ur, "user_id", "ts", 21600000000L)))
      val ua = med(mat(CoreOps.asofJoinAuto(ul, ur, "user_id", "ts", 21600000000L)))
      println(f"[skew] n=$n uniform_asof_direct=$ud%.2f uniform_asof_chunked6h=$uc%.2f uniform_asof_auto=$ua%.2f")
      // the probe itself, priced alone on the stored tables
      val keys = ul.select(col("user_id")).unionAll(ur.select(col("user_id")))
      val tp = med { CoreOps.topKeyShare(keys, "user_id"); () }
      println(f"[skew] n=$n probe_scan=$tp%.2f")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}

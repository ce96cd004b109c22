package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Protocol (steady-state, self-contamination-free):
  *   1. A full untimed warm-up pass runs first so the timed passes measure
  *      the engine, not JVM/class-loading, whole-stage-codegen compilation,
  *      or parquet footer caching.
  *   2. Each query is timed as the MEDIAN of three runs — a single timed
  *      run is hostage to GC pauses and host noise.
  *   3. The 16M-row skew demonstration runs in its OWN SparkSession after
  *      the main session is stopped, and is reported in a separate
  *      `skew_demo` JSON block: its 32M-row working set otherwise raises
  *      JVM heap/GC pressure for every query timed after it (measured in
  *      round 2: up to 18x inflation on unrelated queries).
  */
object Bench {
  private def newSession(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** (medianSeconds, allRunsSucceeded) over `runs` timed executions. */
  private def timed(runs: Int)(body: => Unit): (Double, Boolean) = {
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val ok = try { body; true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val sorted = times.map(_._1).sorted
    (sorted(sorted.length / 2), times.forall(_._2))
  }

  // Skew demonstration: a deterministic corpus with 99% of events on one
  // user. Direct sessionization funnels the hot key's rows through ONE
  // reducer (serial sort + spill); the chunked form spreads them over 6h
  // time buckets and merges per-session summaries — same result (oracled
  // as a4_sessions_chunked; equality-tested in InvariantSpec), skew-immune
  // plan. The pair exists precisely to show chunked << direct.
  private def skewCorpus(spark: SparkSession, n: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.range(n).select(
      timestamp_micros(lit(1704067200000000L) +
        pmod(col("id") * 7919L, lit(30L * 86400000000L))).as("ts"),
      when(pmod(col("id"), lit(100)) < 99, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(5000))).as("user_id"),
      (pmod(xxhash64(col("id") + 1), lit(1000)) / lit(1000.0)).as("value"))
  }
  private def skewPair(spark: SparkSession, n: Long): Seq[(String, () => DataFrame)] = Seq(
    "skew_sessions_direct" -> (() =>
      graft.operators.CoreOps.sessionSummary(
        skewCorpus(spark, n), "user_id", "ts", "4 hours", "value")),
    "skew_sessions_chunked" -> (() =>
      graft.operators.CoreOps.sessionSummaryChunked(
        skewCorpus(spark, n), "user_id", "ts", 14400000000L, 21600000000L, "value")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt

    // ---- Phase 1: the shipped queries, alone in their own session. ----
    val spark = newSession(cpus)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () } // warm-up
    }
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val (sec, ok) = timed(runs)(fn(spark, sfDir).count())
      (name, sec, ok)
    }
    spark.stop()

    // ---- Phase 2: the 16M-row skew demo, in a fresh session. ----
    val spark2 = newSession(cpus)
    skewPair(spark2, 2000000L).foreach { case (_, fn) =>
      try fn().count() catch { case _: Throwable => () } // warm-up (JIT only)
    }
    val skewResults = skewPair(spark2, 16000000L).map { case (name, fn) =>
      val (sec, ok) = timed(runs)(fn().count())
      (name, sec, ok)
    }
    spark2.stop()

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val skewQs = skewResults.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = (results ++ skewResults).collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"skew_demo":$skewQs,"runs_per_query":$runs,"errors":$errors,"sf":"$sfDir"}""")
  }
}

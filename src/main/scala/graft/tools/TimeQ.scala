package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc single-query timer — the inner loop for plan/perf iteration
  * without paying for a full Bench pass. r17: matches the Bench slow-tail
  * protocol instead of the old shared-session `.count()` shape, which
  * both under-timed (count() prunes columns, deleting every
  * cardinality-preserving operator from the executed plan — the Bench
  * scaladoc's round-9 finding) and cross-contaminated (a shared session
  * inflates heavy queries 15-65%). Now: per query, a FRESH session, two
  * warm passes on the tiny sf0.001 sibling (codegen/JIT off the clock),
  * then `runs` timed noop-sink executions at full scale; min and all
  * times printed.
  *
  * Usage: runMain graft.tools.TimeQ <queryName> [queryName ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_TIMEQ_RUNS (default 3).
  */
object TimeQ {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_TIMEQ_RUNS", "3").toInt
    val warmDir = {
      val p = java.nio.file.Paths.get(sf).toAbsolutePath.getParent
      if (p != null) p.resolve("sf0.001").toString else ""
    }
    val warmOk = warmDir.nonEmpty &&
      new java.io.File(warmDir, "lineitem.parquet").exists()
    for (q <- args) {
      val fn = graft.SparkEntry.queries(q)
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      if (warmOk) { // two tiny warms, the Bench slow-tail shape
        try { exec(fn(spark, warmDir)); exec(fn(spark, warmDir)) }
        catch { case _: Throwable => () }
      }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        exec(fn(spark, sf))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $q%-28s min ${times.min}%.2f s" +
        f"  (${times.map(t => f"$t%.2f").mkString(", ")})")
      spark.stop()
      System.gc()
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: median of 3 runs per named query at sf0.1,
  * in a clean session — the inner loop for plan/perf iteration without
  * paying for a full Bench pass.
  *
  * Usage: runMain graft.tools.TimeQ <queryName> [queryName ...]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "timeq")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      graft.SparkEntry.queries(q)(spark, sf).count() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $q%-28s median ${times.sorted.apply(1)}%.2f s" +
        f"  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}

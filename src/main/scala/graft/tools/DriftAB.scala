package graft.tools

import org.apache.spark.sql.DataFrame

/** Drift adjudicator: re-times named queries under the EXACT r9 slow-tail
  * protocol — per-query fresh session, NO tiny-corpus warm, min of 2
  * full-scale runs with an adaptive third when run 2 still undercuts
  * run 1 by >20% — so a number drifted under the r10 warm-on-sf0.001
  * single-run protocol can be attributed: protocol artifact (r9-protocol
  * number matches r9's median) vs real engine change (it doesn't).
  *
  * Usage: runMain graft.tools.DriftAB <queryName> [queryName ...]
  */
object DriftAB {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DriftAB <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (name <- args) {
      val spark = graft.GraftSession.local(cpus.toInt, s"drift-ab-$name")
      val fn = graft.SparkEntry.queries(name)
      def one(): Double = {
        val t0 = System.nanoTime(); exec(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      var times = Seq(one(), one())
      if (times(1) < 0.8 * times(0)) times = times :+ one()
      println(f"[driftab] $name%-26s min=${times.min}%.3f s " +
        s"(runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
      spark.stop()
      System.gc()
    }
  }
}

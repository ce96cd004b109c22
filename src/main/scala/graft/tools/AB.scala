package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Same-window A/B runner for [[graft.Tuning]] switches: for each named
  * query, runs legs A and B INTERLEAVED (A B B A, repeated) with a fresh
  * session per run and the leg's system properties applied — so a
  * drifting host window (this round measured 30% swings between
  * back-to-back sbt invocations on untouched queries) hits both legs
  * equally and the verdict is about the code, not the window.
  *
  * Usage: runMain graft.tools.AB <queryName> [...]
  * Env: SPARK_GRAFT_AB_A / SPARK_GRAFT_AB_B — comma-separated `k=v`
  *      system-property sets for the legs (default: A = shipped behavior
  *      with all Tuning switches off, B = all switches on);
  *      SPARK_GRAFT_AB_ROUNDS — ABBA repeats (default 2, i.e. 4 runs per
  *      leg per query).
  */
object AB {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def parseProps(s: String): Map[String, String] =
    s.split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AB <queryName> [...]")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "2").toInt
    val legA = parseProps(sys.env.getOrElse("SPARK_GRAFT_AB_A",
      "graft.alignWrites=0,graft.scanFill=off"))
    val legB = parseProps(sys.env.getOrElse("SPARK_GRAFT_AB_B",
      "graft.alignWrites=1,graft.scanFill=32"))
    val allKeys = legA.keySet ++ legB.keySet
    val warmDir = {
      val p = java.nio.file.Paths.get(sf).toAbsolutePath.getParent
      if (p != null) p.resolve("sf0.001").toString else ""
    }
    val warmOk = new java.io.File(warmDir, "lineitem.parquet").exists()

    def run(name: String, props: Map[String, String]): Double = {
      allKeys.foreach(System.clearProperty)
      props.foreach { case (k, v) => System.setProperty(k, v) }
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val fn = graft.SparkEntry.queries(name)
      if (warmOk) {
        try { exec(fn(spark, warmDir)); exec(fn(spark, warmDir)) }
        catch { case _: Throwable => () }
      }
      val t0 = System.nanoTime()
      exec(fn(spark, sf))
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      System.gc()
      sec
    }

    for (q <- args) {
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to rounds) { // ABBA cancels linear window drift
        a += run(q, legA); b += run(q, legB)
        b += run(q, legB); a += run(q, legA)
      }
      def stats(xs: Seq[Double]) = {
        val s = xs.sorted; (s(s.length / 2), s.min)
      }
      val (medA, minA) = stats(a.toSeq)
      val (medB, minB) = stats(b.toSeq)
      println(f"[ab] $q%-28s A med=$medA%6.2f min=$minA%6.2f | " +
        f"B med=$medB%6.2f min=$minB%6.2f | B/A=${medB / medA}%5.2f " +
        s"(A: ${a.map(t => f"$t%.2f").mkString(",")} B: ${b.map(t => f"$t%.2f").mkString(",")})")
    }
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame

/** Drift adjudicator: re-times named queries under the EXACT r9 slow-tail
  * protocol — per-query fresh session, NO tiny-corpus warm, min of 2
  * full-scale runs with an adaptive third when run 2 still undercuts
  * run 1 by >20% — so a number drifted under the r10 warm-on-sf0.001
  * single-run protocol can be attributed: protocol artifact (r9-protocol
  * number matches r9's median) vs real engine change (it doesn't).
  *
  * `--concurrent` mode (r12, the `search_hybrid_rrf` adjudication): the
  * r11 fast phase runs 2-3 session clones of one SparkContext
  * concurrently — a fast query's median can inflate under that
  * contention without any engine change. This mode reproduces the
  * contention deterministically: the named query is timed (median of 3,
  * after a warm) in one session clone while TWO sibling clones run a
  * fixed rotating load of read-only fast queries, exactly the fast-phase
  * shape. Isolated-vs-concurrent is then a same-window A/B of the
  * concurrency tax alone.
  *
  * Usage: runMain graft.tools.DriftAB [--concurrent] <queryName> [...]
  */
object DriftAB {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DriftAB [--concurrent] <queryName> [...]")
    val concurrent = args.head == "--concurrent"
    val names = if (concurrent) args.tail.toSeq else args.toSeq
    require(names.nonEmpty, "no query names given")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    if (concurrent) concurrentMode(names, sfDir, cpus) else {
      for (name <- names) {
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

  /** Fixed sibling load: read-only fast-phase queries spanning the three
    * contention channels (scan+agg, window, broadcast join, text explode).
    */
  private val siblingLoad = Seq(
    "text_keywords", "tpch_q16_supplier_cnt", "table_profile_orders",
    "tpch_q9_profit", "top_terms", "search_bm25")

  private def concurrentMode(names: Seq[String], sfDir: String, cpus: String): Unit = {
    val spark = graft.GraftSession.local(cpus.toInt, "drift-ab-concurrent")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    (1 to 2).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val sess = spark.newSession()
          // job group is thread-local: tag every sibling job so teardown
          // can cancel the in-flight Spark work (a thread interrupt alone
          // does not cancel running jobs — shutdownNow would otherwise
          // wait out awaitTermination and race spark.stop())
          sess.sparkContext.setJobGroup("driftab-sibling",
            "DriftAB concurrent sibling load", interruptOnCancel = true)
          val it = Iterator.continually(siblingLoad).flatten
          while (!stop.get()) {
            val q = it.next()
            try exec(graft.SparkEntry.queries(q)(sess, sfDir))
            catch { case _: Throwable => () }
          }
        }
      })
    }
    val timerSess = spark.newSession()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      def one(): Double = {
        val t0 = System.nanoTime(); exec(fn(timerSess, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      try exec(fn(timerSess, sfDir)) catch { case _: Throwable => () } // warm
      val times = (1 to 3).map(_ => one()).sorted
      println(f"[driftab-conc] $name%-26s median=${times(1)}%.3f s under 2 " +
        s"sibling clones (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    stop.set(true)
    // cancel in-flight sibling jobs FIRST — prompt teardown instead of
    // waiting out a 120 s query under interrupt
    spark.sparkContext.cancelJobGroup("driftab-sibling")
    pool.shutdownNow()
    pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)
    spark.stop()
  }
}

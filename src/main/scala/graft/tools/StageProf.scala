package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-stage wall/CPU/shuffle attribution for one query run — the
  * missing level between TimeQ's single number and a full Spark UI
  * (disabled in this container). Registers a listener, runs the query
  * once warm (sf0.001) and once timed (full scale), and prints every
  * stage of the timed run sorted by executor run time, with the
  * callsite so stages map back to operators.
  *
  * Usage: runMain graft.tools.StageProf <queryName> [queryName ...]
  */
object StageProf {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  final case class Row(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long,
      shRead: Long, shWrite: Long, wallMs: Long)

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = {
      val p = java.nio.file.Paths.get(sf).toAbsolutePath.getParent
      if (p != null) p.resolve("sf0.001").toString else ""
    }
    for (q <- args) {
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
      // A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overlays configs so a
      // candidate setting can be measured without a code edit per trial
      sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      })
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val fn = graft.SparkEntry.queries(q)
      if (new java.io.File(warmDir, "lineitem.parquet").exists()) {
        try { exec(fn(spark, warmDir)); exec(fn(spark, warmDir)) }
        catch { case _: Throwable => () }
      }
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      val listener = new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          rows.synchronized {
            rows += Row(si.stageId, si.name, si.numTasks,
              m.executorRunTime, m.executorCpuTime / 1000000,
              m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten, wall)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      exec(fn(spark, sf))
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $q: ${total}%.2f s, ${rows.size} stages =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"wall_s"}%7s ${"run_s"}%7s " +
        f"${"cpu_s"}%7s ${"gc_s"}%5s ${"shR_MB"}%7s ${"shW_MB"}%7s  name")
      rows.sortBy(-_.wallMs).take(40).foreach { r =>
        println(f"${r.id}%6d ${r.tasks}%5d ${r.wallMs / 1e3}%7.2f " +
          f"${r.runMs / 1e3}%7.2f ${r.cpuMs / 1e3}%7.2f ${r.gcMs / 1e3}%5.1f " +
          f"${r.shRead / 1e6}%7.1f ${r.shWrite / 1e6}%7.1f  ${r.name.take(90)}")
      }
      val sumWall = rows.map(_.wallMs).sum / 1e3
      println(f"[stageprof] $q total=${total}%.2f s, sum stage wall=${sumWall}%.2f s, " +
        f"njobs~=${rows.map(_.id).size}")
      spark.stop()
      System.gc()
    }
  }
}

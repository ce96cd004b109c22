package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudicator for the r13 driver-artifact anomaly (VERDICT "What's
  * wrong" #1): `graph_pagerank_weighted` / `graph_pagerank_served` /
  * `graph_walk_pairs_served` read 9-19x their committed numbers in the
  * driver window while 178 other rows read a uniform ~1.2-1.7x and both
  * synthetic canaries said "flat". The shared trait of the trio is that
  * each consumes a STORED table written earlier in the same run — and
  * the two served rows re-scan their bucketed parquet EVERY iteration
  * (`checkpointEdges = false` is what preserves the bucketing), so any
  * I/O-channel degradation is amplified by the iteration count, while
  * the cpu/shuffle canaries never touch the channel.
  *
  * This probe makes the hypothesis testable in one command: build the
  * stored tables once at the bench's scale, then time the trio plus a
  * localCheckpointed CONTROL (`graph_pagerank` — same iterative shape,
  * edge frame pinned in memory after ONE read) in fresh sessions,
  * alongside the scan canary. `--iohammer` repeats the block under a
  * deliberate disk-write hammer (N threads rewriting + fsyncing 256 MB
  * files — saturates writeback, the only I/O pressure a page-cached
  * container allows). Reading the A/B: if the served rows inflate
  * multiplicatively MORE than the control while `canary_scan` moves with
  * them, the r13 driver readings were environmental I/O degradation that
  * the r14 scan canary + per-row plausibility screen now detect; if the
  * trio stays flat under the hammer, the I/O hypothesis is dead and the
  * next suspect is an environment-sensitive plan flip (capture with
  * SPARK_GRAFT_BENCH_EXPLAIN=1).
  *
  * Usage: runMain graft.tools.StoredGraphProbe [--iohammer] [sfDir]
  */
object StoredGraphProbe {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def minOf2(body: => Unit): Double = {
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    ts.min
  }

  /** N writer threads rewriting + fsyncing 256 MB files until stopped —
    * deliberate writeback saturation.
    */
  private def startHammer(threads: Int): (java.util.concurrent.atomic.AtomicBoolean, java.util.concurrent.ExecutorService, String) = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val dir = java.nio.file.Files.createTempDirectory("graft-iohammer").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val chunk = new Array[Byte](8 * 1024 * 1024)
    (0 until threads).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = while (!stop.get()) {
          val f = new java.io.File(dir, s"hog-$i")
          val out = new java.io.FileOutputStream(f)
          try {
            var n = 0
            while (n < 32 && !stop.get()) { out.write(chunk); n += 1 }
            out.getFD.sync()
          } catch { case _: Throwable => () } finally out.close()
        }
      })
    }
    (stop, pool, dir)
  }

  def main(args: Array[String]): Unit = {
    val hammer = args.contains("--iohammer")
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = java.nio.file.Files.createTempDirectory("graft-storedprobe").toString

    // ---- build the stored tables ONCE (the bench family/served setup)
    val sB = graft.Bench.newSession(cpus)
    val fr = graft.SparkEntry.copurchaseFrames(sB, sfDir)
    fr.edges.write.mode("overwrite").parquet(s"$base/edges")
    fr.weighted.write.mode("overwrite").parquet(s"$base/weighted")
    val copurchase = fr.edges.localCheckpoint()
    graft.sinks.Lake.writeBucketed(copurchase, "storedprobe_edges",
      s"$base/bsrc", Seq("src"), numBuckets = 32)
    copurchase.unpersist(blocking = true)
    sB.stop()
    System.gc()

    def block(tag: String): Unit = {
      // scan canary first: the I/O channel reading for this condition
      val sC = graft.Bench.newSession(cpus)
      val scan = HostCanary.measure(sC).toMap.getOrElse("canary_scan", -1.0)
      sC.stop(); System.gc()
      val rows = Seq[(String, SparkSession => DataFrame)](
        // control: same iterative shape, edge frame localCheckpointed
        // after ONE parquet read — immune to per-round scan degradation
        "graph_pagerank_ctrl" -> (s =>
          graft.functions.Graph.pageRank(
            s.read.parquet(s"$base/edges"), "src", "dst", iterations = 5)),
        // the r13 trio, the served way
        "graph_pagerank_weighted" -> (s =>
          graft.functions.Graph.pageRankWeighted(
            s.read.parquet(s"$base/weighted"), "src", "dst", "w", iterations = 5)),
        "graph_pagerank_served" -> { s =>
          graft.sinks.Lake.registerBucketed(s, "storedprobe_edges",
            s"$base/bsrc", "src BIGINT, dst BIGINT", Seq("src"), 32)
          graft.functions.Graph.pageRank(s.table("storedprobe_edges"),
            "src", "dst", iterations = 5,
            broadcastRanks = false, checkpointEdges = false)
        },
        "graph_walk_pairs_served" -> { s =>
          graft.sinks.Lake.registerBucketed(s, "storedprobe_edges",
            s"$base/bsrc", "src BIGINT, dst BIGINT", Seq("src"), 32)
          val e = s.table("storedprobe_edges")
          val seeds = e.select(col("src").as("node")).distinct()
            .filter(pmod(col("node"), lit(40)) === 0)
          graft.functions.Graph.skipGramPairs(
            graft.functions.Graph.deterministicWalks(e,
              "src", "dst", seeds, steps = 4, checkpointEdges = false),
            window = 2)
        })
      val timed = rows.map { case (name, fn) =>
        val s = graft.Bench.newSession(cpus)
        try exec(fn(s)) catch { case _: Throwable => () } // warm
        val t = minOf2(exec(fn(s)))
        s.stop(); System.gc()
        f"$name=$t%.2f"
      }
      println(s"[storedprobe] $tag canary_scan=${f"$scan%.2f"} ${timed.mkString(" ")}")
    }

    block("idle")
    if (hammer) {
      val (stop, pool, dir) = startHammer(4)
      try block("iohammer") finally {
        stop.set(true); pool.shutdownNow()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}

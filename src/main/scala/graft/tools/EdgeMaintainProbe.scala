package graft.tools

import org.apache.spark.sql.functions._

/** Prices the maintained co-purchase edge table (r13 verdict directive 5)
  * against the full rebuild it replaces, in BOTH regimes:
  *
  *  - `--flat` (sf0.1 as-is, 1% order delta, P=64): the regime where
  *    maintenance LOSES — the whole table rebuilds in ~2 s, the delta's
  *    thousands of distinct pairs hash into every partition, and the
  *    state harness's fixed costs (delta checkpoint, partitioned
  *    rewrite, markers) exceed the rebuild. This is the scaladoc's
  *    operating rule made measurable: size P for the delta cadence, and
  *    don't maintain a table cheaper to rebuild.
  *
  *  - default (corpus replicated `R`x with shifted order keys — baskets
  *    stay order-local so the graph semantics are unchanged — and a
  *    SMALL batch of ~1/1000 orders, P=512): the serving regime the
  *    operator exists for. The rebuild pays the corpus-sized basket
  *    self-join every snapshot; the batch pays its own tiny join plus a
  *    partition-pruned merge of only the slices its pairs land in.
  *
  * `--loop` additionally composes the analytics leg: the complete
  * refresh cycle (fold the order batch + warm re-rank from the previous
  * fixed point, [[graft.functions.Graph.pageRankUntil]]) against the
  * complete rebuild cycle (rebuild from lineitem + cold re-rank).
  *
  * Usage: runMain graft.tools.EdgeMaintainProbe [--flat|--loop] [sfDir] [replicate]
  */
object EdgeMaintainProbe {
  def main(args: Array[String]): Unit = {
    val flat = args.contains("--flat")
    val rest = args.filterNot(_.startsWith("--"))
    val sfDir = rest.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val replicate = rest.drop(1).headOption.map(_.toInt).getOrElse(if (flat) 1 else 8)
    // batch size = orders/sampleMod. The partition-pruning property needs
    // the BATCH's distinct pair keys well under P (the scaladoc operating
    // rule): co-purchase baskets emit ~8 pairs/order, so a micro-batch of
    // tens of orders prunes hard while a 1%-of-corpus batch saturates any
    // practical P and devolves to a full rewrite (the --flat receipt).
    val sampleMod = rest.drop(2).headOption.map(_.toInt)
      .getOrElse(if (flat) 100 else 20000)
    val partitions = if (flat) 64 else 512
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.newSession(cpus)
    val li0 = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey")
    // R disjoint replicas, order keys shifted so every basket stays
    // order-local — same degree structure, R x the join volume
    val li = (0 until replicate).map { r =>
      li0.select((col("l_orderkey") + lit(r.toLong * 1000000000L)).as("l_orderkey"),
        col("l_partkey"))
    }.reduce(_ unionAll _).localCheckpoint()
    val isDelta = pmod(col("l_orderkey"), lit(sampleMod)) === 0
    val base = li.filter(!isDelta)
    val delta = li.filter(isDelta)
    val nOrders = delta.select(col("l_orderkey")).distinct().count()
    val stateDir = java.nio.file.Files.createTempDirectory("graft-edgeprobe").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-edgeprobe-full").toString
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val loop = args.contains("--loop")
    val tSeed = timed {
      graft.functions.Graph.maintainCopurchaseWeights(spark, stateDir, base,
        partitions, batchId = 0L)
    }
    // --loop: the serving state a refresh cycle already holds — the
    // previous snapshot's converged ranks (not timed, it was paid by the
    // PREVIOUS cycle)
    val ranks0 = if (!loop) None else Some(
      graft.functions.Graph.pageRankUntil(
        graft.functions.Graph.readCopurchaseWeights(spark, stateDir).get,
        "src", "dst", tolMicro = 10000L, weightCol = Some("w")).ranks
        .localCheckpoint())
    // the small-batch refresh — the repeating cost of the maintained table
    val tDelta = timed {
      graft.functions.Graph.maintainCopurchaseWeights(spark, stateDir, delta,
        partitions, batchId = 1L)
    }
    // the full rebuild it replaces (same physical work: aggregate + write)
    val tFull = timed {
      graft.functions.Graph.copurchaseHalfWeights(li)
        .write.mode("overwrite").parquet(s"$outDir/weighted")
    }
    // equality receipt: maintained == rebuild, bit-for-bit
    val got = graft.functions.Graph.readCopurchaseWeights(spark, stateDir).get
    val want = graft.functions.Graph.copurchaseEdgesWeighted(li)
    val equal = got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty
    println(f"[edgemaintain] sf=$sfDir replicate=$replicate p=$partitions " +
      f"batch_orders=$nOrders seed=$tSeed%.2f s batch_refresh=$tDelta%.2f s " +
      f"full_rebuild=$tFull%.2f s ratio=${tFull / tDelta}%.1fx equal=$equal")
    // --loop: the COMPLETE refresh cycle vs the complete rebuild cycle —
    // (fold order batch into the maintained table + warm re-rank from
    // the previous fixed point) against (rebuild the edge table from
    // lineitem + cold re-rank from uniform). The table halves above
    // already measured; this composes the analytics leg onto them.
    if (loop) {
      def mat(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val table = graft.functions.Graph.readCopurchaseWeights(spark, stateDir).get
        .localCheckpoint()
      // single-shot, warm FIRST: residual JIT warm-up biases AGAINST
      // the refresh-cycle claim
      var kWarm = 0
      val tWarm = timed {
        val run = graft.functions.Graph.pageRankUntil(table, "src", "dst",
          tolMicro = 10000L, init = ranks0, weightCol = Some("w"))
        assert(run.converged, "warm re-rank hit maxRounds")
        kWarm = run.rounds; mat(run.ranks)
      }
      var kCold = 0
      val tCold = timed {
        val run = graft.functions.Graph.pageRankUntil(table, "src", "dst",
          tolMicro = 10000L, weightCol = Some("w"))
        assert(run.converged, "cold re-rank hit maxRounds")
        kCold = run.rounds; mat(run.ranks)
      }
      println(f"[edgemaintain-loop] refresh_cycle=${tDelta + tWarm}%.2f s " +
        f"(merge=$tDelta%.2f + warm_rank=$tWarm%.2f, $kWarm rounds) vs " +
        f"rebuild_cycle=${tFull + tCold}%.2f s " +
        f"(rebuild=$tFull%.2f + cold_rank=$tCold%.2f, $kCold rounds) = " +
        f"${(tFull + tCold) / (tDelta + tWarm)}%.1fx")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    spark.stop()
  }
}

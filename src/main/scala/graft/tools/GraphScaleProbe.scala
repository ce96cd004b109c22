package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Graph
import graft.sinks.Lake

/** Dev probe: the 100x pagerank checkpoint — the NON-broadcast rank path
  * over a PRE-BUCKETED edge table (the documented cluster answer for
  * node sets beyond executor memory, `Graph.pageRank` doc) measured
  * against the default broadcast path at the same size, with the
  * zero-exchange edge-side join confirmed in the physical plan.
  *
  * Graph: `nodes` nodes, 40 out-edges each (hash-derived dsts, every
  * node is a source so the graph is dangling-free). The bucketed run
  * reads edges from a `Lake.writeBucketed` catalog table (bucketed +
  * sorted by src, 32 buckets) with checkpointEdges = false so the
  * bucketing survives; per round only the node-sized rank frame
  * shuffles. Equality of the two paths' fixed-point iterates is
  * asserted before timing.
  *
  * `hits` mode (r12): the same A/B for HITS, whose two half-steps join
  * the edge list on BOTH keys — the cluster layout is the edge set
  * stored TWICE (bucketed by src and by dst, `Graph.hits` edgesByDst
  * doc); the probe asserts the zero-edge-side-exchange plan on EACH
  * half-step and measures broadcastScores=false against the default
  * broadcast path at the same size.
  *
  * `bfs` mode (r12): the same A/B for multi-source BFS, whose hop-2
  * frontier on a small-diameter graph is already near-node-sized — the
  * case where a frontier broadcast stops fitting an executor.
  * `broadcastFrontier=false, checkpointEdges=false` over the
  * src-bucketed table shuffles only the frontier per hop.
  *
  * `walks` mode (r13): the same A/B for node2vec biased walks with a
  * DENSE seed set (one walk per even node — the training-corpus shape
  * where the walk set outgrows an executor broadcast):
  * `broadcastFrontier=false, checkpointEdges=false` rides the
  * src-bucketed table for both the per-step candidate join AND the
  * once-per-run adjacency build; per step only the walk-sized frontier
  * and the (frontier × degree) candidate frame shuffle.
  *
  * `kcore` mode (r14): the A/B for incremental k-core peeling, whose
  * loss step joins the half-edge list on BOTH keys against the
  * newly-dead set — round 1's dead set is NODE-SCALE when k peels
  * aggressively (the case where `broadcastDead` stops fitting), so the
  * cluster layout is the hits device: the half table stored twice
  * (bucketed by src and by dst, `kCoreHalf.halfByDst`), each loss join
  * riding its own bucketing.
  *
  * `lpa` mode (r14): the A/B for synchronous label propagation
  * (`communityLabels`), whose per-round join probes the symmetric edge
  * list with the node-sized label frame — `assumeSymmetric = true,
  * checkpointEdges = false` over a dst-bucketed PRE-symmetrized table
  * pays the symmetrize shuffle once at write time and moves only the
  * label frame per round.
  *
  * Usage: runMain graft.tools.GraphScaleProbe [hits|bfs|walks|kcore|lpa] [millionsOfNodes...]
  */
object GraphScaleProbe {
  private val modes =
    Set("hits", "bfs", "walks", "kcore", "lpa", "warm", "tri", "trimaint",
      "decr", "auto", "warmlpa")

  /** Shuffle-exchange count of a printed physical plan.
    * `ShuffleExchangeExec.nodeName` is `"Exchange"` (the tree prints
    * `Exchange hashpartitioning(...)`), NOT `"ShuffleExchange"` — the
    * literal these probes originally grepped, which matched nothing, so
    * every `nShuffles <= 1` assert before r14 was vacuous (caught in
    * review; the probes were re-run with this counter and the claims
    * re-certified — SCALING.md). The lookbehinds exclude
    * `BroadcastExchange` (whose node name embeds the word) and
    * `ReusedExchange` (a reuse of EITHER exchange kind — a reused
    * broadcast would otherwise count as a shuffle and spuriously fail
    * the `nShuffles <= 1` asserts; a reused shuffle exchange moves no
    * new rows either, so excluding it is the honest count).
    */
  private def shuffleExchanges(plan: String): Int =
    "(?<!Broadcast)(?<!Reused)Exchange ".r.findAllIn(plan).length
  def main(args: Array[String]): Unit = {
    val hitsMode = args.contains("hits")
    val bfsMode = args.contains("bfs")
    val walksMode = args.contains("walks")
    val sizeArgs = args.filterNot(modes)
    val sizes = if (sizeArgs.nonEmpty) sizeArgs.toSeq.map(_.toDouble) else Seq(1.0)
    if (hitsMode) { hitsProbe(sizes); return }
    if (bfsMode) { bfsProbe(sizes); return }
    if (walksMode) { walksProbe(sizes); return }
    if (args.contains("kcore")) { kcoreProbe(sizes); return }
    if (args.contains("lpa")) { lpaProbe(sizes); return }
    if (args.contains("warm")) { warmProbe(sizes); return }
    if (args.contains("tri")) { triProbe(sizes); return }
    if (args.contains("trimaint")) { triMaintProbe(sizes); return }
    if (args.contains("decr")) { decrProbe(sizes); return }
    if (args.contains("auto")) { autoProbe(sizes); return }
    if (args.contains("warmlpa")) { warmLpaProbe(sizes); return }
    val spark = GraftSession.local(32, "graph-scale-probe")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val edges = spark.range(nodes * 40).select(
        (col("id") / 40).cast("long").as("src"),
        pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-pr-edges-$m"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      spark.sql(s"DROP TABLE IF EXISTS pr_edges_probe")
      Lake.writeBucketed(edges, "pr_edges_probe", path, Seq("src"), numBuckets = 32)
      val bucketed = spark.table("pr_edges_probe")

      // plan proof: the per-round join over the bucketed table must NOT
      // exchange the edge side — the only Exchange is the rank frame
      val rankFrame = bucketed.groupBy(col("src")).agg(count(lit(1)).as("outd"))
        .select(col("src"), lit(1000000L).as("r"), col("outd"))
        .localCheckpoint()
      val round = bucketed.join(rankFrame, "src")
        .select(col("dst"), expr("r div outd").as("c"))
      val plan = round.queryExecution.executedPlan.toString
      // count only SHUFFLE exchanges: a BroadcastExchange of the node-sized
      // rank frame would not exercise the edge-side-shuffle-free property
      val nShuffles = shuffleExchanges(plan)
      val bucketedScan = plan.contains("Bucketed: true")
      println(s"[graphscale] m=$m round-join shuffle-exchanges=$nShuffles " +
        s"(bucketed scan: $bucketedScan)")
      assert(nShuffles <= 1, s"edge side must not shuffle:\n$plan")
      assert(bucketedScan, s"edge scan must read bucketed:\n$plan")

      // equality of the two paths before timing (same integer fixed point)
      val viaBucket = Graph.pageRank(bucketed, "src", "dst", iterations = 5,
        broadcastRanks = false, checkpointEdges = false)
      val viaBroadcast = Graph.pageRank(edges, "src", "dst", iterations = 5)
      if (nodes <= 1000000L) {
        assert(viaBucket.exceptAll(viaBroadcast).count() == 0L &&
          viaBroadcast.exceptAll(viaBucket).count() == 0L,
          "bucketed/non-broadcast pagerank diverged from the broadcast path")
      }
      mat(viaBucket); mat(viaBroadcast) // warm both
      val tBucket = med(mat(Graph.pageRank(bucketed, "src", "dst", 5,
        broadcastRanks = false, checkpointEdges = false)))
      val tBcast = med(mat(Graph.pageRank(edges, "src", "dst", 5)))
      println(f"[graphscale] nodes=$nodes edges=${nodes * 40} " +
        f"bucketed_nobcast=$tBucket%.2f broadcast_ckpt=$tBcast%.2f")
      spark.sql(s"DROP TABLE IF EXISTS pr_edges_probe")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    }
    spark.stop()
  }

  private def hitsProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-hits")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val edges = spark.range(nodes * 40).select(
        (col("id") / 40).cast("long").as("src"),
        pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-hits-edges-$m"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      spark.sql("DROP TABLE IF EXISTS hits_edges_probe_src")
      spark.sql("DROP TABLE IF EXISTS hits_edges_probe_dst")
      Lake.writeBucketed(edges, "hits_edges_probe_src", s"$base/src",
        Seq("src"), numBuckets = 32)
      Lake.writeBucketed(edges, "hits_edges_probe_dst", s"$base/dst",
        Seq("dst"), numBuckets = 32)
      val eSrc = spark.table("hits_edges_probe_src")
      val eDst = spark.table("hits_edges_probe_dst")

      // plan proof, BOTH half-steps: each bucketed edge scan must join
      // its key without an edge-side ShuffleExchange — the only shuffle
      // is the node-sized score frame landing on the edge bucketing
      val score = eSrc.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("s")).localCheckpoint()
      val authStep = eSrc
        .join(score.select(col("node").as("src"), col("s").as("h")), "src")
        .select(col("dst"), col("h"))
      val hubStep = eDst
        .join(score.select(col("node").as("dst"), col("s").as("a")), "dst")
        .select(col("src"), col("a"))
      for ((name, step) <- Seq("auth(src)" -> authStep, "hub(dst)" -> hubStep)) {
        val plan = step.queryExecution.executedPlan.toString
        val nShuffles = shuffleExchanges(plan)
        val bucketedScan = plan.contains("Bucketed: true")
        println(s"[graphscale-hits] m=$m half-step $name " +
          s"shuffle-exchanges=$nShuffles (bucketed scan: $bucketedScan)")
        assert(nShuffles <= 1, s"$name edge side must not shuffle:\n$plan")
        assert(bucketedScan, s"$name edge scan must read bucketed:\n$plan")
      }

      // fixed-point equality of the two paths before timing
      val viaBucket = Graph.hits(eSrc, "src", "dst", iterations = 3,
        broadcastScores = false, checkpointEdges = false, edgesByDst = Some(eDst))
      val viaBroadcast = Graph.hits(edges, "src", "dst", iterations = 3)
      if (nodes <= 1000000L) {
        assert(viaBucket.exceptAll(viaBroadcast).count() == 0L &&
          viaBroadcast.exceptAll(viaBucket).count() == 0L,
          "bucketed/non-broadcast hits diverged from the broadcast path")
      }
      mat(viaBucket); mat(viaBroadcast) // warm both
      val tBucket = med(mat(Graph.hits(eSrc, "src", "dst", 3,
        broadcastScores = false, checkpointEdges = false, edgesByDst = Some(eDst))))
      val tBcast = med(mat(Graph.hits(edges, "src", "dst", 3)))
      println(f"[graphscale-hits] nodes=$nodes edges=${nodes * 40} " +
        f"bucketed_nobcast=$tBucket%.2f broadcast_ckpt=$tBcast%.2f")
      spark.sql("DROP TABLE IF EXISTS hits_edges_probe_src")
      spark.sql("DROP TABLE IF EXISTS hits_edges_probe_dst")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
    spark.stop()
  }

  private def walksProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-walks")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val edges = spark.range(nodes * 40).select(
        (col("id") / 40).cast("long").as("src"),
        pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-walk-edges-$m"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      spark.sql("DROP TABLE IF EXISTS walk_edges_probe")
      Lake.writeBucketed(edges, "walk_edges_probe", path, Seq("src"), numBuckets = 32)
      val bucketed = spark.table("walk_edges_probe")

      // plan proof: the per-step candidate join over the bucketed table
      // exchanges ONLY the frontier — never the edge side. Payload
      // columns keep the probe frontier from auto-broadcasting (the
      // property under test is the non-broadcast case).
      val frontier = bucketed.select(col("src").as("wid"),
          col("src").as("prev"), col("src").as("cur"))
        .distinct().localCheckpoint()
      val cand = bucketed.join(frontier, bucketed("src") === frontier("cur"))
        .select(col("wid"), col("prev"), col("dst"))
      val plan = cand.queryExecution.executedPlan.toString
      val nShuffles = shuffleExchanges(plan)
      val bucketedScan = plan.contains("Bucketed: true")
      println(s"[graphscale-walks] m=$m cand-join shuffle-exchanges=$nShuffles " +
        s"(bucketed scan: $bucketedScan)")
      assert(nShuffles <= 1, s"edge side must not shuffle:\n$plan")
      assert(bucketedScan, s"edge scan must read bucketed:\n$plan")

      // dense seed set: one walk per EVEN node — the walk-corpus shape
      // where the frontier outgrows an executor broadcast
      def seedsOf(e: DataFrame) = e.select(col("src").as("node")).distinct()
        .filter(pmod(col("node"), lit(2)) === 0)
      def run(e: DataFrame, bcast: Boolean, ckpt: Boolean) =
        Graph.node2vecWalks(e, "src", "dst", seedsOf(e), steps = 4,
          retPermille = 100, inPermille = 1000, outPermille = 2500,
          broadcastFrontier = bcast, checkpointEdges = ckpt)
      // bit-equality of the two paths before timing
      val viaBucket = run(bucketed, bcast = false, ckpt = false)
      val viaBroadcast = run(edges, bcast = true, ckpt = true)
      if (nodes <= 1000000L) {
        assert(viaBucket.exceptAll(viaBroadcast).count() == 0L &&
          viaBroadcast.exceptAll(viaBucket).count() == 0L,
          "bucketed/non-broadcast node2vec walks diverged from the broadcast path")
      }
      mat(viaBucket); mat(viaBroadcast) // warm both
      val tBucket = med(mat(run(bucketed, bcast = false, ckpt = false)))
      val tBcast = med(mat(run(edges, bcast = true, ckpt = true)))
      println(f"[graphscale-walks] nodes=$nodes edges=${nodes * 40} " +
        f"walks=${nodes / 2} bucketed_nobcast=$tBucket%.2f broadcast_ckpt=$tBcast%.2f")
      spark.sql("DROP TABLE IF EXISTS walk_edges_probe")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    }
    spark.stop()
  }

  private def kcoreProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-kcore")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      // half form (src < dst, deduped): mean degree ~76 after the
      // least/greatest fold, so k = 72 kills a node-scale slab in round 1
      // — the dense-dead shape where broadcastDead stops fitting
      val half = spark.range(nodes * 40).select(
          (col("id") / 40).cast("long").as("a"),
          pmod(xxhash64(col("id")), lit(nodes)).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("src"),
          greatest(col("a"), col("b")).as("dst"))
        .distinct()
      val k = 72
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-kcore-edges-$m"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      spark.sql("DROP TABLE IF EXISTS kcore_half_probe_src")
      spark.sql("DROP TABLE IF EXISTS kcore_half_probe_dst")
      Lake.writeBucketed(half, "kcore_half_probe_src", s"$base/src",
        Seq("src"), numBuckets = 32)
      Lake.writeBucketed(half, "kcore_half_probe_dst", s"$base/dst",
        Seq("dst"), numBuckets = 32)
      val eSrc = spark.table("kcore_half_probe_src")
      val eDst = spark.table("kcore_half_probe_dst")

      // plan proof, BOTH loss-join halves: with a node-scale dead frame
      // (payload column blocks auto-broadcast) each bucketed edge scan
      // joins its own key with no edge-side ShuffleExchange
      val dead = eSrc.select(col("src").as("node")).distinct()
        .select(col("node"), (col("node") * 2).as("pay")).localCheckpoint()
      val dstHalf = eDst.join(dead, eDst("dst") === dead("node"))
        .select(eDst("src").as("n"))
      val srcHalf = eSrc.join(dead, eSrc("src") === dead("node"))
        .select(eSrc("dst").as("n"))
      for ((name, step) <- Seq("loss(dst)" -> dstHalf, "loss(src)" -> srcHalf)) {
        val plan = step.queryExecution.executedPlan.toString
        val nShuffles = shuffleExchanges(plan)
        val bucketedScan = plan.contains("Bucketed: true")
        println(s"[graphscale-kcore] m=$m $name " +
          s"shuffle-exchanges=$nShuffles (bucketed scan: $bucketedScan)")
        assert(nShuffles <= 1, s"$name edge side must not shuffle:\n$plan")
        assert(bucketedScan, s"$name edge scan must read bucketed:\n$plan")
      }

      // bit-equality of the two paths before timing
      val viaBucket = Graph.kCoreHalf(eSrc, k, rounds = 5,
        broadcastDead = false, checkpointEdges = false, halfByDst = Some(eDst))
      val viaBroadcast = Graph.kCoreHalf(half, k, rounds = 5)
      if (nodes <= 1000000L) {
        assert(viaBucket.exceptAll(viaBroadcast).count() == 0L &&
          viaBroadcast.exceptAll(viaBucket).count() == 0L,
          "bucketed/non-broadcast kCoreHalf diverged from the broadcast path")
      }
      mat(viaBucket); mat(viaBroadcast) // warm both
      val tBucket = med(mat(Graph.kCoreHalf(eSrc, k, 5,
        broadcastDead = false, checkpointEdges = false, halfByDst = Some(eDst))))
      val tBcast = med(mat(Graph.kCoreHalf(half, k, 5)))
      println(f"[graphscale-kcore] nodes=$nodes halfedges≈${nodes * 38} k=$k " +
        f"bucketed_nobcast=$tBucket%.2f broadcast_ckpt=$tBcast%.2f")
      spark.sql("DROP TABLE IF EXISTS kcore_half_probe_src")
      spark.sql("DROP TABLE IF EXISTS kcore_half_probe_dst")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
    spark.stop()
  }

  private def lpaProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-lpa")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val edges = spark.range(nodes * 20).select(
        (col("id") / 20).cast("long").as("a"),
        pmod(xxhash64(col("id")), lit(nodes)).as("b"))
        .filter(col("a") =!= col("b"))
      // pre-symmetrized + deduped ONCE at write time (the shuffle the
      // bucketed path amortizes), stored bucketed by dst — the per-round
      // label join's edge key
      val sym = edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-lpa-edges-$m"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      spark.sql("DROP TABLE IF EXISTS lpa_sym_probe")
      Lake.writeBucketed(sym, "lpa_sym_probe", path, Seq("dst"), numBuckets = 32)
      val bucketed = spark.table("lpa_sym_probe")

      // plan proof: the per-round vote join exchanges ONLY the node-sized
      // label frame — the dst-bucketed edge scan never re-shuffles
      val labels = bucketed.select(col("dst").as("node")).distinct()
        .withColumn("label", col("node")).localCheckpoint()
      val vote = bucketed
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .select(col("src"), col("label"))
      val plan = vote.queryExecution.executedPlan.toString
      val nShuffles = shuffleExchanges(plan)
      val bucketedScan = plan.contains("Bucketed: true")
      println(s"[graphscale-lpa] m=$m vote-join shuffle-exchanges=$nShuffles " +
        s"(bucketed scan: $bucketedScan)")
      assert(nShuffles <= 1, s"edge side must not shuffle:\n$plan")
      assert(bucketedScan, s"edge scan must read bucketed:\n$plan")

      // bit-equality before timing: the pre-symmetrized bucketed path and
      // the in-memory symmetrize-inside path run the same fixed rounds
      val viaBucket = Graph.communityLabels(bucketed, "src", "dst", rounds = 3,
        assumeSymmetric = true, checkpointEdges = false)
      val viaDefault = Graph.communityLabels(edges, "a", "b", rounds = 3)
      if (nodes <= 1000000L) {
        assert(viaBucket.exceptAll(viaDefault).count() == 0L &&
          viaDefault.exceptAll(viaBucket).count() == 0L,
          "bucketed LPA diverged from the default symmetrize-inside path")
      }
      mat(viaBucket); mat(viaDefault) // warm both
      val tBucket = med(mat(Graph.communityLabels(bucketed, "src", "dst", 3,
        assumeSymmetric = true, checkpointEdges = false)))
      val tDefault = med(mat(Graph.communityLabels(edges, "a", "b", 3)))
      println(f"[graphscale-lpa] nodes=$nodes symedges≈${nodes * 38} " +
        f"bucketed_presym=$tBucket%.2f default_ckpt=$tDefault%.2f")
      spark.sql("DROP TABLE IF EXISTS lpa_sym_probe")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    }
    spark.stop()
  }

  /** `warm` mode (r14): prices [[Graph.pageRankUntil]]'s warm start at
    * scale — the serving loop over a MAINTAINED edge table
    * ([[Graph.maintainCopurchaseWeights]]): after a 0.1%-of-edges delta,
    * re-rank from the previous snapshot's fixed point vs from uniform.
    * The win is ROUNDS (each round = one edge join + one agg + the
    * residual materialization), so it compounds with whichever per-round
    * layout (broadcast or bucketed) the graph runs.
    */
  private def warmProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-warm")
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val tol = 10000L // 1% of the 10^6 initial mass
      def graph(flip: Boolean) = spark.range(nodes * 40).select(
        (col("id") / 40).cast("long").as("src"),
        when(lit(flip) && pmod(col("id"), lit(1000)) === 0,
          pmod(xxhash64(col("id") + 7), lit(nodes)))
          .otherwise(pmod(xxhash64(col("id")), lit(nodes))).as("dst"))
        .localCheckpoint()
      val g0 = graph(flip = false)
      val g1 = graph(flip = true) // 0.1% of edges re-routed
      def timed[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // previous snapshot's fixed point (not timed — it is the state the
      // serving loop already holds); its run also warms JIT/codegen for
      // both timed runs below
      val prev = Graph.pageRankUntil(g0, "src", "dst", tol,
        checkpointEdges = false)
      val snap = prev.ranks.localCheckpoint()
      // single-shot timings, the CLAIMED-faster path FIRST: any residual
      // JIT warm-up then biases AGAINST the published speedup
      val (warm, tWarm) = timed(
        Graph.pageRankUntil(g1, "src", "dst", tol, init = Some(snap),
          checkpointEdges = false))
      val (cold, tCold) = timed(
        Graph.pageRankUntil(g1, "src", "dst", tol, checkpointEdges = false))
      assert(prev.converged && warm.converged && cold.converged,
        "a probe run hit maxRounds without converging")
      println(f"[graphscale-warm] nodes=$nodes edges=${nodes * 40} tol=$tol " +
        f"prev_rounds=${prev.rounds} cold_rounds=${cold.rounds} cold=$tCold%.1f s " +
        f"warm_rounds=${warm.rounds} warm=$tWarm%.1f s " +
        f"speedup=${tCold / tWarm}%.1fx")

      // HITS warm serving (r15 verdict #3): same delta'd-graph protocol,
      // same claimed-faster-path-first timing-honesty rule
      val prevH = Graph.hitsUntil(g0, "src", "dst", tol,
        checkpointEdges = false)
      val snapH = prevH.scores.localCheckpoint()
      val (warmH, tWarmH) = timed(
        Graph.hitsUntil(g1, "src", "dst", tol, init = Some(snapH),
          checkpointEdges = false))
      val (coldH, tColdH) = timed(
        Graph.hitsUntil(g1, "src", "dst", tol, checkpointEdges = false))
      assert(prevH.converged && warmH.converged && coldH.converged,
        "a hits probe run hit maxRounds without converging")
      println(f"[graphscale-warm-hits] nodes=$nodes edges=${nodes * 40} " +
        f"tol=$tol prev_rounds=${prevH.rounds} cold_rounds=${coldH.rounds} " +
        f"cold=$tColdH%.1f s warm_rounds=${warmH.rounds} warm=$tWarmH%.1f s " +
        f"speedup=${tColdH / tWarmH}%.1fx")

      // LPA cone refresh (r15 verdict #4), priced at BOTH diameter
      // regimes — the honest crossover: on a HIGH-diameter graph (local
      // ring lattice) the 2k-ball stays delta-local and the cone
      // refresh wins; on the small-diameter hub graph above the 2k-ball
      // saturates to the corpus and the cold fixed-round recompute is
      // the better tier (the EdgeMaintainProbe honesty pattern).
      // Deltas are genuine INSERTS (the operator's contract): the base
      // graph plus a separately-generated shortcut batch.
      val kLpa = 3
      def mat(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val ring0 = spark.range(nodes * 4).select(
          (col("id") / 4).cast("long").as("src"),
          pmod((col("id") / 4).cast("long") + pmod(col("id"), lit(4)) + 1,
            lit(nodes))
            .as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint()
      val ringDelta = spark.range(nodes / 1000).select(
          pmod(xxhash64(col("id") + 13), lit(nodes)).as("src"),
          pmod(xxhash64(col("id") + 13) + 101, lit(nodes)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .exceptAll(ring0) // keep only genuinely-new edges
        .localCheckpoint()
      val nRingDelta = ringDelta.count()
      val ring1 = ring0.unionAll(ringDelta).localCheckpoint()
      val oldRing = Graph.communityLabels(ring0, "src", "dst", kLpa)
        .localCheckpoint() // the maintained assignment (not timed)
      // claimed-faster cone path FIRST (timing-honesty rule)
      val tCone = timed(mat(Graph.communityLabelsDelta(
        ring1, "src", "dst", kLpa, oldRing, ringDelta)))._2
      val tColdRing = timed(mat(
        Graph.communityLabels(ring1, "src", "dst", kLpa)))._2
      println(f"[graphscale-lpa-delta] ring nodes=$nodes " +
        f"delta_edges=$nRingDelta k=$kLpa cone=$tCone%.1f s " +
        f"cold=$tColdRing%.1f s speedup=${tColdRing / tCone}%.1fx " +
        f"(high-diameter regime: 2k-ball is delta-local)")
      // the saturating regime on the hub graph: priced, not hidden
      val hubDelta = spark.range(nodes / 1000).select(
          pmod(xxhash64(col("id") + 29), lit(nodes)).as("src"),
          pmod(xxhash64(col("id") + 31), lit(nodes)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .exceptAll(g0.select(col("src"), col("dst")))
        .localCheckpoint()
      val hub1 = g0.select(col("src"), col("dst")).unionAll(hubDelta)
        .localCheckpoint()
      val oldHub = Graph.communityLabels(g0, "src", "dst", kLpa)
        .localCheckpoint()
      val tConeHub = timed(mat(Graph.communityLabelsDelta(
        hub1, "src", "dst", kLpa, oldHub, hubDelta)))._2
      val tColdHub = timed(mat(
        Graph.communityLabels(hub1, "src", "dst", kLpa)))._2
      println(f"[graphscale-lpa-delta] hub nodes=$nodes " +
        f"delta_edges=${hubDelta.count()} k=$kLpa cone=$tConeHub%.1f s " +
        f"cold=$tColdHub%.1f s ratio=${tColdHub / tConeHub}%.2fx " +
        f"(small-diameter regime: the 2k-ball saturates — cold recompute " +
        f"is the operating tier here)")
    }
    spark.stop()
  }

  /** `auto` mode (r16): prices the DISPATCH PROBES the refresh routers
    * run before choosing a tier — the cost a caller pays for not having
    * to read SCALING.md. kcore's probe is one degree aggregate (claimed
    * ~free relative to even a shallow cold peel); LPA's is a 2-hop BFS
    * ball from the delta endpoints, delta-sized on the ring lattice and
    * bounded by ~two frontier passes even where it saturates (the hub
    * graph, where its answer is "go cold").
    */
  private def autoProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-auto")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val k = 40
      val half = spark.range(nodes * 20).select(
          (col("id") / 20).cast("long").as("src"),
          pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
        .filter(col("src") < col("dst"))
        .distinct().localCheckpoint()
      // kcore dispatch probe: the degree + cascade-fuel aggregate alone
      val tProbe = timed {
        half.select(explode(array(col("src"), col("dst"))).as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
          .agg(count(lit(1)), sum(when(col("d") >= k && col("d") < k + 2,
            lit(1L)).otherwise(lit(0L)))).head()
        ()
      }
      val tColdPeel = timed {
        Graph.kCoreHalf(half, k, rounds = 64).write
          .format("noop").mode("overwrite").save()
      }
      println(f"[graphscale-auto] kcore nodes=$nodes k=$k " +
        f"dispatch_probe=$tProbe%.1f s cold_peel=$tColdPeel%.1f s " +
        f"(probe/peel=${tProbe / tColdPeel}%.2f)")
      // LPA dispatch probe: the 2-hop ball expansion alone, on the
      // delta-local ring and on the saturating hub graph
      val ring = spark.range(nodes * 4).select(
          (col("id") / 4).cast("long").as("src"),
          pmod((col("id") / 4).cast("long") + pmod(col("id"), lit(4)) + 1,
            lit(nodes))
            .as("dst"))
        .filter(col("src") =!= col("dst"))
        .unionAll(spark.range(nodes * 4).select(
          pmod((col("id") / 4).cast("long") + pmod(col("id"), lit(4)) + 1,
            lit(nodes))
            .as("src"), (col("id") / 4).cast("long").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint()
      val hub = spark.range(nodes * 40).select(
          (col("id") / 40).cast("long").as("src"),
          pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
        .unionAll(spark.range(nodes * 40).select(
          pmod(xxhash64(col("id")), lit(nodes)).as("src"),
          (col("id") / 40).cast("long").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint()
      val delta = spark.range(nodes / 1000).select(
        pmod(xxhash64(col("id") + 13), lit(nodes)).as("src"),
        pmod(xxhash64(col("id") + 13) + 101, lit(nodes)).as("dst"))
        .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
      def ballProbe(sym: DataFrame): Long = {
        // the router's actual implementation, timed as-is
        val hops0 = delta.select(explode(array(col("src"), col("dst")))
          .as("node")).distinct()
          .select(col("node"), lit(0).as("hop")).localCheckpoint()
        val ball = Graph.ballBfs(sym, hops0, fromHop = 0, maxH = 2)
        val n = ball.count()
        if (!(ball eq hops0)) graft.functions.Checkpoints.unpersist(ball)
        graft.functions.Checkpoints.unpersist(hops0)
        n
      }
      var ringBall = 0L; var hubBall = 0L
      val tRingProbe = timed { ringBall = ballProbe(ring) }
      val tHubProbe = timed { hubBall = ballProbe(hub) }
      val tColdLpa = timed {
        Graph.communityLabels(hub, "src", "dst", 3,
          assumeSymmetric = true, checkpointEdges = false).write
          .format("noop").mode("overwrite").save()
      }
      println(f"[graphscale-auto] lpa nodes=$nodes " +
        f"ring_ball=$ringBall (${100.0 * ringBall / nodes}%.1f%% of nodes, " +
        f"probe=$tRingProbe%.1f s) hub_ball=$hubBall " +
        f"(${100.0 * hubBall / nodes}%.1f%%, probe=$tHubProbe%.1f s) " +
        f"vs one cold fixed-round run $tColdLpa%.1f s")
    }
    spark.stop()
  }

  /** `warmlpa` mode (r16, verdict #6): prices [[Graph.communityLabelsUntil]]
    * warm starts at scale on the ring lattice — the regime where sync-LPA
    * fixpoints genuinely exist — with the claimed-faster warm path timed
    * FIRST, plus the honest-flag control on the hub graph (oscillating:
    * the run must cap at maxRounds with converged=false, never lie).
    */
  private def warmLpaProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-warmlpa")
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      // sync-LPA fixpoints need locally-dense neighborhoods (a bare
      // lattice keeps drifting — measured, 30-round cap with conv=false
      // at every size): the convergent high-diameter shape is a CLIQUE
      // ARCHIPELAGO — 20-cliques in a ring, ~9.5 half-edges per node,
      // diameter = clique count / 2
      val cSize = 20L
      val nCliques = nodes / cSize
      val intra = spark.range(nodes * (cSize - 1)).select(
          (col("id") / (cSize - 1)).cast("long").as("src"),
          ((col("id") / (cSize - 1)).cast("long") +
            pmod(col("id"), lit(cSize - 1)) + 1).as("dst"))
        .filter((col("src") / cSize).cast("long") ===
          (col("dst") / cSize).cast("long")) // integer clique id, not double div
      val bridges = spark.range(nCliques).select(
        (col("id") * cSize).as("src"),
        (pmod(col("id") + 1, lit(nCliques)) * cSize).as("dst"))
      val arch0 = intra.unionAll(bridges).localCheckpoint()
      val delta = spark.range(nodes / 1000).select(
          (pmod(xxhash64(col("id") + 13), lit(nCliques)) * cSize + 3).as("src"),
          (pmod(xxhash64(col("id") + 29), lit(nCliques)) * cSize + 7).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .exceptAll(arch0)
        .localCheckpoint()
      val arch1 = arch0.unionAll(delta).localCheckpoint()
      val maxR = 30
      // the maintained fixpoint (not timed; also JIT warm-up)
      val prev = Graph.communityLabelsUntil(arch0, "src", "dst", maxR)
      val snap = prev.labels.localCheckpoint()
      // claimed-faster warm path FIRST (timing-honesty rule)
      val (warm, tWarm) = timed(Graph.communityLabelsUntil(
        arch1, "src", "dst", maxR, init = Some(snap)))
      val (cold, tCold) = timed(Graph.communityLabelsUntil(
        arch1, "src", "dst", maxR))
      println(f"[graphscale-warmlpa] archipelago nodes=$nodes " +
        f"cliques=$nCliques delta=${delta.count()} " +
        f"prev(rounds=${prev.rounds}, conv=${prev.converged}) " +
        f"warm=$tWarm%.1f s (rounds=${warm.rounds}, conv=${warm.converged}) " +
        f"cold=$tCold%.1f s (rounds=${cold.rounds}, conv=${cold.converged}) " +
        f"speedup=${tCold / tWarm}%.1fx")
      // honest-flag control: the hub graph oscillates under sync LPA —
      // the run must report converged=false at the cap, and the serving
      // answer there is the fixed-round form
      val hub = spark.range(nodes * 4).select(
          (col("id") / 4).cast("long").as("src"),
          pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
        .localCheckpoint()
      val capped = Graph.communityLabelsUntil(hub, "src", "dst", 8)
      println(s"[graphscale-warmlpa] hub control: rounds=${capped.rounds} " +
        s"converged=${capped.converged} (expected false — oscillating " +
        "regime; fixed-round form is the serving tier there)")
    }
    spark.stop()
  }

  /** `tri` mode (r14): prices [[Graph.triangleCountDelta]] — the exact
    * delta-sized triangle refresh — against the full recompute it
    * replaces, on the kcore probe's half-edge graph with a 0.1% edge
    * delta. Equality vs the recompute is spec-pinned (GraphOpsSpec) and
    * re-checked here below 1M nodes (three recomputes are the check's
    * own cost at full size).
    */
  private def triProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-tri")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val half = spark.range(nodes * 40).select(
          (col("id") / 40).cast("long").as("a"),
          pmod(xxhash64(col("id")), lit(nodes)).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("src"),
          greatest(col("a"), col("b")).as("dst"))
        .distinct().localCheckpoint()
      val isDelta = pmod(col("src") * 31 + col("dst"), lit(1000)) === 0
      val delta = half.filter(isDelta).localCheckpoint()
      val nDelta = delta.count()
      // single-shot timings, the CLAIMED-faster delta path FIRST: any
      // residual JIT warm-up then biases AGAINST the published ratio
      val tDelta = timed(mat(Graph.triangleCountDelta(half, delta)))
      val tFull = timed(mat(Graph.triangleCountsAdj(half)))
      if (nodes < 1000000L) {
        val base = half.filter(!isDelta)
        val got = Graph.applyTriangleDelta(
          Graph.triangleCountsAdj(base),
          Graph.triangleCountDelta(half, delta), 1L)
        val want = Graph.triangleCountsAdj(half)
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          "delta maintenance diverged from the recompute")
      }
      println(f"[graphscale-tri] nodes=$nodes halfedges≈${nodes * 38} " +
        f"delta_edges=$nDelta full_recompute=$tFull%.1f s " +
        f"delta_refresh=$tDelta%.1f s ratio=${tFull / tDelta}%.1fx")
    }
    spark.stop()
  }

  /** `trimaint` mode (r15): prices the maintained triangle-count STATE
    * FOLD — the partitioned count-table layout
    * ([[Incremental.mergeCountsPartitioned]], rewrites only the count
    * partitions the batch's affected nodes hash into) against the r13
    * snapshot layout it replaced (read the full node-sized counts,
    * full_outer fold, `coalesce(1)` rewrite of every row through one
    * task) — for a micro-batch-sized delta over maintained states of
    * SWEEPABLE size. Counts are synthetic: the fold cost is a function
    * of state size and delta size only (the triangle-delta MATH is
    * common to both layouts and priced by the `tri` mode), and
    * synthetic state lets the sweep reach node counts the in-probe
    * triangle build never could.
    *
    * The comparison is honest in both directions: the partitioned fold
    * pays a roughly FLAT cost (partition discovery + a handful of
    * slice rewrites — grows with P, not with state), the snapshot fold
    * pays node-scale read+join+write that is CHEAP at small state
    * (a 1M-node snapshot is ~8 MB; the single-task rewrite beats the
    * partitioned layout's fixed overheads) and grows linearly — the
    * probe prints both so SCALING.md can state the measured crossover
    * instead of a presumption. Fold equality is asserted at the
    * smallest size.
    */
  private def triMaintProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-trimaint")
    import graft.functions.Incremental
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val P = 1024
    for (m <- sizes) {
      val n = (m * 1000000L).toLong
      // synthetic maintained counts: n nodes, hash-valued tri_cnt
      val counts0 = spark.range(n).select(col("id").as("node"),
          (pmod(xxhash64(col("id")), lit(50)) + 1).as("tri_cnt"))
        .localCheckpoint()
      // state setup, not timed: the serving loop already holds both
      // layouts' base state
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft-trimaint-part").toString
      Incremental.mergeCountsPartitioned(spark, stateDir, counts0,
        Seq("node"), "tri_cnt", P, batchId = 0L)
      val snapDir = java.nio.file.Files
        .createTempDirectory("graft-trimaint-snap").toString
      counts0.coalesce(1).write.mode("overwrite").parquet(s"$snapDir/v=0")
      // two delta regimes per state size: the MICRO-BATCH the layout is
      // for (the r15 gate run's real triangle delta touched 9 nodes) and
      // a key count near P that SATURATES the partitioning — the
      // operating-rule boundary (touched/P ~ 45%: the "delta-sized
      // rewrite" property needs P comfortably above the delta's keys,
      // the mergeCountsPartitioned scaladoc rule), priced, not hidden
      for ((dk, bid) <- Seq((16L, 1L), (500L, 3L))) {
        val d = spark.range(dk).select(
            pmod(xxhash64(col("id") + 3), lit(n)).as("node"),
            lit(2L).as("tri_delta"))
          .unionAll(spark.range(dk / 4 + 1).select((col("id") + n).as("node"),
            lit(1L).as("tri_delta")))
          .groupBy(col("node")).agg(sum(col("tri_delta")).as("tri_delta"))
          .localCheckpoint()
        val nAffected = d.count()
        val nParts = d.select(pmod(xxhash64(col("node")), lit(P)).as("p"))
          .distinct().count()
        // single-shot fold timings, the CLAIMED-faster partitioned fold
        // FIRST: residual JIT warm-up biases AGAINST the published ratio
        val tPart = timed {
          Incremental.mergeCountsPartitioned(spark, stateDir,
            d.select(col("node"), col("tri_delta").as("tri_cnt")),
            Seq("node"), "tri_cnt", P, batchId = bid)
        }
        val tSnap = timed {
          Graph.applyTriangleDelta(
            spark.read.parquet(s"$snapDir/v=0"), d, 1L)
            .coalesce(1).write.mode("overwrite").parquet(s"$snapDir/v=$bid")
        }
        // the folds must land on identical counts (checked at the
        // smallest sweep size on the first delta — layout-independent)
        if (n <= 1000000L && bid == 1L) {
          val p = Incremental.readCountsPartitioned(
            spark, stateDir, Seq("node"), "tri_cnt").get
          val s = spark.read.parquet(s"$snapDir/v=$bid")
            .select(col("node"), col("tri_cnt"))
          assert(p.exceptAll(s).isEmpty && s.exceptAll(p).isEmpty,
            "partitioned fold diverged from the snapshot fold")
        }
        val snapBytes = org.apache.commons.io.FileUtils
          .sizeOfDirectory(new java.io.File(s"$snapDir/v=$bid"))
        println(f"[graphscale-trimaint] state_rows=$n " +
          f"delta_rows=$nAffected touched_parts=$nParts/$P " +
          f"snapshot_bytes=$snapBytes part_fold=$tPart%.1f s " +
          f"snap_fold=$tSnap%.1f s fold_ratio=${tSnap / tPart}%.2fx")
      }
      Seq(stateDir, snapDir).foreach(pth =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pth)))
    }
    spark.stop()
  }

  /** `decr` mode (r15 verdict #8): prices the DECREMENTAL recompute tier
    * for the two graph-IVM operators whose delete path is a documented
    * cold re-run ([[Graph.bfsHopsDelta]], [[Graph.kCoreDelta]] — both
    * insert-only by theorem; deletions grow distances / shrink cores
    * non-locally). A maintained view under a mixed batch stream pays
    * `blended(f) = f * cold + (1 - f) * delta` per batch, where f is the
    * delete-batch fraction — the probe measures `cold` and `delta` on
    * the standard 1M-node shapes and derives the operating-cadence rule
    * SCALING.md states: the delete fraction at which the insert-path
    * savings HALVE (blended = cold/2), i.e. how many insert batches one
    * delete batch must amortize over before the delta machinery stops
    * paying. Claimed-faster delta paths are timed FIRST (the r14
    * timing-honesty rule).
    */
  private def decrProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-decr")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def rule(name: String, tDelta: Double, tCold: Double): String =
      if (tDelta >= tCold / 2)
        f"$name: delta path ($tDelta%.1f s) is already within 2x of cold " +
          f"($tCold%.1f s) — delete cadence is moot at this size"
      else {
        val fHalf = (tCold / 2 - tDelta) / (tCold - tDelta)
        f"$name: savings halve at delete fraction f=$fHalf%.2f " +
          f"(1 delete per ${1 / fHalf}%.1f batches)"
      }
    val seeds = Seq(1L, 2L, 3L, 4L, 5L)
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      // BFS shape: the bfs probe's directed graph, 0.1% hash-split delta
      val edges = spark.range(nodes * 40).select(
          (col("id") / 40).cast("long").as("src"),
          pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint()
      val isDeltaB = pmod(col("src") * 31 + col("dst"), lit(1000)) === 0
      val deltaB = edges.filter(isDeltaB).localCheckpoint()
      val hops0 = Graph.bfsHops(edges.filter(!isDeltaB), "src", "dst",
        seeds, maxHops = 3).localCheckpoint() // the maintained view
      val tInsB = timed(mat(Graph.bfsHopsDelta(edges, "src", "dst",
        hops0, deltaB, maxHops = 3)))
      val tColdB = timed(mat(Graph.bfsHops(edges, "src", "dst",
        seeds, maxHops = 3)))
      println(f"[graphscale-decr] bfs nodes=$nodes delta_edges=${deltaB.count()} " +
        f"insert_delta=$tInsB%.1f s cold=$tColdB%.1f s " +
        f"speedup=${tColdB / tInsB}%.1fx; ${rule("bfs", tInsB, tColdB)}")
      // k-core shape: half form, k chosen so the converged core holds
      // most nodes (the dense-engagement-core serving regime kCoreDelta
      // is FOR — its cost is the non-core side)
      val half = edges
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .distinct().localCheckpoint()
      val k = 40
      val isDeltaK = pmod(col("src") * 31 + col("dst"), lit(1000)) === 0
      val core0 = Graph.kCoreHalf(half.filter(!isDeltaK), k, rounds = 30)
        .localCheckpoint() // the maintained converged core
      val tInsK = timed(mat(Graph.kCoreDelta(half, core0, k)))
      val tColdK = timed(mat(Graph.kCoreHalf(half, k, rounds = 30)))
      println(f"[graphscale-decr] kcore nodes=$nodes k=$k " +
        f"insert_delta=$tInsK%.1f s cold=$tColdK%.1f s " +
        f"speedup=${tColdK / tInsK}%.1fx; ${rule("kcore", tInsK, tColdK)}")
    }
    spark.stop()
  }

  private def bfsProbe(sizes: Seq[Double]): Unit = {
    val spark = GraftSession.local(32, "graph-scale-probe-bfs")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val seeds = Seq(1L, 2L, 3L, 4L, 5L)
    for (m <- sizes) {
      val nodes = (m * 1000000L).toLong
      val edges = spark.range(nodes * 40).select(
        (col("id") / 40).cast("long").as("src"),
        pmod(xxhash64(col("id")), lit(nodes)).as("dst"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-bfs-edges-$m"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      spark.sql("DROP TABLE IF EXISTS bfs_edges_probe")
      Lake.writeBucketed(edges, "bfs_edges_probe", path, Seq("src"), numBuckets = 32)
      val bucketed = spark.table("bfs_edges_probe")

      // plan proof: the per-hop frontier join over the bucketed table
      // exchanges ONLY the frontier (node-sized) — never the edge side.
      // The probe frontier is the FULL node set with payload columns so
      // it cannot auto-broadcast: the property under test is precisely
      // the non-broadcast case (a small frontier broadcasts and the
      // question never arises).
      val frontier = bucketed.select(col("src").as("node")).distinct()
        .select(col("node"), (col("node") * 2).as("p1"), (col("node") * 3).as("p2"))
        .localCheckpoint()
      val hop = bucketed.join(frontier, bucketed("src") === frontier("node"))
        .select(col("dst"))
      val plan = hop.queryExecution.executedPlan.toString
      val nShuffles = shuffleExchanges(plan)
      val bucketedScan = plan.contains("Bucketed: true")
      println(s"[graphscale-bfs] m=$m hop-join shuffle-exchanges=$nShuffles " +
        s"(bucketed scan: $bucketedScan)")
      assert(nShuffles <= 1, s"edge side must not shuffle:\n$plan")
      assert(bucketedScan, s"edge scan must read bucketed:\n$plan")

      val viaBucket = Graph.bfsHops(bucketed, "src", "dst", seeds, maxHops = 3,
        broadcastFrontier = false, checkpointEdges = false)
      val viaBroadcast = Graph.bfsHops(edges, "src", "dst", seeds, maxHops = 3)
      if (nodes <= 1000000L) {
        assert(viaBucket.exceptAll(viaBroadcast).count() == 0L &&
          viaBroadcast.exceptAll(viaBucket).count() == 0L,
          "bucketed/non-broadcast bfs diverged from the broadcast path")
      }
      mat(viaBucket); mat(viaBroadcast)
      val tBucket = med(mat(Graph.bfsHops(bucketed, "src", "dst", seeds, 3,
        broadcastFrontier = false, checkpointEdges = false)))
      val tBcast = med(mat(Graph.bfsHops(edges, "src", "dst", seeds, 3)))
      println(f"[graphscale-bfs] nodes=$nodes edges=${nodes * 40} " +
        f"bucketed_nobcast=$tBucket%.2f broadcast_ckpt=$tBcast%.2f")
      spark.sql("DROP TABLE IF EXISTS bfs_edges_probe")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    }
    spark.stop()
  }
}

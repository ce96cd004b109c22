package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames — the pregel-shaped family
  * beyond [[Curation.connectedComponents]]'s pointer jumping.
  *
  * All arithmetic is integer fixed-point (micro-units, floor division)
  * so results are bit-identical across engines — an unrolled SQL twin
  * reproduces every iteration exactly, which is what lets PageRank sit
  * behind the hash-compare gate rather than a tolerance check.
  */
object Graph {

  /** PageRank over an edge list, `iterations` synchronous rounds.
    *
    * Semantics (fixed-point, per node v with at least one in-edge):
    * {{{
    *   r_0(v)   = 1_000_000                       // 1.0 in micro-units
    *   r_k+1(v) = (1000 - dampMilli) * 1000
    *            + (dampMilli * Σ_{u→v} (r_k(u) div outdeg(u))) div 1000
    * }}}
    * Floor division at both steps makes every iterate a pure function of
    * longs — no float drift, no engine-specific rounding. Callers that
    * want the textbook probabilities divide by 1e6 * N at the end.
    *
    * Scale shape per iteration: one join of the (large) edge list with
    * the (node-sized) rank frame on `src` — AQE broadcasts the rank side
    * whenever nodes << edges, so the edge list is NEVER re-shuffled — and
    * one partial-aggregating groupBy(dst). The plan grows linearly with
    * rounds (each round's agg is consumed exactly once), so lineage is
    * cut only every `checkpointEvery` rounds (eager `localCheckpoint`;
    * swap for reliable `checkpoint` on a real cluster) — an every-round
    * cut would serialize a full materialization job per round for
    * nothing. Dangling-mass
    * bookkeeping is deliberately out of scope: feed a symmetrized edge
    * list (every node with an in-edge has out-edges) as
    * [[copurchaseEdges]] does.
    *
    * Input edges should be pre-deduplicated (multi-edges count multiple
    * times, the standard weighted reading).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampMilli: Int = 850,
      broadcastRanks: Boolean = true,
      checkpointEvery: Int = 8): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1 (got $iterations)")
    require(dampMilli >= 0 && dampMilli <= 1000,
      s"dampMilli must be in [0, 1000] (got $dampMilli)")
    // materialize the edge list ONCE — it is re-read every round, and an
    // un-checkpointed caller frame (e.g. a distinct() over a self-join)
    // would re-execute its whole lineage per iteration
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outd"))
      .localCheckpoint()
    val base = (1000L - dampMilli) * 1000L
    var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (i <- 1 to iterations) {
      // the rank side is node-sized; checkpointed frames carry no size
      // stats, so without the explicit hint the optimizer shuffles the
      // EDGE list every round (measured 3.3 s vs 0.9 s per round at 2.4M
      // edges). Disable only when nodes outgrow executor memory — then
      // pre-bucket the edge table by src instead.
      val ranks = deg.join(rank, deg("src") === rank("node"))
        .select(col("src"), col("outd"), col("r"))
      rank = e
        .join(if (broadcastRanks) broadcast(ranks) else ranks, "src")
        .select(col("dst").as("node"), expr("r div outd").as("c"))
        .groupBy(col("node"))
        .agg(expr(s"${base}L + ($dampMilli * sum(c)) div 1000").as("r"))
      // the plan grows LINEARLY with rounds (each round consumes the
      // previous agg exactly once), so cut lineage only periodically —
      // an every-round checkpoint serializes a full materialization job
      // per round for nothing
      if (i % checkpointEvery == 0 && i < iterations) rank = rank.localCheckpoint()
    }
    rank.select(col("node"), col("r").as("rank_micro"))
  }

  /** Symmetric co-purchase part graph: two parts are linked iff some
    * order contains both. Distinct directed pairs both ways, so the
    * graph PageRank sees is undirected and dangling-free. Edge count is
    * bounded by Σ_orders |items|² — order baskets are small and bounded
    * by business reality, never corpus-sized.
    */
  def copurchaseEdges(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.join(li.withColumnRenamed("pk", "pk2"), "ok")
      .filter(col("pk") =!= col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"))
      .distinct()
  }
}

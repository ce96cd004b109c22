package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CoreOps

/** Profiling (table profile, drift, snapshot diff), the N-step funnel,
  * and kNN label propagation — semantics pinned on small planted frames
  * where the expected answer is hand-checkable.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("tableProfile: nulls, distincts and per-kind min/max reprs") {
    val df = Seq(
      (1L, Some("a"), Some(1.005)),
      (2L, None, Some(-2.5)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(10.0))).toDF("id", "s", "v")
    val prof = Profiling.tableProfile(df, Seq(
      "id" -> "long", "s" -> "string", "v" -> "double_centi"))
      .orderBy("column").collect()
    assert(prof.map(_.getString(0)).toSeq == Seq("id", "s", "v"))
    val byCol = prof.map(r => r.getString(0) -> r).toMap
    assert(byCol("id") == Row("id", 4L, 0L, 4L, "1", "4"))
    assert(byCol("s") == Row("s", 4L, 1L, 2L, "a", "b"))
    // floor(-2.5 * 100) = -250; floor(10.0 * 100) = 1000
    assert(byCol("v") == Row("v", 4L, 1L, 3L, "-250", "1000"))
  }

  test("embeddingDrift: per-dim quantized means and delta") {
    val emb = Seq(
      (0L, Array(1.0f, -1.0f)), // ref
      (2L, Array(2.0f, -2.0f)), // ref
      (1L, Array(4.0f, 0.5f)), // cand
      (3L, Array(5.0f, 0.5f))) // cand
      .toDF("vec_id", "embedding")
    val out = Profiling.embeddingDrift(emb, "embedding", col("vec_id") % 2 === 0)
      .orderBy("dim").collect()
    // dim 0: ref mean (1e6 + 2e6)/2 = 1_500_000; cand (4e6+5e6)/2 = 4_500_000
    assert(out(0) == Row(0, 2L, 2L, 1500000L, 4500000L, 3000000L))
    // dim 1: ref sum = -3e6 -> div 2 truncates toward zero = -1_500_000
    assert(out(1) == Row(1, 2L, 2L, -1500000L, 500000L, 2000000L))
  }

  test("snapshotDiff: all four statuses and group attribution") {
    val a = Seq((1L, "x", "s1"), (2L, "keep", "s1"), (3L, "old", "s2"))
      .toDF("doc_id", "text", "source")
    val b = Seq((2L, "keep", "s1"), (3L, "new", "s2"), (4L, "add", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Profiling.snapshotDiff(a, b, "doc_id", "text", "source")
      .orderBy("source", "status").collect()
    assert(out.toSeq == Seq(
      Row("s1", "removed", 1L), Row("s1", "unchanged", 1L),
      Row("s2", "added", 1L), Row("s2", "changed", 1L)))
  }

  test("funnelSteps: greedy-earliest completion matches brute-force search") {
    // user 1 completes via the earliest view; user 2 has the steps out of
    // order (never completes step 3); user 3 ties on ts (event_id breaks)
    val ev = Seq(
      (1L, "view", 10L, 100L), (1L, "click", 20L, 101L),
      (1L, "purchase", 30L, 102L), (1L, "view", 5L, 99L),
      (2L, "click", 10L, 200L), (2L, "view", 20L, 201L),
      (2L, "purchase", 15L, 202L),
      (3L, "view", 10L, 300L), (3L, "click", 10L, 301L),
      (3L, "purchase", 10L, 302L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val out = CoreOps.funnelSteps(ev, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out(0) == Row(1L, 5L, 20L, 30L, 3L))
    // user 2: view at 20, no later click/purchase
    assert(out(1) == Row(2L, 20L, null, null, 1L))
    // user 3: same ts everywhere, event_id order 300 < 301 < 302 completes
    assert(out(2) == Row(3L, 10L, 10L, 10L, 3L))
  }

  test("funnelSteps: greedy earliest is maximal (random corpus vs brute)") {
    // exhaustive check: on a random-ish deterministic corpus, the greedy
    // steps_reached equals the true maximum subsequence match
    val types = Vector("view", "click", "purchase", "error")
    val rows = for (u <- 0L until 20L; i <- 0 until 12) yield {
      val h = (u * 31 + i * 17) % 97
      (u, types((h % 4).toInt), (h * 7 % 50).toLong, u * 100 + i)
    }
    val ev = rows.toDF("user_id", "event_type", "ts_us", "event_id")
    val got = CoreOps.funnelSteps(ev, Seq("view", "click", "purchase"))
      .select("user_id", "steps_reached").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val steps = Seq("view", "click", "purchase")
    val brute = rows.groupBy(_._1).map { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._4))
      // longest prefix of `steps` matchable as a subsequence
      val reached = sorted.foldLeft(0) { (k, e) =>
        if (k < steps.length && e._2 == steps(k)) k + 1 else k
      }
      u -> reached.toLong
    }
    for ((u, r) <- brute if r > 0) assert(got(u) == r, s"user $u")
    for ((u, r) <- brute if r == 0) assert(!got.contains(u), s"user $u absent")
  }

  test("labelPropagation: freeze-once rounds, deterministic vote") {
    // kNN edges: node 10's neighbors are seeds {0 -> label 1, 5 -> label 2,
    // 15 (unlabeled)}; vote counts tie 1:1, closest rank breaks to label 2.
    // node 20 only neighbors node 10 -> labeled in round 2 with hops=2.
    val knn = Seq(
      (10L, 5L, 1L), (10L, 0L, 2L), (10L, 15L, 3L),
      (20L, 10L, 1L),
      (0L, 5L, 1L)) // seed's own edges never relabel it
      .toDF("qid", "vec_id", "rank")
    val seeds = Seq((0L, 1L), (5L, 2L)).toDF("node", "label")
    val out = Graph.labelPropagation(knn, seeds, rounds = 2)
      .orderBy("node").collect()
    assert(out.toSeq == Seq(
      Row(0L, 1L, 0L), Row(5L, 2L, 0L),
      Row(10L, 2L, 1L), // tie 1:1 broken by best_rank (5 at rank 1)
      Row(20L, 2L, 2L))) // reached through 10's round-1 label
  }
}

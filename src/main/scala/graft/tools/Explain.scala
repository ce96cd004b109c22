package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump formatted physical plans for selected queries (dev tool for
  * auditing pushdown / broadcast / whole-stage-codegen shape).
  * Usage: runMain graft.tools.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "explain")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "tpch_q1_pricing", "tpch_q3_top_orders", "tpch_q5_nation_revenue",
      "tpch_q2_min_cost_supp", "tpch_q11_important_supply",
      "tpch_q16_supplier_cnt", "tpch_q21_waiting_supp",
      "j1_windowed_join", "top_users_by_value", "a1_tumbling_count",
      "event_transitions", "lang_confusion", "dedup_cluster_sizes",
      "graph_triangles", "pack_dedup_aware", "a4_sessions_auto",
      "t1_rolling_auto", "graph_kcore", "link_prediction", "graph_hops",
      "pack_semantic",
      // round 12
      "graph_walk_pairs", "graph_walks_biased", "graph_pagerank_weighted",
      "datasheet_incremental", "dau_incremental", "join_view_incremental",
      "top_terms_incremental")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

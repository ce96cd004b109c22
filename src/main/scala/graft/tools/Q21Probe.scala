package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev probe: the shipped TPC-H Q21 aggregate rewrite vs the textbook
  * EXISTS/NOT-EXISTS formulation (two sorted self-joins of the fact
  * table), on a synthetic multi-supplier order corpus — equality is
  * asserted per size, then both forms are timed (median of 3).
  *
  * Usage: runMain graft.tools.Q21Probe [millionsOfLines...]
  */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong * 1000000L) else Seq(4000000L)
    val spark = GraftSession.local(32, "q21-probe")
    import spark.implicits._

    // ~5 lines/order, 10k suppliers, ~1/3 of orders final; ship offsets
    // are uniform in 0..179 days so ~49% of F-order lines are late
    // (offset > 90) — lateness and supplier assignment hash-derived so
    // the corpus is deterministic at any size
    def lineitem(n: Long): DataFrame = spark.range(n).select(
      (col("id") / 5).cast("long").as("l_orderkey"),
      pmod(xxhash64(col("id")), lit(10000L)).as("l_suppkey"),
      timestamp_micros(lit(1704067200000000L) +
        (col("id") / 5).cast("long") % 365L * 86400000000L +
        pmod(xxhash64(col("id") + 1), lit(180L)) * 86400000000L).as("l_shipdate"))
    def orders(n: Long): DataFrame = spark.range((n + 4) / 5).select(
      col("id").as("o_orderkey"),
      timestamp_micros(lit(1704067200000000L) +
        col("id") % 365L * 86400000000L).as("o_orderdate"),
      when(col("id") % 3 === 0, lit("F")).otherwise(lit("O")).as("o_orderstatus"))

    /** The shipped shape (SparkEntry.tpch_q21_waiting_supp): one late-line
      * aggregate per order + one distinct-supplier aggregate, filtered to
      * (multi-supplier, sole late supplier).
      */
    def rewrite(li: DataFrame, ord: DataFrame): DataFrame = {
      val late = li.join(ord.filter(col("o_orderstatus") === "F"),
          li("l_orderkey") === col("o_orderkey") &&
            li("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_orderkey").as("okey"))
        .agg(countDistinct(col("l_suppkey")).as("n_late_supp"),
          min(col("l_suppkey")).as("late_supp"),
          count(lit(1)).as("n_late_lines"))
        .filter(col("n_late_supp") === 1)
      li.join(late, li("l_orderkey") === late("okey"))
        .groupBy(col("okey"), col("late_supp"), col("n_late_lines"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
        .filter(col("n_supp") > 1)
        .groupBy(col("late_supp").as("suppkey"))
        .agg(sum(col("n_late_lines")).as("numwait"))
    }

    /** The textbook shape: EXISTS as a semi join of the late-line set
      * against the whole fact table (other-supplier condition), NOT
      * EXISTS as an anti self-join of the late-line set.
      */
    def textbook(li: DataFrame, ord: DataFrame): DataFrame = {
      val l1 = li.join(ord.filter(col("o_orderstatus") === "F"),
          li("l_orderkey") === col("o_orderkey") &&
            li("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
      val l2 = li.select(col("l_orderkey").as("okey2"), col("l_suppkey").as("skey2"))
      val l3 = l1.select(col("okey").as("okey3"), col("skey").as("skey3"))
      l1
        .join(l2, col("okey") === col("okey2") && col("skey") =!= col("skey2"),
          "left_semi")
        .join(l3, col("okey") === col("okey3") && col("skey") =!= col("skey3"),
          "left_anti")
        .groupBy(col("skey").as("suppkey"))
        .agg(count(lit(1)).as("numwait"))
    }

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }

    for (n <- sizes) {
      // no checkpoint: the corpus is a codegen'd range, cheaper to
      // recompute per run than to materialize 64M+ rows under the
      // harness heap (the 64M localCheckpoint fell over)
      val li = lineitem(n)
      val ord = orders(n)
      // equality first: the rewrite IS the textbook answer
      val a = rewrite(li, ord).as[(Long, Long)].collect().toMap
      val b = textbook(li, ord).as[(Long, Long)].collect().toMap
      require(a == b, s"n=$n: rewrite != textbook (${a.size} vs ${b.size} suppliers)")
      mat(rewrite(li, ord)); mat(textbook(li, ord)) // warm
      val tr = med(mat(rewrite(li, ord)))
      val tt = med(mat(textbook(li, ord)))
      println(f"[q21] n=$n suppliers=${a.size} rewrite=$tr%.2f textbook=$tt%.2f")
    }
    spark.stop()
  }
}

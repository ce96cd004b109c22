package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The sketch-based forms of the exact aggregates, checked for accuracy
  * against their oracled exact twins on the real corpus. At 100 TB the
  * exact forms stay correct but pay for it — exact distinct shuffles every
  * (day, user) pair, exact percentiles buffer whole groups — while the
  * sketches (HyperLogLog++, KLL-style quantiles) are fixed-size,
  * map-side-combinable state. The engine ships both; these specs pin the
  * accuracy contract that makes the swap safe.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact DAU within 5% on every day") {
    val ev = Tables.events(spark, d)
    val both = ev
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"))
      .select("exact", "approx").as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"HLL err $err (exact=$exact approx=$approx)")
    }
  }

  test("approx_percentile brackets the exact percentiles per event type") {
    val ev = Tables.events(spark, d)
      .withColumn("value_milli", CoreOps.scaledMilli(col("value")))
    val rows = ev.groupBy(col("event_type"))
      .agg(
        expr("percentile(value_milli, 0.5)").as("p50_exact"),
        expr("approx_percentile(value_milli, 0.5, 1000)").as("p50_approx"),
        expr("percentile(value_milli, 0.99)").as("p99_exact"),
        expr("approx_percentile(value_milli, 0.99, 1000)").as("p99_approx"),
        max(col("value_milli")).as("mx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mx = r.getAs[Long]("mx").toDouble
      assert(math.abs(r.getAs[Double]("p50_exact") - r.getAs[Long]("p50_approx")) / mx < 0.02,
        s"p50 drifted: $r")
      assert(math.abs(r.getAs[Double]("p99_exact") - r.getAs[Long]("p99_approx")) / mx < 0.02,
        s"p99 drifted: $r")
    }
  }

  test("shipped daily_active_users_approx tracks its exact twin within 5%") {
    val exact = graft.SparkEntry.queries("daily_active_users")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = graft.SparkEntry.queries("daily_active_users_approx")(spark, d)
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (day, dau, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val e = exact(day)
      val err = math.abs(dau - e).toDouble / e
      assert(err <= 0.05, s"day $day: HLL $dau vs exact $e (err $err)")
      assert(n > 0)
    }
    assert(approx.map(_.getLong(0)).toSet === exact.keySet, "same day set")
  }

  test("shipped top_terms_sketch matches the exact top_terms while under budget") {
    // corpus vocab (~64 synthetic words) is far below the 8192 tracked
    // items, where the frequent-items sketch is EXACT by contract
    val exact = graft.SparkEntry.queries("top_terms")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = graft.SparkEntry.queries("top_terms_sketch")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch === exact)
  }

  test("shipped weekly_active_users_sketch: day-sketch union tracks exact WAU") {
    val exact = Tables.events(spark, d)
      .groupBy(window(col("ts"), "7 days").as("w"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(col("w.start").cast("long"), col("wau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sk = graft.SparkEntry.queries("weekly_active_users_sketch")(spark, d)
      .collect()
    assert(sk.nonEmpty)
    sk.foreach { r =>
      val (week, wau, nDays) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val e = exact(week)
      val err = math.abs(wau - e).toDouble / e
      // two-level rollup (day sketches -> weekly union) must keep HLL
      // accuracy: union of same-lgK sketches loses nothing material
      assert(err <= 0.05, s"week $week: union-HLL $wau vs exact $e (err $err)")
      assert(nDays >= 1L && nDays <= 7L)
    }
    assert(sk.map(_.getLong(0)).toSet === exact.keySet, "same week set")
  }

  test("shipped value_deciles_approx: buckets near-uniform, totals conserved") {
    // the sketch-boundary buckets can't match ntile's exactly-equal
    // sizes; the contract is conservation + near-uniform occupancy
    val exact = graft.SparkEntry.queries("value_deciles")(spark, d).collect()
    val approx = graft.SparkEntry.queries("value_deciles_approx")(spark, d).collect()
    val exactTotals = exact.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val approxByType = approx.groupBy(_.getString(0))
    assert(approxByType.keySet === exactTotals.keySet)
    approxByType.foreach { case (t, rows) =>
      val total = rows.map(_.getAs[Long]("n")).sum
      assert(total === exactTotals(t), s"$t: rows not conserved")
      assert(rows.forall { r =>
        val dec = r.getAs[Long]("decile"); dec >= 1 && dec <= 10
      })
      val ideal = total / 10.0
      rows.foreach { r =>
        val err = math.abs(r.getAs[Long]("n") - ideal) / ideal
        assert(err <= 0.25,
          s"$t decile ${r.getAs[Long]("decile")}: n=${r.getAs[Long]("n")} vs ideal $ideal")
      }
    }
  }

  test("shipped percentiles_by_type_approx brackets its exact oracle twin") {
    // The accuracy gate for the SHIPPED sketch query (the driver only
    // rows-checks it — sketch internals have no DuckDB twin): every
    // percentile within 2% of the per-type value range of the exact form.
    val exact = graft.SparkEntry.queries("percentiles_by_type")(spark, d)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val approx = graft.SparkEntry.queries("percentiles_by_type_approx")(spark, d)
      .collect()
    val ranges = Tables.events(spark, d)
      .withColumn("value_milli", CoreOps.scaledMilli(col("value")))
      .groupBy(col("event_type"))
      .agg((max(col("value_milli")) - min(col("value_milli"))).as("range"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("range")).toMap
    assert(approx.nonEmpty)
    approx.foreach { a =>
      val t = a.getAs[String]("event_type")
      val e = exact(t)
      val range = ranges(t).toDouble
      assert(a.getAs[Long]("n") === e.getAs[Long]("n"), s"count mismatch for $t")
      Seq("p50", "p90", "p99").foreach { p =>
        val err = math.abs(e.getAs[Double](p) - a.getAs[Long](p)) / range
        assert(err < 0.02, f"$t.$p err $err%.4f exceeds 2%% of range")
      }
    }
  }
}

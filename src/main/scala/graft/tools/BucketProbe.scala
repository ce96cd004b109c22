package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev probe: read-side payoff of `Lake.writeBucketed` — the same
  * fact-to-fact equi-join timed against (a) plain parquet (pays the
  * hash shuffle of both sides per join) and (b) co-bucketed tables
  * (zero exchanges). Write costs are reported separately: bucketing
  * pays ONE shuffle at write time to delete it from every later read.
  *
  * Usage: runMain graft.tools.BucketProbe [millionsOfLines...]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong * 1000000L) else Seq(16000000L)
    val spark = GraftSession.local(32, "bucket-probe")
    // force the join itself: no broadcast shortcut for the fact sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    def timeOnce(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (n <- sizes) {
      val base = java.nio.file.Files.createTempDirectory("graft-bucket-probe").toString
      // ~5 lines/order fact + per-order dim-ish fact, same shape as Q21Probe
      val li = spark.range(n).select(
        (col("id") / 5).cast("long").as("l_orderkey"),
        pmod(xxhash64(col("id")), lit(10000L)).as("l_suppkey"),
        (pmod(xxhash64(col("id") + 1), lit(100000L)) / 100.0).as("l_price"))
      val ord = spark.range((n + 4) / 5).select(
        col("id").as("o_orderkey"),
        pmod(xxhash64(col("id") + 2), lit(5L)).as("o_status"))

      val tPlainW = timeOnce {
        li.write.mode("overwrite").parquet(s"$base/li_plain")
        ord.write.mode("overwrite").parquet(s"$base/ord_plain")
      }
      val tBucketW = timeOnce {
        graft.sinks.Lake.writeBucketed(li, "bp_li", s"$base/li_b", Seq("l_orderkey"), 32)
        graft.sinks.Lake.writeBucketed(ord, "bp_ord", s"$base/ord_b", Seq("o_orderkey"), 32)
      }

      def joined(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
        l.join(r, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_status"))
          .agg(count(lit(1)).as("n"), sum(floor(col("l_price") * 100).cast("long")).as("rev_c"))

      val plainJ = () => joined(
        spark.read.parquet(s"$base/li_plain"), spark.read.parquet(s"$base/ord_plain"))
      val bucketJ = () => joined(spark.table("bp_li"), spark.table("bp_ord"))

      // equality: same corpus, same answer through both layouts
      require(plainJ().orderBy("o_status").collect().toSeq ==
        bucketJ().orderBy("o_status").collect().toSeq, s"n=$n: layouts disagree")

      mat(plainJ()); mat(bucketJ()) // warm
      val tp = med(mat(plainJ()))
      val tb = med(mat(bucketJ()))
      val exB = bucketJ().queryExecution.executedPlan.toString
        .split('\n').count(_.contains("Exchange hashpartitioning"))
      println(f"[bucket] n=$n plain_join=$tp%.2f bucketed_join=$tb%.2f " +
        f"(write: plain=$tPlainW%.1f bucketed=$tBucketW%.1f; " +
        f"join-side exchanges in bucketed plan=${math.max(0, exB - 1)})")
      spark.sql("DROP TABLE IF EXISTS bp_li")
      spark.sql("DROP TABLE IF EXISTS bp_ord")
    }
    spark.stop()
  }
}

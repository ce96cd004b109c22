package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the native vector expressions: a length mismatch is
  * a malformed row and must surface as NULL (the zip_with/aggregate fold
  * these replace pads the shorter array with nulls, nulling the sum),
  * never as a silently truncated score.
  */
class VectorEdgeSpec extends SparkSpec {
  import VectorExpressions._

  private def pairDf(xs: Seq[Double], ys: Seq[Double]) = {
    val s = spark
    import s.implicits._
    Seq((xs, ys)).toDF("x", "y")
      .select(col("x").cast("array<double>").as("x"),
        col("y").cast("array<double>").as("y"))
  }

  test("char_trigrams: windows equal the substring form on corpus + edge cases") {
    val s = spark
    import s.implicits._
    val edge = Seq((9001L, ""), (9002L, "a"), (9003L, "ab"), (9004L, "abc"),
      (9005L, "héllo wörld"), (9006L, "日本語のテキスト"), (9007L, "a\tb\nc d"))
      .toDF("doc_id", "text")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").unionAll(edge)
    // the old positional-substring form, verbatim
    val old = docs
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .select(col("doc_id"), col("lt"),
        explode(when(length(col("lt")) >= 3,
          sequence(lit(1), length(col("lt")) - 2))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), expr("substring(lt, i, 3)").as("t"))
      .groupBy("doc_id", "t").count()
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    val neu = graft.functions.TextAnalysis.charTrigrams(docs, "text", "doc_id")
      .groupBy("doc_id", "t").count()
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(neu.nonEmpty)
    assert(neu === old)
  }

  test("zero-norm vectors never rank (cosine NaN must not floor to score 0)") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (99L, Seq(0.0f, 0.0f))) // dead row from a failed embed job
      .toDF("vec_id", "vec")
    val queries = Seq((100L, Seq(1.0f, 0.0f)), (101L, Seq(0.0f, 0.0f)))
      .toDF("qid", "qvec")
    val out = graft.functions.Similarity.bruteForceTopK(queries, corpus, k = 3)
      .select("qid", "vec_id", "score_q4")
      .as[(Long, Long, Long)].collect()
    // the true neighbours: +1 scores 10000, -1 scores -10000; the zero
    // vector must be ABSENT, not mid-pack with a NaN-floored score 0
    assert(out.filter(_._1 == 100L).map(_._2).sorted === Array(1L, 2L))
    // a zero-norm QUERY can't cosine-rank anything: no rows
    assert(!out.exists(_._1 == 101L))
    assert(!out.exists(_._2 == 99L))
  }

  test("sum_scaled_long_arrays: null arrays skip, short arrays zero-pad") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 2L, Some(Seq(10L, 20L, 30L))),
      (1L, 3L, None),                      // null array: contributes nothing
      (1L, 1L, Some(Seq(5L))),             // short: elements past 0 are zero
      (2L, 1L, Some(Seq(1L, 2L, 3L)))).toDF("g", "k", "arr")
      .select(col("g"), col("k"), col("arr").cast("array<bigint>").as("arr"))
    val out = df.groupBy(col("g"))
      .agg(graft.expressions.TopKExpressions
        .sumScaledLongArrays(col("k"), col("arr"), 3).as("s"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(out(0) === ((1L, Seq(2 * 10 + 5L, 2 * 20L, 2 * 30L))))
    assert(out(1) === ((2L, Seq(1L, 2L, 3L))))
  }

  test("dot_product_d: equal lengths score, mismatched lengths are NULL") {
    val ok = pairDf(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
      .select(dotProduct(col("x"), col("y"))).head()
    assert(ok.getDouble(0) == 32.0)
    val bad = pairDf(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))
      .select(dotProduct(col("x"), col("y"))).head()
    assert(bad.isNullAt(0))
  }

  test("squared_l2_q6: mismatched lengths are NULL, not a truncated distance") {
    val ok = pairDf(Seq(1.0, 3.0), Seq(2.0, 5.0))
      .select(squaredL2Q6(col("x"), col("y"))).head()
    assert(ok.getLong(0) == 5000000L)
    val bad = pairDf(Seq(1.0, 3.0), Seq(2.0))
      .select(squaredL2Q6(col("x"), col("y"))).head()
    assert(bad.isNullAt(0))
  }

  test("dot_product_l: mismatched lengths are NULL") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1L, 2L), Seq(3L, 4L)), (Seq(1L, 2L), Seq(3L)))
      .toDF("x", "y")
    val rows = df.select(dotProductL(col("x"), col("y"))).collect()
    assert(rows(0).getLong(0) == 11L)
    assert(rows(1).isNullAt(0))
  }

  test("top_k_smallest_pairs: rejects non-long structs at analysis time") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", 1L)).toDF("a", "b")
    val err = intercept[Exception] {
      df.agg(graft.expressions.TopKExpressions
        .topKSmallestPairs(struct(col("a"), col("b")), 3)).collect()
    }
    assert(err.getMessage.contains("top_k_smallest_pairs") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("top_k_smallest_pairs: null struct fields are skipped (nulls-last)") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(5L), 50L), (None, 0L), (Some(2L), 20L), (Some(9L), 90L))
      .toDF("a", "b")
    val out = df.agg(graft.expressions.TopKExpressions
      .topKSmallestPairs(struct(col("a"), col("b")), 2).as("tk"))
      .selectExpr("explode(tk) p").select("p.a", "p.b").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 20L), (5L, 50L)))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *   Scale shape: broadcast the (small) query set, score the corpus with a
  *   narrow per-row fold (no shuffle), then two-phase top-k (per-partition
  *   prune before the per-query global sort) so the shuffle carries
  *   O(queries x k x partitions) rows, not O(queries x corpus).
  * - [[ivfTopK]]: IVF-style ANN — corpus is clustered to deterministic
  *   centroids; queries probe only the closest `nprobe` cells. At 100 TB
  *   the cell assignment is the partition key, so a probe touches a
  *   bounded fraction of the corpus.
  *
  * All arithmetic is a sequential left-fold in doubles so external engines
  * can reproduce scores bit-for-bit (see the LlmQueries oracles).
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  /** Sequential-fold L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))

  private def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Cosine similarity (inputs cast to double element-wise). */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Cosine quantized to 1e-4 (BIGINT) for order-stable, engine-exact
    * comparisons.
    */
  def cosineQ4(a: Column, b: Column): Column =
    floor(cosine(a, b) * 10000).cast("long")

  /** Exact top-k neighbours for each query vector.
    *
    * @param queries  (qid, qvec) — small enough to broadcast
    * @param corpus   (vec_id, vec)
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col("qid") =!= col("vec_id"))
      .withColumn("score_q4", cosineQ4(col("qvec"), col("vec")))
    // two-phase top-k: prune inside each partition before the global rank
    val localW = Window
      .partitionBy(col("qid"), spark_partition_id())
      .orderBy(col("score_q4").desc, col("vec_id"))
    val globalW = Window.partitionBy(col("qid"))
      .orderBy(col("score_q4").desc, col("vec_id"))
    scored
      .withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= k)
      .withColumn("rank", row_number().over(globalW))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("score_q4"), col("rank"))
  }

  /** Deterministic IVF: centroids are the corpus vectors whose id is
    * divisible by `centroidEvery`; each corpus vector is assigned to its
    * max-cosine centroid (ties to the lower centroid id); each query
    * probes its `nprobe` closest cells and ranks exactly within them.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      centroidEvery: Int,
      nprobe: Int): DataFrame = {
    val centroids = corpus
      .filter(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("cid"), col("vec").as("cvec"))
    // cell assignment: shuffle-free scoring against broadcast centroids
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("a_score_q4").desc, col("cid"))
    val assigned = corpus
      .join(broadcast(centroids))
      .withColumn("a_score_q4", cosineQ4(col("cvec"), col("vec")))
      .withColumn("arank", row_number().over(assignW))
      .filter(col("arank") === 1)
      .select(col("vec_id"), col("vec"), col("cid"))
    // query probes
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("p_score_q4").desc, col("cid"))
    val probes = queries
      .join(broadcast(centroids))
      .withColumn("p_score_q4", cosineQ4(col("cvec"), col("qvec")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid"))
    val rankW = Window.partitionBy(col("qid"))
      .orderBy(col("score_q4").desc, col("vec_id"))
    probes
      .join(assigned, "cid")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("score_q4", cosineQ4(col("qvec"), col("vec")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("score_q4"), col("rank"))
  }

  /** All embedding pairs above a cosine threshold (near-duplicate
    * detection). Quadratic — at scale, gate behind LSH/IVF blocking; the
    * exact version is the oracle baseline.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      minScoreQ4: Long): DataFrame = {
    val a = corpus.select(col("vec_id").as("a"), col("vec").as("va"))
    val b = corpus.select(col("vec_id").as("b"), col("vec").as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("score_q4", cosineQ4(col("va"), col("vb")))
      .filter(col("score_q4") >= minScoreQ4)
      .select(col("a"), col("b"), col("score_q4"))
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Similarity
import graft.sources.Tables

/** Measures ANN recall@k of the IVF index against the exact brute-force
  * top-k, on the real embeddings corpus — the number SCALING.md reports
  * (the sign-LSH twin reports recall the same way). Evaluates both the
  * shipped modulo-sampled centroids and the deterministic k-means-refined
  * index ([[Similarity.kmeansCentroids]]).
  *
  * Usage: runMain graft.tools.RecallEval <sfDir> [k] [centroidEvery] [nprobe] [kmeansIters]
  */
object RecallEval {

  /** recall@k = |ivf hits ∩ brute hits| / |brute hits| over all queries. */
  def recallAtK(brute: DataFrame, ivf: DataFrame): Double = {
    val truth = brute.select(col("qid"), col("vec_id")).distinct()
    val hits = ivf.select(col("qid"), col("vec_id")).distinct()
    val inter = truth.join(hits, Seq("qid", "vec_id")).count()
    inter.toDouble / truth.count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val centroidEvery = args.lift(2).map(_.toInt).getOrElse(25)
    val nprobe = args.lift(3).map(_.toInt).getOrElse(3)
    val iters = args.lift(4).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(32, "recall-eval")

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id"), col("embedding").as("vec"))
    val n = corpus.count()

    val brute = Similarity.bruteForceTopK(queries, corpus, k).cache()
    val ivfMod = Similarity.ivfTopK(queries, corpus, k, centroidEvery, nprobe)
    val refined = Similarity.kmeansCentroids(corpus, centroidEvery, iters)
    val ivfKm = Similarity.ivfTopKWithCentroids(queries, corpus, refined, k, nprobe)

    val rMod = recallAtK(brute, ivfMod)
    val rKm = recallAtK(brute, ivfKm)
    val cells = math.max(1L, n / centroidEvery)
    println(f"[recall] corpus=$n%d k=$k%d centroids~$cells%d nprobe=$nprobe%d " +
      f"probe-fraction~${nprobe.toDouble / cells}%.3f")
    println(f"[recall] modulo-centroids recall@$k%d = $rMod%.3f")
    println(f"[recall] kmeans($iters%d)-centroids recall@$k%d = $rKm%.3f")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Ad-hoc micro-profiler for operator stages (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = Tables.documents(spark, d)
    docs.cache().count()

    time("tokens")(docs.select(explode(TextAnalysis.tokens(col("text")))).count())
    time("shingles_str")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    time("shingles_staged")(docs.withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(explode(Dedup.shinglesFromTokens(col("toks"), 3))).count())
    time("shingles_hashed")(Dedup.withHashedShingles(docs, "text", 3, "sh")
      .select(explode(col("sh"))).count())
    time("minhash_sig")(Dedup.withHashedShingles(docs, "text", 3, "sh")
      .select(Dedup.minhashSignature(col("sh"), 16)).count())

    val emb = Tables.embeddings(spark, d)
    emb.cache().count()
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id"), col("embedding").as("vec"))
    time("brute_topk")(Similarity.bruteForceTopK(q, corpus, 5).count())
    time("brute_topk_2nd")(Similarity.bruteForceTopK(q, corpus, 5).count())

    spark.stop()
  }
}

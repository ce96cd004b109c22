package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextAnalysis
import graft.sources.Tables

/** Scratch probe: is charTrigrams quadratic in doc length (UTF8String
  * substring walks to the char offset)?
  */
object TdProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "td-probe")
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1").select(col("doc_id"), col("text"))
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
      }
    }
    for (mult <- Seq(1, 2, 4, 8)) {
      val docs = d0.withColumn("__text",
        concat_ws(" ", (1 to mult).map(_ => col("text")): _*))
        .select(col("doc_id"), col("__text")).localCheckpoint()
      val tri = TextAnalysis.charTrigrams(docs, "__text", "doc_id")
      time(s"extract x$mult") { tri.agg(sum(length(col("t")))).head().getLong(0) / 3 }
    }
    spark.stop()
  }
}

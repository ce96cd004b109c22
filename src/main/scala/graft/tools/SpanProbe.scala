package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.functions.TextAnalysis.tokens

/** Stage-wise profile of removeDuplicateSpans on the ScaleSmoke docs
  * corpus — finds which piece of the pipeline pays at 10x scale.
  * Usage: runMain graft.tools.SpanProbe [docsParquetDir]
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "span-probe")
    val dir = args.headOption.getOrElse("/tmp/graft_scale/docs")
    val df = spark.read.parquet(dir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val n = 3
    val withHs = df.select(col("doc_id"), tokens(col("text")).as("toks"),
      graft.expressions.TextExpressions.positionalHashedShingles(col("text"), n).as("hs"))
    val ex = withHs
      .select(col("doc_id"), posexplode(col("hs")))
      .select(col("doc_id"), (col("pos") + 1).as("s"), col("col").as("h"))
    time("ex (positional hashes)")(ex.count())
    val freq = ex.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"), min(col("doc_id")).as("keeper"))
    time("freq (df+keeper)")(freq.count())
    val cutPos = ex.join(freq, "h")
      .where(col("df") > 1 && col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + lit(n - 1))).as("p"))
      .distinct()
    time("cutPos (join+explode+distinct)")(cutPos.count())
    val tokPos = withHs
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("t"))
    time("tokPos")(tokPos.count())
    val kept = tokPos.join(cutPos, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_n"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("t")))),
          e => e.getField("t"))).as("kept_text"))
    time("kept (anti+rebuild)")(kept.count())
    time("full operator")(
      Dedup.removeDuplicateSpans(df, "text", "doc_id", 3)
        .agg(sum(col("n_kept"))).collect())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Graph

/** Dev probe: stage-split of `graph_triangles` (r9's most expensive
  * query) — edge build vs wedge join — comparing the r9 plan (naive
  * symmetric copurchase build + symmetric orientation) against the r10
  * half-edge plan (pre-distinct (ok,pk), pk<pk2 halved dedup, branchless
  * orientation). Equality of (node, tri_cnt) is asserted per corpus
  * before timing. Corpora: sf0.1 lineitem, plus k disjoint shifted
  * copies for the scale-up point (part ids offset per copy so the graph
  * is genuinely k-times larger, not k-fold edge multiplicity).
  *
  * Usage: runMain graft.tools.TriangleProbe [copies...]   (default: 1 10)
  */
object TriangleProbe {
  // the r9 shapes, inlined verbatim as the baseline under test
  private def oldEdges(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.join(li.withColumnRenamed("pk", "pk2"), "ok")
      .filter(col("pk") =!= col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    val spark = GraftSession.local(32, "triangle-probe")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    for (k <- copies) {
      val li =
        if (k == 1) base
        else (0 until k).map { i =>
          base.select(
            (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
            (col("l_partkey") + lit(i.toLong * 100000000L)).as("l_partkey"))
        }.reduce(_ unionAll _)
      // correctness first: identical triangle counts old vs new vs adj
      val oldTri = Graph.triangleCounts(oldEdges(li), "src", "dst")
      val newTri = Graph.triangleCountsHalf(Graph.copurchaseHalfEdges(li))
      val adjTri = Graph.triangleCountsAdj(Graph.copurchaseHalfEdges(li))
      assert(oldTri.exceptAll(newTri).count() == 0L &&
        newTri.exceptAll(oldTri).count() == 0L,
        s"triangle outputs differ at copies=$k")
      assert(adjTri.exceptAll(newTri).count() == 0L &&
        newTri.exceptAll(adjTri).count() == 0L,
        s"adj-intersect triangle outputs differ at copies=$k")
      mat(oldTri); mat(newTri); mat(adjTri) // warm all paths
      val eOld = med(mat(oldEdges(li)))
      val eNew = med(mat(Graph.copurchaseHalfEdges(li)))
      val tOld = med(mat(Graph.triangleCounts(oldEdges(li), "src", "dst")))
      val tNew = med(mat(Graph.triangleCountsHalf(Graph.copurchaseHalfEdges(li))))
      val tAdj = med(mat(Graph.triangleCountsAdj(Graph.copurchaseHalfEdges(li))))
      println(f"[tri] copies=$k edges_old=$eOld%.2f edges_half=$eNew%.2f " +
        f"full_old=$tOld%.2f full_half=$tNew%.2f full_adj=$tAdj%.2f " +
        f"wedge_old=${tOld - eOld}%.2f wedge_half=${tNew - eNew}%.2f " +
        f"isect_adj=${tAdj - eNew}%.2f")
    }
    spark.stop()
  }
}

package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch utilities beyond the SQL-surface aggregates
  * (`hll_sketch_agg` family, used by `weekly_active_users_sketch`):
  * Count-Min sketches for frequency estimation over unbounded key
  * domains (term counts on a web corpus — an exact count table grows
  * with the vocabulary; the CMS is a few KB at any corpus size).
  *
  * The build is one distributed aggregate (Spark's `count_min_sketch`,
  * map-side combinable, O(eps^-1 * ln(1/confidence)) state); the binary
  * travels to the driver where point lookups and merges are O(depth).
  * Estimates are one-sided: est >= true, est <= true + eps * N with the
  * configured confidence — the right direction for frequency CAPPING
  * decisions (never under-counts a stop-shingle).
  */
object Sketches {

  /** Serialized Count-Min sketch of a column, built distributed. */
  def countMinBytes(
      df: DataFrame,
      c: Column,
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42): Array[Byte] =
    df.agg(count_min_sketch(c, lit(eps), lit(confidence), lit(seed)).as("s"))
      .head().getAs[Array[Byte]](0)

  /** Deserialize a sketch produced by [[countMinBytes]]. */
  def readCms(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** Merge sketches built with the SAME (eps, confidence, seed) — the
    * pre-aggregation story: per-partition/per-day sketches union into
    * wider horizons without rescanning (mutates and returns the first).
    */
  def merge(sketches: Seq[Array[Byte]]): CountMinSketch = {
    require(sketches.nonEmpty, "merge of zero sketches")
    val head = readCms(sketches.head)
    sketches.tail.foreach(b => head.mergeInPlace(readCms(b)))
    head
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass per-column table profiling — the data-quality audit a pipeline
  * runs before trusting a new drop of upstream data (row counts, null
  * counts, exact distinct cardinalities, min/max).
  *
  * Shape: ONE aggregate over the table computes every column's statistics
  * simultaneously (Spark plans the multi-`count(DISTINCT)` via a single
  * scan + Expand — the expansion factor is the number of profiled columns,
  * never the row count, and every aggregate is partially applied map-side).
  * The per-column result rows are then unpacked from the single summary row
  * with an `explode` — no second pass, no per-column job loop.
  *
  * Min/max are rendered to PORTABLE string representations chosen per
  * declared column kind so the profile is engine-comparable (and
  * hash-stable against the DuckDB oracle):
  *   - `long`         : decimal string of the value
  *   - `string`       : the value itself (binary collation min/max)
  *   - `double_centi` : `floor(value * 100)` as a decimal string — exact
  *                      integer centi-units, no float formatting drift
  *   - `ts_us`        : epoch microseconds as a decimal string
  */
object Profiling {

  /** Profile `columns` of `df` in one aggregate pass.
    *
    * @param columns (name, kind) pairs; kind ∈ long | string |
    *                double_centi | ts_us (see object doc for the repr)
    * @return one row per profiled column:
    *         (column, n_rows, n_nulls, n_distinct, min_repr, max_repr)
    */
  def tableProfile(df: DataFrame, columns: Seq[(String, String)]): DataFrame = {
    def repr(kind: String, agg: Column): Column = kind match {
      case "long"         => agg.cast("string")
      case "string"       => agg
      case "double_centi" => floor(agg * lit(100)).cast("long").cast("string")
      // NTZ-safe: parquet may surface the column as TIMESTAMP_NTZ; the
      // cast is an identity under the engine's pinned UTC session TZ.
      case "ts_us"        => unix_micros(agg.cast("timestamp")).cast("string")
      case other =>
        throw new IllegalArgumentException(s"unknown profile kind: $other")
    }

    val aggs: Seq[Column] = columns.flatMap { case (c, kind) =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        repr(kind, min(col(c))).as(s"${c}__min"),
        repr(kind, max(col(c))).as(s"${c}__max"))
    }
    val summary = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)

    val rows = columns.map { case (c, _) =>
      struct(
        lit(c).as("column"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_repr"),
        col(s"${c}__max").as("max_repr"))
    }
    summary
      .select(explode(array(rows: _*)).as("p"))
      .select("p.*")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at scale.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on in `GraftSession`); these
  * helpers cover the aggregation/join shapes AQE cannot re-plan:
  * a reduction whose single hot key overwhelms one reducer, and a
  * broadcast-incompatible join against a skewed key column.
  */
object Skew {

  /** Deterministic salt in [0, salts) from a row-discriminating column.
    * The discriminator MUST vary within a single hot key (a row id,
    * event id, or payload column) — passing the key itself or a constant
    * puts the whole hot key on one salt and defeats the mitigation.
    */
  def salt(discriminator: Column, salts: Int): Column =
    pmod(xxhash64(discriminator), lit(salts))

  /** Two-phase salted aggregation: partial aggregate on (key, salt) —
    * spreading each hot key over `salts` reducers — then final aggregate
    * on the key. Result is identical to a direct groupBy for any
    * associative aggregate; only the shuffle distribution changes.
    *
    * @param partialAggs  aggregates over the raw rows, by (key, salt)
    * @param finalAggs    re-aggregation of the partials, by key
    */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      discriminator: Column,
      salts: Int)(
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(discriminator, salts))
      .groupBy(key, col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(key)
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Salted count+sum — the common case, result-identical to
    * `groupBy(key).agg(count, sum)`.
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      discriminator: String,
      salts: Int = 16): DataFrame =
    saltedAggregate(df, col(key), col(discriminator), salts)(
      Seq(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s")),
      Seq(sum(col("__n")).as("n"), sum(col("__s")).as("total")))

  /** Skewed equi-join: replicate the (small, broadcast-unfriendly) right
    * side `salts` times and salt the left side's key so one hot key fans
    * out across `salts` tasks. Exact inner-join semantics.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      discriminator: String,
      salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt", salt(col(discriminator), salts))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}

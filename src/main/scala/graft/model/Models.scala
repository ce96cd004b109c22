package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record types the reference engine processes.
  *
  * AuditTrail mirrors the POJO at
  * `chapter2/AuditTrail.java:6-12` (reference repo): id, user, entity,
  * operation, epoch-millis timestamp, duration, count. The reference parses
  * a fully-double-quoted CSV line by stripping `"` then splitting on `,`
  * (`AuditTrail.java:15-30`); [[AuditTrail.parseLine]] reproduces exactly
  * that codec as a Catalyst column expression (codegen'd, no UDF).
  *
  * BrowserEvent mirrors the inline Tuple3 parse at
  * `chapter6/CourseUseCase.java:59-76` (id column parsed then dropped).
  */
final case class AuditTrail(
    id: Int,
    user: String,
    entity: String,
    operation: String,
    timestamp: Long,
    duration: Int,
    count: Int)

object AuditTrail {
  val schema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("user", StringType),
    StructField("entity", StringType),
    StructField("operation", StringType),
    StructField("timestamp", LongType),
    StructField("duration", IntegerType),
    StructField("count", IntegerType)))

  /** Strip-quotes-then-split codec of `AuditTrail.java:18-29`, as columns.
    * `try_element_at`/`try_cast` keep the job alive on malformed lines
    * (nulls to quarantine downstream) where the reference — and ANSI-mode
    * casts — would throw and kill the stream (`AuditTrail.java:21-28`).
    */
  def parseLine(line: Column): Column = {
    val parts = split(regexp_replace(line, "\"", ""), ",")
    struct(
      try_element_at(parts, lit(1)).try_cast(IntegerType).as("id"),
      try_element_at(parts, lit(2)).as("user"),
      try_element_at(parts, lit(3)).as("entity"),
      try_element_at(parts, lit(4)).as("operation"),
      try_element_at(parts, lit(5)).try_cast(LongType).as("timestamp"),
      try_element_at(parts, lit(6)).try_cast(IntegerType).as("duration"),
      try_element_at(parts, lit(7)).try_cast(IntegerType).as("count"))
  }

  /** Lines dataframe (one `value` string column) -> typed audit trail with a
    * derived `eventTime` TimestampType column (Spark windows/watermarks need
    * a real timestamp; the reference windows on the raw long).
    */
  def fromLines(lines: DataFrame): DataFrame =
    lines
      .select(parseLine(col("value")).as("r"))
      .select(col("r.*"))
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
}

final case class BrowserEvent(id: Int, user: String, action: String, timestamp: Long)

object BrowserEvent {
  val schema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("user", StringType),
    StructField("action", StringType),
    StructField("timestamp", LongType)))

  /** CSV codec of `chapter6/CourseUseCase.java:59-76` (null-safe, see
    * [[AuditTrail.parseLine]]).
    */
  def parseLine(line: Column): Column = {
    val parts = split(regexp_replace(line, "\"", ""), ",")
    struct(
      try_element_at(parts, lit(1)).try_cast(IntegerType).as("id"),
      try_element_at(parts, lit(2)).as("user"),
      try_element_at(parts, lit(3)).as("action"),
      try_element_at(parts, lit(4)).try_cast(LongType).as("timestamp"))
  }

  def fromLines(lines: DataFrame): DataFrame =
    lines
      .select(parseLine(col("value")).as("r"))
      .select(col("r.*"))
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
}

package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Sink surface mirroring SURVEY §2.2.
  *
  * K1 row-format file sink (`BasicStreamingOperations.java:100-108`),
  * K2 Kafka sink (`EventTimeOperations.java:178-216`),
  * K3 console/print sink (`KeyedStreamOperations.java:72`),
  * K4 formatted side-effect prints -> formatting stays in a `select`,
  *    the side effect lives in the sink, never in a `map`.
  *
  * Delivery-semantics note (documented delta): the reference's Kafka sink
  * runs transactional EXACTLY_ONCE; Spark's Kafka sink is at-least-once
  * with checkpointed offsets — end-to-end exactly-once holds for
  * idempotent/file sinks only.
  */
object Sinks {

  /** K1: append text/csv files under `path`, checkpoint under `checkpoint`. */
  def fileSink(df: DataFrame, path: String, checkpoint: String, format: String = "csv"): DataStreamWriter[Row] =
    df.writeStream
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)

  /** K2: Kafka value sink; rows are serialized with `to_csv`-style concat
    * unless a `value` column already exists.
    */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String, checkpoint: String): DataStreamWriter[Row] = {
    val payload =
      if (df.columns.contains("value")) df.select(col("value").cast("string").as("value"))
      else df.select(concat_ws(",", df.columns.map(c => col(c).cast("string")): _*).as("value"))
    payload.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
  }

  /** K3: console sink (the reference's `print()`). */
  def consoleSink(df: DataFrame, numRows: Int = 20): DataStreamWriter[Row] =
    df.writeStream.format("console").option("numRows", numRows.toString)

  /** X1 at scale: single-pass fan-out to N branch handlers. The micro-batch
    * is cached once, every branch filters/transforms/writes from the cached
    * batch, then the cache is released — one source read feeds all
    * branches (the reference's side-output split without re-scanning).
    */
  def fanoutSink(
      df: DataFrame,
      branches: Seq[(String, DataFrame => Unit)]): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
      val b = batch.toDF().persist()
      try branches.foreach { case (_, handle) => handle(b) }
      finally { b.unpersist(); () }
    }

  /** Test sink: named in-memory table. */
  def memorySink(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(mode)
}

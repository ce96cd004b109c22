package graft.apps

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.sinks.Sinks
import graft.sources.Sources
import graft.streaming.StreamOps

/** Replays the driver corpus `events` table as a stream through the
  * windowed/session operators — the bridge between the reference's
  * streaming surface and the batch corpus the correctness gate uses.
  *
  * Usage: runMain graft.apps.EventsReplayApp [sfDir] (default sf0.001)
  */
object EventsReplayApp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "events-replay")

    // nanos stored as long (see Tables.events); normalize to timestamp
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val raw = Sources.parquetStream(spark, sfDir, schema, Some("events.parquet"))
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))

    val sessions = StreamOps.sessionCounts(
      raw, "user_id", "ts", gap = "4 hours", watermark = "1 hour")
    val q = Sinks.memorySink(sessions, "events_sessions", OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val n = spark.table("events_sessions").count()
    val total = spark.table("events_sessions")
      .agg(coalesce(sum("n"), lit(0L))).collect().head.getLong(0)
    println(s"[events-replay] emitted $n closed sessions covering $total events from $sfDir")
    spark.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class Ev(ts: Timestamp, user: String, v: Double)
final case class TwoSided(ts: Timestamp, user: String, id: Long)

/** Streaming window/join/late-data semantics under MemoryStream. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(sec: Long) = new Timestamp(sec * 1000)

  test("A1 streaming: tumbling 5s counts appear after watermark passes") {
    val input = MemoryStream[Ev]
    val counts = StreamOps.windowedCount(input.toDF(), "ts", "5 seconds")
    val q = counts.writeStream.format("memory").queryName("a1_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(t(1), "a", 1), Ev(t(2), "b", 1), Ev(t(6), "a", 1))
      q.processAllAvailable()
      input.addData(Ev(t(20), "c", 1)) // advances watermark past both windows
      q.processAllAvailable()
      input.addData(Ev(t(40), "c", 1))
      q.processAllAvailable()
      val rows = spark.table("a1_out")
        .select(col("window_start").cast("long"), col("n")).as[(Long, Long)]
        .collect().toMap
      assert(rows(0L) === 2L)
      assert(rows(5L) === 1L)
    } finally q.stop()
  }

  test("A2 streaming: running keyed sum in update mode converges") {
    val input = MemoryStream[Ev]
    val totals = StreamOps.runningKeyedSum(input.toDF(), "user", "v")
    val q = totals.writeStream.format("memory").queryName("a2_out")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(Ev(t(1), "a", 2.0), Ev(t(2), "a", 3.0))
      q.processAllAvailable()
      input.addData(Ev(t(3), "a", 5.0), Ev(t(4), "b", 7.0))
      q.processAllAvailable()
      val rows = spark.table("a2_out")
        .select("user", "total").as[(String, Double)].collect().toMap
      assert(rows === Map("a" -> 10.0, "b" -> 7.0))
    } finally q.stop()
  }

  test("A4 streaming: session windows close when the watermark passes the gap") {
    val input = MemoryStream[Ev]
    val sessions = StreamOps.sessionCounts(input.toDF(), "user", "ts", "5 seconds")
    val q = sessions.writeStream.format("memory").queryName("a4_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(t(1), "a", 1), Ev(t(3), "a", 1), Ev(t(20), "a", 1))
      q.processAllAvailable()
      input.addData(Ev(t(60), "b", 1)) // watermark far past both sessions
      q.processAllAvailable()
      input.addData(Ev(t(90), "b", 1))
      q.processAllAvailable()
      val rows = spark.table("a4_out")
        .select(col("user"), col("session_start").cast("long"),
          col("session_end").cast("long"), col("n"))
        .as[(String, Long, Long, Long)].collect().filter(_._1 == "a").sortBy(_._2)
      assert(rows.toSeq === Seq(("a", 1L, 8L, 2L), ("a", 20L, 25L, 1L)))
    } finally q.stop()
  }

  test("A3 streaming: sliding windows emit two rows per closed 5s bucket") {
    val input = MemoryStream[Ev]
    val sliding = StreamOps.slidingSummary(input.toDF(), "ts", "10 seconds", "5 seconds")
    val q = sliding.writeStream.format("memory").queryName("a3_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(t(7), "a", 1))
      q.processAllAvailable()
      input.addData(Ev(t(40), "b", 1))
      q.processAllAvailable()
      input.addData(Ev(t(80), "c", 1))
      q.processAllAvailable()
      val starts = spark.table("a3_out")
        .select(col("window_start").cast("long")).as[Long].collect().sorted
      // event at 7s belongs to windows starting at 0 and 5
      assert(starts.toSeq.take(2) === Seq(0L, 5L))
    } finally q.stop()
  }

  test("J1 streaming: stream-stream join pairs rows in the same window") {
    val left = MemoryStream[TwoSided]
    val right = MemoryStream[TwoSided]
    val joined = StreamOps.streamStreamWindowJoin(
      left.toDF().withColumnRenamed("id", "left_id"),
      right.toDF().withColumnRenamed("id", "right_id"),
      "user", "ts", "5 seconds")
    val q = joined.writeStream.format("memory").queryName("j1_out")
      .outputMode(OutputMode.Append).start()
    try {
      left.addData(TwoSided(t(1), "a", 100), TwoSided(t(7), "a", 101))
      right.addData(TwoSided(t(3), "a", 200), TwoSided(t(12), "a", 201))
      q.processAllAvailable()
      val rows = spark.table("j1_out").select("left_id", "right_id")
        .as[(Long, Long)].collect().toSet
      // only (100, 200) share the [0,5) window
      assert(rows === Set((100L, 200L)))
    } finally q.stop()
  }

  test("W2: LateDataSplit tees rows older than the carried watermark") {
    val input = MemoryStream[Ev]
    val onTime = scala.collection.mutable.ArrayBuffer[Long]()
    val late = scala.collection.mutable.ArrayBuffer[Long]()
    val split = new LateDataSplit(
      "ts", 2000L,
      (df, _) => onTime.synchronized {
        onTime ++= df.select(unix_millis(col("ts"))).as[Long](Encoders).collect()
      },
      (df, _) => late.synchronized {
        late ++= df.select(unix_millis(col("ts"))).as[Long](Encoders).collect()
      })
    val q = split.writer(input.toDF()).start()
    try {
      input.addData(Ev(t(10), "a", 1))
      q.processAllAvailable()
      assert(split.watermarkMs === 8000L)
      // batch 2: one on-time (>= 8 s), one late (< 8 s)
      input.addData(Ev(t(9), "a", 1), Ev(t(5), "a", 1))
      q.processAllAvailable()
      assert(onTime.sorted.toSeq === Seq(9000L, 10000L))
      assert(late.toSeq === Seq(5000L))
    } finally q.stop()
  }

  private def Encoders = org.apache.spark.sql.Encoders.scalaLong
}

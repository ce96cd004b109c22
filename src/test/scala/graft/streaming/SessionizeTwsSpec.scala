package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.model.BrowserEvent

/** Event-time-timer sessionization (transformWithState, TimeMode.EventTime). */
class SessionizeTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("sessions emit when the watermark passes lastEvent + gap") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[BrowserEvent]
      val watermarked = input.toDF()
        .withColumn("eventTime", timestamp_millis(col("timestamp")))
        .withWatermark("eventTime", "0 seconds")
        .drop("eventTime")
        .as[BrowserEvent]
      val sessions = SessionizeTws.sessionize(watermarked, gapMs = 5000L)
      val q = sessions.writeStream.format("memory").queryName("tws_sessions")
        .outputMode(OutputMode.Append).start()
      try {
        // session: Tom events at 1s and 3s
        input.addData(Seq(
          BrowserEvent(0, "Tom", "Login", 1000L),
          BrowserEvent(1, "Tom", "ViewVideo", 3000L)))
        q.processAllAvailable()
        assert(spark.table("tws_sessions").count() === 0) // watermark at 3s, timer at 8s
        // Bob at 60s pushes the watermark past Tom's 8s timer
        input.addData(Seq(BrowserEvent(2, "Bob", "Login", 60000L)))
        q.processAllAvailable()
        input.addData(Seq(BrowserEvent(3, "Bob", "Logout", 120000L)))
        q.processAllAvailable()
        val out = spark.table("tws_sessions").as[SessionizeTws.UserSession].collect()
          .filter(_.user == "Tom")
        assert(out.toSeq === Seq(SessionizeTws.UserSession("Tom", 1000L, 3000L, 2L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("in-batch gap closes the first session immediately") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[BrowserEvent]
      val watermarked = input.toDF()
        .withColumn("eventTime", timestamp_millis(col("timestamp")))
        .withWatermark("eventTime", "0 seconds")
        .drop("eventTime")
        .as[BrowserEvent]
      val sessions = SessionizeTws.sessionize(watermarked, gapMs = 5000L)
      val q = sessions.writeStream.format("memory").queryName("tws_sessions2")
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(Seq(
          BrowserEvent(0, "Tom", "Login", 1000L),
          BrowserEvent(1, "Tom", "ViewVideo", 2000L),
          BrowserEvent(2, "Tom", "ViewLink", 20000L))) // 18s gap inside one batch
        q.processAllAvailable()
        val out = spark.table("tws_sessions2").as[SessionizeTws.UserSession].collect()
        assert(out.toSeq === Seq(SessionizeTws.UserSession("Tom", 1000L, 2000L, 2L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}

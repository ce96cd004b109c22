package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.GraftSession
import graft.model.{AuditTrail, BrowserEvent}
import graft.operators.CoreOps
import graft.sinks.Sinks
import graft.sources.Sources
import graft.streaming.{LateDataSplit, StatefulOps, StreamOps}

/** Runnable mains mirroring the reference's chapter programs (SURVEY §0) —
  * same observable behavior, Spark-native execution. Each main spins up the
  * deterministic generator, runs the streaming pipeline for `--seconds N`
  * (default 15), prints to console, then exits.
  *
  * Run e.g.: `sbt "runMain graft.apps.BasicStreamingApp --seconds 10"`.
  */
object ChapterApps {

  def seconds(args: Array[String], default: Int = 15): Int =
    args.sliding(2).collectFirst { case Array("--seconds", v) => v.toInt }.getOrElse(default)

  def runFor(q: StreamingQuery, secs: Int): Unit = {
    q.awaitTermination(secs * 1000L)
    q.stop()
  }

  def tmp(prefix: String): String = Files.createTempDirectory(prefix).toString

  def auditStream(spark: SparkSession, dir: String): DataFrame =
    AuditTrail.fromLines(Sources.fileLines(spark, dir))

  def browserStream(spark: SparkSession, dir: String): DataFrame =
    BrowserEvent.fromLines(Sources.fileLines(spark, dir))
}

/** chapter2/BasicStreamingOperations.java: file source -> parse -> 5 s
  * tumbling count -> file sink (+ console echo of the raw records).
  */
object BasicStreamingApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "basic-streaming")
    val dir = tmp("audit_src")
    val out = tmp("five_sec_summary")
    val gen = DataGenerators.auditFiles(dir)
    val counts = StreamOps.windowedCount(
      auditStream(spark, dir), "eventTime", "5 seconds", watermark = "2 seconds")
    val toFile = Sinks.fileSink(
      counts.select(col("window_start").cast("string"), col("n").cast("string")),
      out, tmp("ckpt"))
      .trigger(Trigger.ProcessingTime("1 second")).start()
    val toConsole = Sinks.consoleSink(counts).outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(toConsole, seconds(args)); toFile.stop(); gen.stop()
    println(s"[basic-streaming] summaries written under $out")
    spark.stop()
  }
}

/** chapter2/KeyedStreamOperations.java: keyBy(user) running sum(duration). */
object KeyedStreamApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "keyed-stream")
    val dir = tmp("audit_src")
    val gen = DataGenerators.auditFiles(dir)
    val totals = StreamOps.runningKeyedSum(auditStream(spark, dir), "user", "duration")
    val q = Sinks.consoleSink(totals).outputMode(OutputMode.Complete)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(q, seconds(args)); gen.stop(); spark.stop()
  }
}

/** chapter2/StreamSplitAndCombine.java: split by entity, re-merge tagged. */
object SplitAndCombineApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "split-combine")
    val dir = tmp("audit_src")
    val gen = DataGenerators.auditFiles(dir)
    val src = auditStream(spark, dir)
    val (customers, salesReps) = CoreOps.splitByPredicate(src, col("entity") === "Customer")
    val merged = CoreOps.taggedUnion(Seq(
      "Stream-1" -> customers.select(col("user"), lit(1).as("one")),
      "Stream-2" -> salesReps.select(col("user"), lit(1).as("one"))))
    val q = Sinks.consoleSink(merged).outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(q, seconds(args)); gen.stop(); spark.stop()
  }
}

/** chapter3/WindowingOperations.java: sliding all-window summary + keyed
  * session windows (file source stands in for Kafka; point
  * `Sources.kafkaLines` at a broker to run the original topology).
  */
object WindowingApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "windowing")
    val dir = tmp("audit_src")
    val gen = DataGenerators.auditFiles(dir)
    val src = auditStream(spark, dir)
    val sliding = StreamOps.slidingSummary(src, "eventTime", "10 seconds", "5 seconds")
    val sessions = StreamOps.sessionCounts(src, "user", "eventTime", "5 seconds")
    val q1 = Sinks.consoleSink(sliding).outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    val q2 = Sinks.consoleSink(sessions).outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(q1, seconds(args)); q2.stop(); gen.stop(); spark.stop()
  }
}

/** chapter3/WindowJoins.java: two streams joined per user per 5 s window. */
object WindowJoinApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "window-join")
    val dirA = tmp("audit_src_a")
    val dirB = tmp("audit_src_b")
    val genA = DataGenerators.auditFiles(dirA, seed = 42)
    val genB = DataGenerators.auditFiles(dirB, seed = 43)
    val joined = StreamOps.streamStreamWindowJoin(
      auditStream(spark, dirA).select(col("user"), col("eventTime").as("ts"), col("id").as("id_a")),
      auditStream(spark, dirB).select(col("user"), col("eventTime").as("ts"), col("id").as("id_b")),
      "user", "ts", "5 seconds")
    val q = Sinks.consoleSink(joined.select("user", "id_a", "id_b"))
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(q, seconds(args)); genA.stop(); genB.stop(); spark.stop()
  }
}

/** chapter4/EventTimeOperations.java: event-time 1 s counts with 2 s
  * allowed lateness; late rows tee'd to their own console stream (W2).
  */
object EventTimeApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "event-time")
    val dir = tmp("audit_src")
    val gen = DataGenerators.auditFiles(dir)
    val split = new LateDataSplit(
      "eventTime", 2000L,
      (onTime, id) => {
        val counts = onTime.groupBy(window(col("eventTime"), "1 second")).count()
        if (!counts.isEmpty) { println(s"--- batch $id on-time 1s counts:"); counts.show(5, truncate = false) }
      },
      (late, id) => if (!late.isEmpty) { println(s"--- batch $id LATE rows:"); late.show(5, truncate = false) })
    val q = split.writer(auditStream(spark, dir))
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(q, seconds(args)); gen.stop(); spark.stop()
  }
}

/** chapter5/StatefulOperations.java: delete-burst alerts (ST1). */
object StatefulApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "stateful")
    import spark.implicits._
    val dir = tmp("audit_src")
    // tight interval so same-user deletes land < 10 s apart
    val gen = DataGenerators.auditFiles(dir, intervalMs = 20)
    val alerts = StatefulOps.deleteBurstAlerts(
      ChapterApps.auditStream(spark, dir).drop("eventTime").as[AuditTrail])
    val q = Sinks.consoleSink(alerts.toDF()).outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(q, seconds(args)); gen.stop(); spark.stop()
  }
}

/** chapter6/CourseUseCase.java: 10 s (user, action) counts + ST2 durations. */
object CourseUseCaseApp {
  import ChapterApps._
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "course-use-case")
    import spark.implicits._
    val dir = tmp("browser_src")
    val gen = DataGenerators.browserFiles(dir, intervalMs = 30)
    val src = browserStream(spark, dir)
    val counts = StreamOps.keyedWindowedCount(
      src, "eventTime", "10 seconds", "2 seconds", "user", "action")
    val durations = StatefulOps.actionDurations(
      src.drop("eventTime").as[BrowserEvent])
    val q1 = Sinks.consoleSink(counts.select(col("w.start").as("ws"), col("user"), col("action"), col("n")))
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    val q2 = Sinks.consoleSink(durations.toDF()).outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second")).start()
    runFor(q1, seconds(args)); q2.stop(); gen.stop(); spark.stop()
  }
}

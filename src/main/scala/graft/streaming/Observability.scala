package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a progress listener capturing the metrics an
  * operator of this engine watches in production — input rate, batch
  * duration, state-store rows, current watermark. (The reference's
  * equivalent was eyeballing console prints; at scale these numbers feed
  * alerting and auto-tuning of trigger intervals.)
  */
final class ProgressLogger(verbose: Boolean = false) extends StreamingQueryListener {

  final case class Snapshot(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      batchDurationMs: Long,
      stateRows: Long,
      watermark: String)

  private val snaps = mutable.ArrayBuffer[Snapshot]()

  def snapshots: Seq[Snapshot] = snaps.synchronized(snaps.toSeq)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows = Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum
    val snap = Snapshot(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      p.batchDuration,
      stateRows,
      Option(p.eventTime).flatMap(m => Option(m.get("watermark"))).getOrElse("-"))
    snaps.synchronized { snaps += snap; () }
    if (verbose) println(
      s"[stream] ${snap.queryName} batch=${snap.batchId} rows=${snap.numInputRows} " +
        s"dur=${snap.batchDurationMs}ms state=${snap.stateRows} wm=${snap.watermark}")
  }
}

object Observability {
  /** Attach a ProgressLogger to the session; returns it for inspection. */
  def attach(spark: SparkSession, verbose: Boolean = false): ProgressLogger = {
    val l = new ProgressLogger(verbose)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: ProgressLogger): Unit =
    spark.streams.removeListener(l)
}

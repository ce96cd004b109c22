package graft.apps

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicBoolean

import scala.util.Random

/** Deterministic re-implementations of the reference's in-process data
  * generators (`datasource/FileStreamDataGenerator.java:32-107`,
  * `chapter6/BrowserStreamDataGenerator.java:32-98`): same record domains,
  * same one-file-per-record layout, but a fixed seed and fixed inter-arrival
  * interval so demo runs are reproducible.
  */
object DataGenerators {

  private val users = Seq("Tom", "Harry", "Bob")
  private val operations = Seq("Create", "Modify", "Query", "Delete")
  private val entities = Seq("Customer", "SalesRep")
  private val actions = Seq("Login", "ViewVideo", "ViewLink", "ViewReview", "Logout")

  final class Handle(flag: AtomicBoolean, thread: Thread) {
    def stop(): Unit = { flag.set(false); thread.join(5000) }
    /** Wait for a bounded generator to write its FULL record budget —
      * unlike a sleep-then-stop, this can't truncate the run on a slow
      * host.
      */
    def await(timeoutMs: Long = 300000L): Unit = thread.join(timeoutMs)
  }

  private def spawn(body: AtomicBoolean => Unit): Handle = {
    val flag = new AtomicBoolean(true)
    val t = new Thread(() => body(flag))
    t.setDaemon(true)
    t.start()
    new Handle(flag, t)
  }

  /** Audit-trail CSV files, one quoted row per file (reference format:
    * `"id","user","entity","operation","ts","duration","count"`).
    */
  def auditFiles(dir: String, records: Int = 100, intervalMs: Long = 50, seed: Long = 42): Handle = {
    Files.createDirectories(Paths.get(dir))
    spawn { flag =>
      val rnd = new Random(seed)
      var i = 0
      while (flag.get() && i < records) {
        val row = Seq(
          i.toString,
          users(rnd.nextInt(users.size)),
          entities(rnd.nextInt(entities.size)),
          operations(rnd.nextInt(operations.size)),
          System.currentTimeMillis().toString,
          (rnd.nextInt(10) + 1).toString,
          (rnd.nextInt(4) + 1).toString
        ).map(v => "\"" + v + "\"").mkString(",")
        atomicWrite(Paths.get(dir, s"audit_trail_$i.csv"), row)
        i += 1
        Thread.sleep(intervalMs)
      }
    }
  }

  /** Browser-event CSV files (`"id","user","action","ts"`). */
  def browserFiles(dir: String, records: Int = 100, intervalMs: Long = 50, seed: Long = 7): Handle = {
    Files.createDirectories(Paths.get(dir))
    spawn { flag =>
      val rnd = new Random(seed)
      var i = 0
      while (flag.get() && i < records) {
        val row = Seq(
          i.toString,
          users(rnd.nextInt(users.size)),
          actions(rnd.nextInt(actions.size)),
          System.currentTimeMillis().toString
        ).map(v => "\"" + v + "\"").mkString(",")
        atomicWrite(Paths.get(dir, s"browser_events$i.csv"), row)
        i += 1
        Thread.sleep(intervalMs)
      }
    }
  }

  private val docTemplates = Seq(
    "the quick brown fox jumps over the lazy dog again and again today",
    "this is a wholly new document about storage engines and their many compaction strategies",
    "a different tale of rivers and mountains told slowly by the old storyteller at dusk",
    "engineers at the plant reviewed the turbine logs and filed a careful report on friday")

  /** Document CSV files (`"doc_id","source","text"`), one per file, for
    * the streaming-curation pipeline: rotates sentence templates, emits a
    * near-duplicate (last word swapped) every 4th record and a junk doc
    * (fails the quality gate) every 7th — so the pipeline has something
    * to gate, dedup and index.
    */
  def docFiles(dir: String, records: Int = 40, intervalMs: Long = 50, seed: Long = 11): Handle = {
    Files.createDirectories(Paths.get(dir))
    spawn { flag =>
      val rnd = new Random(seed)
      var i = 0
      while (flag.get() && i < records) {
        val text =
          if (i % 7 == 6) "@@@@ #### $$$$ !!!! ???? %%%%"
          else {
            val base = docTemplates(rnd.nextInt(docTemplates.size))
            if (i % 4 == 3) base.reverse.dropWhile(_ != ' ').reverse + "tomorrow"
            else base
          }
        val row = Seq(i.toString, s"src${i % 3}", text)
          .map(v => "\"" + v + "\"").mkString(",")
        atomicWrite(Paths.get(dir, s"doc_$i.csv"), row)
        i += 1
        Thread.sleep(intervalMs)
      }
    }
  }

  /** Write-then-rename so the streaming file source never reads a partial
    * file (the reference writes in place, racy on purpose-built FS only).
    */
  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling("." + target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content + "\n")
    Files.move(tmp, target)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.model.{AuditTrail, BrowserEvent}

/** ScalaCheck properties for the CSV codecs, with generators mirroring the
  * reference generator domains (`datasource/FileStreamDataGenerator.java:37-78`,
  * `chapter6/BrowserStreamDataGenerator.java:37-48`).
  */
class CodecPropertySpec extends SparkSpec {

  private val genAudit: Gen[AuditTrail] = for {
    id <- Gen.choose(0, 99)
    user <- Gen.oneOf("Tom", "Harry", "Bob")
    entity <- Gen.oneOf("Customer", "SalesRep")
    op <- Gen.oneOf("Create", "Modify", "Query", "Delete")
    ts <- Gen.choose(1577215616071L, 1577215716071L)
    duration <- Gen.choose(1, 10)
    count <- Gen.choose(1, 4)
  } yield AuditTrail(id, user, entity, op, ts, duration, count)

  private def toCsv(a: AuditTrail): String =
    Seq(a.id, a.user, a.entity, a.operation, a.timestamp, a.duration, a.count)
      .map(v => "\"" + v + "\"").mkString(",")

  private def runProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("property: quoted-CSV round-trip reproduces every audit record") {
    import spark.implicits._
    runProp(Prop.forAll(Gen.listOfN(20, genAudit)) { rows =>
      val lines = rows.map(toCsv).toDF("value")
      val parsed = AuditTrail.fromLines(lines).drop("eventTime").as[AuditTrail].collect()
      parsed.sortBy(r => (r.id, r.timestamp)).toSeq ==
        rows.sortBy(r => (r.id, r.timestamp))
    })
  }

  test("malformed lines parse null-safely instead of failing the job") {
    import spark.implicits._
    val bad = Seq("\"not,enough", "", "\"1\",\"Tom\"", "garbage").toDF("value")
    val parsed = AuditTrail.fromLines(bad)
    // the job completes; unparseable numeric fields surface as nulls that a
    // quality filter can quarantine (vs the reference, which would throw
    // NumberFormatException and kill the stream: AuditTrail.java:21-28)
    val rows = parsed.collect()
    assert(rows.length === 4)
    assert(parsed.filter(col("timestamp").isNull).count() >= 3)
  }

  test("property: browser-event codec round-trips (id column preserved)") {
    import spark.implicits._
    val genBrowser = for {
      id <- Gen.choose(0, 99)
      user <- Gen.oneOf("Tom", "Harry", "Bob")
      action <- Gen.oneOf("Login", "ViewVideo", "ViewLink", "ViewReview", "Logout")
      ts <- Gen.choose(1577029696229L, 1577029796229L)
    } yield BrowserEvent(id, user, action, ts)
    runProp(Prop.forAll(Gen.listOfN(20, genBrowser)) { rows =>
      val lines = rows
        .map(b => Seq(b.id, b.user, b.action, b.timestamp)
          .map(v => "\"" + v + "\"").mkString(","))
        .toDF("value")
      val parsed = BrowserEvent.fromLines(lines).drop("eventTime").as[BrowserEvent].collect()
      parsed.sortBy(r => (r.id, r.timestamp)).toSeq ==
        rows.sortBy(r => (r.id, r.timestamp))
    })
  }

  test("property: token-window chunking covers every token, in order, per doc") {
    import spark.implicits._
    val genDoc = for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, Gen.choose(0, 9).map(i => s"t$i"))
    } yield toks.mkString(" ")
    val genParams = for {
      window <- Gen.choose(1, 8)
      stride <- Gen.choose(1, 8)
    } yield (window, stride)
    runProp(Prop.forAll(Gen.listOfN(5, genDoc), genParams) {
      case (docs, (window, stride)) =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val chunks = graft.functions.Curation
          .chunkTokenWindows(df, "text", "doc_id", window, stride)
          .select("doc_id", "chunk_idx", "chunk_start", "chunk_tokens")
          .as[(Long, Long, Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
        docs.zipWithIndex.forall { case (text, i) =>
          val n = text.split("\\s+").count(_.nonEmpty)
          val cs = chunks.getOrElse(i.toLong, Array.empty[(Long, Long, Long, Long)])
          if (n == 0) cs.isEmpty
          else {
            // chunk k starts at k*stride+1; lengths truncate at the tail
            val shapeOk = cs.forall { case (_, k, start, len) =>
              start == k * stride + 1 &&
                len == math.min(window.toLong, n - start + 1)
            }
            val countOk = cs.length == (n - 1) / stride + 1
            // overlapping windows (stride <= window) cover every token;
            // sparse strides (stride > window) may legitimately skip
            val covered = cs
              .flatMap { case (_, _, start, len) => start until start + len }
              .toSet
            val all = (1L to n.toLong).toSet
            val coverOk =
              if (stride <= window) covered == all else covered.subsetOf(all)
            shapeOk && countOk && coverOk
          }
        }
    })
  }
}

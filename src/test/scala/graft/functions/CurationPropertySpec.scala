package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-random invariants for the curation operators — the properties a
  * 100 TB run relies on (conservation, bounds, determinism), checked over
  * corpora the fixture tests don't enumerate.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = (0 until 40).map(i => s"w$i")

  private def randomDocs(seed: Long, n: Int) = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val len = 1 + rnd.nextInt(60)
      (i.toLong,
        Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        s"src${rnd.nextInt(5)}")
    }.toDF("doc_id", "text", "source")
  }

  test("log2Q10: Scala and Spark-SQL forms agree and bracket true log2") {
    val rnd = new Random(7L)
    val xs = (Seq(1L, 2L, 3L, 1023L, 1024L, (1L << 40) - 1, 1L << 40) ++
      Seq.fill(200)(1L + math.abs(rnd.nextLong()) % (1L << 48))).distinct
    val fromSql = xs.toDF("x")
      .select(col("x"), TextAnalysis.surprisalQ10("x", 1L << 50).as("s"))
      .as[(Long, Long)].collect().toMap
    xs.foreach { x =>
      val scala = TextAnalysis.log2Q10(x)
      // surprisalQ10 = log2Q10(total) - log2Q10Sql(x): invert to compare
      val sql = TextAnalysis.log2Q10(1L << 50) - fromSql(x)
      assert(scala === sql, s"x=$x: scala $scala vs sql $sql")
      val truth = math.log(x.toDouble) / math.log(2.0) * 1024.0
      assert(scala <= truth + 1e-6 && scala >= truth - 0.09 * 1024,
        s"x=$x: $scala vs true $truth")
    }
  }

  test("duplicateShingleProfile: n_dup bounded, exact-dup docs hit 1000") {
    for (seed <- Seq(11L, 12L)) {
      val docs = randomDocs(seed, 200)
      // plant an exact duplicate of doc 0 under a fresh id
      val planted = docs.union(
        docs.filter(col("doc_id") === 0).select(lit(9999L), col("text"), col("source")))
      val prof = Dedup.duplicateShingleProfile(planted, "text", "doc_id", n = 3)
        .as[(Long, Long, Long, Long)].collect()
      assert(prof.forall(p => p._3 >= 0 && p._3 <= p._2), "0 <= n_dup <= n_shingles")
      assert(prof.forall(p => p._4 >= 0 && p._4 <= 1000), "frac in [0, 1000]")
      prof.find(_._1 === 9999L).foreach { p =>
        assert(p._4 === 1000L, "an exact duplicate is 100% duplicated spans")
      }
    }
  }

  test("packing conserves tokens; offsets stay under budget; strata start at zero") {
    for (seed <- Seq(31L, 32L)) {
      val docs = randomDocs(seed, 400)
      val budget = 128
      val packed = Curation.packSequences(docs, "doc_id", "source", "text", budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val totalTokens = docs
        .select(sum(TextAnalysis.tokenCount(col("text")).cast("long")))
        .collect().head.getLong(0)
      assert(packed.map(_._3).sum === totalTokens, "token conservation")
      assert(packed.forall(p => p._5 >= 0 && p._5 < budget), "offset in [0, budget)")
      packed.groupBy(_._2).foreach { case (_, rows) =>
        val ordered = rows.sortBy(_._1)
        assert(ordered.head._4 === 0L && ordered.head._5 === 0L,
          "first doc of a stratum starts at bin 0 offset 0")
        // bins never decrease in id order, and cum positions reconstruct
        var cum = 0L
        ordered.foreach { case (_, _, nTok, bin, off) =>
          assert(bin === cum / budget && off === cum % budget)
          cum += nTok
        }
      }
    }
  }

  test("chunked packing equals direct packing, incl. a single hot stratum") {
    val uniform = randomDocs(37L, 500)
    val hot = randomDocs(38L, 800).withColumn("source", lit("HOT"))
    for (docs <- Seq(uniform, hot)) {
      val direct = Curation.packSequences(docs, "doc_id", "source", "text", 128)
      val chunked = Curation.packSequencesChunked(docs, "doc_id", "source", "text", 128,
        chunkCol = floor(col("doc_id") / 50))
      assert(direct.exceptAll(chunked).count() === 0L)
      assert(chunked.exceptAll(direct).count() === 0L)
      assert(chunked.count() === direct.count())
    }
  }

  test("dedup-aware compositions: random clusters never co-locate in a " +
      "bin, a shard (while they fit), or across the split") {
    for (seed <- Seq(31L, 32L, 33L)) {
      val rnd = new Random(seed)
      val docs = randomDocs(seed, 150)
      // random disjoint clusters of size 2-6 over a random id subset
      val ids = rnd.shuffle((0L until 150L).toList)
      val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var rest = ids
      while (rest.length >= 6 && groups.length < 15) {
        val k = 2 + rnd.nextInt(5)
        groups += rest.take(k); rest = rest.drop(k)
      }
      val clusters = groups.toSeq.flatMap(g => g.map(m => (m, g.min)))
        .toDF("node", "cluster_id")
      val byDoc = groups.flatMap(g => g.map(_ -> g.min)).toMap

      val packed = Curation.packSequencesDedupAware(
        docs, "doc_id", "source", "text", 64, clusters)
        .as[(Long, String, Long, Long, Long, Long, Long)].collect()
      packed.groupBy(r => (r._2, r._4, r._6)).foreach { case (bin, ms) =>
        val cids = ms.map(_._3)
        assert(cids.distinct.length === cids.length,
          s"seed $seed: bin $bin holds two members of one cluster")
      }
      // token conservation vs the naive pack (same docs, same counts)
      val naiveTokens = Curation.packSequences(docs, "doc_id", "source", "text", 64)
        .agg(sum("n_tokens")).as[Long].head()
      assert(packed.map(_._5).sum === naiveTokens)

      val sharded = Curation.shuffleShardsDedupAware(
        docs, "doc_id", shards = 8, clusters)
        .as[(Long, Long, Long, Long)].collect()
      sharded.groupBy(_._2).filter(_._2.length >= 2).foreach { case (cid, ms) =>
        // clusters here are <= 6 <= 8 members, so shards must all differ
        val sh = ms.map(_._3)
        assert(sh.distinct.length === sh.length,
          s"seed $seed: cluster $cid co-located in a shard")
      }
      // positions dense per shard, all docs present exactly once
      assert(sharded.length === 150)
      sharded.groupBy(_._3).foreach { case (shard, ms) =>
        assert(ms.map(_._4).sorted.toSeq === (1L to ms.length).toSeq,
          s"seed $seed: shard $shard positions not dense")
      }

      val split = Curation.datasetSplitDedupAware(
        docs, "text", "doc_id", 100, 50, clusters)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      groups.foreach { g =>
        assert(g.map(split).distinct.length === 1,
          s"seed $seed: cluster ${g.min} straddles the split")
      }
      // unclustered docs match the legacy split exactly
      val legacy = Curation.datasetSplit(docs, "text", 100, 50)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      (0L until 150L).filterNot(byDoc.contains).foreach { id =>
        assert(split(id) === legacy(id), s"seed $seed: singleton $id moved")
      }
    }
  }

  test("sampling is a deterministic subset, monotone in rate") {
    val docs = randomDocs(33L, 600)
    def sample(rate: Int) = Curation.stratifiedSample(
      docs, "doc_id", "source", Map.empty, rate).select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(sample(1000) === all)
    assert(sample(0) === Set.empty[Long])
    val s300 = sample(300)
    val s700 = sample(700)
    assert(s300.subsetOf(s700), "rate monotonicity: lower rate is a subset")
    assert(s700.subsetOf(all))
    assert(sample(300) === s300, "re-run identical")
  }

  test("connected components: pair endpoints share labels, labels are members") {
    val rnd = new Random(34L)
    val pairs = (0 until 120).map { _ =>
      val a = rnd.nextInt(80).toLong; val b = rnd.nextInt(80).toLong
      if (a < b) (a, b) else (b, a + 1)
    }.filter(p => p._1 != p._2).toDF("a", "b")
    val labels = Curation.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    // every endpoint is labelled with a node no greater than itself
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b))
      assert(labels(a) === labels(b), s"endpoints of ($a,$b) in different clusters")
    }
    assert(labels.forall { case (n, l) => l <= n }, "label is a component minimum")
    assert(labels.values.toSet.forall(l => labels(l) === l),
      "every cluster label is itself labelled with itself")
  }

  test("contamination containment is bounded and benchmark-consistent") {
    val docs = randomDocs(35L, 300)
    val rows = Curation.contaminationPairs(docs, "text", "doc_id",
      isBench = pmod(col("doc_id"), lit(10)) === 0,
      n = 3, maxShingleDf = 40, minContainMilli = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (docId, benchId, inter, nb, milli) =>
      assert(docId % 10 !== 0L, "corpus side excludes benchmark docs")
      assert(benchId % 10 === 0L, "bench side only benchmark docs")
      assert(inter >= 1 && inter <= nb, "0 < inter <= |bench shingles|")
      assert(milli >= 0 && milli <= 1000, "containment in [0, 1000]")
    }
  }

  test("token-budget sampling: kept set is the exact per-stratum prefix, budgets bite") {
    for (seed <- Seq(41L, 42L)) {
      val docs = randomDocs(seed, 300)
      val budget = 600L
      val kept = Curation.tokenBudgetSample(docs, "doc_id", "source", "text",
        budgets = Map("src0" -> 200L), defaultBudget = budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(kept.nonEmpty)
      kept.groupBy(_._2).foreach { case (src, rows) =>
        val b = if (src == "src0") 200L else budget
        // every kept doc starts under budget; the kept set is a PREFIX in
        // doc_id order (no gaps), and it reaches the budget unless the
        // stratum ran out of documents
        assert(rows.forall(_._4 < b), s"$src: kept doc starting at/after budget")
        val ids = rows.map(_._1).sorted
        val allIds = docs.filter(col("source") === src)
          .select("doc_id").as[Long].collect().sorted
        assert(ids.toSeq === allIds.take(ids.length).toSeq, s"$src: not a prefix")
        val lastTotal = rows.map(r => r._4 + r._3).max
        assert(lastTotal >= b || ids.length == allIds.length,
          s"$src: budget undershot with documents left")
      }
    }
  }

  test("repetition stats: all metrics in [0, 1000], degenerate docs flagged") {
    val docs = randomDocs(43L, 200)
      .union(Seq((9001L, "spam spam spam spam spam spam", "srcX")).toDF())
      .union(Seq((9002L, "", "srcX")).toDF())
    val rows = Curation.repetitionStats(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === 202)
    rows.foreach { case (_, n, top, dist, dup) =>
      assert(top >= 0 && top <= 1000 && dist >= 0 && dist <= 1000 && dup >= 0 && dup <= 1000)
      if (n == 0) assert(top == 0 && dist == 0 && dup == 0)
    }
    val spam = rows.find(_._1 == 9001L).get
    assert(spam._3 === 1000L, "single-token doc: top-token share = 1000")
    // 6 tokens -> 5 bigrams, 1 distinct: dup share = (5-1)/5 = 800 milli
    assert(spam._5 === 800L, "all-identical bigrams: dup share = (n-1)/n")
    val empty = rows.find(_._1 == 9002L).get
    assert(empty._2 === 0L && empty._3 === 0L)
  }

  test("int8 quantization: codes bounded, dequantization error under scale/127") {
    val vecs = (0 until 100).map { i =>
      val rnd = new Random(100L + i)
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "vec")
    val q = Similarity.quantizeInt8(col("vec"))
    val rows = vecs.select(col("vec"), q.getField("scale").as("s"), q.getField("q").as("q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val s = r.getDouble(1)
      val codes = r.getSeq[Long](2)
      assert(codes.forall(c => c >= -127 && c <= 127))
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(c.toDouble / 127.0 * s - x) <= s / 127.0 + 1e-9,
          s"dequant error too large: x=$x c=$c s=$s")
      }
    }
  }

  test("keyword ranks are contiguous from 1 and scores non-increasing per doc") {
    val docs = randomDocs(36L, 200)
    val rows = Curation.keywordScores(docs, "text", "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1L to byRank.length).toSeq)
      assert(byRank.sliding(2).forall {
        case Array(x, y) => x._2 >= y._2
        case _ => true
      }, "scores non-increasing in rank")
    }
  }

  test("removeDuplicateSpans invariants on random corpora") {
    for (seed <- Seq(11L, 23L)) {
      val docs = randomDocs(seed, 120)
      val rows = Dedup.removeDuplicateSpans(docs, "text", "doc_id", n = 3)
        .as[(Long, Long, Long, String)].collect()
      assert(rows.length === 120, "one output row per doc")
      val toksIn = docs.select(col("doc_id"),
        split(col("text"), "\\s+").as("t")).as[(Long, Seq[String])]
        .collect().toMap
      rows.foreach { case (id, nTok, nKept, clean) =>
        assert(nTok === toksIn(id).length.toLong)
        assert(nKept >= 0L && nKept <= nTok, s"doc $id: kept $nKept of $nTok")
        val kept = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
        assert(kept.length.toLong === nKept)
        // surviving tokens are a subsequence of the input tokens
        val it = toksIn(id).iterator
        assert(kept.forall(k => it.contains(k)),
          s"doc $id: output not a subsequence of input")
      }
      // the globally-minimal doc id keeps every shingle (it is the keeper
      // of any duplicated window it contains); short docs (< n tokens)
      // are never touched
      val byId = rows.map(r => r._1 -> r).toMap
      assert(byId(0L)._3 === byId(0L)._2, "min-id doc must be intact")
      rows.filter(_._2 < 3).foreach { r =>
        assert(r._3 === r._2, s"short doc ${r._1} must be untouched")
      }
      // determinism: a second run is byte-identical
      val again = Dedup.removeDuplicateSpans(docs, "text", "doc_id", n = 3)
        .as[(Long, Long, Long, String)].collect()
      assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
    }
  }

  test("shuffleShards: dense per-shard positions, invariant across chunkings") {
    val docs = randomDocs(41L, 700)
    // chunkDiv choices spanning one-chunk-per-shard to many: the chunked
    // prefix must be invisible in the output
    val runs = Seq(1L << 48, 1L << 44, (1L << 44) + 12345L).map { div =>
      Curation.shuffleShards(docs, "doc_id", shards = 8, chunkDiv = div)
        .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    }
    assert(runs(0) === runs(1) && runs(1) === runs(2),
      "shard/pos must not depend on the chunking")
    val rows = runs.head
    assert(rows.map(_._1).distinct.size === 700, "every doc exactly once")
    rows.groupBy(_._2).foreach { case (shard, in) =>
      assert(in.map(_._3).sorted === (1L to in.size.toLong),
        s"shard $shard: positions must be dense 1..n")
    }
    // the permutation is the hkey order: deterministic re-run identical
    val again = Curation.shuffleShards(docs, "doc_id", shards = 8)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    assert(again === rows)
  }

  test("tokenBudgetSelect: budget respected, rank-prefix closed, chunking-invariant") {
    val docs = randomDocs(42L, 600)
    val budget = 1500L
    val runs = Seq(1000000L, 50L, 37L).map { div =>
      Curation.tokenBudgetSelect(docs, "doc_id", "text", "source", budget, chunkDiv = div)
        .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(runs(0) === runs(1) && runs(1) === runs(2),
      "selection must not depend on the chunking")
    val rows = runs.head
    val full = docs
      .withColumn("q", TextAnalysis.qualityMilli(col("text")))
      .withColumn("t", TextAnalysis.tokenCount(col("text")).cast("long"))
      .select("doc_id", "source", "q", "t")
      .as[(Long, String, Long, Long)].collect()
    rows.groupBy(_._2).foreach { case (src, kept) =>
      // inclusive running total in (quality desc, id asc) order stays
      // within budget and reconstructs the reported cum_tokens
      val order = kept.sortBy(r => (-r._3, r._1))
      var cum = 0L
      order.foreach { r =>
        cum += r._4
        assert(r._5 === cum, s"$src doc ${r._1}: cum mismatch")
      }
      assert(cum <= budget, s"$src: budget exceeded ($cum)")
      // prefix-closed: everything ranked better than a kept doc is kept
      val keptIds = kept.map(_._1).toSet
      val bestKept = order.lastOption
      bestKept.foreach { worst =>
        full.filter(f => f._2 == src &&
            (f._3 > worst._3 || (f._3 == worst._3 && f._1 < worst._1)))
          .foreach(f => assert(keptIds.contains(f._1),
            s"$src: better-ranked doc ${f._1} missing from the keep set"))
      }
      // maximal: the next doc in rank order would blow the budget
      val rejected = full.filter(f => f._2 == src && !keptIds.contains(f._1))
      if (rejected.nonEmpty) {
        val next = rejected.sortBy(f => (-f._3, f._1)).head
        assert(cum + next._4 > budget,
          s"$src: doc ${next._1} would still fit (${cum + next._4} <= $budget)")
      }
    }
  }
}

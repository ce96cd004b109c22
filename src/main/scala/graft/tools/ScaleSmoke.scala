package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.operators.CoreOps

/** Scale-up smoke: synthesizes a corpus ~10x sf0.1 (1M events, 50k docs,
  * 20k embeddings) in /tmp and runs the flagship operators, printing
  * per-operator wall time. The point is to observe near-linear scaling of
  * the narrow/keyed-shuffle plans — the local[32] stand-in for "would this
  * hold at 1000 executors".
  *
  * Usage: runMain graft.tools.ScaleSmoke [eventsM] [docsK] [vecsK] [onlyRegex]
  *   onlyRegex: run only operator blocks whose name matches (generation
  *   always runs) — e.g. "span|surprisal|inverted" for the 50x text-op
  *   checkpoint without paying for the whole suite.
  */
object ScaleSmoke {
  /** Full-materialization evaluator (noop sink): `count()` lets Catalyst
    * prune every cardinality-preserving operator (windows, narrow
    * transforms) out of the executed plan — a smoke row timed that way
    * measures the parquet scan, not the operator. */
  private def go(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.write.format("noop").mode("overwrite").save()
  private implicit class Mat(df: org.apache.spark.sql.Dataset[_]) {
    def mat(): Unit = go(df)
  }

  def main(args: Array[String]): Unit = {
    val eventsN = args.headOption.map(_.toInt).getOrElse(1) * 1000000L
    val docsN = args.drop(1).headOption.map(_.toInt).getOrElse(50) * 1000L
    val vecsN = args.drop(2).headOption.map(_.toInt).getOrElse(20) * 1000L
    val onlyRe = args.drop(3).headOption.map(_.r.unanchored)
    val spark = GraftSession.local(32, "scale-smoke")
    import spark.implicits._

    val base = "/tmp/graft_scale"
    def time[T](name: String)(f: => T): Unit = {
      if (name.startsWith("gen ") || onlyRe.forall(_.matches(name))) {
        val t0 = System.nanoTime()
        f
        println(f"[scale] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }

    // --- synthesize (deterministic, seed-free arithmetic) ---------------
    time(s"gen events ($eventsN)") {
      spark.range(eventsN)
        .select(
          col("id").as("event_id"),
          timestamp_micros(lit(1704067200000000L) + col("id") * 2592L).as("ts"),
          pmod(xxhash64(col("id")), lit(15000)).as("user_id"),
          element_at(
            array(lit("click"), lit("view"), lit("purchase"), lit("error"), lit("signup")),
            (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int")).as("event_type"),
          (pmod(xxhash64(col("id"), lit(2)), lit(49000)).cast("double") / 100.0).as("value"))
        .write.mode("overwrite").parquet(s"$base/events")
    }
    time(s"gen docs ($docsN)") {
      val words = array((0 until 64).map(i => lit(s"w$i")): _*)
      spark.range(docsN)
        .select(
          col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(120)),
            i => element_at(words, (pmod(xxhash64(col("id"), i), lit(64)) + 1).cast("int"))))
            .as("text"),
          concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
        .write.mode("overwrite").parquet(s"$base/docs")
    }
    time(s"gen vecs ($vecsN)") {
      spark.range(vecsN)
        .select(
          col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)),
            i => (pmod(xxhash64(col("id"), i), lit(2000)).cast("double") / 1000.0 - 1.0)
              .cast("float")).as("vec"))
        .write.mode("overwrite").parquet(s"$base/vecs")
    }

    val events = spark.read.parquet(s"$base/events")
    val docs = spark.read.parquet(s"$base/docs")
    val vecs = spark.read.parquet(s"$base/vecs")

    // --- operators ------------------------------------------------------
    time("windowed counts (5s)") {
      CoreOps.tumblingCountAll(events, "ts", "5 seconds").mat()
    }
    time("session windows (1h/user)") {
      CoreOps.sessionSummary(events, "user_id", "ts", "1 hour", "value").mat()
    }
    time("keyed running totals") {
      CoreOps.keyedRunningTotal(events, "user_id", "value").mat()
    }
    time("windowed self-join (1d)") {
      val c = events.filter(col("event_type") === "click")
        .select(col("ts"), col("user_id"), col("event_id").as("l"))
      val p = events.filter(col("event_type") === "purchase")
        .select(col("ts"), col("user_id"), col("event_id").as("r"))
      CoreOps.windowedEquiJoin(c, p, "user_id", "ts", "1 day").mat()
    }
    time("scd2 history (event_type)") {
      CoreOps.scd2History(events, "user_id", "ts", "event_id", "event_type").mat()
    }
    time("resample ffill (6h grid)") {
      CoreOps.resampleFfill(events, "user_id", "ts", "value", 21600000000L).mat()
    }
    time("session paths (1h gap)") {
      events.groupBy(col("user_id"),
          org.apache.spark.sql.functions.session_window(col("ts"), "1 hour").as("w"))
        .agg(array_join(transform(array_sort(collect_list(struct(
          unix_micros(col("ts")).as("t"), col("event_id").as("i"),
          col("event_type").as("e")))), x => x.getField("e")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(50).mat()
    }
    time("transition matrix") {
      import org.apache.spark.sql.expressions.Window
      val seq = events.select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))).as("prev_type"))
      seq.filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n")).mat()
    }
    time("text annotate (langid+quality)") {
      docs.select(
        TextAnalysis.langId(col("text")),
        TextAnalysis.qualityMilli(col("text"))).mat()
    }
    time("hashed shingles") {
      Dedup.withHashedShingles(docs, "text", 3, "sh").select(size(col("sh"))).mat()
    }
    time("minhash LSH pairs") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 4, 4, 600).mat()
    }
    time("jaccard prefix pairs (t=.5)") {
      // the 64-word uniform corpus is prefix filtering's WORST case:
      // every trigram is common, df-ordering has no skew to exploit
      Dedup.jaccardPrefixPairs(docs, "text", "doc_id", 3, 500).mat()
    }
    time(s"gen zipf docs ($docsN)") {
      // Zipf(1) word choice (word = R^u for uniform u): the realistic
      // text shape — vocab scales with the corpus, docs carry genuinely
      // rare words, so df-ordered prefixes rarely collide
      val r = lit(docsN.toDouble)
      spark.range(docsN).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(120)),
          i => concat(lit("z"),
            floor(pow(r, pmod(xxhash64(col("id"), i), lit(1000000))
              .cast("double") / 1000000.0)).cast("long").cast("string")))).as("text"))
        .write.mode("overwrite").parquet(s"$base/zipfdocs")
    }
    time("jaccard prefix zipf (t=.5)") {
      Dedup.jaccardPrefixPairs(spark.read.parquet(s"$base/zipfdocs"),
        "text", "doc_id", 3, 500).mat()
    }
    time("simhash fingerprints") {
      docs.withColumn("hs", Dedup.tokenHashes60(col("text")))
        .select(Dedup.simhash60FromHashes(col("hs"))).mat()
    }
    time("brute topk (100 queries)") {
      val q = vecs.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      Similarity.bruteForceTopK(q, vecs, 5).mat()
    }
    time("ivf topk (100 queries)") {
      val q = vecs.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      Similarity.ivfTopK(q, vecs, 5, centroidEvery = 200, nprobe = 3).mat()
    }
    time("contamination (1/1000 bench)") {
      graft.functions.Curation.contaminationPairs(docs, "text", "doc_id",
        isBench = pmod(col("doc_id"), lit(1000)) === 0,
        n = 3, maxShingleDf = 50, minContainMilli = 100).mat()
    }
    time("stratified sample") {
      graft.functions.Curation.stratifiedSample(docs, "doc_id", "source",
        Map("src0" -> 50, "src1" -> 200), 500).mat()
    }
    time("sequence packing (4096)") {
      graft.functions.Curation.packSequences(docs, "doc_id", "source", "text", 4096).mat()
    }
    time("dup clusters (CC over LSH pairs)") {
      graft.functions.Curation.connectedComponents(
        Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 4, 4, 600), "a", "b").mat()
    }
    time("pack dedup-aware (4096)") {
      graft.functions.Curation.packSequencesDedupAware(
        docs, "doc_id", "source", "text", 4096,
        graft.functions.Curation.connectedComponents(
          Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 4, 4, 600), "a", "b")).mat()
    }
    time("shards dedup-aware (64)") {
      graft.functions.Curation.shuffleShardsDedupAware(
        docs, "doc_id", shards = 64,
        graft.functions.Curation.connectedComponents(
          Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 4, 4, 600), "a", "b"),
        chunkDiv = 1L << 40).mat()
    }
    time("pagerank (5 iters, deg~40)") {
      // synthetic graph scaling with the corpus: docsN nodes, ~20*docsN
      // directed pairs symmetrized (degree ~40) — edge count dominates,
      // node frames stay broadcast-sized, the shape pageRank prices
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      graft.functions.Graph.pageRank(sym, "src", "dst", 5).mat()
    }
    time("personalized pagerank (4 iters)") {
      // same deg~40 synthetic graph as the pagerank row; seed-sparse rank
      // frames stay tiny early and bounded by reached-nodes later
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      graft.functions.Graph.personalizedPageRank(
        sym, "src", "dst", seeds = Seq(1L, 2L, 3L, 4L, 5L), iterations = 4).mat()
    }
    time("triangle counts (deg~40)") {
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      graft.functions.Graph.triangleCounts(sym, "src", "dst").mat()
    }
    time("triangle counts adj (deg~40)") {
      // the r11 adjacency-intersection plan on the same graph, half-edge
      // input (each {u,v} once) — the shipped graph_triangles shape
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val half = edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst")).distinct()
      graft.functions.Graph.triangleCountsAdj(half).mat()
    }
    time("walks (4 steps, 1/40 seeds)") {
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val seeds = sym.select(col("src").as("node")).distinct()
        .filter(pmod(col("node"), lit(40)) === 0)
      graft.functions.Graph.deterministicWalks(sym, "src", "dst", seeds, steps = 4).mat()
    }
    // pair step timed ALONE over pre-built (checkpointed) walks: its plan
    // never touches the edge list, so cost is walks x steps x 2w — the
    // edge count enters only the untimed walk build above
    if (onlyRe.forall(_.matches("walk pairs (w=2, pair step only)"))) {
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val seeds = sym.select(col("src").as("node")).distinct()
        .filter(pmod(col("node"), lit(40)) === 0)
      val walks = graft.functions.Graph.deterministicWalks(
        sym, "src", "dst", seeds, steps = 4).localCheckpoint()
      time("walk pairs (w=2, pair step only)") {
        graft.functions.Graph.skipGramPairs(walks, window = 2).mat()
      }
      graft.functions.Checkpoints.unpersist(walks)
    }
    // negatives step timed ALONE over pre-built walks: like the pair
    // step, the plan never touches the edge list — cost is pairs x k
    // draws + the vocab-sized noise table, flat in |E|
    if (onlyRe.forall(_.matches("walk negatives (k=3, step only)"))) {
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val seeds = sym.select(col("src").as("node")).distinct()
        .filter(pmod(col("node"), lit(40)) === 0)
      val walks = graft.functions.Graph.deterministicWalks(
        sym, "src", "dst", seeds, steps = 4).localCheckpoint()
      time("walk negatives (k=3, step only)") {
        graft.functions.Graph.sgnsNegatives(walks, window = 2, negatives = 3).mat()
      }
      graft.functions.Checkpoints.unpersist(walks)
    }
    time("biased walks (4 steps, 1/40 seeds)") {
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val seeds = sym.select(col("src").as("node")).distinct()
        .filter(pmod(col("node"), lit(40)) === 0)
      graft.functions.Graph.node2vecWalks(sym, "src", "dst", seeds, steps = 4,
        retPermille = 100, inPermille = 1000, outPermille = 2500).mat()
    }
    time("weighted pagerank (5 rounds)") {
      // hash-derived weights 1..5 on the same deg~40 graph
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst")))
        .groupBy(col("src"), col("dst"))
        .agg((pmod(xxhash64(col("src"), col("dst")), lit(5)) + 1).as("w"))
      graft.functions.Graph.pageRankWeighted(sym, "src", "dst", "w",
        iterations = 5).mat()
    }
    time("hits (3 rounds, deg~40)") {
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      graft.functions.Graph.hits(sym, "src", "dst", iterations = 3).mat()
    }
    time("kcore peel (k=30, deg~40)") {
      // incremental peeling on the same deg~40 graph, half-edge input:
      // one degree aggregate + per-round dead-frontier subtraction —
      // rounds after the first touch only edges at dying nodes
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val half = edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst")).distinct()
      graft.functions.Graph.kCoreHalf(half, k = 30, rounds = 5).mat()
    }
    time("link prediction (cap 16)") {
      // capped common-neighbor Adamic-Adar: wedge volume bounded by
      // degCap * |E| regardless of hubs — the load-bearing cap. The cap
      // must sit BELOW the typical degree (the gate query's 64 vs median
      // 115): at cap >= typical degree every node pivots and the plan
      // degenerates to the full sum-of-deg^2 wedge sweep (measured 57 s
      // at cap 48 on this deg~40 graph — the documented saturation)
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      graft.functions.Graph.commonNeighborLinks(sym, "src", "dst",
        degCap = 16, topK = 100).mat()
    }
    time("bfs hops (3 from 5 seeds)") {
      val edges = spark.range(docsN * 20)
        .select((col("id") % docsN).as("src"),
          pmod(xxhash64(col("id")), lit(docsN)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      graft.functions.Graph.bfsHops(sym, "src", "dst",
        seeds = Seq(1L, 2L, 3L, 4L, 5L), maxHops = 3).mat()
    }
    time("semantic pack (kmeans cells)") {
      // cell assignment (bounded corpus x centroids broadcast) + one
      // cell-partitioned pack window over the joined doc/vec subset.
      // Cell COUNT is pinned (~100) rather than corpus-proportional:
      // with a fixed centroidEvery the assignment cost grows as
      // corpus x centroids = corpus^2/centroidEvery (measured 7 -> 43 s
      // for 5x vecs at fixed 200) — at cluster scale the centroid count
      // is a capacity parameter, exactly the IVF index-build stance
      val corpus = vecs.select(col("vec_id"), col("vec"))
      val cent = Similarity.kmeansCentroids(corpus,
        centroidEvery = (vecsN / 100).toInt.max(1), iters = 1)
      val cells = Similarity.semanticCells(corpus, cent)
      graft.functions.Curation.packSequences(
        docs.join(cells.withColumnRenamed("vec_id", "doc_id"), "doc_id"),
        "doc_id", "cid", "text", 4096).mat()
    }
    time("table profile (events, 5 cols)") {
      graft.functions.Profiling.tableProfile(events, Seq(
        "event_id" -> "long", "user_id" -> "long",
        "event_type" -> "string", "value" -> "double_centi",
        "ts" -> "ts_us")).mat()
    }
    time("embedding drift (64 dims)") {
      graft.functions.Profiling.embeddingDrift(
        vecs.withColumnRenamed("vec", "embedding"), "embedding",
        col("vec_id") % 2 === 0).mat()
    }
    time("snapshot diff") {
      graft.functions.Profiling.snapshotDiff(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 17 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, upper(col("text")))
              .otherwise(col("text"))),
        "doc_id", "text", "source").mat()
    }
    time("funnel steps (3-step)") {
      CoreOps.funnelSteps(
        events.filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"), col("event_id")),
        Seq("view", "click", "purchase")).mat()
    }
    time("contrastive pairs (8 shards)") {
      graft.functions.Curation.contrastivePairs(
        Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 4, 4, 600),
        "a", "b", shards = 8).mat()
    }
    time("eval leakage report") {
      graft.functions.Curation.evalLeakageReport(docs, "text", "doc_id",
        isBench = pmod(col("doc_id"), lit(1000)) === 0,
        n = 3, maxShingleDf = 50, minContainMilli = 100).mat()
    }
    time("quality quantile norm") {
      graft.functions.Curation.quantileNormalizeQuality(
        docs, "text", "doc_id", "source").mat()
    }
    time("key skew report") {
      val counts = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("__t"))))
        .select(col("user_id"), col("n"), expr("n * 1000 div __t").as("permille"))
        .orderBy(col("n").desc, col("user_id")).limit(20).mat()
    }
    time("mutual knn + communities") {
      val probes = vecs.select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val corpus = vecs.select(col("vec_id"), col("vec"))
      val nn = Similarity.ivfTopK(probes, corpus, k = 5, centroidEvery = 200,
        nprobe = 3).select(col("qid"), col("vec_id"), col("rank"))
      val mutual = nn.join(
          nn.select(col("vec_id").as("qid"), col("qid").as("vec_id")),
          Seq("qid", "vec_id"))
        .filter(col("qid") < col("vec_id"))
        .select(col("qid").as("a"), col("vec_id").as("b"))
      graft.functions.Graph.communityLabels(mutual, "a", "b", rounds = 2).mat()
    }
    time("label propagation (ivf knn)") {
      val probes = vecs.select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val corpus = vecs.select(col("vec_id"), col("vec"))
      graft.functions.Graph.labelPropagation(
        Similarity.ivfTopK(probes, corpus, k = 5, centroidEvery = 200, nprobe = 3),
        vecs.filter(col("vec_id") % 5 === 0)
          .select(col("vec_id").as("node"), (col("vec_id") % 7).as("label")),
        rounds = 2).mat()
    }
    // the production index posture for full-corpus probes: centroid count
    // ~ sqrt(n) balances the n x k assignment term against the
    // n x nprobe x (n/k) probe term (both n^1.5) — vs fixed cellsize
    // (centroidEvery const), whose assignment term is n^2/centroidEvery
    time("label propagation (sqrt centroids)") {
      val ce = math.max(200L, math.round(math.sqrt(vecsN.toDouble)))
      val probes = vecs.select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val corpus = vecs.select(col("vec_id"), col("vec"))
      graft.functions.Graph.labelPropagation(
        Similarity.ivfTopK(probes, corpus, k = 5, centroidEvery = ce.toInt,
          nprobe = 3),
        vecs.filter(col("vec_id") % 5 === 0)
          .select(col("vec_id").as("node"), (col("vec_id") % 7).as("label")),
        rounds = 2).mat()
    }
    time("keyword extraction (top-3)") {
      graft.functions.Curation.keywordScores(docs, "text", "doc_id", 3).mat()
    }
    time("pii scrub") {
      graft.functions.Curation.piiScrub(docs, "text")
        .select(col("n_emails") + col("n_urls") + col("n_ids")).mat()
    }
    time("repetition stats") {
      graft.functions.Curation.repetitionStats(docs, "text", "doc_id").mat()
    }
    time("token-budget mixture sample") {
      graft.functions.Curation.tokenBudgetSample(docs, "doc_id", "source", "text",
        Map("src0" -> 100000L), 50000L).mat()
    }
    // budget scaled to keep ~half of each 120-token-doc stratum; chunkDiv
    // sized for ~50 chunks per (source, quality) cell at the 10x point
    time("token-budget select (by quality)") {
      graft.functions.Curation.tokenBudgetSelect(docs, "doc_id", "text", "source",
        budgetTokens = docsN * 3L, chunkDiv = math.max(docsN / 1000L, 1L)).mat()
    }
    time("shard shuffle (64 shards)") {
      graft.functions.Curation.shuffleShards(docs, "doc_id", shards = 64,
        chunkDiv = 1L << 40).mat()
    }
    // NB scoring cost is classes x corpus by design: 5 classes is the
    // langid shape, 20 classes the heaviest legitimate (domain routing)
    time("nb classify (5 classes)") {
      TextAnalysis.nbClassify(
        docs.withColumn("lang5", concat(lit("l"), pmod(col("doc_id"), lit(5)))),
        "text", "doc_id", "lang5").mat()
    }
    time("nb classify (20 classes)") {
      TextAnalysis.nbClassify(docs, "text", "doc_id", "source").mat()
    }
    time("dsir weights") {
      graft.functions.Curation.dsirWeights(docs, "text", "doc_id",
        col("source") === "src0").mat()
    }
    time("gopher rules") {
      graft.functions.Curation.gopherRules(docs, "text", "doc_id").mat()
    }
    time("ccnet buckets") {
      graft.functions.Curation.ccnetBuckets(docs, "text", "doc_id", "source")
        .mat()
    }
    time("temperature mixture (a=1/2)") {
      graft.functions.Curation.temperatureMixtureSample(docs, "doc_id",
        "source", "text", budgetTokens = 100000L).mat()
    }
    time("cross-source dup matrix") {
      graft.functions.Dedup.crossSourceDupMatrix(docs, "text", "doc_id",
        "source", n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 500)
        .mat()
    }
    time("full curation DAG (keep+split)") {
      graft.functions.Curation.curationKeep(docs, "text", "doc_id",
        isBench = pmod(col("doc_id"), lit(1000)) === 0)
        .groupBy(col("split")).agg(count(lit(1))).collect()
    }
    time("asof join (direct window)") {
      val clicks = events.filter(col("event_type") === "click")
        .select(col("ts"), col("user_id"), col("event_id").as("click_id"))
      val purchases = events.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      CoreOps.asofJoin(clicks, purchases, "user_id", "ts").mat()
    }
    time("asof join (chunked 6h)") {
      val clicks = events.filter(col("event_type") === "click")
        .select(col("ts"), col("user_id"), col("event_id").as("click_id"))
      val purchases = events.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      CoreOps.asofJoinChunked(clicks, purchases, "user_id", "ts",
        bucketUs = 21600000000L).mat()
    }
    time("rolling range features (1h)") {
      CoreOps.rollingRangeStats(events, "user_id", "ts", "value",
        rangeUs = 3600000000L).mat()
    }
    time("edit-distance pairs (blocked)") {
      Dedup.editDistancePairs(docs, "text", "doc_id",
        prefixLen = 48, maxDist = 2, maxBlockDf = 200).mat()
    }
    time("funnel next-purchase (chunked)") {
      val ev = events
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      CoreOps.funnelNextPurchaseChunked(ev, bucketUs = 86400000000L).mat()
    }
    time("int8 quantize + fingerprint") {
      val q = Similarity.quantizeInt8(col("vec"))
      vecs.select(md5(concat_ws(",",
        transform(q.getField("q"), c => c.cast("string"))))).mat()
    }
    time("containment pairs (df-capped)") {
      Dedup.containmentPairs(docs, "text", "doc_id",
        n = 3, minContainMilli = 300, maxShingleDf = 50).mat()
    }
    time("keep-best dup resolution") {
      val clusters = graft.functions.Curation.connectedComponents(
        Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 4, 4, 500),
        "a", "b").withColumnRenamed("node", "doc_id")
      val q = docs.select(col("doc_id"),
        TextAnalysis.qualityMilli(col("text")).as("quality_milli"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("quality_milli").desc, col("doc_id").asc)
      q.join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1).mat()
    }
    time("dataset card (per source)") {
      docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
        countDistinct(md5(col("text"))).as("n_uniq_texts"),
        sum(TextAnalysis.qualityMilli(col("text"))).as("sum_quality_milli"))
        .mat()
    }
    time("knn label agreement (50 probes)") {
      val probes = vecs.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val corpus = vecs.select(col("vec_id"), col("vec"))
      val labels = vecs.select(col("vec_id"),
        pmod(col("vec_id"), lit(7)).as("label"))
      val votes = Similarity.bruteForceTopK(probes, corpus, 5)
        .join(labels, "vec_id")
        .groupBy(col("qid"), col("label"))
        .agg(count(lit(1)).as("n_votes"), min(col("rank")).as("best_rank"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
        .orderBy(col("n_votes").desc, col("best_rank").asc, col("label").asc)
      votes.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1).mat()
    }
    // The full-corpus mislabel sweep: probes = EVERY vector. Brute would
    // be O(n^2) dot products here; the IVF core prices it at
    // n x nprobe x cellsize = n x 3 x centroidEvery — linear in the
    // corpus for a fixed index shape. The labeled frame feeds the shared
    // knnLabelVote, whose own cost is probes x k rows regardless of core.
    time("knn sweep IVF (full corpus)") {
      val probes = vecs.select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val corpus = vecs.select(col("vec_id"), col("vec"))
      val labeled = vecs.select(col("vec_id"), col("vec").as("embedding"),
        pmod(col("vec_id"), lit(7)).as("label"))
      graft.functions.LlmQueries.knnLabelVote(
        Similarity.ivfTopK(probes, corpus, 5, centroidEvery = 200, nprobe = 3),
        labeled).mat()
    }
    time("span dup profile (3-gram)") {
      Dedup.duplicateShingleProfile(docs, "text", "doc_id", 3).mat()
    }
    time("span dup removal (3-gram)") {
      Dedup.removeDuplicateSpans(docs, "text", "doc_id", 3)
        .agg(sum(col("n_kept"))).collect()
    }
    time("LM surprisal score") {
      TextAnalysis.lmSurprisalScore(docs, "text", "doc_id").mat()
    }
    time("contamination bloom (1/1000)") {
      graft.functions.Curation.contaminationPairsBloom(docs, "text", "doc_id",
        isBench = pmod(col("doc_id"), lit(1000)) === 0,
        n = 3, maxShingleDf = 50, minContainMilli = 100).mat()
    }
    time("semdedup (kmeans cells)") {
      val corpus = vecs.select(col("vec_id"), col("vec"))
      val cent = Similarity.kmeansCentroids(corpus, centroidEvery = 200, iters = 1)
      Similarity.semDedupKeep(corpus, cent, minScoreQ4 = 9000L)
        .filter(col("keep") === 0).mat()
    }
    time("diversity sample (kmeans cells)") {
      val corpus = vecs.select(col("vec_id"), col("vec"))
      val cent = Similarity.kmeansCentroids(corpus, centroidEvery = 200, iters = 1)
      Similarity.diversitySample(corpus, cent, keepPermille = 500).mat()
    }
    time("token-window chunking (32/8)") {
      graft.functions.Curation.chunkTokenWindows(docs, "text", "doc_id",
        window = 32, stride = 8).mat()
    }
    time("random projection (64->8)") {
      vecs.select(col("vec_id") +:
        Similarity.randomProjectionQ4(col("vec"), inDim = 64, outDim = 8): _*).mat()
    }
    time("minhash estimated pairs") {
      Dedup.minhashEstimatedPairs(docs, "text", "doc_id", 3, 4, 4, 600).mat()
    }
    time("int8 topk (100 queries)") {
      val q = vecs.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      Similarity.int8TopK(q, vecs, 5).mat()
    }
    time("pq encode (m=8)") {
      Similarity.pqEncode(vecs.select(col("vec_id"), col("vec")),
        centroidEvery = 200, m = 8, dim = 64).mat()
    }
    time("adc topk over pq (100 queries)") {
      val q = vecs.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      Similarity.adcTopK(q, vecs.select(col("vec_id"), col("vec")),
        k = 5, centroidEvery = 200, m = 8, dim = 64).mat()
    }
    time("ivf+pq topk (100 queries)") {
      val q = vecs.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      Similarity.ivfPqTopK(q, vecs.select(col("vec_id"), col("vec")),
        k = 5, centroidEvery = 200, nprobe = 3, m = 8, dim = 64).mat()
    }
    time("inverted index build") {
      TextAnalysis.writeInvertedIndex(docs, "text", "doc_id",
        s"$base/invidx", buckets = 64)
    }
    time("bm25 from index (2 terms)") {
      TextAnalysis.bm25SearchFromIndex(spark, s"$base/invidx",
        Seq("w1", "w2"), topK = 50).mat()
    }
    time("collocations PMI") {
      TextAnalysis.collocationsPmi(docs, "text", "doc_id",
        minCount = 5L, topK = 50).mat()
    }
    time("bpe train (6 merges)") {
      TextAnalysis.bpeTrain(docs, "text", merges = 6).mat()
    }
    time("lsh index build") {
      Dedup.writeLshIndex(docs, "text", "doc_id", s"$base/lshidx",
        n = 3, bands = 4, rowsPerBand = 4)
    }
    time("incremental neardup (500-doc batch)") {
      Dedup.nearDupsAgainstIndex(spark,
        docs.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text")),
        "text", "doc_id", s"$base/lshidx",
        n = 3, bands = 4, rowsPerBand = 4, minJaccardMilli = 600).mat()
    }
    time("weekly HLL sketch rollup") {
      val daily = events
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
        .select(col("w.start").as("day"), col("sk"))
      daily.groupBy(window(col("day"), "7 days").as("w"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau")).mat()
    }
    spark.stop()
  }
}

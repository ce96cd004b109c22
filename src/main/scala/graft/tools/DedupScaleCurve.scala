package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{Curation, Dedup, Similarity}

/** Candidate-volume scaling curve for the bucketed dedup family — the
  * evidence behind the "dedup at 100 TB is bucketed, not all-pairs"
  * claim. For a geometric series of corpus sizes up to ~100x the sf0.1
  * test corpus, measures the CANDIDATE pair count (threshold opened to
  * minimum, i.e. every bucket collision) and the verified pair count for:
  *
  *  - `Dedup.minhashLshPairs`  — band key = md5 of 4 minhash values: a
  *    huge key space, so random collisions are negligible and candidate
  *    volume tracks the planted duplicates (near-linear by construction);
  *  - `Similarity.signLshNearDupPairs` — band key = `rowsPerBand` sign
  *    bits. Random pairs collide with prob 2^-rowsPerBand per band, so
  *    bits per band MUST scale as ~log2(n) to keep expected random
  *    collisions O(n): this tool sets rowsPerBand = ceil(log2 n) and the
  *    curve demonstrates the resulting near-linear candidate volume (the
  *    4-bit default of the sf0.01 oracle query is a small-corpus setting);
  *  - `Curation.contaminationPairs` — df-capped shingle join, fan-out
  *    bounded by maxShingleDf^2 per shingle.
  *
  * Corpora are deterministic; ~2% of items are planted exact duplicates
  * of their predecessor so recall has something to find. Results are
  * recorded in SCALING.md.
  *
  * Usage: runMain graft.tools.DedupScaleCurve [docSizesK] [vecSizesK]
  *   e.g. runMain graft.tools.DedupScaleCurve 50,150,500 250,1000,2000
  */
object DedupScaleCurve {
  def main(args: Array[String]): Unit = {
    val docSizes = args.headOption.getOrElse("50,150,500")
      .split(",").map(_.trim.toLong * 1000L).toSeq
    val vecSizes = args.drop(1).headOption.getOrElse("250,1000,2000")
      .split(",").map(_.trim.toLong * 1000L).toSeq
    val spark = GraftSession.local(32, "dedup-scale-curve")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ~2% planted exact duplicates: id % 50 == 0 reuses the previous id's
    // content, everything else is unique pseudo-random text/vectors.
    def docs(n: Long) = {
      val words = array((0 until 4096).map(i => lit(s"w$i")): _*)
      spark.range(n)
        .withColumn("cid",
          when(pmod(col("id"), lit(50)) === 0 && col("id") > 0, col("id") - 1)
            .otherwise(col("id")))
        .select(
          col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(80)),
            i => element_at(words, (pmod(xxhash64(col("cid"), i), lit(4096)) + 1).cast("int"))))
            .as("text"))
    }
    def vecs(n: Long) =
      spark.range(n)
        .withColumn("cid",
          when(pmod(col("id"), lit(50)) === 0 && col("id") > 0, col("id") - 1)
            .otherwise(col("id")))
        .select(
          col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)),
            i => (pmod(xxhash64(col("cid"), i), lit(2000)).cast("double") / 1000.0 - 1.0)
              .cast("float")).as("vec"))

    println("op,n,candidates,verified,cand_per_item,secs_cand,secs_verified")
    def report(op: String, n: Long, cand: Long, sc: Double, ver: Long, sv: Double): Unit =
      println(f"$op,$n,$cand,$ver,${cand.toDouble / n}%.3f,$sc%.1f,$sv%.1f")

    // materialize each corpus as parquet and read it back (like a real
    // lake read): in-memory plan nodes carry no size statistics, which
    // makes the planner broadcast unboundedly large sides; parquet
    // relations give Catalyst real stats to plan against.
    val base = "/tmp/graft_curve"
    def materialize(df: org.apache.spark.sql.DataFrame, path: String) = {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    docSizes.foreach { n =>
      val d = materialize(docs(n), s"$base/docs_$n")
      val (cand, sc) = time(
        Dedup.minhashLshPairs(d, "text", "doc_id", 3, 4, 4, minJaccardMilli = 0).count())
      val (ver, sv) = time(
        Dedup.minhashLshPairs(d, "text", "doc_id", 3, 4, 4, minJaccardMilli = 900).count())
      report("minhash_lsh", n, cand, sc, ver, sv)

      val (ccand, csc) = time(
        Curation.contaminationPairs(d, "text", "doc_id",
          isBench = pmod(col("doc_id"), lit(1000)) === 0,
          n = 3, maxShingleDf = 50, minContainMilli = 0).count())
      val (cver, csv) = time(
        Curation.contaminationPairs(d, "text", "doc_id",
          isBench = pmod(col("doc_id"), lit(1000)) === 0,
          n = 3, maxShingleDf = 50, minContainMilli = 500).count())
      report("contamination", n, ccand, csc, cver, csv)

      // SimHash, whole corpus as ONE block (the adversarial setting —
      // blocking only bounds the quadratic, it doesn't fix it).
      // 60-bit banding (halves=1): ~5.5-bit bands collide at random, so
      // candidates grow ~n^2/4 — measured only up to 50k docs because the
      // trap is the point. The width-scaled form (simhashHalvesFor) keeps
      // band space >= 32n and stays planted-dup-dominated.
      val db = d.withColumn("blk", lit(0L))
      if (n <= 50000) {
        val (scand, ssc) = time(
          Dedup.simhashPairsWide(db, "text", "doc_id", "blk", maxHamming = 10,
            halves = 1, verifyMaxHamming = 60).count())
        val (sver, ssv) = time(
          Dedup.simhashPairsWide(db, "text", "doc_id", "blk", maxHamming = 10,
            halves = 1).count())
        report("simhash60", n, scand, ssc, sver, ssv)
      }
      val h = Dedup.simhashHalvesFor(n)
      val (wcand, wsc) = time(
        Dedup.simhashPairsWide(db, "text", "doc_id", "blk", maxHamming = 10,
          halves = h, verifyMaxHamming = 60 * h).count())
      val (wver, wsv) = time(
        Dedup.simhashPairsWide(db, "text", "doc_id", "blk", maxHamming = 10,
          halves = h).count())
      report(s"simhash_wide(h=$h)", n, wcand, wsc, wver, wsv)

      // Connected components over the verified LSH pairs — the
      // dedup_keep_list tail: label propagation + pointer jumping.
      // Planted dups are predecessor pairs (2-cliques, the dominant
      // real near-dup topology; the 60-node-chain spec pins the
      // pathological-diameter bound at ~3+log2 d). Columns here:
      // candidates=nodes, verified=clusters, secs_cand=full CC time.
      val rounds = new java.util.concurrent.atomic.AtomicInteger(0)
      var labels: org.apache.spark.sql.DataFrame = null
      val (ccNodes, ccSec) = time {
        // the eager checkpoint materializes CC inside the timed block;
        // the cluster count below then reads the cached labels
        labels = Curation.connectedComponents(
          Dedup.minhashLshPairs(d, "text", "doc_id", 3, 4, 4,
            minJaccardMilli = 500),
          "a", "b", roundsOut = Some(rounds)).localCheckpoint()
        labels.count()
      }
      val clusters = labels.select("cluster_id").distinct().count()
      report(s"cc_label_prop(rounds=${rounds.get})", n, ccNodes, ccSec, clusters, 0.0)
    }

    vecSizes.foreach { n =>
      val v = materialize(vecs(n), s"$base/vecs_$n")
      val bits = math.ceil(math.log(n.toDouble) / math.log(2)).toInt
      val (cand, sc) = time(
        Similarity.signLshNearDupPairs(v, minScoreQ4 = -10001L, dim = 64,
          bands = 8, rowsPerBand = bits).count())
      val (ver, sv) = time(
        Similarity.signLshNearDupPairs(v, minScoreQ4 = 9900L, dim = 64,
          bands = 8, rowsPerBand = bits).count())
      report(s"sign_lsh(r=$bits)", n, cand, sc, ver, sv)
    }
    spark.stop()
  }
}

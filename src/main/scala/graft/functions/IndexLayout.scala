package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Shared layout rules for the materialized index families (LSH band
  * buckets, IVF+PQ cells): every write — the base build and each append —
  * lands under a `batch=<id>` partition directory, and an append with a
  * known batch id is a DYNAMIC PARTITION OVERWRITE of exactly its own
  * `batch=<id>` partitions rather than a blind parquet append.
  *
  * That one layout rule is what makes streaming index maintenance
  * idempotent under foreachBatch's at-least-once contract: a replayed
  * micro-batch re-derives the same rows (the derivation is deterministic
  * — frozen codebooks / hash band keys — and the source replays the same
  * data for the same batch id) and REPLACES the partitions its failed
  * attempt may have half-written, so retries cannot duplicate index rows.
  * The pruning key (bucket / cell) stays the OUTER partition column, so
  * probe-time partition pruning is unchanged.
  *
  * An index should be maintained either by one streaming query (whose
  * checkpointed batch ids are unique and monotone) or by SERIAL ad-hoc
  * batch appends. Default batch-id allocation (max-existing + 1) is a
  * non-atomic filesystem read-modify-write: TWO CONCURRENT appends with
  * `batchId = None` can pick the same id, and the later dynamic
  * overwrite silently replaces the earlier one's rows. Concurrent
  * backfills must pass EXPLICIT, distinct batch ids; interleaving a
  * stream with ad-hoc appends has the same hazard.
  */
private[graft] object IndexLayout {

  /** Batch id of the base (non-incremental) build. */
  val BaseBatch = -1L

  /** Largest `batch=<id>` value present under `root` (searched at depth 1
    * and 2, covering both `batch=N` and `<prune>=K/batch=N` layouts), or
    * [[BaseBatch]] when only the base build exists. Driver-side FS
    * listing, bounded by the number of partition directories.
    */
  def maxBatchId(spark: SparkSession, root: String): Long = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return BaseBatch
    val found = Seq("batch=*", "*/batch=*").flatMap { pat =>
      fs.globStatus(new Path(p, pat)) match {
        case null => Nil
        case sts => sts.toSeq.map(_.getPath.getName.stripPrefix("batch="))
      }
    }
    found.flatMap(s => scala.util.Try(s.toLong).toOption)
      .foldLeft(BaseBatch)(math.max)
  }

  /** Whether `root` holds any `batch=<id>` partition directories (depth
    * 1 or 2). A layout WITHOUT them predates the batch convention: an
    * append into it would write `bucket=K/batch=N` next to flat
    * `bucket=K` files — a mixed-depth partition tree Spark's discovery
    * rejects ("Conflicting directory structures"), bricking every
    * subsequent read of the index. Appenders fail fast on false.
    */
  def hasBatchDirs(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && Seq("batch=*", "*/batch=*").exists { pat =>
      Option(fs.globStatus(new Path(p, pat))).exists(_.nonEmpty)
    }
  }

  /** Persist the index's SHAPE PARAMETERS (band counts, bucket counts,
    * codebook dims ...) as a 1-row table under `<root>/params`, making
    * the layout self-describing: a reader or appender called with
    * DIFFERENT parameters would silently prune the wrong partitions /
    * bucket band keys differently and return wrong results with no
    * error — [[requireParams]] turns that into a loud failure at open
    * time (the `writeBm25Index` stats-table convention, generalized).
    */
  def writeParams(spark: SparkSession, root: String, params: Map[String, Long]): Unit = {
    import spark.implicits._
    params.toSeq.sortBy(_._1).toDF("param", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/params")
  }

  /** Fail loudly if `<root>/params` exists and disagrees with `expected`.
    * A layout without a params table (pre-convention build) is accepted
    * as-is — the caller's arguments are then the only source of truth.
    */
  def requireParams(spark: SparkSession, root: String, expected: Map[String, Long]): Unit = {
    val p = new Path(s"$root/params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val stored = spark.read.parquet(s"$root/params")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val diff = expected.filter { case (k, v) => stored.get(k).exists(_ != v) }
      val built = diff.keys.map(k => k -> stored(k)).toMap
      require(diff.isEmpty,
        s"index at $root was built with $built, " +
          s"but caller passed $diff — results would be silently wrong")
    }
  }

  /** One stored shape parameter from `<root>/params`, when present. */
  def readParam(spark: SparkSession, root: String, key: String): Option[Long] = {
    val p = new Path(s"$root/params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(p.toString)
      .collect().collectFirst {
        case r if r.getString(0) == key => r.getLong(1)
      }
  }

  /** Largest batch id CONSUMED by a compaction under `markerRoot`
    * (`compacted/through=<id>` dirs; [[Long.MinValue]]-free None when
    * never compacted). Appenders refuse ids at or below it: a replayed
    * pre-compaction micro-batch would re-write `batch=<id>` partitions
    * whose rows already live in the compacted batch — silent
    * duplication. Multiple markers (a crashed marker rotation) resolve
    * to the max — the conservative bound.
    */
  def compactedThrough(spark: SparkSession, markerRoot: String): Option[Long] = {
    val fs = new Path(markerRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(new Path(s"$markerRoot/through=*")))
      .map(_.toSeq.flatMap(s =>
        scala.util.Try(s.getPath.getName.stripPrefix("through=").toLong).toOption))
      .filter(_.nonEmpty).map(_.max)
  }

  /** Record `through` as the compaction bound (rotate: write the new
    * marker BEFORE removing older ones, so the guard never lapses).
    */
  private[graft] def writeCompactedThrough(
      spark: SparkSession, markerRoot: String, through: Long): Unit = {
    val fs = new Path(markerRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$markerRoot/through=$through"))
    Option(fs.globStatus(new Path(s"$markerRoot/through=*"))).foreach(_.foreach { s =>
      val v = scala.util.Try(
        s.getPath.getName.stripPrefix("through=").toLong).toOption
      if (v.exists(_ != through)) { fs.delete(s.getPath, true); () }
    })
  }

  /** Collapse a batch-partitioned index table's `batch=*` tree into ONE
    * batch (`toBatch`) via a STAGED SWAP — the lifecycle operator the
    * idempotent-append layout needs at 100 TB: a year of micro-batches
    * is thousands of `batch=` dirs per bucket/cell, and partition
    * discovery + open cost grow with every one. `keep` filters the rows
    * that survive (e.g. committed batches only — a crashed append's
    * orphans are reclaimed here); `repartitionCols`/`targetFiles` shape
    * the output (one file per prune partition is the usual goal).
    *
    * STOP-THE-WORLD: quiesce appenders/searchers for the swap window.
    * Crash safety is a deterministic RESUME, not atomicity: the merged
    * table is fully staged (with `_SUCCESS`) BEFORE the live dir is
    * touched; a crash between the delete and the rename leaves the
    * staging complete and the live dir absent, which the next call (or
    * [[resumeCompaction]]) detects and finishes with the rename alone.
    * A stale staging from a crash BEFORE the swap is rebuilt wholesale.
    */
  private[graft] def compactTable(
      spark: SparkSession,
      tableDir: String,
      partCols: Seq[String],
      toBatch: Long,
      keep: DataFrame => DataFrame,
      repartitionCols: Seq[String],
      targetFiles: Int): Unit = {
    require(partCols.lastOption.contains("batch"),
      "compactTable expects a batch-terminated partition layout")
    // a resumed swap IS the completed compaction — unlike the rebuilds,
    // there is nothing fresher to derive, so return
    if (resumeCompaction(spark, tableDir)) return
    val rows = keep(spark.read.parquet(tableDir))
      .drop("batch").withColumn("batch", lit(toBatch))
    val shaped =
      if (repartitionCols.isEmpty) rows.repartition(targetFiles)
      else rows.repartition(targetFiles, repartitionCols.map(col): _*)
    // ONE copy of the swap protocol (r17 review): the fold rides the
    // same stage/require-_SUCCESS/delete/rename as the rebuilds; the
    // staging write lazily reads the still-intact live table
    stageAndSwap(spark, tableDir)(staging =>
      shaped.write.partitionBy(partCols: _*).parquet(staging))
  }

  /** Stage a complete REPLACEMENT table and swap it in via the same
    * delete-then-rename protocol as [[compactTable]] — shared by the
    * rebuild operators, which re-derive contents from a corpus rather
    * than fold the stored table. Crash rules identical: the staging dir
    * is fully written (with `_SUCCESS`) before the live dir is touched;
    * a crash between the delete and the rename is finished by
    * [[resumeCompaction]] (or the next call here), and a stale pre-swap
    * staging is rebuilt wholesale. STOP-THE-WORLD for the swap window,
    * like every lifecycle operator of the index family.
    */
  private[graft] def stageAndSwap(
      spark: SparkSession, tableDir: String)(
      writeStaging: String => Unit): Unit = {
    val live = new Path(tableDir)
    val staging = new Path(tableDir + ".compacting")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // finish an interrupted predecessor's swap first — then rebuild
    // anyway: the caller is asking for a FRESH derivation, and contents
    // are deterministic in (corpus, params), so a rerun is idempotent
    resumeCompaction(spark, tableDir)
    require(fs.exists(live), s"no index table at $tableDir")
    fs.delete(staging, true)
    writeStaging(staging.toString)
    require(fs.exists(new Path(staging, "_SUCCESS")),
      s"staging write at $staging left no _SUCCESS marker")
    fs.delete(live, true)
    require(fs.rename(staging, live),
      s"rename $staging -> $live failed; staging holds the full table")
    ()
  }

  /** Finish a compaction swap interrupted between its delete and its
    * rename (live dir absent, staging complete). Returns true when a
    * resume happened. Safe to call any time.
    */
  def resumeCompaction(spark: SparkSession, tableDir: String): Boolean = {
    val live = new Path(tableDir)
    val staging = new Path(tableDir + ".compacting")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live) && fs.exists(new Path(staging, "_SUCCESS"))) {
      require(fs.rename(staging, live),
        s"resume rename $staging -> $live failed")
      true
    } else false
  }

  /** Write `df` (which must carry a literal `batch` column) into `path`
    * replacing only the partitions present in `df` — the idempotent
    * append primitive. `partCols` must end with `batch`.
    */
  def overwriteBatchPartitions(df: DataFrame, path: String, partCols: Seq[String]): Unit = {
    // Align the shuffle to the partition tree before the write (guide §6
    // small-files rule): without it every upstream task holding rows of a
    // partition value opens its own writer there, so one append lands
    // tasks x dirs files (measured 32 x 64 on the bm25 postings path) and
    // every later search pays the open-cost tax CompactionProbe measured
    // at 9.6x. One exchange of the batch (appends are micro-batch-sized
    // by contract) buys exactly one file per partition dir.
    graft.Tuning.align(df, partCols)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)
  }
}

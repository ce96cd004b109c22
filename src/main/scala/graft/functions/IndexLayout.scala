package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Write `df` (which must carry a literal `batch` column) into `path`
    * replacing only the partitions present in `df` — the idempotent
    * append primitive. `partCols` must end with `batch`.
    */
  def overwriteBatchPartitions(df: DataFrame, path: String, partCols: Seq[String]): Unit = {
    // Per-write option (not a session-conf toggle): overrides the conf for
    // exactly this write without mutating state shared with concurrent
    // writers on the same SparkSession.
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)
  }
}

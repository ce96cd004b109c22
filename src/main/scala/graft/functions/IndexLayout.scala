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
  * checkpointed batch ids are unique and monotone) or by ad-hoc batch
  * appends (which allocate max-existing+1); interleaving both against the
  * same index could reuse an id and overwrite a prior append.
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

package graft

/** Runtime switches for optimization-round A/B attribution.
  *
  * Every switch defaults to the SHIPPED behavior; the `graft.tools.AB`
  * runner flips them per leg (system properties, read at call time) so an
  * old-vs-new comparison can interleave legs inside ONE JVM and one host
  * window — the only protocol that survived this round's window drift
  * (single-tool before/after runs 10 minutes apart disagreed by 30% on
  * untouched queries).
  */
object Tuning {

  private def prop(name: String): Option[String] =
    Option(System.getProperty(name))

  /** Partition-aligned index/state writes (guide §6): repartition by the
    * partition columns immediately before a partitionBy write so each
    * partition dir gets one file instead of tasks x dirs. Default OFF:
    * the interleaved A/B measured it 1.13-1.16x on the lifecycle rows at
    * bench scale (the added exchange costs more than the file-count
    * saving while AQE already coalesces the upstream to a few tasks);
    * it exists for the scan-filled build paths, where the upstream is
    * deliberately many-task and the file explosion is real.
    */
  def alignWrites: Boolean =
    prop("graft.alignWrites").contains("1")

  /** Scan-parallelism fill target for compute-dense tables (guide §2.5
    * unsplittable-input rule); None disables. Default: the session's
    * defaultParallelism (resolved at the call site).
    */
  def scanFill(defaultParallelism: Int): Option[Int] =
    prop("graft.scanFill").orElse(sys.env.get("SPARK_GRAFT_SCAN_FILL")) match {
      case Some("off") => None
      case Some(n) => Some(n.toInt)
      case None => Some(defaultParallelism)
    }

  /** T1 arm of [[graft.functions.Graph.triangleCountDelta]] for the two
    * corpus-fraction-delta gate rows: adjacency-intersect (default) vs
    * the wedge join. Exists so the A/B runner can flip arms in one
    * window; both arms are bit-identical (GraphOpsSpec).
    */
  def triDeltaAdjacency: Boolean =
    prop("graft.triAdj").forall(_ == "1")

  /** [[alignWrites]] applied: repartition `df` by `cols` when the switch
    * is on, identity when off.
    */
  def align(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): org.apache.spark.sql.DataFrame =
    if (alignWrites)
      df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)
    else df
}

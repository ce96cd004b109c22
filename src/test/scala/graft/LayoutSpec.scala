package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Data-layout proofs for the 100 TB story: a date-partitioned lake layout
  * must turn a date predicate into PARTITION PRUNING (skip whole
  * directories at planning time), not a full scan + filter. Complements
  * `BucketingSpec` (shuffle-free co-located joins) and `PlanSpec`
  * (PushedFilters/ReadSchema row-group pushdown on the shipped queries).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))

  test("date-partitioned writes prune partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    spark.range(10000)
      .select(col("id"),
        concat(lit("2024-01-"), lpad((col("id") % 10 + 1).cast("string"), 2, "0"))
          .as("day"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-03")
    val full = spark.read.parquet(dir)

    // the day predicate becomes a partition filter, not a data filter
    assert(scanOf(pruned).partitionFilters.nonEmpty,
      "day predicate must prune partitions at plan time")

    // and the pruned scan physically reads ~1/10 of the files
    pruned.collect(); full.collect()
    val prunedFiles = scanOf(pruned).metrics("numFiles").value
    val fullFiles = scanOf(full).metrics("numFiles").value
    assert(prunedFiles > 0 && prunedFiles * 5 <= fullFiles,
      s"expected <=1/5 of files read, got $prunedFiles of $fullFiles")
  }

  test("non-partition predicates still push to the parquet reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout2").toString
    spark.range(10000)
      .select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("k") === 3)
    val scan = scanOf(filtered)
    assert(scan.dataFilters.nonEmpty, "k predicate must reach the scan")
    assert(scan.metadata.get("PushedFilters").exists(_.contains("EqualTo")),
      s"k predicate must push into the parquet reader: ${scan.metadata}")
  }
}

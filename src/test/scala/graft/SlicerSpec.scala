package graft

import graft.analytics.Dashboard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dashboard slicer parameters (SURVEY §3 E3): predicate correctness
  * and — the 100 TB property — pushdown of the slicer predicates into
  * the parquet scan.
  */
class SlicerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("slicers filter by date range and farm set") {
    val events = Tables.events(spark, sf)
    val s = Dashboard.Slicers(
      dateFrom = Some("2024-01-10"), dateTo = Some("2024-01-20"),
      farms = Some(Seq(1L, 2L, 3L)))
    val sliced = s(events)
    assert(sliced.count() > 0)
    assert(sliced.filter(
      col("ts") < lit("2024-01-10").cast("timestamp") ||
        col("ts") >= lit("2024-01-20").cast("timestamp") ||
        !col("user_id").isin(1L, 2L, 3L)).count() === 0)
    // no slicers = identity
    assert(Dashboard.Slicers()(events).count() === events.count())
  }

  test("IVF layout: a label-partitioned lake turns probes into partition pruning") {
    // Similarity.scala's scale claim for q40: with the corpus laid out
    // partitioned by cluster id, probing 2 of k centroids reads 2/k of
    // the data AT THE SOURCE. Prove it on a real partitioned write.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Tables.embeddings(spark, sf).write.mode("overwrite").partitionBy("label").parquet(dir)
    val probed = spark.read.parquet(dir).filter(col("label").isin(0, 1))
    val scan = probed.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
    // only the probed partitions' files are read
    val files = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("label=0") || f.contains("label=1")),
      s"scan touched unprobed partitions: ${files.filterNot(f => f.contains("label=0") || f.contains("label=1")).take(3).mkString(", ")}")
  }

  test("slicer predicates push down to the parquet scan") {
    val plan = Dashboard.byType(
      Tables.events(spark, sf),
      Dashboard.Slicers(farms = Some(Seq(1L, 2L))))
      .queryExecution.executedPlan.toString
    // the farm slicer must reach the scan, not sit in a post-scan Filter
    assert(plan.contains("PushedFilters") && plan.contains("In(user_id"),
      s"slicer predicate not pushed to scan:\n$plan")
  }
}

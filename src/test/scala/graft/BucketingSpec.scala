package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY §4 / the 100 TB join story):
  * two tables bucketed+sorted on the join key join with NO exchange —
  * the physical plan reads buckets directly into the sort-merge join.
  * This is the layout move that turns the repeated big-fact joins of a
  * warehouse into shuffle-free scans.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed+sorted tables join without an exchange") {
    val dir = Files.createTempDirectory("graft-bucketing")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
    try {
      import spark.implicits._
      val facts = (0L until 10000L).map(i => (i % 997, i, i * 1.5)).toDF("k", "id", "v")
      val dims = (0L until 997L).map(i => (i, s"dim_$i")).toDF("k", "name")

      facts.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/facts")
        .saveAsTable("bkt_facts")
      dims.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/dims")
        .saveAsTable("bkt_dims")

      val joined = spark.table("bkt_facts")
        .join(spark.table("bkt_dims"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      assert(!physical.contains("Exchange"),
        s"bucketed join still shuffles:\n$physical")
      assert(joined.count() === 10000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }
}

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

  test("q58 production layout: bucketed corpus signatures join a daily batch shuffle-free") {
    // Substantiates q58's scale claim ("at 100 TB the corpus side is a
    // bucketed signature table"): persist the MinHash signature
    // relation bucketed+sorted on the banding keys (i, mh), and the
    // daily batch's banding join reads the corpus buckets straight
    // into the sort-merge join — the only exchange in the plan is the
    // (small) batch side re-hashing into the bucket layout. Broadcast
    // disabled so the corpus side can't hide behind a BHJ: this proves
    // the layout works even when the batch outgrows broadcast.
    val dir = Files.createTempDirectory("graft-sigtable")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
    try {
      graft.functions.VectorExpressions.register(spark)
      val sig = Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), expr("minhash16(text)").as("sig"))
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("i", "mh")))
      sig.filter(col("doc_id") < 450).write.mode("overwrite")
        .bucketBy(8, "i", "mh").sortBy("i", "mh")
        .option("path", s"$dir/sig_corpus")
        .saveAsTable("sig_corpus")
      val batch = sig.filter(col("doc_id") >= 450) // the daily ingest
      val cand = spark.table("sig_corpus").as("c")
        .join(batch.as("b"), Seq("i", "mh"))
        .select(col("b.doc_id").as("new_id"), col("c.doc_id").as("dup_of"))
        .distinct()
      assert(cand.count() > 0) // the layout actually finds candidates
      val plan = cand.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), plan)
      // corpus side: bucket-pruned scan, no exchange; the join's only
      // exchange is the batch side conforming to the bucket layout
      // (+ the distinct's own aggregate exchange above the join)
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(joinPart.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
        s"corpus side of the banding join shuffled:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), plan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS sig_corpus")
    }
  }
}

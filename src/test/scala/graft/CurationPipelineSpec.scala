package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The training-data flow end to end over the real test corpus:
  * near-dup clusters → canonical survivors → quality + repetition
  * filters → train/val/test split → sequence packing. One chain,
  * every curation operator composed on the previous one's output —
  * what a user of the engine actually runs, not isolated queries.
  */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dedup survivors → filters → split → packing composes coherently") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. near-dup clusters; keep canonical survivors only
    val clusters = graft.ext.Clustering.all.head.fn(spark, sf)
    assert(clusters.count() === total) // every doc got a cluster
    val survivors = clusters.filter(col("is_canonical"))
      .select("doc_id")
    val nSurvivors = survivors.count()
    assert(nSurvivors <= total && nSurvivors > 0)
    // exactly one canonical per cluster
    val perCluster = clusters.filter(col("is_canonical"))
      .groupBy("cluster_id").count().filter(col("count") =!= 1).count()
    assert(perCluster === 0)

    // 2. drop degenerate docs: repetition metrics on survivors
    val rep = graft.ext.Scrub.all.find(_.name == "q55_repetition").get
      .fn(spark, sf)
      .join(survivors, "doc_id")
    val kept = rep.filter(col("top_2gram_share") < 0.5).select("doc_id")
    assert(kept.count() > 0)

    // 3. deterministic split over the kept set
    val coin = graft.ext.Portable.h60Spark(
      "concat('split|', cast(doc_id as string))")
    val split = kept.withColumn("split",
      expr(s"CASE WHEN $coin % 100 < 90 THEN 'train' WHEN $coin % 100 < 95 THEN 'val' ELSE 'test' END"))
    val bySplit = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))

    // 4. pack the train split into 2048-token sequences
    val packed = graft.ext.Curation.all
      .find(_.name == "q60_sequence_packing").get.fn(spark, sf)
      .join(split.filter(col("split") === "train").select("doc_id"), "doc_id")
    assert(packed.count() > 0)
    // offsets stay inside the budget and packs are dense from 0
    assert(packed.filter(col("tok_offset") >= 2048 || col("tok_offset") < 0)
      .count() === 0)
    assert(packed.filter(col("pack_id") < 0).count() === 0)
  }
}

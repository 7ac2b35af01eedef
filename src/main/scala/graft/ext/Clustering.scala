package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Near-duplicate CLUSTER formation — the step a real training-data
  * dedup pipeline runs after pair generation: LSH/SimHash emit pairs,
  * but retention decisions need connected components (A~B and B~C put
  * A, C in one cluster even when A, C never collided), a canonical
  * survivor per cluster, and cluster sizes for filtering/reporting.
  *
  * Algorithm: min-label propagation to fixpoint (the Pregel/GraphX
  * formulation) — every doc starts labeled with its own id; each round
  * every node takes the min of its label and its neighbors' labels;
  * at fixpoint the label is the component's min doc_id, which doubles
  * as the deterministic cluster id and canonical-survivor choice.
  *
  * Scale notes (100 TB): rounds = component diameter, and near-dup
  * graphs are overwhelmingly tiny cliques (diameter ≤ 2-3), so the
  * loop converges in a handful of rounds; each round is one
  * shuffle-on-id of the (id, label) relation — 16 bytes/doc — plus the
  * edge join. The driver only reads a one-row convergence count per
  * round (the same scalar-read shape as Incremental.watermark), never
  * data. For adversarial long-chain graphs the literature upgrade is
  * large-star/small-star (Kiveris et al., "Connected Components in
  * MapReduce", SOCC'14), which squares path lengths per round; not
  * needed for near-dup workloads.
  */
object Clustering {

  /** Connected components by min-label propagation over an undirected
    * edge list (a_id, b_id). Returns (doc_id, cluster_id) for every id
    * in `nodes` (singletons keep their own id as cluster).
    */
  private[graft] def components(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    // both directions once; labels flow along edges either way
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .persist()
    // localCheckpoint, NOT persist: persist caches data but the logical
    // plan still nests one level per round, and Catalyst's analysis of
    // that growing lineage goes super-linear — a 16-round chain graph
    // takes minutes in the analyzer alone. Checkpointing truncates the
    // lineage to the materialized blocks each round, keeping every
    // round's plan constant-size (the same reason GraphFrames
    // checkpoints its iterative algorithms).
    // seed labels with min(self, direct neighbors) instead of self:
    // near-dup components are overwhelmingly cliques, and a clique
    // whose members already hold the component minimum converges on
    // the first loop round (the round only confirms) — one fewer
    // join+checkpoint+count cycle on the common shape, same fixpoint.
    var labels = nodes.select(col("doc_id").as("id"), col("doc_id").as("lbl"))
      .union(edges.groupBy(col("dst").as("id")).agg(min("src").as("lbl")))
      .groupBy("id").agg(min("lbl").as("lbl"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val prop = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.lbl") =!= col("o.lbl"))
        .count()
      labels = next
      rounds += 1
    }
    // A silent cap would emit split clusters with wrong survivors in a
    // setting with no oracle to catch it — fail loudly instead. A graph
    // needing 50+ rounds means path-like components far outside the
    // near-dup regime; the algorithmic answer there is large-star/
    // small-star (Kiveris et al., SOCC'14), not more rounds.
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $rounds rounds " +
          s"($changed labels still changing); component diameter exceeds " +
          "the near-dup regime — use a star-contraction variant")
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  val all: Seq[Q] = Seq(
    // ── Near-dup clusters from SimHash pairs + canonical survivors ─────
    // The oracle states the same fixpoint as a recursive CTE: walk
    // enumerates (id, reachable-label) over the undirected edges with
    // set semantics (UNION dedups, so it terminates), and min(label)
    // per id is exactly the propagated fixpoint label.
    Q(
      "q53_dedup_clusters",
      s"""WITH RECURSIVE ${Dedup.simhashPairsDuck},
         |edges AS (SELECT a_id AS src, b_id AS dst FROM spairs
         |          UNION ALL SELECT b_id, a_id FROM spairs),
         |walk(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id),
         |cc AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id),
         |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
         |SELECT cc.doc_id, cc.cluster_id, sizes.cluster_size,
         |       cc.doc_id = cc.cluster_id AS is_canonical
         |FROM cc JOIN sizes USING (cluster_id)""".stripMargin) { (s, d) =>
      // Iterate ONLY the pair-participant subgraph: a doc in no pair is
      // its own cluster by construction, so the propagation loop
      // shuffles the near-dup subgraph (dup-rate × corpus) instead of
      // every doc — at 100 TB that is the difference between iterating
      // gigabytes and iterating the corpus. Singletons union in after
      // the fixpoint with cluster_id = doc_id.
      val pairs = Dedup.simhashPairs(s, d).persist()
      val participants = pairs.select(col("a_id").as("doc_id"))
        .union(pairs.select(col("b_id").as("doc_id")))
        .distinct()
      val docs = Tables.documents(s, d).select("doc_id")
      val singletons = docs.join(participants, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
      val cc = components(participants, pairs)
        .unionByName(singletons)
      // cluster_size via a window, not a join against a per-cluster
      // aggregate: the cluster relation is mostly singletons (~one row
      // per doc), so a broadcast would not fit and a join would shuffle
      // twice — the window shuffles the 16-byte (id, label) rows once.
      cc.withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          (col("doc_id") === col("cluster_id")).as("is_canonical"))
    })
}

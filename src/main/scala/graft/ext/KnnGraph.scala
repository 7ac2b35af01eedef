package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CacheScope, Q}

/** Distributed k-nearest-neighbor GRAPH construction (NN-descent, Dong
  * et al. WWW'11) — the graph tier of the ANN ladder (brute q39 → LSH
  * q47 → IVF q40 → PQ q173/q174): the all-nodes neighbor graph that
  * SemDeDup-style semantic dedup, HNSW index builds, and kNN label
  * propagation all consume. Where q39/q40/q47 answer "top-k for a small
  * QUERY batch", this materializes top-k for EVERY corpus vector without
  * the n² scan.
  *
  * Algorithm (both engines, bit-identical):
  *   - init g₀: q47's deterministic 6-hyperplane LSH buckets, each node
  *     pairs with its own bucket plus the 6 hamming-1 probe buckets,
  *     exact quantized-cosine re-rank to top-k. The probe union is what
  *     seeds CROSS-bucket edges — without it NN-descent could never
  *     leave a bucket's connected component.
  *   - round r (NN-descent): B(v) = out ∪ in neighbors of g₍ᵣ₋₁₎
  *     (≤ 2k per node), candidates C(v) = B(v) ∪ { w ∈ B(u) : u ∈ B(v),
  *     w ≠ v }, exact re-rank to top-k. B(v) ⊆ C(v) makes per-node
  *     quality MONOTONE non-decreasing (KnnGraphSpec pins the law).
  *
  * Scale design (100 TB): every stage is linear in corpus size n —
  * init is n·(7n/B) pairs where B is the hyperplane-count dial (64
  * buckets here; production raises the plane count so bucket size stays
  * ~constant, the q164-modulus pattern), rounds are O(n·k²) candidate
  * rows (k=5 → ≤ ~105/node), and every exchange is a hash shuffle on
  * ids (bucket, v) — the 64-long `qe` arrays move only through the
  * corpus-side hash joins, never through a pair relation. No stage is
  * corpus-quadratic; the exact audit truth (q176) runs on the
  * deterministic content-hash SAMPLE dial (|S|·n, linear), never the
  * full n². Ranking is integer-dot cosine (`vec_ldot`) with
  * neighbor-id tie-break, so both engines produce the identical graph.
  *
  * Reference scope: the reference pipeline has no ANN surface; this is
  * north-star extension coverage (SURVEY §7.1) alongside q38–q47.
  */
object KnnGraph {

  /** Neighbors kept per node (k of the kNN graph). */
  val K = 5

  /** NN-descent refinement rounds after the LSH init. */
  val Rounds = 2

  /** Audit sample modulus: h60(vec_id) % Mod == 0 nodes get exact
    * ground truth (the q164 sample dial — production picks Mod so the
    * audit is sample-sized, the graph itself always covers all nodes).
    */
  val Mod = 4

  /** Exact quantized-cosine top-k re-rank of a candidate pair relation
    * `cand(v, w)` against an nv-shaped relation `e(vec_id, qe, nrm)`.
    * Returns `(v, w, cos, rank)`, rank ≤ k. The pair relation carries
    * only ids; vectors join in from the corpus side (hash exchanges on
    * vec_id — ids shuffle, arrays stream).
    */
  private[graft] def topK(e: DataFrame, cand: DataFrame, k: Int = K): DataFrame =
    cand
      .join(e.select(col("vec_id").as("v"), col("qe").as("vqe"),
        col("nrm").as("vnrm")), "v")
      .join(e.select(col("vec_id").as("w"), col("qe").as("wqe"),
        col("nrm").as("wnrm")), "w")
      .select(col("v"), col("w"),
        expr("cast(vec_ldot(vqe, wqe) as double) / (vnrm * wnrm)").as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("v").orderBy(col("cos").desc, col("w"))))
      .filter(col("rank") <= k)

  /** LSH multi-probe init candidates: each node × (own bucket + 6
    * hamming-1 buckets). The 7 probe values are distinct by
    * construction, so each (v, w) appears at most once — no distinct
    * exchange needed.
    */
  private[graft] def initCand(e: DataFrame): DataFrame = {
    val nb = e.withColumn("bucket", expr(Similarity.lshBucketExpr))
    val probes = nb.select(col("vec_id").as("v"), explode(expr(
      "transform(sequence(0, 6), t -> CASE WHEN t = 0 THEN bucket" +
        " ELSE bucket ^ shiftleft(cast(1 as bigint), t - 1) END)")).as("pb"))
    probes.join(
        nb.select(col("vec_id").as("w"), col("bucket").as("wb")),
        col("wb") === col("pb") && col("w") =!= col("v"))
      .select("v", "w")
  }

  /** One NN-descent candidate expansion over a graph `g(v, w)`:
    * B(v) ∪ B(B(v)). Deduplicated — neighbor-of-neighbor paths
    * multiply, and duplicate (v, w) rows would double-place a neighbor
    * in the rank window.
    */
  private[graft] def roundCand(g: DataFrame): DataFrame = {
    val b = g.select("v", "w")
      .union(g.select(col("w").as("v"), col("v").as("w")))
      .distinct()
    b.as("x")
      .join(b.as("y"), col("x.w") === col("y.v") && col("y.w") =!= col("x.v"))
      .select(col("x.v").as("v"), col("y.w").as("w"))
      .union(b)
      .distinct()
  }

  /** g₀ .. g₍rounds₎ over an nv-shaped relation. Each round is
    * persisted (query-scoped): g₍ᵣ₋₁₎ feeds BOTH the next round's
    * expansion and (in q176) the per-round audit union.
    */
  private[graft] def descend(e: DataFrame, rounds: Int = Rounds,
      k: Int = K): Seq[DataFrame] = {
    val g0 = topK(e, initCand(e), k).transform(CacheScope.scoped)
    (1 to rounds).foldLeft(Vector(g0)) { (gs, _) =>
      gs :+ topK(e, roundCand(gs.last), k).transform(CacheScope.scoped)
    }
  }

  /** Spark-side sampled-node predicate (the q164 content-hash dial). */
  private val sampSpark =
    s"${Portable.h60Spark("cast(vec_id as string)")} % $Mod = 0"

  /** DuckDB CTE chain computing g0/g1/g2 as `(v, w, cos, r)` relations
    * (ends without trailing comma; expects nothing in scope).
    */
  private def descentDuck: String = {
    def gCte(name: String, candCte: String) =
      s"""$name AS (SELECT v, w, cos, r FROM (
         |  SELECT v, w, cos, row_number() OVER (PARTITION BY v ORDER BY cos DESC, w) AS r
         |  FROM (SELECT c.v, c.w,
         |          CAST(${Similarity.idotD("a.qe", "b.qe")} AS DOUBLE) / (a.nrm * b.nrm) AS cos
         |        FROM $candCte c
         |        JOIN qn a ON a.vec_id = c.v
         |        JOIN qn b ON b.vec_id = c.w)) WHERE r <= $K)""".stripMargin
    def bCte(name: String, g: String) =
      s"$name AS (SELECT v, w FROM $g UNION SELECT w AS v, v AS w FROM $g)"
    def cCte(name: String, b: String) =
      s"""$name AS (SELECT x.v, y.w FROM $b x JOIN $b y ON y.v = x.w AND y.w <> x.v
         |          UNION SELECT v, w FROM $b)""".stripMargin
    s"""${Similarity.planesDuck},
       |${Similarity.qvDuck},
       |${Similarity.nvDuck},
       |${Similarity.bktDuck},
       |qn AS (SELECT qv.vec_id, qv.qe, nv.nrm FROM qv JOIN nv ON nv.vec_id = qv.vec_id),
       |pr AS (SELECT b.vec_id AS v,
       |         unnest(list_transform(range(0, 7),
       |           t -> CASE WHEN t = 0 THEN bucket ELSE xor(bucket, (1::BIGINT << (t - 1))) END)) AS pb
       |       FROM bkt b),
       |c0 AS (SELECT p.v, eb.vec_id AS w FROM pr p
       |       JOIN bkt eb ON eb.bucket = p.pb AND eb.vec_id <> p.v),
       |${gCte("g0", "c0")},
       |${bCte("b0", "g0")},
       |${cCte("c1", "b0")},
       |${gCte("g1", "c1")},
       |${bCte("b1", "g1")},
       |${cCte("c2", "b1")},
       |${gCte("g2", "c2")}""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // ── The kNN graph itself (all nodes, final round) ──────────────────
    Q(
      "q175_knn_graph",
      s"""WITH $descentDuck
         |SELECT v AS vec_id, r AS rank, w AS neighbor_id,
         |  floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM g2""".stripMargin) { (s, d) =>
      val e = Similarity.nv(s, d).select("vec_id", "qe", "nrm")
        .transform(CacheScope.scoped)
      descend(e).last
        .select(col("v").as("vec_id"), col("rank"),
          col("w").as("neighbor_id"),
          expr("floor(cos * 1000000.0D) / 1000000.0D").as("cosine"))
    },

    // ── Per-round recall audit (the q73/q153/q171 pattern) ─────────────
    // Exact top-k ground truth on the sampled nodes vs each round's
    // graph: iter 0 reads the LSH init's recall, iters 1..2 read what
    // each NN-descent round buys — the curve the round count is tuned
    // against. Monotone non-decreasing by the B(v) ⊆ C(v) containment
    // (KnnGraphSpec pins the law; the oracle certifies the values).
    Q(
      "q176_knn_graph_recall",
      s"""WITH $descentDuck,
         |samp AS (SELECT vec_id FROM qn
         |         WHERE ${Portable.h60Duck("CAST(vec_id AS VARCHAR)")} % $Mod = 0),
         |ex AS (SELECT v, w FROM (
         |         SELECT a.vec_id AS v, b.vec_id AS w,
         |           row_number() OVER (PARTITION BY a.vec_id
         |             ORDER BY CAST(${Similarity.idotD("a.qe", "b.qe")} AS DOUBLE) / (a.nrm * b.nrm) DESC,
         |                      b.vec_id) AS r
         |         FROM qn a JOIN samp s ON s.vec_id = a.vec_id
         |         JOIN qn b ON b.vec_id <> a.vec_id) WHERE r <= $K),
         |gall AS (SELECT CAST(0 AS BIGINT) AS iter, v, w FROM g0
         |         UNION ALL SELECT CAST(1 AS BIGINT), v, w FROM g1
         |         UNION ALL SELECT CAST(2 AS BIGINT), v, w FROM g2),
         |iters AS (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS iter),
         |f AS (SELECT i.iter, CASE WHEN gall.w IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM ex CROSS JOIN iters i
         |      LEFT JOIN gall ON gall.iter = i.iter AND gall.v = ex.v AND gall.w = ex.w)
         |SELECT iter, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(CASE WHEN hit = 1 THEN 1 END) AS BIGINT) AS n_found,
         |  floor(count(CASE WHEN hit = 1 THEN 1 END) * 1000000.0 / count(*)) / 1000000.0 AS recall
         |FROM f GROUP BY iter""".stripMargin) { (s, d) =>
      val e = Similarity.nv(s, d).select("vec_id", "qe", "nrm")
        .transform(CacheScope.scoped)
      val gs = descend(e)
      // exact truth on the sampled nodes only: |S|·n pairs (linear —
      // the modulus is the 100 TB dial), NOT the full n² scan
      val ex = e.filter(expr(sampSpark))
        .select(col("vec_id").as("v"), col("qe").as("vqe"),
          col("nrm").as("vnrm"))
        .join(e.select(col("vec_id").as("w"), col("qe").as("wqe"),
          col("nrm").as("wnrm")), col("w") =!= col("v"))
        .select(col("v"), col("w"),
          expr("cast(vec_ldot(vqe, wqe) as double) / (vnrm * wnrm)").as("cos"))
        .withColumn("r", row_number().over(
          Window.partitionBy("v").orderBy(col("cos").desc, col("w"))))
        .filter(col("r") <= K)
        .select("v", "w")
      val gall = gs.zipWithIndex.map { case (g, i) =>
        g.select(lit(i.toLong).as("iter"), col("v"), col("w"), lit(1).as("hit"))
      }.reduce(_.union(_))
      val iters = s.range(0, Rounds + 1).select(col("id").as("iter"))
      ex.crossJoin(broadcast(iters))
        .join(gall, Seq("iter", "v", "w"), "left")
        .groupBy("iter")
        .agg(
          count(lit(1)).as("n_exact"),
          count(expr("CASE WHEN hit = 1 THEN 1 END")).as("n_found"),
          expr("floor(count(CASE WHEN hit = 1 THEN 1 END) * 1000000.0D / count(1)) / 1000000.0D")
            .as("recall"))
    }
  )
}

package graft.ext

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.VectorExpressions

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d):
  * brute-force cosine near-dup + top-k as the exact baseline, and an
  * IVF-style probed search as the scale path.
  *
  * The per-pair kernel is [[graft.functions.FloatDot]] (`vec_dot`), a
  * native codegen'd Catalyst expression — the interpreted
  * `aggregate(zip_with(...))` baseline computes the same doubles but is
  * ~30× slower at millions of pairs. Norms are computed once per vector
  * on each join side, not per pair.
  *
  * Floating-point determinism: dot products fold left-to-right from
  * +0.0 with floats widened to double before multiplying — the same op
  * order as DuckDB's `list_sum(list_transform(...))`, so both engines
  * produce bit-identical doubles, identical rankings, and exact oracle
  * matches. Scores are floor-truncated (no round-half-tie rule).
  *
  * Scale design (100 TB): brute force is O(n·q) and broadcast-friendly
  * (queries ≪ corpus; the corpus streams once per query batch). The IVF
  * variant is the real ANN pattern: coarse partitions (`label`),
  * centroid = deterministic running mean, probe the 2 nearest
  * centroids, search only those partitions — with a layout partitioned
  * by cluster id this becomes partition pruning at the source.
  */
object Similarity {

  /** DuckDB-side sequential-fold kernels (mirror vec_dot exactly). */
  private def dotD(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private def normD(a: String): String =
    s"list_sum(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"

  /** embeddings with per-vector norm — computed once, reused per pair. */
  private val nvDuck =
    s"nv AS (SELECT vec_id, label, embedding, sqrt(${normD("embedding")}) AS nrm FROM embeddings)"

  private def nv(s: org.apache.spark.sql.SparkSession, d: String) = {
    VectorExpressions.register(s)
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"), col("embedding"),
      expr("sqrt(vec_dot(embedding, embedding))").as("nrm"))
  }

  val all: Seq[Q] = Seq(
    // ── Embedding-cosine near-dup pairs (brute force baseline) ─────────
    // Full pair scan a<b. The corpus has no planted high-cosine dups
    // (max ≈ 0.6), so the demonstration threshold is 0.4; dedup in a
    // real pipeline would use ≥0.95 with LSH blocking in front.
    Q(
      "q38_embedding_neardup",
      s"""WITH $nvDuck
         |SELECT a_id, b_id, floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |        ${dotD("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |      FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
         |WHERE cos >= 0.4""".stripMargin) { (s, d) =>
      val e = nv(s, d)
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          expr("vec_dot(a.embedding, b.embedding) / (a.nrm * b.nrm)").as("cos"))
        .filter(col("cos") >= 0.4)
        .select(col("a_id"), col("b_id"),
          expr("floor(cos * 1000000.0) / 1000000.0").as("cosine"))
    },

    // ── Brute-force cosine top-k (exact kNN baseline) ──────────────────
    Q(
      "q39_cosine_topk",
      s"""WITH $nvDuck
         |SELECT qid, neighbor_id, rank,
         |  floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM (SELECT qid, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM (SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
         |              ${dotD("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |            FROM nv a JOIN nv b ON b.vec_id <> a.vec_id
         |            WHERE a.vec_id < 10))
         |WHERE rank <= 5""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = nv(s, d)
      val q = e.filter(col("vec_id") < 10)
      broadcast(q.as("a")).join(e.as("b"), col("b.vec_id") =!= col("a.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("neighbor_id"),
          expr("vec_dot(a.embedding, b.embedding) / (a.nrm * b.nrm)").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("neighbor_id"), col("rank"),
          expr("floor(cos * 1000000.0) / 1000000.0").as("cosine"))
    },

    // ── IVF-probed ANN (the 100 TB scale path) ─────────────────────────
    // Coarse partition = `label`; centroid = per-dimension mean summed
    // in vec_id order (deterministic fold, so both engines agree to the
    // last bit). Each query probes its 2 nearest centroids and searches
    // only those partitions. Centroid math stays in (tiny) HOF space —
    // centroids are double[], vec_dot is float[]-only by design so the
    // widening is never hidden.
    Q(
      "q40_ivf_ann",
      s"""WITH pos AS (SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
         |             FROM embeddings, generate_series(1, 64) g(i)),
         |cent AS (SELECT label, i, list_sum(list(v ORDER BY vec_id)) / count(*) AS cv
         |         FROM pos GROUP BY label, i),
         |cvec AS (SELECT label, list(cv ORDER BY i) AS cvec FROM cent GROUP BY label),
         |$nvDuck,
         |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qnrm FROM nv WHERE vec_id < 10),
         |qc AS (SELECT qid, label,
         |         list_sum(list_transform(list_zip(qe, cvec), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         |           / (qnrm * sqrt(list_sum(list_transform(cvec, v -> v * v)))) AS ccos
         |       FROM q, cvec),
         |probe AS (SELECT qid, label
         |          FROM (SELECT qid, label,
         |                  row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, label) AS r
         |                FROM qc) WHERE r <= 2),
         |cand AS (SELECT q.qid, e.vec_id AS neighbor_id,
         |           ${dotD("q.qe", "e.embedding")} / (q.qnrm * e.nrm) AS cos
         |         FROM probe p
         |         JOIN q ON q.qid = p.qid
         |         JOIN nv e ON e.label = p.label AND e.vec_id <> q.qid)
         |SELECT qid, neighbor_id, rank,
         |  floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM (SELECT qid, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = nv(s, d)
      // centroid per (label, dim): mean with a vec_id-ordered fold
      val pos = Tables.embeddings(s, d)
        .select(col("label"), col("vec_id"),
          posexplode(col("embedding")).as(Seq("p", "vf")))
        .select(col("label"), col("vec_id"), (col("p") + 1).as("i"),
          col("vf").cast("double").as("v"))
      val cent = pos.groupBy("label", "i")
        .agg(expr(
          "aggregate(transform(array_sort(collect_list(struct(vec_id, v))), x -> x.v), cast(0 as double), (acc, w) -> acc + w) / count(*)")
          .as("cv"))
      val cvec = cent.groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(i, cv))), x -> x.cv)").as("cvec"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qnrm"))
      // probe: 2 nearest centroids per query (cvec is double[])
      val qc = broadcast(q).crossJoin(broadcast(cvec))
        .select(col("qid"), col("label"), col("qe"), col("qnrm"), expr(
          "aggregate(zip_with(qe, cvec, (x, y) -> cast(x as double) * y), cast(0 as double), (acc, v) -> acc + v)" +
            " / (qnrm * sqrt(aggregate(cvec, cast(0 as double), (acc, v) -> acc + v * v)))")
          .as("ccos"))
      val probe = qc
        .withColumn("r", row_number().over(
          Window.partitionBy("qid").orderBy(col("ccos").desc, col("label"))))
        .filter(col("r") <= 2)
        .select(col("qid"), col("label").as("plabel"), col("qe"), col("qnrm"))
      probe.join(e.as("e"),
          col("e.label") === col("plabel") && col("e.vec_id") =!= col("qid"))
        .select(col("qid"), col("e.vec_id").as("neighbor_id"),
          expr("vec_dot(qe, e.embedding) / (qnrm * e.nrm)").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("neighbor_id"), col("rank"),
          expr("floor(cos * 1000000.0) / 1000000.0").as("cosine"))
    },

    // ── Random-hyperplane LSH ANN (the other scale path) ───────────────
    // 6 deterministic hyperplanes (md5-derived components in [-1,1],
    // identical in both engines) → 64 sign buckets; each query probes
    // its own bucket plus the 6 hamming-1 neighbors (multi-probe LSH),
    // then ranks candidates by exact cosine. Corpus side is one narrow
    // pass computing a 6-bit bucket per vector; the candidate join
    // touches ~probes/buckets of the corpus instead of all of it.
    Q(
      "q47_lsh_ann",
      s"""WITH planes AS (
         |  SELECT j, list((('0x' || substr(md5(concat('plane|', j, '|', i)), 1, 15))::BIGINT % 2001 - 1000) / 1000.0 ORDER BY i) AS pvec
         |  FROM generate_series(0, 5) g(j), generate_series(1, 64) gi(i)
         |  GROUP BY j),
         |$nvDuck,
         |bkt AS (SELECT v.vec_id,
         |          (SUM(CASE WHEN ${dotD("v.embedding", "p.pvec")} >= 0
         |                    THEN (1::BIGINT << p.j) ELSE 0 END))::BIGINT AS bucket
         |        FROM embeddings v, planes p GROUP BY v.vec_id),
         |q AS (SELECT nv.vec_id AS qid, nv.embedding AS qe, nv.nrm AS qnrm, b.bucket
         |      FROM nv JOIN bkt b ON b.vec_id = nv.vec_id WHERE nv.vec_id < 10),
         |probes AS (SELECT qid, qe, qnrm,
         |             unnest(list_transform(range(0, 7),
         |               t -> CASE WHEN t = 0 THEN bucket
         |                         ELSE xor(bucket, (1::BIGINT << (t - 1))) END)) AS pb
         |           FROM q),
         |cand AS (SELECT p.qid, e.vec_id AS neighbor_id,
         |           ${dotD("p.qe", "e.embedding")} / (p.qnrm * e.nrm) AS cos
         |         FROM probes p
         |         JOIN bkt eb ON eb.bucket = p.pb
         |         JOIN nv e ON e.vec_id = eb.vec_id AND e.vec_id <> p.qid)
         |SELECT qid, neighbor_id, rank,
         |  floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM (SELECT qid, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // hyperplane components derived with the same md5 the oracle uses;
      // k/1000 is an exact 3-decimal value, so literal-parse == division
      def planeArr(j: Int): String = "array(" + (1 to 64).map { i =>
        val k = Portable.h60Scala(s"plane|$j|$i") % 2001
        s"($k - 1000) / 1000.0D"
      }.mkString(", ") + ")"
      def dotPlane(j: Int): String =
        s"aggregate(zip_with(embedding, ${planeArr(j)}, (x, y) -> cast(x as double) * y), cast(0 as double), (acc, v) -> acc + v)"
      val bucketExpr = (0 until 6)
        .map(j => s"CASE WHEN ${dotPlane(j)} >= 0 THEN ${1L << j}L ELSE 0L END")
        .mkString(" + ")
      val nb = nv(s, d).withColumn("bucket", expr(bucketExpr))
      val q = nb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qnrm"), col("bucket"))
      val probes = q.select(col("qid"), col("qe"), col("qnrm"),
        explode(expr(
          "transform(sequence(0, 6), t -> CASE WHEN t = 0 THEN bucket ELSE bucket ^ shiftleft(cast(1 as bigint), t - 1) END)"))
          .as("pb"))
      broadcast(probes).join(nb.as("e"),
          col("e.bucket") === col("pb") && col("e.vec_id") =!= col("qid"))
        .select(col("qid"), col("e.vec_id").as("neighbor_id"),
          expr("vec_dot(qe, e.embedding) / (qnrm * e.nrm)").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("neighbor_id"), col("rank"),
          expr("floor(cos * 1000000.0) / 1000000.0").as("cosine"))
    })
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{CacheScope, Q, Tables}
import graft.functions.VectorExpressions

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d):
  * brute-force cosine near-dup + top-k as the exact baseline, an
  * IVF-style probed search and a multi-probe LSH search as the two
  * scale paths.
  *
  * Vectors are quantized once per row to fixed-point long arrays
  * (`qe = floor(xᵢ·2²⁰)`); the per-pair kernel is then
  * [[graft.functions.LongDot]] (`vec_ldot`), a native codegen'd
  * Catalyst expression computing the integer dot product — equal by
  * construction to `vec_qdot(a, b)` (KernelSpec proves it) but without
  * re-quantizing inside the O(n·m) pair loop.
  *
  * Numeric contract (what makes the DuckDB oracle exact): float
  * accumulation order is NOT portable across engines — DuckDB's
  * `list_sum` does not fold in the same order as a left fold, so two
  * engines computing the "same" float dot product disagree in the last
  * ulp, which flips floor-truncated digits. Integer addition is
  * associative, so the quantized dot product is identical regardless of
  * accumulation strategy; every downstream scalar op (int64→double
  * conversion of a < 2⁵³ value, sqrt, one multiply, one divide) is a
  * single correctly-rounded IEEE op. Cosine scores, thresholds and
  * rankings derived from the quantized kernel are therefore
  * bit-identical in both engines. (The float kernel `vec_dot` remains
  * the production scoring path where no cross-engine identity is
  * required.) Quantization at 2⁻²⁰ perturbs a unit-scale cosine by
  * < 10⁻⁵ — well under any semantic threshold here.
  *
  * Scale design (100 TB): brute force is O(n·q) and broadcast-friendly
  * (queries ≪ corpus; the corpus streams once per query batch). The IVF
  * variant is the real ANN pattern: coarse partitions (`label`),
  * integer-sum centroids, probe the 2 nearest, search only those
  * partitions — with a layout partitioned by cluster id this becomes
  * partition pruning at the source. The LSH variant buckets the corpus
  * by 6 hyperplane signs and probes hamming-1 neighbors.
  */
object Similarity {

  /** DuckDB-side quantization of one float scalar expression. */
  private[ext] def qD(x: String): String =
    s"CAST(floor(CAST($x AS DOUBLE) * 1048576.0) AS BIGINT)"

  /** DuckDB-side `vec_qdot`: quantize two float lists inline, integer dot. */
  private[ext] def qdotD(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), x -> ${qD("x[1]")} * ${qD("x[2]")})) AS BIGINT)"

  /** DuckDB-side integer dot of two already-quantized BIGINT lists. */
  private[ext] def idotD(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) AS BIGINT)"

  /** embeddings with per-vector quantized norm — computed once, reused
    * per pair. √(integer) is one correctly-rounded op: identical in
    * both engines.
    */
  private[ext] val nvDuck =
    s"nv AS (SELECT vec_id, label, embedding, sqrt(CAST(${qdotD("embedding", "embedding")} AS DOUBLE)) AS nrm FROM embeddings)"

  /** Spark-side quantized vector column (shared with the streaming
    * semantic gate, which quantizes micro-batch embeddings the same
    * way the index build quantized the corpus).
    */
  private[graft] val qeSpark =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1048576.0D) as bigint))"

  /** Per-label integer centroids of a (label, qe) relation — q80's
    * recompute shape (floor(Σq/n) per dim, a (labels × dims)
    * combine-reduced exchange), shared by q124 (outliers) and q143
    * (separation audit).
    */
  private def labelCentroids(v: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    v.select(col("label"), posexplode(col("qe")).as(Seq("p", "vv")))
      .groupBy("label", "p")
      .agg(sum("vv").as("cs"), count(lit(1)).as("n"))
      .select(col("label"), col("p"),
        expr("cast(floor(cast(cs as double) / n) as bigint)").as("cv"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(p, cv))), x -> x.cv)")
        .as("c"))

  /** The IVF-PQ index relations (q174's layout — FAISS's IVFADC): the
    * coarse per-label centroid table `cent(label, c)`, the
    * residual-space product-quantizer codebook `codebook(j, cl, c)`
    * (8 subspaces × 8 centroids × 8 dims), and the compressed corpus
    * `codes(vec_id, label, j, code)` — 8 code bytes + a label per
    * vector, the 32×-compressed relation that serves 100 TB. Built
    * once ([[ivfPqBuild]]), probed many times ([[ivfPqTopK]]) — the
    * write-once/probe-per-batch split a streaming deployment needs.
    */
  private[graft] case class IvfPqIndex(
      cent: DataFrame, codebook: DataFrame, codes: DataFrame)

  /** Build an [[IvfPqIndex]] from a quantized corpus
    * `qv(vec_id, label, qe)`. `cache` wraps the multi-consumer
    * intermediates AND the returned relations' upstreams: registered
    * queries pass `CacheScope.scoped` (cache dies with the query); a
    * streaming deployment passes its own `persist` (the index must
    * outlive every micro-batch). Training scans the corpus here
    * because the test corpus is small; production trains on the q164
    * content-hash sample dial — the trained codebook, not the
    * training pass, is what the scan needs.
    */
  private[graft] def ivfPqBuild(
      qv: DataFrame, cache: DataFrame => DataFrame): IvfPqIndex = {
    val cent = cache(labelCentroids(qv)) // residual pass + probe + query residuals
    val rv = qv.join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        expr("zip_with(qe, c, (a, b) -> a - b)").as("r"))
    val rsub = cache(rv
      .select(col("vec_id"), col("label"), explode(expr("sequence(0, 7)")).as("j"), col("r"))
      .select(col("vec_id"), col("label"), col("j"), expr("slice(r, 8 * j + 1, 8)").as("s")))
    // ^ seeds + 2 assign passes + recompute
    // Seeds by RANK (the 8 smallest vec_ids), not by absolute id
    // (r14 ADVICE): semanticIndex/runSemanticGate expose this builder
    // to arbitrary embedding corpora, and a corpus whose ids don't
    // include 0..7 (offset or sharded ranges) would otherwise yield an
    // empty codebook, an empty codes relation, and a semantic gate
    // that silently accepts every document. orderBy+limit plans as
    // TakeOrderedAndProject (map-side top-8, no full sort) over the
    // cached rsub; the 8-row rank window is driver-trivial. On the
    // driver corpora (dense ids from 0) the seeds — and so every
    // downstream relation — are bit-identical to the old id filter.
    val seedIds = rsub.filter(col("j") === 0).select("vec_id")
      .orderBy("vec_id").limit(8)
      .withColumn("cl", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
      .transform(cache)
    val nSeeds = seedIds.count()
    require(nSeeds == 8,
      s"ivfPqBuild: corpus must hold >= 8 distinct vectors to seed the " +
        s"8-centroid PQ codebook; found $nSeeds — refusing to build a " +
        "degenerate index (an empty codebook would make every gate " +
        "probe miss and read as 'no duplicates')")
    val c0 = rsub.join(broadcast(seedIds), "vec_id")
      .select(col("j"), col("cl"), col("s").as("c"))
    // q173's assignment, residual-space; label carried for the probed scan
    def assign(cb: DataFrame) =
      rsub.join(broadcast(cb), "j")
        .select(col("vec_id"), col("label"), col("j"), expr(
          "(vec_ldot(s, s) - 2 * vec_ldot(s, c) + vec_ldot(c, c)) * 8 + cl")
          .as("key"))
        .groupBy("vec_id", "label", "j").agg(min("key").as("k"))
        .select(col("vec_id"), col("label"), col("j"), expr("k % 8").as("code"))
    // per-(subspace, centroid) floor-mean recompute — q80's shape
    val c1 = cache(assign(c0).select("vec_id", "j", "code")
      .join(rsub.select("vec_id", "j", "s"), Seq("vec_id", "j"))
      .select(col("j"), col("code").as("cl"), posexplode(col("s")).as(Seq("p", "v")))
      .groupBy("j", "cl", "p").agg(sum("v").as("cs"), count(lit(1)).as("n"))
      .select(col("j"), col("cl"), col("p"),
        expr("cast(floor(cast(cs as double) / n) as bigint)").as("cv"))
      .groupBy("j", "cl")
      .agg(expr("transform(array_sort(collect_list(struct(p, cv))), x -> x.cv)").as("c")))
    // ^ encode pass + LUT (every later probe joins this codebook)
    // Post-build guard (r14 ADVICE): every subspace must retain ≥ 1
    // centroid, or the ADC join would silently drop that subspace's
    // distance term from every probe. NOT a full-64 check on purpose:
    // a low-entropy corpus whose seed vectors share identical subspace
    // slices legitimately collapses clusters (PqAdcSpec's 8-base
    // fixture retains 40/64 — a coarser but CORRECT index; ties break
    // to the lowest cl and the winners absorb the mass). The count
    // reads the just-cached ≤64-row relation.
    val cbSubspaces = c1.select("j").distinct().count()
    require(cbSubspaces == 8,
      s"ivfPqBuild: PQ codebook covers $cbSubspaces/8 subspaces — a " +
        "missing subspace would silently drop its distance term from " +
        "every ADC probe; refusing to serve a structurally broken index")
    // codes rides the caller's cache too (r16 opt round): every probe
    // scans it, and a multi-probe consumer (q178 calibrates THEN
    // self-gates; the streaming gate probes per micro-batch) was
    // re-running the whole encode pass (rsub ⋈ codebook + argmin +
    // groupBy) once per probe when it was left uncached.
    IvfPqIndex(cent, c1, cache(assign(c1)))
  }

  /** Coarse-cell width for the CELLED IVF layout (r16 — the gate's
    * 100 TB fix): the label-coarse index probes nprobe whole labels,
    * and with a FIXED label count the per-doc ADC scan grows linearly
    * with the corpus — measured fatal at ×300 (≈2.4M candidate rows
    * PER DOC filled the scratch disk inside the composed LakePipeline
    * run). The celled layout sub-partitions each label by the
    * deterministic sign-bucket of the vector at width p, the smallest
    * p with L·[[CellTarget]]·2^p ≥ n — mean cell size stays
    * ~[[CellTarget]] at every corpus size, so the per-doc probe cost
    * is CONSTANT (nprobe·cellsize·8 rows) and only the broadcast
    * centroid frame grows (linearly, ~n/64 rows — hash-join fallback
    * territory past ~10M cells, noted in SCALE.md). Integer
    * bit-length math, same derivation in the oracle's `cw` CTE. At
    * p = 0 (corpus smaller than L·target) the cell IS the label and
    * the celled index is bit-identical to the classic layout —
    * which is how the sf0.01 oracle covers the degenerate case while
    * sf0.1 (p = 2) covers the live one.
    */
  val CellTarget = 64L

  private[graft] def cellWidthFor(n: Long, labels: Long): Int = {
    val b = (n + labels * CellTarget - 1) / (labels * CellTarget)
    if (b <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(b - 1)
  }

  /** Relabel a `(vec_id, label, qe)` relation with its coarse CELL:
    * label·2^p + sign-bucket(qe) at width p. p = 0 is the identity
    * (no bucket term, labels untouched).
    */
  private[graft] def celled(qv: DataFrame, p: Int): DataFrame =
    if (p == 0) qv
    else qv.withColumn("label",
      expr(s"label * ${1L << p}L + (${lshBucketExpr(p)})"))

  /** [[ivfPqBuild]] on the celled relabeling, dial derived from the
    * corpus (count + distinct labels — two 1-row driver decisions).
    * Returns the index plus the width so incremental encoders can
    * freeze the same dial. The build machinery is UNCHANGED — cells
    * ride the opaque `label` key through centroids, residuals, codes,
    * and the probe.
    */
  private[graft] def ivfPqBuildCelled(
      qv: DataFrame, cache: DataFrame => DataFrame): (IvfPqIndex, Int, Long) = {
    // one fused driver decision (r16 opt round): count + distinct-label
    // count in a single aggregate job (count_distinct plans as one
    // expand + two-phase aggregate) instead of two separate actions —
    // same two exact integers, one fewer full pass over the corpus
    // relation at any scale
    val r = qv.agg(count(lit(1)), countDistinct(col("label"))).first()
    val n = r.getLong(0)
    val labels = r.getLong(1)
    val p = cellWidthFor(n, labels)
    (ivfPqBuild(celled(qv, p), cache), p, n)
  }

  /** Encode NEW vectors into an existing index's FIXED coarse
    * centroids and PQ codebooks — the incremental-refresh path (r15
    * verdict ask #8): one broadcast-joined pass over the new chunk
    * (residual against the frozen per-label centroid, per-subspace
    * nearest-codeword assignment — the same `key` arithmetic
    * [[ivfPqBuild]]'s assign uses, so a vector present at build time
    * encodes to the identical codes). Returns codes rows
    * `(vec_id, label, j, code)` to union onto `idx.codes`. What this
    * does NOT do is move the centroids or codewords — that is the
    * point: the refresh-cadence experiment (CurationStreamBench
    * `refresh` arm) prices exactly the drift this freezing causes
    * against the full-rebuild cost it saves.
    */
  private[graft] def ivfPqEncode(qv: DataFrame, idx: IvfPqIndex): DataFrame = {
    val rsub = qv.join(broadcast(idx.cent), "label")
      .select(col("vec_id"), col("label"),
        expr("zip_with(qe, c, (a, b) -> a - b)").as("r"))
      .select(col("vec_id"), col("label"),
        explode(expr("sequence(0, 7)")).as("j"), col("r"))
      .select(col("vec_id"), col("label"), col("j"),
        expr("slice(r, 8 * j + 1, 8)").as("s"))
    rsub.join(broadcast(idx.codebook), "j")
      .select(col("vec_id"), col("label"), col("j"), expr(
        "(vec_ldot(s, s) - 2 * vec_ldot(s, c) + vec_ldot(c, c)) * 8 + cl")
        .as("key"))
      .groupBy("vec_id", "label", "j").agg(min("key").as("k"))
      .select(col("vec_id"), col("label"), col("j"),
        expr("k % 8").as("code"))
  }

  /** ADC top-k of a query batch `qp(qid, qe)` against an
    * [[IvfPqIndex]]: nprobe-probe coarse search (|Q|·|labels| tiny
    * frames, both broadcast), per-(query, probed partition) residual
    * LUT (|Q|·nprobe·64 rows, broadcast), and the probed ADC scan —
    * the (label, j, code) keys restrict the scan to probed partitions
    * WITHOUT moving the corpus (members of unprobed labels match no
    * LUT row). Returns `(qid, neighbor_id, adist, r)`, r ≤ k. Scanned
    * members matching the query's own id are excluded (self-match
    * guard for audits that query the corpus against itself).
    */
  private[graft] def ivfPqTopK(
      qp: DataFrame, idx: IvfPqIndex, k: Int = 5, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Single-join discipline in the COARSE step too (r16, measured):
    // scoring the qp × cent cross join with qe AND c attached sends
    // ~1.1 KB rows into the sort feeding WindowGroupLimit — at 60k
    // probes × 5k cells that is ~340 GB of sort spill (it filled this
    // host's disk inside the refresh-cadence arm, at cross-join
    // parallelism 2). The scored stream now carries (qid, label,
    // cdist) ONLY — ids + one long through the sort — and the ≤nprobe
    // winners re-attach their vectors by two narrow joins (qid unique
    // in qp, label unique in cent, so the rejoin reproduces the exact
    // winner rows). Same rank order, same output — the oracle chain
    // is untouched.
    val pro = qp.crossJoin(broadcast(idx.cent))
      .select(col("qid"), col("label"),
        expr("vec_ldot(qe, qe) - 2 * vec_ldot(qe, c) + vec_ldot(c, c)").as("cdist"))
      .withColumn("pr", row_number().over(
        Window.partitionBy("qid").orderBy(col("cdist"), col("label"))))
      .filter(col("pr") <= nprobe)
      .select("qid", "label")
    val probe = pro
      .join(qp, "qid")
      .join(broadcast(idx.cent), "label")
      .select(col("qid"), col("label"),
        expr("zip_with(qe, c, (a, b) -> a - b)").as("qr"))
    val lut = probe
      .select(col("qid"), col("label"), explode(expr("sequence(0, 7)")).as("j"), col("qr"))
      .select(col("qid"), col("label"), col("j"), expr("slice(qr, 8 * j + 1, 8)").as("qs"))
      .join(idx.codebook, "j")
      .select(col("qid"), col("label"), col("j"), col("cl"),
        expr("vec_ldot(qs, qs) - 2 * vec_ldot(qs, c) + vec_ldot(c, c)").as("dist"))
    val adc = idx.codes.as("cd")
      .join(broadcast(lut.as("lu")),
        col("lu.label") === col("cd.label") && col("lu.j") === col("cd.j") &&
          col("lu.cl") === col("cd.code") && col("cd.vec_id") =!= col("lu.qid"))
      .groupBy(col("lu.qid").as("qid"), col("cd.vec_id").as("vec_id"))
      .agg(sum("lu.dist").as("adist"))
    adc
      .withColumn("r", row_number().over(
        Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))))
      .filter(col("r") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("adist"), col("r"))
  }

  /** DuckDB mirror of [[labelCentroids]] as a CTE chain ending in
    * `cent(label, c)` (expects `qv(vec_id, label, qe)` in scope).
    */
  private val labelCentroidsDuck =
    """pos AS (SELECT label, g.i, qe[g.i] AS v
      |        FROM qv, generate_series(1, 64) g(i)),
      |m AS (SELECT label, i,
      |        CAST(floor(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cv
      |      FROM pos GROUP BY label, i),
      |cent AS (SELECT label, list(cv ORDER BY i) AS c FROM m GROUP BY label)"""
      .stripMargin

  /** Integer squared-L2 between two quantized lists (DuckDB side). */
  private def pqL2(a: String, b: String) =
    s"(${idotD(a, a)} - 2 * ${idotD(a, b)} + ${idotD(b, b)})"

  /** DuckDB mirror of [[ivfPqBuild]]: CTE chain from the raw
    * `embeddings` table through the compressed corpus
    * `codes(vec_id, label, j, code)` (also leaves `qv`, `cent`, `c1`
    * = the PQ codebook in scope). ONE definition shared by q174 (the
    * ANN audit) and q178 (the semantic gate's batch pin) — the
    * stream/batch forms cannot drift.
    */
  private def ivfPqIndexDuck: String =
    s"""qv AS (SELECT vec_id, label, list_transform(embedding, x -> ${qD("x")}) AS qe
       |            FROM embeddings),
       |$ivfPqCoreDuck""".stripMargin

  /** The build chain AFTER `qv` (centroids → residuals → seeds → PQ
    * codebook → codes) — shared verbatim by the label-coarse chain
    * ([[ivfPqIndexDuck]]) and the celled chain
    * ([[ivfPqCellIndexDuck]]): the cell rides the opaque `label` key,
    * so ONE definition covers both layouts.
    */
  private def ivfPqCoreDuck: String =
    s"""$labelCentroidsDuck,
       |rv AS (SELECT qv.vec_id, qv.label,
       |         list_transform(list_zip(qv.qe, cent.c), x -> x[1] - x[2]) AS r
       |       FROM qv JOIN cent USING (label)),
       |rsub AS (SELECT vec_id, label, g.j AS j, r[(8*g.j+1):(8*g.j+8)] AS s
       |         FROM rv, generate_series(0, 7) g(j)),
       |seed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
       |         FROM (SELECT DISTINCT vec_id FROM rsub ORDER BY vec_id LIMIT 8)),
       |c0 AS (SELECT rsub.j, seed.cl, rsub.s AS c FROM rsub JOIN seed USING (vec_id)),
       |a1 AS (SELECT rsub.vec_id, rsub.j,
       |         CAST(min(${pqL2("rsub.s", "c0.c")} * 8 + c0.cl) AS BIGINT) AS k
       |       FROM rsub JOIN c0 ON c0.j = rsub.j GROUP BY 1, 2),
       |pos1 AS (SELECT a1.j, a1.k % 8 AS cl, g.i, rsub.s[g.i] AS v
       |         FROM a1 JOIN rsub ON rsub.vec_id = a1.vec_id AND rsub.j = a1.j,
       |              generate_series(1, 8) g(i)),
       |m1 AS (SELECT j, cl, i,
       |         CAST(floor(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |       FROM pos1 GROUP BY j, cl, i),
       |c1 AS (SELECT j, cl, list(cv ORDER BY i) AS c FROM m1 GROUP BY j, cl),
       |codes AS (SELECT rsub.vec_id, rsub.label, rsub.j,
       |            CAST(min(${pqL2("rsub.s", "c1.c")} * 8 + c1.cl) AS BIGINT) % 8 AS code
       |          FROM rsub JOIN c1 ON c1.j = rsub.j GROUP BY 1, 2, 3)""".stripMargin

  /** DuckDB mirror of [[ivfPqBuildCelled]]: derives the cell width
    * from the corpus (`cw` — [[cellWidthFor]]'s integer math), buckets
    * each vector on the first p hyperplanes of the q47 md5 family, and
    * feeds `qv` relabeled with `label·2^p + bucket` into the SAME core
    * chain as the classic layout. LEFT-JOIN + COALESCE on the planes
    * table so p = 0 (no planes) degenerates to the identity relabel.
    */
  private def ivfPqCellIndexDuck: String =
    s"""qv0 AS (SELECT vec_id, label, list_transform(embedding, x -> ${qD("x")}) AS qe
       |             FROM embeddings),
       |nl AS (SELECT count(*) AS n, count(DISTINCT label) AS nlab FROM qv0),
       |cw AS (SELECT CASE WHEN (n + nlab * $CellTarget - 1) // (nlab * $CellTarget) <= 1 THEN 0
       |              ELSE length(bin((n + nlab * $CellTarget - 1) // (nlab * $CellTarget) - 1)) END AS p
       |       FROM nl),
       |cplanes AS (
       |  SELECT j, list((('0x' || substr(md5(concat('plane|', j, '|', i)), 1, 15))::BIGINT % 2001 - 1000) ORDER BY i) AS pvec
       |  FROM generate_series(0, 63) g(j), generate_series(1, 64) gi(i), cw
       |  WHERE j < cw.p
       |  GROUP BY j),
       |cbkt AS (SELECT v.vec_id,
       |          COALESCE((SUM(CASE WHEN ${idotD("v.qe", "p.pvec")} >= 0
       |                    THEN (1::BIGINT << p.j) ELSE 0 END))::BIGINT, 0) AS bucket
       |        FROM qv0 v LEFT JOIN cplanes p ON true GROUP BY v.vec_id),
       |qv AS (SELECT qv0.vec_id,
       |         qv0.label * (1::BIGINT << (SELECT p FROM cw)) + cbkt.bucket AS label,
       |         qv0.qe
       |       FROM qv0 JOIN cbkt ON cbkt.vec_id = qv0.vec_id),
       |$ivfPqCoreDuck""".stripMargin

  /** DuckDB mirror of [[ivfPqTopK]]'s probe + ADC scan, ending in
    * `adc(qid, vec_id, adist)` (self-matches excluded). Expects
    * `qp(qid, qe)` plus [[ivfPqIndexDuck]]'s relations in scope;
    * nprobe = 2 (the registered dial).
    */
  private def ivfPqAdcDuck: String =
    s"""probe AS (SELECT qid, label
       |          FROM (SELECT qp.qid, cent.label,
       |                  row_number() OVER (PARTITION BY qp.qid
       |                    ORDER BY ${pqL2("qp.qe", "cent.c")}, cent.label) AS pr
       |                FROM qp, cent) WHERE pr <= 2),
       |qr0 AS (SELECT probe.qid, probe.label,
       |          list_transform(list_zip(qp.qe, cent.c), x -> x[1] - x[2]) AS qr
       |        FROM probe JOIN qp USING (qid) JOIN cent USING (label)),
       |qrs AS (SELECT qid, label, g.j AS j, qr[(8*g.j+1):(8*g.j+8)] AS qs
       |        FROM qr0, generate_series(0, 7) g(j)),
       |lut AS (SELECT qrs.qid, qrs.label, qrs.j, c1.cl,
       |          CAST(${pqL2("qrs.qs", "c1.c")} AS BIGINT) AS dist
       |        FROM qrs JOIN c1 ON c1.j = qrs.j),
       |adc AS (SELECT lut.qid, codes.vec_id, CAST(sum(lut.dist) AS BIGINT) AS adist
       |        FROM codes JOIN lut ON lut.label = codes.label
       |                           AND lut.j = codes.j AND lut.cl = codes.code
       |        WHERE codes.vec_id <> lut.qid
       |        GROUP BY 1, 2)""".stripMargin

  /** The semantic gate's FALLBACK distance threshold: a doc is a
    * semantic near-dup when its nearest compressed neighbor sits
    * within float-space L2 0.92. Until r15 this constant WAS the
    * gate — calibrated by hand on this fixture's measured nn_dist
    * deciles (0.92 sits between p10 and p25 at both SFs) — which
    * meant a different embedding corpus would silently over- or
    * under-flag (the r15 verdict ask #3). The registered pin (q178)
    * and the streaming gate now derive the bar from the corpus's own
    * compressed-distance distribution ([[calibratedGateTau]]); this
    * constant remains as the documented fallback when the calibration
    * sample is empty, and as the deployment default for callers that
    * pass an explicit τ. The SEMANTICS (nearest compressed neighbor,
    * integer adist, √adist/2²⁰ ≤ τ) are what q178 pins cross-engine.
    */
  val SemanticGateMaxDist = 0.92

  /** Calibration percentile for [[calibratedGateTau]]: the derived τ
    * is the p[[SemanticGatePct]] of the corpus's own sampled
    * nearest-compressed-neighbor distances — "a near-dup is a doc
    * UNUSUALLY close to an existing one, relative to this corpus",
    * which is the definition that transfers across embedding spaces
    * where any fixed distance does not. 20 lands inside the same
    * p10–p25 window the hand-calibrated 0.92 occupied on the driver
    * fixture, so the derived gate reproduces the pinned behavior
    * there while tracking the distribution elsewhere
    * (SemanticGateSpec moves the corpus and watches the bar follow).
    */
  val SemanticGatePct = 20

  /** Corpus-derived semantic-gate threshold (r15 verdict ask #3): τ =
    * the [[SemanticGatePct]]-th-percentile nearest-compressed-neighbor
    * distance over a deterministic ~500-doc sample of the corpus
    * probed against its own index (self-matches excluded by
    * ivfPqTopK's guard). Exact integer selection — the k-th smallest
    * adist by (adist, qid) — so the oracle re-derives the identical
    * bar from its own CTE chain; the float τ follows by the same
    * correctly-rounded √/2²⁰ both engines compute. The sample is
    * [[KnnGraph.modFor]]'s (~500 probes at ANY corpus size — the
    * calibration cost is bounded, not corpus-proportional), and the
    * selection window runs over ≤ sample-size rows. Falls back to
    * [[SemanticGateMaxDist]] when the sample has no index hits.
    */
  private[graft] def calibratedGateTau(
      corpus: DataFrame, idx: IvfPqIndex, nOpt: Option[Long] = None): Double = {
    import org.apache.spark.sql.expressions.Window
    // `nOpt` lets a caller that already counted the corpus (q178's
    // celled build does) skip the recount action (r16 opt round)
    val n = nOpt.getOrElse(corpus.count())
    val samp = corpus.filter(expr(KnnGraph.sampSpark(KnnGraph.modFor(n))))
      .select(col("vec_id").as("qid"), col("qe"))
    val cal = ivfPqTopK(samp, idx, k = 1)
      .filter(col("adist").isNotNull)
      .select(col("qid"), col("adist"))
    // ONE single-partition window pass over the ≤ ~500-row sample — a
    // 1-row driver decision (the BPE-argmax / planesFor precedent).
    // The sample count m rides the same window frame as the rank, so
    // the k-th-smallest selection no longer needs its own count()
    // action first (r16 opt round); empty sample → no row → fallback.
    // Exact integer selection, identical to the old two-action form.
    val w = Window.orderBy(col("adist"), col("qid"))
    val sel = cal
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rn") === greatest(lit(1L),
        expr(s"$SemanticGatePct * m div 100")))
      .select("adist").collect()
    if (sel.isEmpty) SemanticGateMaxDist
    else math.sqrt(sel(0).getLong(0).toDouble) / 1048576.0
  }

  /** Per-doc semantic near-dup verdicts against an [[IvfPqIndex]] —
    * the ONE definition of the gate's decision boundary, shared by
    * the streaming gate ([[graft.stream.StreamingCuration]] delegates
    * here per micro-batch) and its batch oracle pin q178 (the
    * DriftMonitor/q87 shared-expression pattern): quantize the batch
    * embeddings (the same 2²⁰ fixed point the index was built with),
    * ADC-probe for each doc's nearest compressed neighbor, flag docs
    * within `maxDist` — float-space L2, i.e. `sqrt(adist)/2²⁰ ≤
    * maxDist` (adist is integer L2 in the quantized residual space,
    * so the boolean is bit-identical on any engine computing the same
    * integer). Every input doc gets a verdict row: docs whose probed
    * partitions held no corpus vector come back `semantic_dup = false`
    * with NULL neighbor; a batch doc whose id equals a corpus vec_id
    * skips that one corpus vector (ivfPqTopK's self-match guard).
    *
    * Scale: per batch this is two broadcast-sized frames (probe, LUT)
    * and ONE pass over the compressed codes relation restricted to
    * probed partitions — the corpus's full vectors are never touched
    * after index build.
    */
  private[graft] def semanticVerdicts(
      batch: DataFrame,
      idx: IvfPqIndex,
      maxDist: Double): DataFrame = {
    VectorExpressions.register(batch.sparkSession)
    val qp = batch.select(col("doc_id").as("qid"),
      expr(qeSpark).as("qe"))
    val top1 = ivfPqTopK(qp, idx, k = 1)
      .select(col("qid").as("doc_id"), col("neighbor_id").as("nn_vec_id"),
        expr("sqrt(cast(adist as double)) / 1048576.0D").as("nn_dist"))
    batch.join(top1, Seq("doc_id"), "left")
      .withColumn("semantic_dup",
        coalesce(col("nn_dist") <= maxDist, lit(false)))
  }

  /** Spark-side LSH sign-bucket expression over a `qe` column (q47's
    * deterministic hyperplane family: md5-derived integer components
    * in [-1000, 1000], identical to [[planesDuck]] at the registered
    * width of 6). Shared by q47 (multi-probe ANN) and the q175/q176
    * kNN-graph init; `planes` is the corpus-size dial (more planes →
    * smaller buckets; production raises it so bucket size stays
    * ~constant — KnnBench measures the dial, the registered queries
    * pin 6).
    */
  private[graft] def lshBucketExpr(planes: Int = 6): String = {
    def planeArr(j: Int): String = "array(" + (1 to 64).map { i =>
      val p = Portable.h60Scala(s"plane|$j|$i") % 2001 - 1000
      s"${p}L"
    }.mkString(", ") + ")"
    (0 until planes)
      .map(j => s"CASE WHEN vec_ldot(qe, ${planeArr(j)}) >= 0 THEN ${1L << j}L ELSE 0L END")
      .mkString(" + ")
  }

  /** DuckDB mirror of the hyperplane family: CTE `planes(j, pvec)`. */
  private[ext] val planesDuck =
    """planes AS (
      |  SELECT j, list((('0x' || substr(md5(concat('plane|', j, '|', i)), 1, 15))::BIGINT % 2001 - 1000) ORDER BY i) AS pvec
      |  FROM generate_series(0, 5) g(j), generate_series(1, 64) gi(i)
      |  GROUP BY j)""".stripMargin

  /** DuckDB quantized-embedding CTE `qv(vec_id, label, embedding, qe)`. */
  private[ext] val qvDuck =
    s"qv AS (SELECT vec_id, label, embedding, list_transform(embedding, x -> ${qD("x")}) AS qe FROM embeddings)"

  /** DuckDB mirror of [[lshBucketExpr]]: CTE `bkt(vec_id, bucket)`
    * (expects `planes` and `qv` in scope).
    */
  private[ext] val bktDuck =
    s"""bkt AS (SELECT v.vec_id,
       |          (SUM(CASE WHEN ${idotD("v.qe", "p.pvec")} >= 0
       |                    THEN (1::BIGINT << p.j) ELSE 0 END))::BIGINT AS bucket
       |        FROM qv v, planes p GROUP BY v.vec_id)""".stripMargin

  /** Quantize ONCE per vector at the scan (`qe`), then every pair/probe
    * kernel is `vec_ldot` over long arrays — in an O(n·m) join,
    * re-quantizing inside the pair kernel (`vec_qdot`) would redo the
    * 128 floor/cast ops per PAIR instead of 64 per ROW.
    */
  private[graft] def nv(s: org.apache.spark.sql.SparkSession, d: String) = {
    VectorExpressions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), expr(qeSpark).as("qe"))
      .withColumn("nrm", expr("sqrt(cast(vec_ldot(qe, qe) as double))"))
  }

  /** IVF candidate generation (q40's search, pre-ranking): coarse
    * partition = `label`, integer centroids, `maxProbe`-probe, exact
    * quantized cosine on the probed partitions only. Returns `(qid,
    * neighbor_id, cos, pr)` where `pr` is the probe rank of the
    * partition that produced the candidate; q40 ranks the 2-probe set
    * to top-5, q153 audits that top-5 against the brute-force truth,
    * q159 sweeps `pr ≤ nprobe` over the 4-probe set for the tuning
    * curve.
    */
  private def ivfCand(s: org.apache.spark.sql.SparkSession, d: String,
      maxProbe: Int = 2): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qv = nv(s, d)
    // centroid per (label, dim): integer sum + floor-divide mean —
    // order-independent, so no sequential-fold contortions needed
    val pos = qv
      .select(col("label"), col("vec_id"),
        posexplode(col("qe")).as(Seq("p", "v")))
      .select(col("label"), (col("p") + 1).as("i"), col("v"))
    val cent = pos.groupBy("label", "i")
      .agg(sum("v").as("cs"), count(lit(1)).as("n"))
    val cvec = cent
      .select(col("label"), col("i"),
        expr("cast(floor(cast(cs as double) / n) as bigint)").as("cq"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(i, cq))), x -> x.cq)").as("cvec"))
    val q = qv.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qe").as("qq"), col("nrm").as("qnrm"))
    // probe: 2 nearest centroids per query (integer dots, tiny frames)
    val qc = broadcast(q).crossJoin(broadcast(cvec))
      .select(col("qid"), col("label"), col("qq"), col("qnrm"), expr(
        "cast(vec_ldot(qq, cvec) as double)" +
          " / (qnrm * sqrt(cast(vec_ldot(cvec, cvec) as double)))")
        .as("ccos"))
    val probe = qc
      .withColumn("r", row_number().over(
        Window.partitionBy("qid").orderBy(col("ccos").desc, col("label"))))
      .filter(col("r") <= maxProbe)
      .select(col("qid"), col("label").as("plabel"),
        col("r").cast("long").as("pr"), col("qq"), col("qnrm"))
    // the probe relation is ≤ |Q|·nprobe rows BY CONSTRUCTION (a query
    // batch × 2 probed partitions) — a structural bound, so the forced
    // broadcast is legitimate (the q146 rule). Without it the planner
    // sizes the join off the CORPUS side: at test SF it broadcast the
    // whole embedding table, and at ×100 it degraded to shuffling the
    // corpus by label (57 MB compressed at the x100 soak) — exactly
    // the exchange an IVF probe exists to avoid. With the probe side
    // pinned, the corpus streams once through a hash join and its
    // label partitions never move.
    broadcast(probe).join(qv.as("e"),
        col("e.label") === col("plabel") && col("e.vec_id") =!= col("qid"))
      .select(col("qid"), col("e.vec_id").as("neighbor_id"),
        expr("cast(vec_ldot(qq, e.qe) as double) / (qnrm * e.nrm)").as("cos"),
        col("pr"))
  }

  /** DuckDB mirror of [[ivfCand]]: CTE chain ending in
    * `cand(qid, neighbor_id, cos, pr)` (also leaves `nv` in scope).
    */
  private def ivfCandDuck(maxProbe: Int = 2) =
    s"""qv AS (SELECT vec_id, label, embedding,
       |         list_transform(embedding, x -> ${qD("x")}) AS qe FROM embeddings),
       |pos AS (SELECT label, vec_id, i, qe[i] AS v
       |        FROM qv, generate_series(1, 64) g(i)),
       |cent AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS cs, count(*) AS n
       |         FROM pos GROUP BY label, i),
       |cvec AS (SELECT label,
       |           list(CAST(floor(CAST(cs AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS cvec
       |         FROM cent GROUP BY label),
       |$nvDuck,
       |q AS (SELECT qv.vec_id AS qid, qv.embedding AS qemb, qv.qe AS qq, nv.nrm AS qnrm
       |      FROM qv JOIN nv ON nv.vec_id = qv.vec_id WHERE qv.vec_id < 10),
       |qc AS (SELECT qid, label,
       |         CAST(${idotD("qq", "cvec")} AS DOUBLE)
       |           / (qnrm * sqrt(CAST(${idotD("cvec", "cvec")} AS DOUBLE))) AS ccos
       |       FROM q, cvec),
       |probe AS (SELECT qid, label, CAST(r AS BIGINT) AS pr
       |          FROM (SELECT qid, label,
       |                  row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, label) AS r
       |                FROM qc) WHERE r <= $maxProbe),
       |cand AS (SELECT q.qid, e.vec_id AS neighbor_id,
       |           CAST(${qdotD("q.qemb", "e.embedding")} AS DOUBLE) / (q.qnrm * e.nrm) AS cos,
       |           p.pr AS pr
       |         FROM probe p
       |         JOIN q ON q.qid = p.qid
       |         JOIN nv e ON e.label = p.label AND e.vec_id <> q.qid)""".stripMargin

  /** DuckDB brute-force exact top-5 per query point (q39's kernel as a
    * CTE, expects `nv` in scope) — the ground truth both recall audits
    * compare against.
    */
  private val bfTop5Duck =
    s"""bf AS (SELECT qid, neighbor_id
       |       FROM (SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
       |               row_number() OVER (PARTITION BY a.vec_id
       |                 ORDER BY CAST(${qdotD("a.embedding", "b.embedding")} AS DOUBLE)
       |                          / (a.nrm * b.nrm) DESC, b.vec_id) AS r
       |             FROM nv a JOIN nv b ON b.vec_id <> a.vec_id
       |             WHERE a.vec_id < 10) WHERE r <= 5)""".stripMargin

  /** Spark mirror of [[bfTop5Duck]]: exact top-5 `(qid, neighbor_id)`
    * per query point from the brute-force scan over an [[nv]] relation.
    */
  private def bfTop5(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    broadcast(e.filter(col("vec_id") < 10).as("a"))
      .join(e.as("b"), col("b.vec_id") =!= col("a.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("neighbor_id"),
        expr("cast(vec_ldot(a.qe, b.qe) as double) / (a.nrm * b.nrm)").as("cos"))
      .withColumn("r", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("r") <= 5)
      .select(col("qid"), col("neighbor_id"))
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
         |        CAST(${qdotD("a.embedding", "b.embedding")} AS DOUBLE) / (a.nrm * b.nrm) AS cos
         |      FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
         |WHERE cos >= 0.4""".stripMargin) { (s, d) =>
      val e = nv(s, d)
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          expr("cast(vec_ldot(a.qe, b.qe) as double) / (a.nrm * b.nrm)").as("cos"))
        .filter(col("cos") >= 0.4)
        .select(col("a_id"), col("b_id"),
          expr("floor(cos * 1000000.0D) / 1000000.0D").as("cosine"))
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
         |              CAST(${qdotD("a.embedding", "b.embedding")} AS DOUBLE) / (a.nrm * b.nrm) AS cos
         |            FROM nv a JOIN nv b ON b.vec_id <> a.vec_id
         |            WHERE a.vec_id < 10))
         |WHERE rank <= 5""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = nv(s, d)
      val q = e.filter(col("vec_id") < 10)
      broadcast(q.as("a")).join(e.as("b"), col("b.vec_id") =!= col("a.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("neighbor_id"),
          expr("cast(vec_ldot(a.qe, b.qe) as double) / (a.nrm * b.nrm)").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("neighbor_id"), col("rank"),
          expr("floor(cos * 1000000.0D) / 1000000.0D").as("cosine"))
    },

    // ── IVF-probed ANN (the 100 TB scale path) ─────────────────────────
    // Coarse partition = `label`; centroid = per-dimension quantized
    // integer mean (sum then floor-divide — both exact). Cosine is
    // scale-invariant, so the floor in the mean only perturbs the
    // centroid direction by < 2⁻²⁰ per component. Each query probes its
    // 2 nearest centroids and searches only those partitions.
    // (Candidate generation lives in [[ivfCand]]/[[ivfCandDuck]],
    // shared with the q153 recall audit.)
    Q(
      "q40_ivf_ann",
      s"""WITH ${ivfCandDuck()}
         |SELECT qid, neighbor_id, rank,
         |  floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM (SELECT qid, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      ivfCand(s, d)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("neighbor_id"), col("rank"),
          expr("floor(cos * 1000000.0D) / 1000000.0D").as("cosine"))
    },

    // ── IVF recall audit (the q73 pattern, for the embedding path) ─────
    // LSH blocking has its recall (q73) and precision (q126) audited;
    // this closes the symmetry for the IVF path: exact top-5 from the
    // brute-force scan (q39's kernel) vs IVF-probed top-5 (q40's), per
    // query point. Recall@5 is the operating metric an IVF deployment
    // tunes nprobe against — a probe count that stops finding the
    // exact neighbors shows up here as recall < 1, not as a silent
    // quality cliff in whatever consumes the neighbors.
    //
    // Scale: both sides are rank-5-truncated per query, so the audit
    // join is (|Q|·5) rows regardless of corpus size; the cost is the
    // two searches it composes — and the brute-force side is the same
    // "queries ≪ corpus, one corpus scan" shape as q39, run over an
    // audit SAMPLE of queries in production, never the full query log.
    Q(
      "q153_ivf_recall",
      s"""WITH ${ivfCandDuck()},
         |ivf AS (SELECT qid, neighbor_id
         |        FROM (SELECT qid, neighbor_id,
         |                row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS r
         |              FROM cand) WHERE r <= 5),
         |$bfTop5Duck,
         |f AS (SELECT bf.qid, CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM bf LEFT JOIN ivf ON ivf.qid = bf.qid AND ivf.neighbor_id = bf.neighbor_id)
         |SELECT qid, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(CASE WHEN hit = 1 THEN 1 END) AS BIGINT) AS n_found,
         |  floor(count(CASE WHEN hit = 1 THEN 1 END) * 1000000.0 / count(*)) / 1000000.0 AS recall
         |FROM f GROUP BY qid""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = nv(s, d)
      val ivf = ivfCand(s, d)
        .withColumn("r", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("r") <= 5)
        .select(col("qid"), col("neighbor_id"), lit(1).as("hit"))
      bfTop5(e).join(ivf, Seq("qid", "neighbor_id"), "left")
        .groupBy("qid")
        .agg(
          count(lit(1)).as("n_exact"),
          count(expr("CASE WHEN hit = 1 THEN 1 END")).as("n_found"),
          expr("floor(count(CASE WHEN hit = 1 THEN 1 END) * 1000000.0D / count(1)) / 1000000.0D")
            .as("recall"))
    },

    // ── nprobe tuning sweep (the q148 pattern, for the IVF knob) ───────
    // q153 audits the DEPLOYED operating point; this produces the curve
    // the point is chosen FROM: recall@5 at nprobe 1..4, computed from
    // ONE 4-probe candidate generation — each candidate carries the
    // probe rank `pr` of the partition that produced it, and a 4-row
    // nprobe dimension fans candidates into every sweep arm with
    // pr ≤ nprobe (the same one-score-many-thresholds trick as q148's
    // Jaccard sweep; the BNL join is legitimate because the build side
    // is the 4-row dimension). More probes monotonically widen the
    // candidate set, so recall is non-decreasing by construction —
    // the spec pins it and the oracle certifies the exact values.
    Q(
      "q159_nprobe_sweep",
      s"""WITH ${ivfCandDuck(4)},
         |probes AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS np),
         |iv AS (SELECT np, qid, neighbor_id
         |       FROM (SELECT p.np, c.qid, c.neighbor_id,
         |               row_number() OVER (PARTITION BY p.np, c.qid
         |                 ORDER BY c.cos DESC, c.neighbor_id) AS r
         |             FROM cand c JOIN probes p ON c.pr <= p.np)
         |       WHERE r <= 5),
         |$bfTop5Duck,
         |f AS (SELECT p.np, CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM bf CROSS JOIN probes p
         |      LEFT JOIN iv ON iv.np = p.np AND iv.qid = bf.qid
         |        AND iv.neighbor_id = bf.neighbor_id)
         |SELECT np AS nprobe, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(CASE WHEN hit = 1 THEN 1 END) AS BIGINT) AS n_found,
         |  floor(count(CASE WHEN hit = 1 THEN 1 END) * 1000000.0 / count(*)) / 1000000.0 AS recall
         |FROM f GROUP BY np""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = nv(s, d)
      val probes = s.range(1, 5).select(col("id").as("np"))
      val iv = ivfCand(s, d, maxProbe = 4)
        .join(broadcast(probes), col("pr") <= col("np"))
        .withColumn("r", row_number().over(
          Window.partitionBy("np", "qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("r") <= 5)
        .select(col("np"), col("qid"), col("neighbor_id"), lit(1).as("hit"))
      bfTop5(e).crossJoin(broadcast(probes))
        .join(iv, Seq("np", "qid", "neighbor_id"), "left")
        .groupBy("np")
        .agg(
          count(lit(1)).as("n_exact"),
          count(expr("CASE WHEN hit = 1 THEN 1 END")).as("n_found"),
          expr("floor(count(CASE WHEN hit = 1 THEN 1 END) * 1000000.0D / count(1)) / 1000000.0D")
            .as("recall"))
        .select(col("np").as("nprobe"), col("n_exact"), col("n_found"),
          col("recall"))
    },

    // ── Hard-negative mining (contrastive-training sampling) ───────────
    // The sampling step of embedding-model training (DPR, Karpukhin et
    // al. 2020): for each anchor, the most-similar vectors of a
    // DIFFERENT label are the hard negatives — the examples that
    // actually move a contrastive loss, where random negatives are
    // trivially separable. Same brute-force shape as q39 with a label
    // disequality: anchors broadcast, corpus streams once, and the
    // per-anchor top-3 is rank-truncated before anything else happens.
    // In production the anchor set is the training batch (structurally
    // small) and the scan side is pre-filtered by the ANN index
    // (q40/q47); the exact scan here is the auditable ground truth.
    Q(
      "q162_hard_negatives",
      s"""WITH $nvDuck,
         |anch AS (SELECT * FROM nv WHERE vec_id < 10),
         |neg AS (SELECT a.vec_id AS qid, a.label AS anchor_label,
         |          b.vec_id AS neighbor_id, b.label AS neg_label,
         |          CAST(${qdotD("a.embedding", "b.embedding")} AS DOUBLE)
         |            / (a.nrm * b.nrm) AS cos
         |        FROM anch a JOIN nv b
         |          ON b.label <> a.label AND b.vec_id <> a.vec_id)
         |SELECT qid, anchor_label, neighbor_id, neg_label, rank,
         |  floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM (SELECT qid, anchor_label, neighbor_id, neg_label, cos,
         |        row_number() OVER (PARTITION BY qid
         |          ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM neg)
         |WHERE rank <= 3""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = nv(s, d)
      val anch = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("anchor_label"),
          col("qe").as("aqe"), col("nrm").as("anrm"))
      broadcast(anch)
        .join(e.as("b"),
          col("b.label") =!= col("anchor_label") &&
            col("b.vec_id") =!= col("qid"))
        .select(col("qid"), col("anchor_label"),
          col("b.vec_id").as("neighbor_id"), col("b.label").as("neg_label"),
          expr("cast(vec_ldot(aqe, b.qe) as double) / (anrm * b.nrm)").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("anchor_label"), col("neighbor_id"),
          col("neg_label"), col("rank"),
          expr("floor(cos * 1000000.0D) / 1000000.0D").as("cosine"))
    },

    // ── Random-hyperplane LSH ANN (the other scale path) ───────────────
    // 6 deterministic hyperplanes (md5-derived integer components in
    // [-1000, 1000], identical in both engines) → 64 sign buckets; each
    // query probes its own bucket plus the 6 hamming-1 neighbors
    // (multi-probe LSH), then ranks candidates by exact quantized
    // cosine. The sign test is an integer comparison — no float dot
    // anywhere near a bucket boundary. The candidate join touches
    // ~probes/buckets of the corpus instead of all of it.
    Q(
      "q47_lsh_ann",
      s"""WITH $planesDuck,
         |$qvDuck,
         |$nvDuck,
         |$bktDuck,
         |q AS (SELECT nv.vec_id AS qid, nv.embedding AS qemb, nv.nrm AS qnrm, b.bucket
         |      FROM nv JOIN bkt b ON b.vec_id = nv.vec_id WHERE nv.vec_id < 10),
         |probes AS (SELECT qid, qemb, qnrm,
         |             unnest(list_transform(range(0, 7),
         |               t -> CASE WHEN t = 0 THEN bucket
         |                         ELSE xor(bucket, (1::BIGINT << (t - 1))) END)) AS pb
         |           FROM q),
         |cand AS (SELECT p.qid, e.vec_id AS neighbor_id,
         |           CAST(${qdotD("p.qemb", "e.embedding")} AS DOUBLE) / (p.qnrm * e.nrm) AS cos
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
      VectorExpressions.register(s)
      // hyperplane buckets derived with the same md5 the oracle uses
      // (shared with the q175/q176 kNN-graph init: [[lshBucketExpr]])
      val nb = nv(s, d).withColumn("bucket", expr(lshBucketExpr()))
      val q = nb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("qe").as("qq"),
          col("nrm").as("qnrm"), col("bucket"))
      val probes = q.select(col("qid"), col("qq"), col("qnrm"),
        explode(expr(
          "transform(sequence(0, 6), t -> CASE WHEN t = 0 THEN bucket ELSE bucket ^ shiftleft(cast(1 as bigint), t - 1) END)"))
          .as("pb"))
      broadcast(probes).join(nb.as("e"),
          col("e.bucket") === col("pb") && col("e.vec_id") =!= col("qid"))
        .select(col("qid"), col("e.vec_id").as("neighbor_id"),
          expr("cast(vec_ldot(qq, e.qe) as double) / (qnrm * e.nrm)").as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("neighbor_id"), col("rank"),
          expr("floor(cos * 1000000.0D) / 1000000.0D").as("cosine"))
    },

    // ── Semantic decontamination (embedding-space benchmark overlap) ───
    // The embedding-side complement of the n-gram contamination checks
    // (q50 exact overlap, q102 bloom-prefiltered): paraphrased or
    // reformatted eval items share no 8-gram with their corpus twin
    // but sit next to it in embedding space. The first 20 vectors
    // stand in for the benchmark set (the q39 fixture convention);
    // every corpus vector reports its nearest benchmark item when the
    // cosine clears 0.4 (the corpus's demonstration operating point —
    // real decontamination runs ~0.9 on text embeddings).
    //
    // Scale: the benchmark set is small BY DEFINITION (eval suites are
    // thousands of items), so it broadcasts and the corpus streams
    // once — the q39 brute-force shape with the roles reversed; the
    // per-vector top-1 window shuffles only (vec_id, bench_id, cos)
    // triples for rows that already cleared the threshold prefilter,
    // a contamination-rate-sized relation, not the corpus.
    Q(
      "q158_semantic_decontamination",
      s"""WITH $nvDuck,
         |bench AS (SELECT * FROM nv WHERE vec_id < 20),
         |corp AS (SELECT * FROM nv WHERE vec_id >= 20),
         |sc AS (SELECT c.vec_id AS vec_id, b.vec_id AS bench_id,
         |         CAST(${qdotD("c.embedding", "b.embedding")} AS DOUBLE)
         |           / (c.nrm * b.nrm) AS cos
         |       FROM corp c, bench b)
         |SELECT vec_id, bench_id,
         |  floor(cos * 1000000.0) / 1000000.0 AS cosine
         |FROM (SELECT vec_id, bench_id, cos,
         |        row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC, bench_id) AS r
         |      FROM sc WHERE cos >= 0.4)
         |WHERE r = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = nv(s, d)
      val bench = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("bench_id"), col("qe").as("bqe"),
          col("nrm").as("bnrm"))
      e.filter(col("vec_id") >= 20)
        .crossJoin(broadcast(bench))
        .select(col("vec_id"), col("bench_id"),
          expr("cast(vec_ldot(qe, bqe) as double) / (nrm * bnrm)").as("cos"))
        .filter(col("cos") >= 0.4)
        .withColumn("r", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bench_id"))))
        .filter(col("r") === 1)
        .select(col("vec_id"), col("bench_id"),
          expr("floor(cos * 1000000.0D) / 1000000.0D").as("cosine"))
    },

    // ── Semantic dedup within coarse clusters (SemDeDup shape) ─────────
    // The embedding-space dedup of Abbas et al. 2023 ("SemDeDup"):
    // partition the corpus into coarse clusters (here `label`, the same
    // coarse partitioning q40's IVF uses), compare pairs ONLY within a
    // cluster, and drop every vector that has a lower-id neighbor above
    // the cosine threshold — keeping exactly one representative per
    // duplicate neighborhood, deterministically (lowest vec_id). The
    // within-cluster restriction is what makes this the 100 TB path:
    // pairwise cost is Σ n_c² over cluster sizes, bounded by choosing k
    // so n_c stays ~constant as the corpus grows, vs q38's corpus-wide
    // n². The pair join goes through [[Skew.selfPairs]] keyed on label,
    // so an over-dense cluster salts across reducers instead of
    // serializing its n_c² on one task. Threshold 0.4 matches q38's
    // demonstration operating point (corpus max cos ≈ 0.6; production
    // SemDeDup uses ~0.95 on real embeddings).
    Q(
      "q68_semantic_dedup",
      s"""WITH $nvDuck,
         |close AS (SELECT b.vec_id AS vec_id, count(*) AS n_close_lower
         |          FROM nv a JOIN nv b
         |            ON a.label = b.label AND a.vec_id < b.vec_id
         |          WHERE CAST(${qdotD("a.embedding", "b.embedding")} AS DOUBLE) / (a.nrm * b.nrm) >= 0.4
         |          GROUP BY b.vec_id)
         |SELECT nv.vec_id, nv.label,
         |  COALESCE(close.n_close_lower, CAST(0 AS BIGINT)) AS n_close_lower,
         |  close.vec_id IS NULL AS keep
         |FROM nv LEFT JOIN close ON close.vec_id = nv.vec_id""".stripMargin) { (s, d) =>
      // persisted: feeds both sides of the pair join AND the final
      // keep/drop left join — three consumers of one kernel projection
      val e = nv(s, d).transform(CacheScope.scoped)
      val close = Skew.selfPairs(
          e.select("vec_id", "label", "qe", "nrm"),
          "vec_id", Seq("label"), payloadCols = Seq("qe", "nrm"))
        .filter(expr("cast(vec_ldot(a_qe, b_qe) as double) / (a_nrm * b_nrm) >= 0.4D"))
        .groupBy("b_id").agg(count(lit(1)).as("n_close_lower"))
        .withColumnRenamed("b_id", "vec_id")
      e.select("vec_id", "label")
        .join(close, Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"),
          coalesce(col("n_close_lower"), expr("CAST(0 AS BIGINT)")).as("n_close_lower"),
          col("n_close_lower").isNull.as("keep"))
    },

    // ── int8 embedding quantization audit (storage-scale path) ─────────
    // The standard 4× embedding-storage reduction at corpus scale:
    // per-vector symmetric int8 quantization (scale = max|component| /
    // 127) with the reconstruction-error audit a pipeline runs before
    // switching its ANN index to the compact format. All math stays in
    // the 2²⁰ fixed-point integer domain — the int8 code is
    // sign(x)·(|x|·127 div max) (div on NON-NEGATIVE operands only:
    // Spark's `div` truncates toward zero while DuckDB's `//` floors,
    // so they agree only away from negatives), and the error is
    // |x·127 − code·max|, exact BIGINT — which makes even this
    // lossy-compression audit hash-exact cross-engine. Pure per-row
    // projection, no shuffle.
    Q(
      "q75_embedding_quantization",
      s"""WITH qv AS (SELECT vec_id, label,
         |             list_transform(embedding, x -> ${qD("x")}) AS qe FROM embeddings),
         |m AS (SELECT vec_id, label, qe,
         |        list_max(list_transform(qe, x -> abs(x))) AS qmax FROM qv)
         |SELECT vec_id, label, qmax,
         |  CASE WHEN qmax = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(list_max(list_transform(qe, x ->
         |         abs(x * 127 - (CASE WHEN x < 0 THEN -1 ELSE 1 END)
         |           * ((abs(x) * 127) // qmax) * qmax))) AS BIGINT) END AS max_scaled_err,
         |  CASE WHEN qmax = 0 THEN 0.0
         |       ELSE floor(CAST(list_max(list_transform(qe, x ->
         |         abs(x * 127 - (CASE WHEN x < 0 THEN -1 ELSE 1 END)
         |           * ((abs(x) * 127) // qmax) * qmax))) AS BIGINT)
         |         * 1000000.0 / (qmax * 127)) / 1000000.0 END AS rel_err
         |FROM m""".stripMargin) { (s, d) =>
      VectorExpressions.register(s)
      val errArr = "transform(qe, x -> abs(x * 127 - (CASE WHEN x < 0 THEN -1L ELSE 1L END)" +
        " * ((abs(x) * 127) div qmax) * qmax))"
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(qeSpark).as("qe"))
        .withColumn("qmax", expr("array_max(transform(qe, x -> abs(x)))"))
        .select(col("vec_id"), col("label"), col("qmax"),
          expr(s"CASE WHEN qmax = 0 THEN 0L ELSE array_max($errArr) END")
            .as("max_scaled_err"),
          expr(s"CASE WHEN qmax = 0 THEN 0.0D ELSE " +
            s"floor(array_max($errArr) * 1000000.0D / (qmax * 127)) / 1000000.0D END")
            .as("rel_err"))
    },

    // ── Per-group embedding centroids (semantic profile / drift) ───────
    // The corpus-monitoring aggregate: mean vector per label, exact
    // across engines because each component is a [[Portable.qavg]]
    // micro-unit sum. Spark computes all 64 components as ONE wide
    // aggregation (64 agg columns in a single groupBy — one exchange of
    // 10 labels × 64 partials) and unpivots with stack(), instead of
    // exploding 64 rows per vector into the shuffle; the oracle can
    // afford the lateral explode. Memory-noted pattern: wide-agg beats
    // explode×K whenever K is a fixed small fan-out.
    Q(
      "q59_centroid_profile", {
        val c = Portable.qavg("CAST(embedding[i] AS DOUBLE)", 6)
        s"""SELECT label, CAST(i AS INT) AS dim, $c AS centroid, count(*) AS n
           |FROM embeddings, generate_series(1, 64) g(i)
           |GROUP BY label, i""".stripMargin
      }) { (s, d) =>
      val aggs = (1 to 64).map(i =>
        expr(Portable.qavg(s"CAST(element_at(embedding, $i) AS DOUBLE)", 6)).as(s"c$i")) :+
        count(lit(1)).as("n")
      Tables.embeddings(s, d)
        .groupBy("label")
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr("label",
          s"stack(64, ${(1 to 64).map(i => s"$i, c$i").mkString(", ")}) as (dim, centroid)",
          "n")
        .select("label", "dim", "centroid", "n")
    },

    // ── K-means training (2 Lloyd iterations — the IVF index builder) ──
    // The missing piece between "embeddings" and q40's IVF search: TRAIN
    // the coarse quantizer. Deterministic seeding (vec_id < 8), two full
    // Lloyd rounds, entirely in the 2²⁰ fixed-point integer domain:
    // squared distance expands to vec_ldot(q,q) − 2·vec_ldot(q,c) +
    // vec_ldot(c,c) (exact integer identity with Σ(qᵢ−cᵢ)²), and the
    // argmin is encoded as min(dist·8 + cl) — one BIGINT min with the
    // lowest-cluster tiebreak built into the low bits, so assignment
    // needs NO window and NO join disambiguation. New centroids are
    // floor(Σv / n) per dimension (one correctly-rounded double div of
    // a < 2⁵³ integer — portable). Per-iteration cost at 100 TB: the
    // k=8 centroid table BROADCASTS; assignment is a narrow map over
    // the corpus (k dot products/vector); the recompute exchange
    // carries (cl, dim, partial-sum) with map-side combine. Reported:
    // per-cluster membership, inertia (Σ min-dist, the convergence
    // metric a trainer monitors per round), and an md5 fingerprint of
    // the final centroid — comparison over the whole 64-d vector
    // without 512 output rows. sum(dist) ≤ n·64·2⁴² needs the HUGEINT
    // CAST in the oracle; Spark's BIGINT sum wraps at ~2⁶³ — at 10¹²
    // vectors the trainer would report inertia in a wider unit (the
    // documented qval-style trade).
    Q(
      "q80_kmeans_train", {
        val dist = s"(${idotD("qv.qe", "cc.c")} * (-2) + ${idotD("qv.qe", "qv.qe")} + ${idotD("cc.c", "cc.c")})"
        s"""WITH qv AS (SELECT vec_id, list_transform(embedding, x -> ${qD("x")}) AS qe FROM embeddings),
           |c0 AS (SELECT vec_id AS cl, qe AS c FROM qv WHERE vec_id < 8),
           |a1 AS (SELECT qv.vec_id, CAST(min($dist * 8 + cc.cl) AS BIGINT) AS k
           |       FROM qv, c0 cc GROUP BY qv.vec_id),
           |s1 AS (SELECT vec_id, k % 8 AS cl FROM a1),
           |pos1 AS (SELECT s1.cl, g.i, qv.qe[g.i] AS v
           |         FROM s1 JOIN qv USING (vec_id), generate_series(1, 64) g(i)),
           |m1 AS (SELECT cl, i,
           |         CAST(floor(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cv
           |       FROM pos1 GROUP BY cl, i),
           |c1 AS (SELECT cl, list(cv ORDER BY i) AS c FROM m1 GROUP BY cl),
           |a2 AS (SELECT qv.vec_id, CAST(min($dist * 8 + cc.cl) AS BIGINT) AS k
           |       FROM qv, c1 cc GROUP BY qv.vec_id),
           |s2 AS (SELECT vec_id, k % 8 AS cl, k // 8 AS dist FROM a2),
           |pos2 AS (SELECT s2.cl, g.i, qv.qe[g.i] AS v
           |         FROM s2 JOIN qv USING (vec_id), generate_series(1, 64) g(i)),
           |m2 AS (SELECT cl, i,
           |         CAST(floor(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cv
           |       FROM pos2 GROUP BY cl, i),
           |c2 AS (SELECT cl, list(cv ORDER BY i) AS c FROM m2 GROUP BY cl),
           |agg AS (SELECT cl AS cluster, count(*) AS n_members,
           |               CAST(sum(dist) AS BIGINT) AS sse
           |        FROM s2 GROUP BY cl)
           |SELECT cluster, n_members, sse,
           |  md5(array_to_string(c2.c, ',')) AS centroid_md5
           |FROM agg JOIN c2 ON c2.cl = cluster""".stripMargin
      }) { (s, d) =>
      VectorExpressions.register(s)
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), expr(qeSpark).as("qe"))
        .transform(CacheScope.scoped) // consumed by seeding + 2 assignment passes + 2 recomputes
      val c0 = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cl"), col("qe").as("c"))
      def assign(cent: org.apache.spark.sql.DataFrame) =
        v.crossJoin(broadcast(cent))
          .select(col("vec_id"), expr(
            "(vec_ldot(qe, qe) - 2 * vec_ldot(qe, c) + vec_ldot(c, c)) * 8 + cl").as("key"))
          .groupBy("vec_id").agg(min("key").as("k"))
          .select(col("vec_id"), expr("k % 8").as("cl"), expr("k div 8").as("dist"))
      def centroids(asg: org.apache.spark.sql.DataFrame) =
        asg.join(v, "vec_id")
          .select(col("cl"), posexplode(col("qe")).as(Seq("p", "vv")))
          .groupBy("cl", "p").agg(sum("vv").as("cs"), count(lit(1)).as("n"))
          .select(col("cl"), col("p"),
            expr("cast(floor(cast(cs as double) / n) as bigint)").as("cv"))
          .groupBy("cl")
          .agg(expr("transform(array_sort(collect_list(struct(p, cv))), x -> x.cv)").as("c"))
      val a2 = assign(centroids(assign(c0))).transform(CacheScope.scoped) // stats + c2 membership
      a2.groupBy(col("cl").as("cluster"))
        .agg(count(lit(1)).as("n_members"), sum("dist").as("sse"))
        .join(centroids(a2).withColumnRenamed("cl", "c_cl"),
          col("cluster") === col("c_cl"))
        .select(col("cluster"), col("n_members"), col("sse"),
          md5(expr("array_join(c, ',')")).as("centroid_md5"))
    },

    // ── Dimension-truncation audit (matryoshka fidelity check) ─────────
    // The evaluation a pipeline runs before storing truncated
    // embeddings (Kusupati et al. 2022's matryoshka representations:
    // keep the first k dims, cut index + compute cost): for a query
    // sample, exact top-5 under the full 64-d cosine vs top-5 under
    // the first-16-dims cosine, reported as per-query overlap —
    // recall@5 of the cheap representation against the true ranking.
    // Both rankings derive from integer vec_ldot dots over the SAME
    // quantized vectors (the truncated norm is just a slice's dot),
    // so both engines rank identically and the audit is hash-exact.
    // Scale: a fixed query sample broadcasts (q39's pattern) and the
    // corpus streams ONCE — the persisted ext relation feeds both
    // rankings; everything after the two rank-filters is
    // sample-sized. On this corpus recall@5 ≈ 0.1–0.4: the audit
    // SHOWS 16 dims are not enough here, which is exactly the
    // decision signal the operator exists to produce.
    Q(
      "q83_dim_truncation", {
        val dotF = s"CAST(${idotD("q.qe", "e.qe")} AS DOUBLE) / (q.nrm * e.nrm)"
        val dotT = s"CAST(${idotD("q.qe16", "e.qe16")} AS DOUBLE) / (q.nrm16 * e.nrm16)"
        s"""WITH qv AS (SELECT vec_id, list_transform(embedding, x -> ${qD("x")}) AS qe FROM embeddings),
           |ext AS (SELECT vec_id, qe, qe[1:16] AS qe16,
           |          sqrt(CAST(${idotD("qe", "qe")} AS DOUBLE)) AS nrm,
           |          sqrt(CAST(${idotD("qe[1:16]", "qe[1:16]")} AS DOUBLE)) AS nrm16
           |        FROM qv),
           |q AS (SELECT * FROM ext WHERE vec_id < 10),
           |t64 AS (SELECT qid, neighbor_id
           |        FROM (SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
           |                row_number() OVER (PARTITION BY q.vec_id
           |                  ORDER BY $dotF DESC, e.vec_id) AS r
           |              FROM q, ext e WHERE e.vec_id <> q.vec_id)
           |        WHERE r <= 5),
           |t16 AS (SELECT qid, neighbor_id
           |        FROM (SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
           |                row_number() OVER (PARTITION BY q.vec_id
           |                  ORDER BY $dotT DESC, e.vec_id) AS r
           |              FROM q, ext e WHERE e.vec_id <> q.vec_id)
           |        WHERE r <= 5),
           |ov AS (SELECT t64.qid, count(t16.neighbor_id) AS n_overlap
           |       FROM t64 LEFT JOIN t16
           |         ON t16.qid = t64.qid AND t16.neighbor_id = t64.neighbor_id
           |       GROUP BY t64.qid)
           |SELECT qid, n_overlap,
           |  floor(n_overlap * 1000000.0 / 5) / 1000000.0 AS recall_at_5
           |FROM ov""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ext = nv(s, d)
        .withColumn("qe16", expr("slice(qe, 1, 16)"))
        .withColumn("nrm16", expr("sqrt(cast(vec_ldot(qe16, qe16) as double))"))
        .transform(CacheScope.scoped) // one corpus pass feeds both rankings
      val q = ext.filter(col("vec_id") < 10)
      def top5(scoreExpr: String): org.apache.spark.sql.DataFrame =
        broadcast(q.as("q")).join(ext.as("e"), col("e.vec_id") =!= col("q.vec_id"))
          .select(col("q.vec_id").as("qid"), col("e.vec_id").as("neighbor_id"),
            expr(scoreExpr).as("cos"))
          .withColumn("r", row_number().over(
            Window.partitionBy("qid").orderBy(col("cos").desc, col("neighbor_id"))))
          .filter(col("r") <= 5)
          .select("qid", "neighbor_id")
      val t64 = top5("cast(vec_ldot(q.qe, e.qe) as double) / (q.nrm * e.nrm)")
      val t16 = top5("cast(vec_ldot(q.qe16, e.qe16) as double) / (q.nrm16 * e.nrm16)")
        .select(col("qid").as("t_qid"), col("neighbor_id").as("t_nid"), lit(1).as("hit"))
      t64.join(t16,
          col("t_qid") === col("qid") && col("t_nid") === col("neighbor_id"), "left")
        .groupBy("qid")
        .agg(count(col("hit")).as("n_overlap"))
        .select(col("qid"), col("n_overlap"),
          expr("floor(n_overlap * 1000000.0D / 5) / 1000000.0D").as("recall_at_5"))
    },

    // ── Embedding outlier audit (mislabel / junk-vector detection) ─────
    // The farthest members of each label's cluster — where mislabeled
    // or degenerate embeddings hide. Per-label integer centroid
    // (q80's recompute shape: floor(Σq/n) per dim — a (labels × dims)
    // combine-reduced exchange), then every vector's squared distance
    // to ITS OWN label centroid via the exact integer expansion
    // (vec_ldot(q,q) − 2·vec_ldot(q,c) + vec_ldot(c,c)); the label
    // centroid table broadcasts (label-count sized) and the top-5
    // farthest per label come from a rank filter (WindowGroupLimit —
    // ≤5 rows per label leave each map task). Distances are exact
    // BIGINTs — hash-exact audit of a geometric property.
    Q(
      "q124_embedding_outliers", {
        val dist = s"${idotD("qv.qe", "cent.c")} * (-2) + ${idotD("qv.qe", "qv.qe")} + ${idotD("cent.c", "cent.c")}"
        s"""WITH qv AS (SELECT vec_id, label, list_transform(embedding, x -> ${qD("x")}) AS qe
           |            FROM embeddings),
           |$labelCentroidsDuck,
           |dist AS (SELECT qv.label, qv.vec_id, CAST($dist AS BIGINT) AS dist
           |         FROM qv JOIN cent USING (label)),
           |r AS (SELECT label, vec_id, dist,
           |        row_number() OVER (PARTITION BY label
           |                           ORDER BY dist DESC, vec_id) AS rank
           |      FROM dist)
           |SELECT label, rank, vec_id, dist FROM r WHERE rank <= 5""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      VectorExpressions.register(s)
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(qeSpark).as("qe"))
        .transform(CacheScope.scoped) // one quantization pass feeds centroids AND distances
      val cent = labelCentroids(v)
      v.join(broadcast(cent), "label")
        .select(col("label"), col("vec_id"),
          expr("vec_ldot(qe, qe) - 2 * vec_ldot(qe, c) + vec_ldot(c, c)").as("dist"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("label").orderBy(col("dist").desc, col("vec_id"))))
        .where(col("rank") <= 5)
        .select("label", "rank", "vec_id", "dist")
    },

    // ── Cluster-separation audit (Davies-Bouldin-lite) ─────────────────
    // Are the labels geometrically distinct, or is the labeling noise?
    // Per label: mean squared distance of members to their own
    // centroid (cohesion) vs the squared distance to the NEAREST other
    // centroid (separation), and their ratio — the per-cluster
    // diagnostic behind Davies-Bouldin / silhouette decisions. Member
    // distances reuse q124's integer expansion over the broadcast
    // centroid table; the centroid-centroid matrix is |labels|² rows
    // of pure integer dots; the ratio divides exact integers as
    // doubles (the ppm shortcut would overflow at squared-distance
    // magnitudes). Everything after the one corpus pass is
    // labels-sized.
    Q(
      "q143_label_separation", {
        val mDist = s"${idotD("qv.qe", "cent.c")} * (-2) + ${idotD("qv.qe", "qv.qe")} + ${idotD("cent.c", "cent.c")}"
        val cDist = s"${idotD("a.c", "b.c")} * (-2) + ${idotD("a.c", "a.c")} + ${idotD("b.c", "b.c")}"
        s"""WITH qv AS (SELECT vec_id, label, list_transform(embedding, x -> ${qD("x")}) AS qe
           |            FROM embeddings),
           |$labelCentroidsDuck,
           |d AS (SELECT qv.label, CAST($mDist AS BIGINT) AS dist
           |      FROM qv JOIN cent USING (label)),
           |intra AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
           |            CAST(sum(dist) AS BIGINT) // count(*) AS intra
           |          FROM d GROUP BY label),
           |cc AS (SELECT a.label AS la, b.label AS lb, CAST($cDist AS BIGINT) AS cd
           |       FROM cent a JOIN cent b ON a.label <> b.label),
           |near AS (SELECT la AS label, lb AS nearest_label, cd,
           |           row_number() OVER (PARTITION BY la ORDER BY cd, lb) AS rn
           |         FROM cc)
           |SELECT i.label, i.n, i.intra, near.nearest_label, near.cd AS inter,
           |  CAST(floor(CAST(near.cd AS DOUBLE) * 1000.0
           |       / CAST(i.intra + 1 AS DOUBLE)) AS BIGINT) AS separation_x1000
           |FROM intra i JOIN near ON near.label = i.label AND near.rn = 1"""
          .stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      VectorExpressions.register(s)
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(qeSpark).as("qe"))
        .transform(CacheScope.scoped)
      val cent = labelCentroids(v).transform(CacheScope.scoped) // member pass + |labels|² matrix
      val intra = v.join(broadcast(cent), "label")
        .select(col("label"),
          expr("vec_ldot(qe, qe) - 2 * vec_ldot(qe, c) + vec_ldot(c, c)").as("dist"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), expr("sum(dist) div count(1)").as("intra"))
      val near = cent.as("a")
        .join(cent.as("b"), col("a.label") =!= col("b.label"))
        .select(col("a.label").as("label"), col("b.label").as("nearest_label"),
          expr("vec_ldot(a.c, a.c) - 2 * vec_ldot(a.c, b.c) + vec_ldot(b.c, b.c)")
            .as("cd"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("label").orderBy(col("cd"), col("nearest_label"))))
        .where(col("rn") === 1)
      intra.join(near, "label")
        .select(col("label"), col("n"), col("intra"),
          col("nearest_label"), col("cd").as("inter"),
          expr("CAST(floor(CAST(cd AS DOUBLE) * 1000.0D" +
            " / CAST(intra + 1 AS DOUBLE)) AS BIGINT)").as("separation_x1000"))
    },

    // ── Product quantization + ADC scan (the compressed ANN tier) ──────
    // Completes the ANN ladder brute-force (q39) → LSH (q47) → IVF
    // (q40): PQ (Jégou/Douze/Schmid, TPAMI 2011 — the FAISS IVF-PQ
    // code path) is what actually fits a 100 TB embedding corpus in
    // memory. The 64-dim vector splits into M=8 subvectors of 8 dims;
    // each subspace gets its own K=8 codebook (deterministic seeds =
    // the first 8 vectors' subvectors, one Lloyd refinement — q80's
    // training shape per subspace); a vector is then stored as 8 small
    // codes — 8 bytes instead of 256, a 32× index compression — and
    // query-time distance is ASYMMETRIC: the query precomputes a
    // (subspace × centroid) lookup table of exact integer L2 distances
    // to every centroid, and each corpus vector's approximate distance
    // is M table adds over its codes. The scan never touches the full
    // vectors. Output is the built-in fidelity audit (the q153/q73
    // pattern): ADC top-5 vs exact integer-L2 top-5 per query, with
    // the ADC rank-1 neighbor and its approximate distance.
    //
    // Scale: codebooks are (8×8 centroids × 8 dims) — broadcast
    // trivially; the LUT is |Q|·64 rows — broadcast; the corpus
    // streams ONCE through encode (a linear pass emitting 8 ints/row)
    // and ONCE through the ADC scan (a broadcast-hash join + map-side
    // partial sum; the |Q|-fan-out before the combine is the query
    // batch dial, exactly the FAISS ADC loop). Codebook TRAINING also
    // scans the corpus here because the test corpus is small; at
    // production scale training runs on a content-hash sample (the
    // q164 dial) — the trained codebook, not the training pass, is
    // what the scan needs. Everything is integer arithmetic
    // (quantized dims ≤ 2²⁰, subspace distances ≤ 2⁴⁵, argmin packed
    // as dist·8+cl ≤ 2⁴⁸), so both engines rank identically and the
    // audit is hash-exact.
    Q(
      "q173_pq_adc", {
        def l2(a: String, b: String) =
          s"(${idotD(a, a)} - 2 * ${idotD(a, b)} + ${idotD(b, b)})"
        s"""WITH qv AS (SELECT vec_id, list_transform(embedding, x -> ${qD("x")}) AS qe FROM embeddings),
           |sub AS (SELECT vec_id, g.j AS j, qe[(8*g.j+1):(8*g.j+8)] AS s
           |        FROM qv, generate_series(0, 7) g(j)),
           |c0 AS (SELECT j, vec_id AS cl, s AS c FROM sub WHERE vec_id < 8),
           |a1 AS (SELECT sub.vec_id, sub.j,
           |         CAST(min(${l2("sub.s", "c0.c")} * 8 + c0.cl) AS BIGINT) AS k
           |       FROM sub JOIN c0 ON c0.j = sub.j GROUP BY 1, 2),
           |pos1 AS (SELECT a1.j, a1.k % 8 AS cl, g.i, sub.s[g.i] AS v
           |         FROM a1 JOIN sub ON sub.vec_id = a1.vec_id AND sub.j = a1.j,
           |              generate_series(1, 8) g(i)),
           |m1 AS (SELECT j, cl, i,
           |         CAST(floor(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cv
           |       FROM pos1 GROUP BY j, cl, i),
           |c1 AS (SELECT j, cl, list(cv ORDER BY i) AS c FROM m1 GROUP BY j, cl),
           |codes AS (SELECT sub.vec_id, sub.j,
           |            CAST(min(${l2("sub.s", "c1.c")} * 8 + c1.cl) AS BIGINT) % 8 AS code
           |          FROM sub JOIN c1 ON c1.j = sub.j GROUP BY 1, 2),
           |q AS (SELECT vec_id AS qid, j, s AS qs FROM sub WHERE vec_id < 10),
           |lut AS (SELECT q.qid, c1.j, c1.cl,
           |          CAST(${l2("q.qs", "c1.c")} AS BIGINT) AS dist
           |        FROM q JOIN c1 ON c1.j = q.j),
           |adc AS (SELECT lut.qid, codes.vec_id, CAST(sum(lut.dist) AS BIGINT) AS adist
           |        FROM codes JOIN lut ON lut.j = codes.j AND lut.cl = codes.code
           |        WHERE codes.vec_id <> lut.qid
           |        GROUP BY 1, 2),
           |tpq AS (SELECT qid, vec_id AS neighbor_id, adist, r
           |        FROM (SELECT qid, vec_id, adist,
           |                row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS r
           |              FROM adc) WHERE r <= 5),
           |ex AS (SELECT qid, neighbor_id
           |       FROM (SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
           |               row_number() OVER (PARTITION BY a.vec_id
           |                 ORDER BY ${l2("a.qe", "b.qe")}, b.vec_id) AS r
           |             FROM qv a JOIN qv b ON b.vec_id <> a.vec_id
           |             WHERE a.vec_id < 10) WHERE r <= 5),
           |ov AS (SELECT ex.qid, count(tpq.neighbor_id) AS n_overlap
           |       FROM ex LEFT JOIN tpq ON tpq.qid = ex.qid AND tpq.neighbor_id = ex.neighbor_id
           |       GROUP BY ex.qid)
           |SELECT ov.qid, t1.neighbor_id AS pq_top1, t1.adist AS top1_adist,
           |  ov.n_overlap,
           |  floor(ov.n_overlap * 1000000.0 / 5) / 1000000.0 AS recall_at_5
           |FROM ov JOIN tpq t1 ON t1.qid = ov.qid AND t1.r = 1""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      VectorExpressions.register(s)
      val qv = Tables.embeddings(s, d)
        .select(col("vec_id"), expr(qeSpark).as("qe"))
        .transform(CacheScope.scoped) // subvector split + exact baseline
      val sub = qv
        .select(col("vec_id"), explode(expr("sequence(0, 7)")).as("j"), col("qe"))
        .select(col("vec_id"), col("j"), expr("slice(qe, 8 * j + 1, 8)").as("s"))
        .transform(CacheScope.scoped) // seeds + 2 assign passes + recompute + queries
      val c0 = sub.filter(col("vec_id") < 8)
        .select(col("j"), col("vec_id").as("cl"), col("s").as("c"))
      // nearest-centroid assignment per (vector, subspace): integer L2,
      // argmin packed as dist*8+cl (dist ≥ 0 — it IS a square), broadcast
      // codebook, corpus streams once
      def assign(cent: org.apache.spark.sql.DataFrame) =
        sub.join(broadcast(cent), "j")
          .select(col("vec_id"), col("j"), expr(
            "(vec_ldot(s, s) - 2 * vec_ldot(s, c) + vec_ldot(c, c)) * 8 + cl")
            .as("key"))
          .groupBy("vec_id", "j").agg(min("key").as("k"))
          .select(col("vec_id"), col("j"), expr("k % 8").as("code"))
      // per-(subspace, centroid) floor-mean recompute — q80's shape
      val c1 = assign(c0)
        .join(sub, Seq("vec_id", "j"))
        .select(col("j"), col("code").as("cl"), posexplode(col("s")).as(Seq("p", "v")))
        .groupBy("j", "cl", "p").agg(sum("v").as("cs"), count(lit(1)).as("n"))
        .select(col("j"), col("cl"), col("p"),
          expr("cast(floor(cast(cs as double) / n) as bigint)").as("cv"))
        .groupBy("j", "cl")
        .agg(expr("transform(array_sort(collect_list(struct(p, cv))), x -> x.cv)").as("c"))
        .transform(CacheScope.scoped) // encode pass + LUT
      val codes = assign(c1)
      val q = sub.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("j"), col("s").as("qs"))
      // |Q|·64-row asymmetric-distance lookup table (exact query-to-
      // centroid integer L2), broadcast onto the code scan
      val lut = q.join(c1, "j")
        .select(col("qid"), col("j"), col("cl"),
          expr("vec_ldot(qs, qs) - 2 * vec_ldot(qs, c) + vec_ldot(c, c)").as("dist"))
      val adc = codes.as("cd")
        .join(broadcast(lut.as("lu")),
          col("lu.j") === col("cd.j") && col("lu.cl") === col("cd.code") &&
            col("cd.vec_id") =!= col("lu.qid"))
        .groupBy(col("lu.qid").as("qid"), col("cd.vec_id").as("vec_id"))
        .agg(sum("lu.dist").as("adist"))
      val tpq = adc
        .withColumn("r", row_number().over(
          Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))))
        .filter(col("r") <= 5)
        .select(col("qid"), col("vec_id").as("neighbor_id"), col("adist"), col("r"))
        .transform(CacheScope.scoped) // overlap audit + rank-1 projection
      val ex = broadcast(qv.filter(col("vec_id") < 10).as("a"))
        .join(qv.as("b"), col("b.vec_id") =!= col("a.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("neighbor_id"),
          expr("vec_ldot(a.qe, a.qe) - 2 * vec_ldot(a.qe, b.qe) + vec_ldot(b.qe, b.qe)")
            .as("dist"))
        .withColumn("r", row_number().over(
          Window.partitionBy("qid").orderBy(col("dist"), col("neighbor_id"))))
        .filter(col("r") <= 5)
        .select(col("qid"), col("neighbor_id"))
      val ov = ex.as("ex")
        .join(tpq.as("t"),
          col("t.qid") === col("ex.qid") &&
            col("t.neighbor_id") === col("ex.neighbor_id"), "left")
        .groupBy(col("ex.qid").as("qid"))
        .agg(count(col("t.neighbor_id")).as("n_overlap"))
      ov.join(tpq.filter(col("r") === 1)
          .select(col("qid"), col("neighbor_id").as("pq_top1"),
            col("adist").as("top1_adist")), "qid")
        .select(col("qid"), col("pq_top1"), col("top1_adist"), col("n_overlap"),
          expr("floor(n_overlap * 1000000.0D / 5) / 1000000.0D").as("recall_at_5"))
    },

    // ── IVF-PQ: coarse partitions + residual PQ + probed ADC scan ──────
    // The COMPOSED production form (FAISS's IVFADC, Jégou et al.
    // TPAMI'11 §V): q40's coarse quantizer (label partitions, integer
    // centroids, 2-probe) restricts WHICH vectors are scanned, and
    // q173's product quantizer — trained on the RESIDUAL qe − c(label),
    // which is tighter than raw vectors because the coarse centroid
    // already absorbs the partition's mean — compresses WHAT is
    // scanned. Query-time distance is fully asymmetric: per probed
    // partition the query forms its own residual against that
    // partition's centroid, builds a (subspace × centroid) LUT of
    // exact integer L2 distances, and every member's approximate
    // distance is M table adds over its stored codes. End-to-end
    // recall (probe misses + quantization error together) is audited
    // against the exact full-corpus L2 top-5 — the honest number an
    // IVF-PQ deployment tunes nprobe and code budget against.
    //
    // Scale: this is the layout that serves 100 TB of embeddings —
    // the index holds 8 code bytes + a label per vector (32×
    // compression), the coarse table and PQ codebooks broadcast, the
    // |Q|·nprobe·64-row LUT broadcasts, and the ADC join's
    // (label, j, code) keys restrict the scan to probed partitions
    // WITHOUT moving the corpus (members of unprobed labels match no
    // LUT row). Training scans the corpus here because the test
    // corpus is small; production trains on the q164 content-hash
    // sample dial. All-integer (residuals ≤ 2²¹ per dim, subspace
    // distances ≤ 2⁴⁷, argmin pack ≤ 2⁵⁰) — hash-exact in both
    // engines.
    Q(
      "q174_ivfpq_ann", {
        s"""WITH $ivfPqIndexDuck,
           |qp AS (SELECT vec_id AS qid, qe FROM qv WHERE vec_id < 10),
           |$ivfPqAdcDuck,
           |tpq AS (SELECT qid, vec_id AS neighbor_id, adist, r
           |        FROM (SELECT qid, vec_id, adist,
           |                row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS r
           |              FROM adc) WHERE r <= 5),
           |ex AS (SELECT qid, neighbor_id
           |       FROM (SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
           |               row_number() OVER (PARTITION BY a.vec_id
           |                 ORDER BY ${pqL2("a.qe", "b.qe")}, b.vec_id) AS r
           |             FROM qv a JOIN qv b ON b.vec_id <> a.vec_id
           |             WHERE a.vec_id < 10) WHERE r <= 5),
           |ov AS (SELECT ex.qid, count(tpq.neighbor_id) AS n_overlap
           |       FROM ex LEFT JOIN tpq ON tpq.qid = ex.qid AND tpq.neighbor_id = ex.neighbor_id
           |       GROUP BY ex.qid)
           |SELECT ov.qid, t1.neighbor_id AS pq_top1, t1.adist AS top1_adist,
           |  ov.n_overlap,
           |  floor(ov.n_overlap * 1000000.0 / 5) / 1000000.0 AS recall_at_5
           |FROM ov JOIN tpq t1 ON t1.qid = ov.qid AND t1.r = 1""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      VectorExpressions.register(s)
      val qv = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(qeSpark).as("qe"))
        .transform(CacheScope.scoped) // centroids + residuals + queries + exact baseline
      val idx = ivfPqBuild(qv, CacheScope.scoped)
      val qp = qv.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("qe"))
      val tpq = ivfPqTopK(qp, idx)
        .transform(CacheScope.scoped) // overlap audit + rank-1 projection
      val ex = broadcast(qv.filter(col("vec_id") < 10).as("a"))
        .join(qv.as("b"), col("b.vec_id") =!= col("a.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("neighbor_id"),
          expr("vec_ldot(a.qe, a.qe) - 2 * vec_ldot(a.qe, b.qe) + vec_ldot(b.qe, b.qe)")
            .as("dist"))
        .withColumn("r", row_number().over(
          Window.partitionBy("qid").orderBy(col("dist"), col("neighbor_id"))))
        .filter(col("r") <= 5)
        .select(col("qid"), col("neighbor_id"))
      val ov = ex.as("ex")
        .join(tpq.as("t"),
          col("t.qid") === col("ex.qid") &&
            col("t.neighbor_id") === col("ex.neighbor_id"), "left")
        .groupBy(col("ex.qid").as("qid"))
        .agg(count(col("t.neighbor_id")).as("n_overlap"))
      ov.join(tpq.filter(col("r") === 1)
          .select(col("qid"), col("neighbor_id").as("pq_top1"),
            col("adist").as("top1_adist")), "qid")
        .select(col("qid"), col("pq_top1"), col("top1_adist"), col("n_overlap"),
          expr("floor(n_overlap * 1000000.0D / 5) / 1000000.0D").as("recall_at_5"))
    },

    // ── Semantic gate, batch form (the streaming gate's oracle pin) ────
    // The r14 streaming semantic gate's threshold semantics — nearest
    // COMPRESSED neighbor within float-space L2 τ — previously lived
    // only in StreamingCurationSpec; this registers the identical
    // decision boundary as a batch query so it is DuckDB-checked at
    // both SFs (r14 verdict ask #3). One shared implementation:
    // [[semanticVerdicts]] serves BOTH the per-micro-batch gate
    // (graft.stream.StreamingCuration delegates here) and this query,
    // and the oracle SQL composes the SAME [[ivfPqIndexDuck]] +
    // [[ivfPqAdcDuck]] chains as q174 — neither surface can drift.
    // Here the corpus gates ITSELF (each doc vs the rest — the batch
    // re-certification form; the self-match guard makes "vs the rest"
    // exact), emitting every doc's verdict. The boolean is portable by
    // construction: adist is an exact integer on both engines, sqrt is
    // correctly rounded, /2²⁰ is exact.
    //
    // Scale: index build is q174's (train on the q164 sample dial at
    // production SF); the gate pass is ONE scan of the compressed
    // codes relation restricted to probed partitions — per doc the
    // candidate set is ~n·nprobe/labels, the IVF restriction that
    // makes an all-docs certification affordable where brute force
    // (q39's n² scan) is not. At 100 TB the batch side is the ingest
    // DELTA, not the corpus — this self-gate form is the one-off
    // re-certification a threshold change triggers.
    Q(
      "q178_semantic_gate", {
        // the derived bar (r16): τ = p20 of the sampled docs' own
        // nearest-compressed-neighbor distances — exact integer
        // selection (k-th smallest adist by (adist, qid)) over the
        // modFor sample, so this chain derives the IDENTICAL bar the
        // Spark side does; the fallback constant appears only in the
        // empty-sample branch. The index is the CELLED layout (r16's
        // scale fix — label-coarse probing is corpus-linear per doc):
        // sf0.01 resolves to p = 0 (cells ≡ labels, the degenerate
        // pin), sf0.1 to p = 2 (live cells) — both covered.
        s"""WITH $ivfPqCellIndexDuck,
           |qp AS (SELECT vec_id AS qid, qe FROM qv),
           |$ivfPqAdcDuck,
           |top1 AS MATERIALIZED (SELECT qid, vec_id, adist
           |         FROM (SELECT qid, vec_id, adist,
           |                 row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS r
           |               FROM adc) WHERE r = 1),
           |ndial AS (SELECT GREATEST(4, (count(*) + 499) // 500) AS md FROM embeddings),
           |calib AS MATERIALIZED (SELECT qid, adist FROM top1
           |          WHERE ${Portable.h60Duck("CAST(qid AS VARCHAR)")} % (SELECT md FROM ndial) = 0),
           |bar AS (SELECT CASE WHEN (SELECT count(*) FROM calib) = 0
           |                    THEN $SemanticGateMaxDist
           |               ELSE (SELECT sqrt(CAST(adist AS DOUBLE)) / 1048576.0 FROM (
           |                       SELECT adist, qid,
           |                         row_number() OVER (ORDER BY adist, qid) AS rn
           |                       FROM calib)
           |                     WHERE rn = GREATEST(1, ($SemanticGatePct * (SELECT count(*) FROM calib)) // 100))
           |               END AS tau)
           |SELECT qv.vec_id AS doc_id, top1.vec_id AS nn_vec_id,
           |  floor(sqrt(CAST(top1.adist AS DOUBLE)) / 1048576.0 * 1000000.0) / 1000000.0
           |    AS nn_dist,
           |  coalesce(sqrt(CAST(top1.adist AS DOUBLE)) / 1048576.0 <= (SELECT tau FROM bar),
           |           false) AS semantic_dup,
           |  CASE WHEN coalesce(sqrt(CAST(top1.adist AS DOUBLE)) / 1048576.0
           |              <= (SELECT tau FROM bar), false)
           |       THEN 'rejected_semantic_dup' ELSE 'accepted' END AS verdict
           |FROM qv LEFT JOIN top1 ON top1.qid = qv.vec_id""".stripMargin
      }) { (s, d) =>
      VectorExpressions.register(s)
      val qv = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(qeSpark).as("qe"))
        .transform(CacheScope.scoped) // index build + the gated batch
      val (idx, _, n) = ivfPqBuildCelled(qv, CacheScope.scoped)
      val tau = calibratedGateTau(qv, idx, Some(n))
      val batch = Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      semanticVerdicts(batch, idx, tau)
        .select(col("doc_id"), col("nn_vec_id"),
          expr("floor(nn_dist * 1000000.0D) / 1000000.0D").as("nn_dist"),
          col("semantic_dup"),
          expr("CASE WHEN semantic_dup THEN 'rejected_semantic_dup'" +
            " ELSE 'accepted' END").as("verdict"))
    },

    // ── q183: celled coarse-layout certification (r16) ─────────────────
    // The dial that makes the semantic gate corpus-constant per doc
    // (see [[CellTarget]]) certified cross-engine: corpus size, label
    // count, the derived width p, and the realized cell-occupancy
    // envelope (count/max/min). sf0.01 pins the degenerate p = 0 case
    // (cells ≡ labels), sf0.1 the live p = 2 split — the same pair of
    // postures q178's gate rides on.
    Q(
      "q183_cell_stats", {
        s"""WITH $ivfPqCellIndexDuck
           |SELECT (SELECT n FROM nl) AS n_vectors,
           |  (SELECT nlab FROM nl) AS n_labels,
           |  (SELECT CAST(p AS BIGINT) FROM cw) AS cell_width,
           |  CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(max(c) AS BIGINT) AS max_cell,
           |  CAST(min(c) AS BIGINT) AS min_cell
           |FROM (SELECT label, count(*) AS c FROM qv GROUP BY label)""".stripMargin
      }) { (s, d) =>
      VectorExpressions.register(s)
      val qv = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(qeSpark).as("qe"))
        .transform(CacheScope.scoped)
      val n = qv.count()
      val labels = qv.select("label").distinct().count()
      val p = cellWidthFor(n, labels)
      celled(qv, p)
        .groupBy("label").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_cells"), max("c").as("max_cell"),
          min("c").as("min_cell"))
        .select(lit(n).as("n_vectors"), lit(labels).as("n_labels"),
          lit(p.toLong).as("cell_width"), col("n_cells"),
          col("max_cell"), col("min_cell"))
    })
}

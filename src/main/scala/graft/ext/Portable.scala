package graft.ext

/** Hash/expression fragments computable bit-identically in Spark SQL and
  * in the DuckDB oracle, so hash-based operators (MinHash, SimHash,
  * fingerprinting) can be verified exactly rather than rows-only.
  *
  * The base primitive is a 60-bit integer hash derived from md5 — both
  * engines produce the same md5 hex string, and 15 hex chars (60 bits)
  * fit a signed 64-bit integer:
  *   Spark:  cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)
  *   DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
  *
  * ORACLE-SIDE RULE — integer sums: DuckDB widens integer `sum()` to
  * HUGEINT (both plain aggregates and `sum(...) OVER` windows), and the
  * driver's value-hash canonicalizes HUGEINT differently from BIGINT
  * even when the numbers are identical. Any integer sum in oracle SQL
  * whose value reaches the output — directly or through derived columns
  * like `(cum - x) // k` — must be wrapped in `CAST(... AS BIGINT)`.
  * Local value comparison cannot catch this (values match); diagnose
  * with `DESCRIBE <oracle sql>` and grep for HUGEINT columns.
  */
object Portable {
  /** Spark-side 60-bit hash of a string SQL expression. */
  def h60Spark(x: String): String =
    s"cast(conv(substr(md5($x), 1, 15), 16, 10) as bigint)"

  /** DuckDB-side 60-bit hash of a string SQL expression. */
  def h60Duck(x: String): String =
    s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** MinHash permutation family over a base hash `h`, reduced mod a
    * 31-bit prime: (a_i * (h % P) + b_i) % P with a_i = 37 i + 11,
    * b_i = 17 i + 7. Products stay < 2^63 for i < ~2000. Same text in
    * both dialects.
    */
  val P = 2147483647L
  def permSpark(h: String, i: String): String =
    s"(((37 * $i + 11) * ($h % $P) + (17 * $i + 7)) % $P)"
  def permDuck(h: String, i: String): String = permSpark(h, i)

  /** Quantized comparison aggregates over DOUBLE columns.
    *
    * Float SUM accumulation order is engine-specific (DuckDB's sum does
    * not fold like Spark's partial/final aggregation), so
    * `round(sum(doubleCol), k)` only hash-matches while no group's sum
    * happens to land near a rounding boundary — correctness by luck
    * that runs out as data grows. Summing fixed-point int64 micro-units
    * (`floor(x·10⁶ + 0.5)` — nearest micro-unit, so per-row error is
    * ±0.5e-6 with no systematic drift, unlike bare floor whose bias
    * accumulates linearly with row count) instead is associative, so
    * the result is identical under ANY grouping or ordering — including
    * two-level partial aggregation, which composes EXACTLY (unlike
    * float sums). The final value derives by single correctly-rounded
    * double ops; `floor(x+0.5)` is deterministic across engines because
    * the input doubles are already identical on both sides.
    *
    * Dialect note: Spark parses un-suffixed decimal literals as DECIMAL
    * and `floor` returns BIGINT, so the final scaling division would be
    * DECIMAL in Spark but DOUBLE in DuckDB — qsum/qavg/qscale therefore
    * CAST their result to DOUBLE explicitly (same text in both
    * dialects, bit-exact value either way).
    *
    * Overflow bound: micro-unit sums accumulate in BIGINT, so a group's
    * |sum(x)| must stay below 2^63/10^6 ≈ 9.2e12 units. Spark's
    * non-ANSI sum wraps silently past that while DuckDB widens to
    * HUGEINT; callers aggregating unbounded monetary totals at extreme
    * scale should pre-scale or sum in DECIMAL(38,0). All current query
    * groups are orders of magnitude inside the bound.
    */
  def qval(c: String): String = s"CAST(floor(($c) * 1000000.0 + 0.5) AS BIGINT)"

  private def p10(n: Int): Long = math.pow(10, n).toLong

  /** SUM of a double expression, floor-truncated to `dec` decimals.
    *
    * The outer CAST(... AS DOUBLE) is load-bearing: Spark's `floor`
    * returns BIGINT, and BIGINT / decimal literal yields DECIMAL(27,6),
    * while DuckDB's floor→DOUBLE path yields DOUBLE. The cast makes
    * both engines emit DOUBLE, and the value is still bit-exact — the
    * decimal quotient is exact, and exact-value → nearest-double equals
    * DuckDB's correctly-rounded double division of the same integer.
    */
  def qsum(c: String, dec: Int): String =
    s"CAST(floor(CAST(sum(${qval(c)}) AS DOUBLE) / ${p10(6 - dec)}.0) / ${p10(dec)}.0 AS DOUBLE)"

  /** AVG of a double expression, floor-truncated to `dec` decimals. */
  def qavg(c: String, dec: Int): String =
    s"CAST(floor(CAST(sum(${qval(c)}) AS DOUBLE) / count($c) / ${p10(6 - dec)}.0) / ${p10(dec)}.0 AS DOUBLE)"

  /** Scale an already-summed micro-unit total to `dec` decimals. */
  def qscale(c: String, dec: Int): String =
    s"CAST(floor(CAST($c AS DOUBLE) / ${p10(6 - dec)}.0) / ${p10(dec)}.0 AS DOUBLE)"

  /** Re-aggregate pre-summed micro-units (see [[qval]]) to `dec`
    * decimals — for two-level aggregations whose inner level keeps the
    * integer sum.
    */
  def qresum(sumCol: String, dec: Int): String = qscale(s"sum($sumCol)", dec)

  /** The same 60-bit hash computed in Scala (standard md5 → first 15
    * hex chars) — for deriving constants (e.g. LSH hyperplanes) on the
    * driver that the DuckDB oracle re-derives with [[h60Duck]].
    */
  def h60Scala(x: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}

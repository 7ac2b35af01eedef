package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4; the 100 TB reality that a
  * handful of keys can hold 90% of the rows): salting spreads a hot
  * key across `salts` reducers. AQE's skew-join handles moderate skew
  * at runtime; explicit salting is the deterministic-plan tool for
  * known-pathological keys.
  *
  * Both transforms are *result-identical* to their unsalted forms
  * (proved in SkewSpec): salted aggregation re-merges algebraic
  * partials; the salted join replicates the small side across salt
  * values so every (key, salt) pair still meets its matches.
  */
object Skew {

  /** Deterministic salt from the row's full content hash — identical
    * rows share a salt (harmless for algebraic aggregates), everything
    * else spreads uniformly with no RNG in the plan (replayable).
    */
  private def salt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(salts))

  /** Two-phase salted sum/count per key: partial aggregate on
    * (key, salt) — map-side combine plus `salts`-way reducer spread —
    * then merge. sum/count compose; avg = merged sum / merged count.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      salts: Int = 32): DataFrame =
    df.withColumn("_salt", salt(df, salts))
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcount"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("_psum").as(s"sum_$valueCol"), sum("_pcount").as("n"))

  /** Salted equi-join: the big (skewed) side gets a content salt, the
    * small side is replicated once per salt value, and the join key
    * becomes (key, salt) — a hot key's rows land on `salts` different
    * reducers instead of one. Inner-join semantics preserved.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCol: String,
      salts: Int = 32): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(big, salts))
    val replicatedSmall = small
      .withColumn("_salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(replicatedSmall, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** Skew-aware within-bucket self-pairing — the candidate-generation
    * primitive of the LSH/SimHash banding joins: emit every (a, b) pair
    * with `a.idCol < b.idCol` that shares `bucketCols`. A bucket whose
    * row count exceeds `hotThreshold` would serialize its quadratic
    * pair generation on one reducer; such buckets are processed SALTED
    * — left side spread across `salts` reducers by id hash, right side
    * replicated per salt — so each (x, y) pair still meets exactly once
    * (at x's salt) and the hot bucket's m² work lands on `salts` tasks
    * at m²/salts each. Cold buckets take the plain self-join, paying
    * nothing beyond the bucket-size probe (a count aggregation that
    * map-side-combines, then a broadcast of only the >threshold keys —
    * tiny by construction: ≤ rows/threshold entries, and in practice
    * the handful of boilerplate-duplicate band values).
    *
    * Result-identical to the unsalted self-join for any threshold/salt
    * choice (SkewSpec proves it on a 90%-hot-bucket fixture); the split
    * is per-bucket, so no pair can straddle the cold and hot paths.
    *
    * Output: `a_id`, `b_id`, plus `a_<c>`/`b_<c>` for each payload col.
    */
  def selfPairs(
      rel: DataFrame,
      idCol: String,
      bucketCols: Seq[String],
      payloadCols: Seq[String] = Nil,
      hotThreshold: Int = 1024,
      salts: Int = 16): DataFrame = {
    val hotBuckets = rel.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > hotThreshold)
      .select(bucketCols.map(col): _*)
      .withColumn("_hot", lit(true))
    // ONE join, not a cold/hot plan split: a split would re-evaluate
    // `rel` (often an expensive kernel projection) once per branch per
    // side. Instead the salt is conditional per row — cold rows pin
    // salt 0 on both sides, hot rows spread left by id-hash and
    // replicate right across all salts — so each side evaluates `rel`
    // exactly once and cold buckets pay zero replication.
    val marked = rel.join(broadcast(hotBuckets), bucketCols, "left")
    val left = marked.withColumn("_salt",
      when(col("_hot"), pmod(hash(col(idCol)), lit(salts))).otherwise(lit(0)))
    val right = marked.withColumn("_salt",
      explode(when(col("_hot"), expr(s"sequence(0, ${salts - 1})"))
        .otherwise(array(lit(0)))))
    left.as("a").join(right.as("b"),
      (bucketCols :+ "_salt").map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id") +: col(s"b.$idCol").as("b_id") +:
        payloadCols.flatMap(c =>
          Seq(col(s"a.$c").as(s"a_$c"), col(s"b.$c").as(s"b_$c"))): _*)
  }
}

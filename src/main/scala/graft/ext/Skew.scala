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
}

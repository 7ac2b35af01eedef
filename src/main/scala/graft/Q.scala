package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the test tables
  * plus (when SQL-expressible) an equivalent DuckDB oracle query the
  * driver hash-compares against (see SparkEntry).
  *
  * Column names/types must line up between `fn`'s result and `oracle` —
  * the driver sorts columns by name and hashes values, so every computed
  * column is aliased identically on both sides, and doubles that
  * accumulate differently across engines (sums/avgs) are rounded on both
  * sides to make the comparison exact.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  /** Non-SQL-expressible op: the driver records a weaker rows-only check. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

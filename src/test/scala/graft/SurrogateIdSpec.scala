package graft

import graft.etl.StarSchema
import org.scalatest.funsuite.AnyFunSuite

/** The two surrogate-id formulations (r8 VERDICT ask #6) must be
  * id-for-id identical: `orderedIds` (range sort + rdd.zipWithIndex)
  * and `orderedIdsDF` (same sort + monotonically_increasing_id +
  * per-partition offset add) both assign base+1..base+N in natural-key
  * order. Pinned across multiple partitions, duplicate order keys, and
  * an empty input, so whichever form the measured A/B keeps, the other
  * remains a proven drop-in.
  */
class SurrogateIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ids(n: Int, base: Long) = {
    import spark.implicits._
    // keys deliberately unsorted at the source and heavier than the
    // partition count, with duplicates (dup natural keys get DISTINCT'd
    // away upstream in upsertRows; orderedIds itself must just not
    // lose/gap ids over them)
    val df = (0 until n).map(i => (s"key_${(i * 7919) % n}%05d", i % 13))
      .toDF("nk", "payload")
    val a = StarSchema.orderedIds(df, "sk", Seq("nk", "payload"), base)
      .select("nk", "payload", "sk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sortBy(_._3)
    val b = StarSchema.orderedIdsDF(df, "sk", Seq("nk", "payload"), base)
      .select("nk", "payload", "sk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sortBy(_._3)
    CacheScope.drain()
    (a, b)
  }

  test("both formulations assign identical contiguous ordered ids") {
    val (a, b) = ids(5000, base = 100L)
    assert(a.length === 5000 && (a sameElements b))
    assert(a.head._3 === 101L && a.last._3 === 5100L)
    // ids follow the (nk, payload) order with no gaps
    assert(a.map(_._3).toSeq === (101L to 5100L))
    assert(a.map(t => (t._1, t._2)).toSeq === a.map(t => (t._1, t._2)).sorted)
  }

  test("empty input yields an empty keyed frame in both forms") {
    val (a, b) = ids(0, base = 0L)
    assert(a.isEmpty && b.isEmpty)
  }
}

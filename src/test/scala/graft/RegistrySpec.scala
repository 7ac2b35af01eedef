package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the driver contract: `queries` is built as
  * a Map over the registry, so a DUPLICATE query name would silently
  * drop one implementation (and its oracle) from the gate — the kind
  * of regression nothing else would catch until coverage quietly
  * shrank. Also pins the entry smoke check the driver runs.
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registry names are unique, well-formed, and oracle keys match") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    names.foreach(n => assert(n.matches("q\\d+_[a-z0-9_]+"), s"odd name: $n"))
    // every oracle belongs to a registered query (Map construction
    // guarantees the other direction)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library-packaging path: `spark.sql.extensions=graft.GraftExtensions`
  * must inject every codegen kernel into a session WITHOUT any
  * imperative `VectorExpressions.register` call — the route Spark
  * Connect / thrift-server deployments take, where imperative
  * registration isn't reachable.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects all kernels into a fresh session") {
    val old = TestSpark.spark // ensures the shared context exists
    // a NEW SparkSession on the same context: extensions only apply at
    // session construction, and getOrCreate() would return the default
    // session — so clear, build, and restore
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne old, "builder returned the existing session; extensions untested")
      // sessions have independent function registries: other suites'
      // imperative register() calls went to `old`, so resolution here
      // can only come from the extensions injection
      graft.functions.VectorExpressions.kernels.foreach { case (name, _) =>
        assert(s2.catalog.functionExists(name), s"kernel $name not injected")
      }
      val d = s2.sql("SELECT vec_ldot(array(1L, 2L), array(3L, 4L)) AS d")
        .collect()(0).getLong(0)
      assert(d === 11L)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}

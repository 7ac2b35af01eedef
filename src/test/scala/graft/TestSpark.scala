package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt runs suites in one
  * forked JVM; spinning a session per suite triples test time).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("4")
}

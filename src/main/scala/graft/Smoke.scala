package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: verify every test table reads (esp. nanosecond-timestamp
  * parquet in events) and print schemas. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("4")
    Tables.names.foreach { t =>
      try {
        val df = Tables.load(spark, sfDir, t)
        println(s"== $t rows=${df.count()}")
        df.printSchema()
        df.show(2, truncate = 60)
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

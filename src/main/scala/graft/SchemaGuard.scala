package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Schema-drift tripwire for the driver-generated testdata.
  *
  * Round 7 lost 48/157 registry queries to a silent regeneration of
  * `events.parquet` (`ts`: TIMESTAMP(NANOS)-read-as-long → timestamp[us]);
  * every failure surfaced as an opaque per-query DATATYPE_MISMATCH deep in
  * analysis. This guard turns the next drift into ONE line naming the
  * table, column, and actual-vs-expected type, checked up front.
  *
  * Expectations are on the RAW read schema (before [[Tables]] loaders
  * normalize), with a *set* of acceptable types per column wherever the
  * driver has legitimately used more than one encoding across testdata
  * generations — e.g. `events.ts` may be LONG epoch-nanos (via the
  * session's `nanosAsLong` flag), TIMESTAMP, or TIMESTAMP_NTZ; all three
  * are handled by the type-adaptive [[Tables.events]] loader.
  */
object SchemaGuard {
  private val Ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val EventsTs: Set[DataType] = Ts + LongType

  /** table -> ordered (column, acceptable raw types). */
  val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> Set[DataType](IntegerType), "r_name" -> Set[DataType](StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set[DataType](IntegerType), "n_name" -> Set[DataType](StringType),
      "n_regionkey" -> Set[DataType](IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set[DataType](LongType), "c_name" -> Set[DataType](StringType),
      "c_nationkey" -> Set[DataType](IntegerType), "c_acctbal" -> Set[DataType](DoubleType),
      "c_mktsegment" -> Set[DataType](StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set[DataType](LongType), "s_name" -> Set[DataType](StringType),
      "s_nationkey" -> Set[DataType](IntegerType), "s_acctbal" -> Set[DataType](DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set[DataType](LongType), "p_name" -> Set[DataType](StringType),
      "p_brand" -> Set[DataType](StringType), "p_type" -> Set[DataType](StringType),
      "p_size" -> Set[DataType](IntegerType), "p_retailprice" -> Set[DataType](DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set[DataType](LongType), "o_custkey" -> Set[DataType](LongType),
      "o_orderstatus" -> Set[DataType](StringType), "o_totalprice" -> Set[DataType](DoubleType),
      "o_orderdate" -> Ts, "o_orderpriority" -> Set[DataType](StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set[DataType](LongType), "l_partkey" -> Set[DataType](LongType),
      "l_suppkey" -> Set[DataType](LongType), "l_linenumber" -> Set[DataType](IntegerType),
      "l_quantity" -> Set[DataType](DoubleType), "l_extendedprice" -> Set[DataType](DoubleType),
      "l_discount" -> Set[DataType](DoubleType), "l_tax" -> Set[DataType](DoubleType),
      "l_returnflag" -> Set[DataType](StringType), "l_linestatus" -> Set[DataType](StringType),
      "l_shipdate" -> Ts),
    "events" -> Seq(
      "event_id" -> Set[DataType](LongType), "ts" -> EventsTs,
      "user_id" -> Set[DataType](LongType), "event_type" -> Set[DataType](StringType),
      "value" -> Set[DataType](DoubleType), "props" -> Set[DataType](StringType)),
    "documents" -> Seq(
      "doc_id" -> Set[DataType](LongType), "text" -> Set[DataType](StringType),
      "lang" -> Set[DataType](StringType), "source" -> Set[DataType](StringType),
      "n_chars" -> Set[DataType](LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set[DataType](LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> Set[DataType](IntegerType)))

  /** Returns one human-readable line per drift; empty = schemas match. */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    expected.flatMap { case (table, cols) =>
      try {
        val actual = Tables.load(spark, sfDir, table).schema
        val byName = actual.fields.map(f => f.name -> f.dataType).toMap
        val missing = cols.collect {
          case (c, want) if !byName.contains(c) =>
            s"$table.$c MISSING (expected one of ${want.map(_.simpleString).mkString("/")})"
        }
        val drifted = cols.collect {
          case (c, want) if byName.contains(c) && !want.contains(byName(c)) =>
            s"$table.$c is ${byName(c).simpleString} (expected one of ${want.map(_.simpleString).mkString("/")})"
        }
        val extra = actual.fields.map(_.name).filterNot(cols.map(_._1).toSet)
          .map(c => s"$table.$c UNEXPECTED extra column (${byName(c).simpleString})")
        missing ++ drifted ++ extra
      } catch {
        case e: Throwable => Seq(s"$table UNREADABLE at $sfDir: ${e.getMessage}")
      }
    }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{FloatDot, FloatQDot, LongDot, MinHash16, ShingleMinHash, Simhash60}

/** Library packaging of the engine's Catalyst surface: register with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`), which injects the
  * custom functions into every session built from that config —
  * including Spark Connect and thrift-server sessions where imperative
  * registration isn't reachable. [[functions.VectorExpressions.register]]
  * remains as the imperative fallback for externally-built sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "vec_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_qdot"),
      new ExpressionInfo(classOf[FloatQDot].getName, "vec_qdot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatQDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_min_hash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_min_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleMinHash(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[Simhash60].getName, "simhash60"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Simhash60(args(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "minhash16"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHash16(args(0))))
    ext.injectFunction((
      FunctionIdentifier("vec_ldot"),
      new ExpressionInfo(classOf[LongDot].getName, "vec_ldot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LongDot(args(0), args(1))))
  }
}

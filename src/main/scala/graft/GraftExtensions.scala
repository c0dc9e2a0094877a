package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{FloatVectorDot, MinHashSignature}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL: `spark.sql.extensions=graft.GraftExtensions` →
  * `SELECT float_vector_dot(a, b)`, `SELECT minhash_signature(h, 64, 42)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vector_dot"),
      info("float_vector_dot",
        "_FUNC_(a, b) - dot product of two float arrays in double precision"),
      (args: Seq[Expression]) => FloatVectorDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "_FUNC_(hashes[, numPerms[, seed]]) - minhash signature of a bigint array"),
      (args: Seq[Expression]) => {
        def intArg(i: Int, default: Long): Long = args.lift(i) match {
          case Some(Literal(v: Int, _))  => v.toLong
          case Some(Literal(v: Long, _)) => v
          case None                      => default
          case other => throw new IllegalArgumentException(
            s"minhash_signature: literal expected, got $other")
        }
        MinHashSignature(args.head, intArg(1, 64L).toInt, intArg(2, 42L))
      }))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{FloatVectorDot, HyperplaneSignature, KmvSketch,
  MinHashSignature, NearestCells, RollingFingerprint, SimHash64}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL: `spark.sql.extensions=graft.GraftExtensions` →
  * `SELECT float_vector_dot(a, b)`, `SELECT minhash_signature(h, 64, 42)`,
  * `simhash64(hs)`, `hyperplane_signature(v, 16, 42)`,
  * `rolling_fingerprint(s)`, `nearest_cells(v, cents, 1)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def intArg(fn: String, args: Seq[Expression], i: Int, default: Long): Long =
    args.lift(i) match {
      case Some(Literal(v: Int, _))  => v.toLong
      case Some(Literal(v: Long, _)) => v
      case None                      => default
      case other => throw new IllegalArgumentException(
        s"$fn: literal expected, got $other")
    }

  private def arity(fn: String, args: Seq[Expression], min: Int, max: Int): Unit =
    if (args.size < min || args.size > max)
      throw new IllegalArgumentException(
        s"$fn expects $min..$max arguments, got ${args.size}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vector_dot"),
      info("float_vector_dot",
        "_FUNC_(a, b) - dot product of two float arrays in double precision"),
      (args: Seq[Expression]) => {
        arity("float_vector_dot", args, 2, 2); FloatVectorDot(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "_FUNC_(hashes[, numPerms[, seed]]) - minhash signature of a bigint array"),
      (args: Seq[Expression]) => {
        arity("minhash_signature", args, 1, 3)
        MinHashSignature(args.head,
          intArg("minhash_signature", args, 1, 64L).toInt,
          intArg("minhash_signature", args, 2, 42L))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64",
        "_FUNC_(hashes) - 64-bit simhash of a bigint feature-hash array"),
      (args: Seq[Expression]) => {
        arity("simhash64", args, 1, 1); SimHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_signature"),
      info("hyperplane_signature",
        "_FUNC_(vec[, nBits[, seed]]) - random-hyperplane LSH signature of a float array"),
      (args: Seq[Expression]) => {
        arity("hyperplane_signature", args, 1, 3)
        val nBits = intArg("hyperplane_signature", args, 1, 16L).toInt
        if (nBits < 1 || nBits > 63) throw new IllegalArgumentException(
          s"hyperplane_signature: nBits must be in [1, 63], got $nBits")
        HyperplaneSignature(args.head, nBits,
          intArg("hyperplane_signature", args, 2, 42L))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      info("rolling_fingerprint",
        "_FUNC_(s) - 62-bit rolling polynomial hash over the code points of s"),
      (args: Seq[Expression]) => {
        arity("rolling_fingerprint", args, 1, 1); RollingFingerprint(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch",
        "_FUNC_(hash[, k]) - k-minimum-values distinct estimate over a " +
          "BIGINT hash column REDUCED MOD 2147483647 (values outside " +
          "[0, 2^31-1) are rejected; exact below k distinct values)"),
      (args: Seq[Expression]) => {
        arity("kmv_sketch", args, 1, 2)
        // bare AggregateFunction: the analyzer wraps it in an
        // AggregateExpression like any built-in aggregate
        KmvSketch(args.head, intArg("kmv_sketch", args, 1, 256L).toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_cells"),
      info("nearest_cells",
        "_FUNC_(vec, cents, k) - top-k nearest centroid positions by cosine"),
      (args: Seq[Expression]) => {
        arity("nearest_cells", args, 2, 3)
        NearestCells(args(0), args(1), intArg("nearest_cells", args, 2, 1L).toInt)
      }))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchAlgebra

class SketchAlgebraSpec extends TestSpark {
  import spark.implicits._

  test("kmvSketchRows keeps the k smallest distinct hashes per group") {
    val elems = Seq(("a", 50L), ("a", 10L), ("a", 30L), ("a", 10L),
      ("a", 40L), ("b", 5L), ("b", 7L)).toDF("g", "h")
    val sk = SketchAlgebra.kmvSketchRows(elems, col("g"), col("h"), k = 3)
      .orderBy("g", "h").as[(String, Long)].collect()
    assert(sk.toSeq === Seq(("a", 10L), ("a", 30L), ("a", 40L),
      ("b", 5L), ("b", 7L)))
  }

  test("kmvSetOps is exact below saturation: union, intersection, jaccard") {
    // |A| = 100, |B| = 100, overlap 50 — merged sketch (k = 256) sees
    // the whole union, so every estimate must be the true count
    val a = (1L to 100L).map(("a", _))
    val b = (51L to 150L).map(("b", _))
    val sk = SketchAlgebra.kmvSketchRows((a ++ b).toDF("g", "h"),
      col("g"), col("h"), k = 256)
    val r = SketchAlgebra.kmvSetOps(sk, k = 256)
      .as[(String, String, Long, Long, Long)].head()
    assert(r === (("a", "b", 150L, 50L, 333333L)))
  }

  test("kmvSetOps estimator path: saturated sketches land near the truth") {
    // well-mixed hashes (x^5 mod P, the q43 chain); truth: union 3000,
    // intersection 1000. k = 128 → relative std ~ 1/sqrt(k-1) ≈ 9%;
    // the inputs are deterministic so the bounds are stable forever.
    def h5(x: Long): Long = {
      val P = SketchAlgebra.P
      val h0 = (x * 131071 + 524287) % P
      val h2 = (h0 * h0) % P
      (((h2 * h2) % P) * h0) % P
    }
    val a = (1L to 2000L).map(x => ("a", h5(x)))
    val b = (1001L to 3000L).map(x => ("b", h5(x)))
    val k = 128
    val sk = SketchAlgebra.kmvSketchRows((a ++ b).toDF("g", "h"),
      col("g"), col("h"), k)
    val r = SketchAlgebra.kmvSetOps(sk, k)
      .as[(String, String, Long, Long, Long)].head()
    assert(r._3 > 2200 && r._3 < 4000, r) // union within ~4 std
    assert(r._4 > 400 && r._4 < 1800, r)  // intersection, looser
  }

  test("heavyHitters is exact and independent of sketch geometry") {
    // N = 1000: key 7 × 300, key 9 × 120, 58 cold keys × 10
    val rows = Seq.fill(300)(7L) ++ Seq.fill(120)(9L) ++
      (100L until 158L).flatMap(k => Seq.fill(10)(k))
    val df = rows.toDF("k")
    // T = N/8 = 125 → only key 7
    val hh = SketchAlgebra.heavyHitters(df, col("k"), phiInv = 8)
      .as[(Long, Long)].collect().toSet
    assert(hh === Set((7L, 300L)))
    // width 4 floods pass 2 with false-positive candidates (every key
    // collides with a heavy cell); the exact verify returns the
    // IDENTICAL set — the sketch is performance, never semantics
    val hh4 = SketchAlgebra.heavyHitters(df, col("k"), phiInv = 8,
      width = 4).as[(Long, Long)].collect().toSet
    assert(hh4 === hh)
    // looser φ (T = 111) admits the second tier
    val hh9 = SketchAlgebra.heavyHitters(df, col("k"), phiInv = 9)
      .as[(Long, Long)].collect().toSet
    assert(hh9 === Set((7L, 300L), (9L, 120L)))
  }

  test("element-stream duplicates never change a sketch (mergeability)") {
    val base = (1L to 500L).map(("a", _)) ++ (200L to 700L).map(("b", _))
    val dup = base ++ base ++ base
    val k = 64
    def run(rows: Seq[(String, Long)]) =
      SketchAlgebra.kmvSetOps(
        SketchAlgebra.kmvSketchRows(rows.toDF("g", "h"),
          col("g"), col("h"), k), k)
        .orderBy("src_a", "src_b").collect().toSeq
    assert(run(base) === run(dup))
  }

  test("bitmapDistinct: exact counts, null-skip, partitioning-invariant") {
    import graft.functions.BitmapFunctions.bitmapDistinct
    // keys straddle word boundaries (63/64/65) and repeat across rows
    val rows = Seq(("a", 0L), ("a", 63L), ("a", 64L), ("a", 64L),
      ("a", 65L), ("a", 1000L), ("b", 5L), ("b", 5L)).toDF("g", "k")
      .union(Seq(("b", Option.empty[Long])).toDF("g", "k")) // null skipped
    def counts(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(bitmapDistinct(col("k")).as("n")).orderBy("g")
      .as[(String, Long)].collect().toSeq
    val expect = Seq(("a", 5L), ("b", 1L))
    assert(counts(rows) === expect)
    // OR-merge is order/partitioning-free: same bits at any layout
    assert(counts(rows.repartition(7)) === expect)
    // agrees with the generic exact rewrite on a dense random stream
    val r = new scala.util.Random(42)
    val big = Seq.fill(5000)(("g", r.nextInt(800).toLong)).toDF("g", "k")
    val viaBitmap = counts(big).head._2
    val viaGeneric = big.agg(countDistinct(col("k"))).as[Long].head()
    assert(viaBitmap === viaGeneric)
  }

  test("bitmapDistinct fails loudly outside the dense-domain contract") {
    import graft.functions.BitmapFunctions.bitmapDistinct
    val neg = Seq(("a", -1L)).toDF("g", "k")
    val e = intercept[Exception] {
      neg.groupBy("g").agg(bitmapDistinct(col("k"))).collect()
    }
    assert(e.getMessage != null)
    val over = Seq(("a", 10L)).toDF("g", "k")
    val e2 = intercept[Exception] {
      over.groupBy("g").agg(bitmapDistinct(col("k"), maxKey = 5L)).collect()
    }
    assert(e2.getMessage != null)
  }

  test("heavyHittersSides equals per-side heavyHitters, one pass-pair") {
    val ev = (Seq.fill(40)(1L) ++ (10L to 19L)).toDF("k")   // N=50, T=N/5=10
    val or = (Seq.fill(30)(2L) ++ Seq.fill(12)(3L) ++ (20L to 27L)).toDF("k")
    val fused = SketchAlgebra.heavyHittersSides(Seq(
        ("ev", ev, col("k"), 5L), ("or", or, col("k"), 4L)))
      .orderBy("side", "k").as[(String, Long, Long)].collect().toSeq
    val seq = SketchAlgebra.heavyHitters(ev, col("k"), 5L)
      .withColumn("side", lit("ev"))
      .unionByName(SketchAlgebra.heavyHitters(or, col("k"), 4L)
        .withColumn("side", lit("or")))
      .select("side", "k", "exact_cnt")
      .orderBy("side", "k").as[(String, Long, Long)].collect().toSeq
    assert(fused === seq)
    assert(fused === Seq(("ev", 1L, 40L), ("or", 2L, 30L), ("or", 3L, 12L)))
  }
}

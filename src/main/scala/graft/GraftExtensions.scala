package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{BloomHitCount, BloomSketch, CdcSegments,
  CmsEstimate, CmsJoinSize, CmsSketch, EditWithin1, FloatVectorDot,
  HashedShingles, HyperplaneSignature, KmvSketch, KmvSketchValues,
  MinHashSignature, MmrSelect, NearestCells, RollingFingerprint,
  SimHash64, TermCountMap}

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
      FunctionIdentifier("bloom_sketch"),
      info("bloom_sketch",
        "_FUNC_(hash[, mBits[, numHashes[, seed]]]) - Bloom filter bit " +
          "array (binary) over a BIGINT hash column reduced mod 2^31-1; " +
          "merge is bitwise OR, so bytes are partitioning-deterministic"),
      (args: Seq[Expression]) => {
        arity("bloom_sketch", args, 1, 4)
        BloomSketch(args.head,
          intArg("bloom_sketch", args, 1, 1L << 20).toInt,
          intArg("bloom_sketch", args, 2, 3L).toInt,
          intArg("bloom_sketch", args, 3, 42L))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_hit_count"),
      info("bloom_hit_count",
        "_FUNC_(bits, hashes[, mBits[, numHashes[, seed]]]) - how many of " +
          "an array's hashes MIGHT be in the bloom bit array"),
      (args: Seq[Expression]) => {
        arity("bloom_hit_count", args, 2, 5)
        BloomHitCount(args(0), args(1),
          intArg("bloom_hit_count", args, 2, 1L << 20).toInt,
          intArg("bloom_hit_count", args, 3, 3L).toInt,
          intArg("bloom_hit_count", args, 4, 42L))
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      info("cms_sketch",
        "_FUNC_(hash[, depth[, width[, seed]]]) - Count-Min counter matrix " +
          "(binary) over a BIGINT hash column reduced mod 2^31-1; merge is " +
          "element-wise addition, so the matrix is partitioning-deterministic"),
      (args: Seq[Expression]) => {
        arity("cms_sketch", args, 1, 4)
        CmsSketch(args.head,
          intArg("cms_sketch", args, 1, 3L).toInt,
          intArg("cms_sketch", args, 2, 1024L).toInt,
          intArg("cms_sketch", args, 3, 42L))
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      info("cms_estimate",
        "_FUNC_(sketch, hash[, depth[, width[, seed]]]) - min-over-rows " +
          "frequency estimate for one hash from a cms_sketch matrix"),
      (args: Seq[Expression]) => {
        arity("cms_estimate", args, 2, 5)
        CmsEstimate(args(0), args(1),
          intArg("cms_estimate", args, 2, 3L).toInt,
          intArg("cms_estimate", args, 3, 1024L).toInt,
          intArg("cms_estimate", args, 4, 42L))
      }))
    ext.injectFunction((
      FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles",
        "_FUNC_(tokens[, n[, modP]]) - sorted-distinct rolling-fingerprint " +
          "hashes of the n-token shingles of a string array"),
      (args: Seq[Expression]) => {
        arity("hashed_shingles", args, 1, 3)
        val modP = args.lift(2) match {
          case Some(Literal(v: Boolean, _)) => v
          case None                         => true
          case other => throw new IllegalArgumentException(
            s"hashed_shingles: boolean literal expected, got $other")
        }
        HashedShingles(args.head,
          intArg("hashed_shingles", args, 1, 3L).toInt, modP)
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_cells"),
      info("nearest_cells",
        "_FUNC_(vec, cents, k) - top-k nearest centroid positions by cosine"),
      (args: Seq[Expression]) => {
        arity("nearest_cells", args, 2, 3)
        NearestCells(args(0), args(1), intArg("nearest_cells", args, 2, 1L).toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("term_counts"),
      info("term_counts",
        "_FUNC_(tokens) - per-row (term -> count) map of a string array, " +
          "keys sorted bytewise, empty tokens skipped"),
      (args: Seq[Expression]) => {
        arity("term_counts", args, 1, 1); TermCountMap(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_join_size"),
      info("cms_join_size",
        "_FUNC_(cmsA, cmsB[, depth[, width]]) - join-cardinality " +
          "estimate: min over sketch rows of the count-vector dot " +
          "product; never underestimates"),
      (args: Seq[Expression]) => {
        arity("cms_join_size", args, 2, 4)
        CmsJoinSize(args(0), args(1),
          intArg("cms_join_size", args, 2, 3L).toInt,
          intArg("cms_join_size", args, 3, 1024L).toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch_values"),
      info("kmv_sketch_values",
        "_FUNC_(hash[, k]) - the KMV sketch ITSELF: sorted array of the " +
          "k smallest distinct hashes (same buffer as kmv_sketch, " +
          "mergeable; input reduced mod 2147483647)"),
      (args: Seq[Expression]) => {
        arity("kmv_sketch_values", args, 1, 2)
        KmvSketchValues(args.head,
          intArg("kmv_sketch_values", args, 1, 256L).toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("mmr_select"),
      info("mmr_select",
        "_FUNC_(cands, k[, lamPct]) - greedy maximal-marginal-relevance " +
          "selection over array<struct<vec_id bigint, rel double, " +
          "embedding array<float>>>; lamPct is λ·100 (default 70)"),
      (args: Seq[Expression]) => {
        arity("mmr_select", args, 2, 3)
        val k = intArg("mmr_select", args, 1, 10L).toInt
        val lamPct = intArg("mmr_select", args, 2, 70L)
        if (lamPct < 0 || lamPct > 100) throw new IllegalArgumentException(
          s"mmr_select: lamPct must be in [0, 100], got $lamPct")
        MmrSelect(args.head, k, lamPct / 100.0)
      }))
    ext.injectFunction((
      FunctionIdentifier("edit_within_1"),
      info("edit_within_1",
        "_FUNC_(a, b) - true iff levenshtein(a, b) <= 1, via a bounded " +
          "two-pointer pass (no DP)"),
      (args: Seq[Expression]) => {
        arity("edit_within_1", args, 2, 2); EditWithin1(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cdc_segments"),
      info("cdc_segments",
        "_FUNC_(tokens[, modB]) - content-defined segmentation of a string " +
          "array: a token closes its segment iff rolling_fingerprint(token) " +
          "% modB == 0; segments come back space-joined"),
      (args: Seq[Expression]) => {
        arity("cdc_segments", args, 1, 2)
        val modB = intArg("cdc_segments", args, 1, 8L).toInt
        if (modB < 1) throw new IllegalArgumentException(
          s"cdc_segments: modB must be >= 1, got $modB")
        CdcSegments(args.head, modB)
      }))

    // ---- table-valued operator wrappers -----------------------------------
    // the reference's UX is "type a line, get a table"; these put the
    // whole-operator surface behind plain SQL so the REPL (and any SQL
    // client on a session with graft.GraftExtensions) can run the
    // §2.D-ish pipeline operators without Scala: table arguments are
    // names resolved against the session catalog (temp views included),
    // column arguments are name strings, thresholds are literals.
    // Heavy by design — a call builds the operator's full DataFrame
    // plan (dedup_corpus eagerly materializes its clustering stages,
    // like the Scala API it wraps).
    import org.apache.spark.sql.{GraftInternal, SparkSession}
    import org.apache.spark.sql.functions.col
    def strArg(fn: String, args: Seq[Expression], i: Int): String =
      args.lift(i) match {
        case Some(Literal(s: org.apache.spark.unsafe.types.UTF8String, _)) =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"$fn: string literal expected at arg $i, got $other")
      }
    def numArg(fn: String, args: Seq[Expression], i: Int,
               default: Double): Double =
      args.lift(i) match {
        case Some(Literal(v: Int, _))     => v.toDouble
        case Some(Literal(v: Long, _))    => v.toDouble
        case Some(Literal(v: Double, _))  => v
        case Some(Literal(d: org.apache.spark.sql.types.Decimal, _)) =>
          d.toDouble
        case None                         => default
        case other => throw new IllegalArgumentException(
          s"$fn: numeric literal expected at arg $i, got $other")
      }

    ext.injectTableFunction((
      FunctionIdentifier("dedup_corpus"),
      info("dedup_corpus",
        "_FUNC_(table, idCol, textCol[, minJaccard]) - the end-to-end " +
          "dedup pipeline as a table: exact dedup, MinHash-LSH pair " +
          "mining, connected components, one representative per cluster; " +
          "returns the surviving rows with the source schema"),
      (args: Seq[Expression]) => {
        arity("dedup_corpus", args, 3, 4)
        val spark = SparkSession.active
        val df = spark.table(strArg("dedup_corpus", args, 0))
        GraftInternal.logicalPlan(graft.operators.Dedup.dedupCorpus(df,
          col(strArg("dedup_corpus", args, 1)),
          col(strArg("dedup_corpus", args, 2)),
          minJaccard = numArg("dedup_corpus", args, 3, 0.7)))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("decontaminate"),
      info("decontaminate",
        "_FUNC_(corpusTable, idCol, textCol, benchTable, benchIdCol, " +
          "benchTextCol[, minOverlapMilli]) - drop every corpus row whose " +
          "shingle overlap with ANY benchmark row reaches the threshold"),
      (args: Seq[Expression]) => {
        arity("decontaminate", args, 6, 7)
        val spark = SparkSession.active
        GraftInternal.logicalPlan(graft.operators.Dedup.decontaminate(
          spark.table(strArg("decontaminate", args, 0)),
          col(strArg("decontaminate", args, 1)),
          col(strArg("decontaminate", args, 2)),
          spark.table(strArg("decontaminate", args, 3)),
          col(strArg("decontaminate", args, 4)),
          col(strArg("decontaminate", args, 5)),
          minOverlapMilli =
            numArg("decontaminate", args, 6, 800.0).toLong))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("asof_join"),
      info("asof_join",
        "_FUNC_(leftTable, leftKeyCol, leftTimeCol, rightTable, " +
          "rightKeyCol, rightTimeCol, payloadCols) - each left row picks " +
          "up the payload of the latest right row at or before its time, " +
          "per key; payloadCols is a comma-separated column list"),
      (args: Seq[Expression]) => {
        arity("asof_join", args, 7, 7)
        val spark = SparkSession.active
        val payload = strArg("asof_join", args, 6)
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        GraftInternal.logicalPlan(graft.operators.AsofJoin(
          spark.table(strArg("asof_join", args, 0)),
          col(strArg("asof_join", args, 1)),
          col(strArg("asof_join", args, 2)),
          spark.table(strArg("asof_join", args, 3)),
          col(strArg("asof_join", args, 4)),
          col(strArg("asof_join", args, 5)),
          rightPayload = payload))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("apply_changeset"),
      info("apply_changeset",
        "_FUNC_(snapshotTable, changesTable, keyCols[, seqCol]) - MERGE " +
          "a CDC batch (snapshot columns + an 'op' column of " +
          "insert|update|delete) onto a snapshot; keyCols is a " +
          "comma-separated key list; with seqCol the latest change per " +
          "key wins, without it the batch must be key-unique"),
      (args: Seq[Expression]) => {
        arity("apply_changeset", args, 3, 4)
        val spark = SparkSession.active
        val keys = strArg("apply_changeset", args, 2)
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        GraftInternal.logicalPlan(graft.operators.Diff.applyChangeset(
          spark.table(strArg("apply_changeset", args, 0)),
          spark.table(strArg("apply_changeset", args, 1)),
          keys = keys,
          seqCol = args.lift(3).map(_ =>
            strArg("apply_changeset", args, 3))))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("scd2_history"),
      info("scd2_history",
        "_FUNC_(changesTable, keyCols[, opCol, seqCol]) - reshape a CDC " +
          "changelog into SCD type-2 history: one row per (key, version) " +
          "with half-open [valid_from, valid_to) seq bounds and an " +
          "is_current flag; keyCols is a comma-separated key list"),
      (args: Seq[Expression]) => {
        arity("scd2_history", args, 2, 4)
        val spark = SparkSession.active
        val keys = strArg("scd2_history", args, 1)
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        GraftInternal.logicalPlan(graft.operators.Diff.scd2History(
          spark.table(strArg("scd2_history", args, 0)),
          keys = keys,
          opCol = args.lift(2).map(_ => strArg("scd2_history", args, 2))
            .getOrElse("op"),
          seqCol = args.lift(3).map(_ => strArg("scd2_history", args, 3))
            .getOrElse("seq")))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("interval_merge"),
      info("interval_merge",
        "_FUNC_(table, keyCol, startCol, endCol) - union of overlapping-" +
          "or-touching closed intervals per key: one (key, m_start, " +
          "m_end, n_merged) row per disjoint merged interval"),
      (args: Seq[Expression]) => {
        arity("interval_merge", args, 4, 4)
        val spark = SparkSession.active
        GraftInternal.logicalPlan(graft.operators.Intervals.mergeOverlapping(
          spark.table(strArg("interval_merge", args, 0)),
          col(strArg("interval_merge", args, 1)),
          col(strArg("interval_merge", args, 2)),
          col(strArg("interval_merge", args, 3))))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("pps_sample"),
      info("pps_sample",
        "_FUNC_(table, idCol, weightCol, k) - probability-proportional-" +
          "to-size systematic sample: exactly k grid hits over the " +
          "cumulative weight axis in (md5(id), id) order; returns " +
          "(id, w, mult) with multiplicity for items heavier than the " +
          "stride"),
      (args: Seq[Expression]) => {
        arity("pps_sample", args, 4, 4)
        val spark = SparkSession.active
        GraftInternal.logicalPlan(graft.operators.Mixing.ppsSystematicSample(
          spark.table(strArg("pps_sample", args, 0)),
          col(strArg("pps_sample", args, 1)),
          col(strArg("pps_sample", args, 2)),
          k = numArg("pps_sample", args, 3, 0.0).toInt))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("range_digest"),
      info("range_digest",
        "_FUNC_(table, keyCol, rangeSize, cols) - Merkle-style range " +
          "digests: (range_id, n_rows, xor64, sum31) per contiguous key " +
          "range over the portable md5-prefix row hash of the " +
          "comma-separated column list; compare two replicas' digests " +
          "to localize damage without shipping rows. Keys must be " +
          "non-negative; each column escapes | and \\ and renders NULL " +
          "as the \\0 sentinel before joining on |"),
      (args: Seq[Expression]) => {
        arity("range_digest", args, 4, 4)
        val spark = SparkSession.active
        val cols = strArg("range_digest", args, 3)
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        GraftInternal.logicalPlan(graft.operators.Diff.rangeDigest(
          spark.table(strArg("range_digest", args, 0)),
          col(strArg("range_digest", args, 1)),
          rangeSize = numArg("range_digest", args, 2, 0.0).toLong,
          cols = cols.map(col)))
      }))
  }
}

package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** The SQL surface of the native expressions: everything registered by
  * GraftExtensions must be callable from `spark.sql` and agree with the
  * library column API. */
class ExtensionsSpec extends TestSpark {

  test("native expressions are callable from SQL and agree with the library") {
    val r = spark.sql(
      """SELECT
        |  float_vector_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                   array(cast(3.0 as float), cast(4.0 as float))) AS dot,
        |  rolling_fingerprint('abc') AS fp,
        |  simhash64(array(1L, 3L)) AS sh,
        |  hyperplane_signature(array(cast(1.0 as float), cast(-2.0 as float)), 8, 7) AS hp,
        |  element_at(minhash_signature(array(5L, 9L), 4, 42), 1) AS mh0,
        |  element_at(nearest_cells(array(cast(1.0 as float)),
        |    array(array(cast(-1.0 as float)), array(cast(1.0 as float))), 1), 1) AS nc
        |""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) ===
      graft.functions.RollingFingerprintUtil.compute(UTF8String.fromString("abc")))
    // hashes {1, 3}: bit0 votes +2 (set), bit1 votes 0 (strict > 0: unset)
    assert(r.getLong(2) === 1L)
    // deterministic: same value on every call/engine
    assert(r.getLong(3) === spark.sql(
      "SELECT hyperplane_signature(array(cast(1.0 as float), cast(-2.0 as float)), 8, 7)")
      .head().getLong(0))
    // minhash of a fixed set is in [0, 2^31-1)
    assert(r.getLong(4) >= 0L && r.getLong(4) < 2147483647L)
    // vec (1.0) is nearest to centroid (1.0) at position 1 (0-based index 1)
    assert(r.getInt(5) === 1)
  }

  test("sketch family is callable from pure SQL: bloom, cms, shingles") {
    // bloom: a member can never miss
    val hit = spark.sql(
      """WITH s AS (SELECT bloom_sketch(h, 1024, 3, 42) AS b
        |           FROM (SELECT explode(sequence(1L, 100L)) AS h))
        |SELECT bloom_hit_count(b, array(50L), 1024, 3, 42) FROM s
        |""".stripMargin).head().getLong(0)
    assert(hit === 1L)
    // cms: estimate bounded below by the true count, above by n
    val est = spark.sql(
      """WITH c AS (SELECT cms_sketch(h, 3, 64, 42) AS m
        |           FROM (SELECT explode(array(7L, 7L, 7L, 8L)) AS h))
        |SELECT cms_estimate(m, 7L, 3, 64, 42) FROM c
        |""".stripMargin).head().getLong(0)
    assert(est >= 3L && est <= 4L)
    // hashed_shingles: SQL call == library column API
    val viaSql = spark.sql(
      "SELECT hashed_shingles(array('a','b','c','d'), 2)").head().getSeq[Long](0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaLib = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(graft.functions.ShingleFunctions.hashedShingles(col("t"), n = 2))
      .head().getSeq[Long](0)
    assert(viaSql === viaLib && viaSql.nonEmpty)
  }

  test("hyperplane_signature rejects nBits outside 1..63 from BOTH entry points") {
    import org.apache.spark.sql.functions._
    // SQL path
    intercept[Exception] {
      spark.sql("SELECT hyperplane_signature(array(cast(1.0 as float)), 64, 7)")
        .head()
    }
    // Scala/Column path: nBits=64 would silently alias bit 64 to bit 0
    intercept[Exception] {
      spark.sql("SELECT array(cast(1.0 as float)) AS v")
        .select(graft.functions.HyperplaneFunctions
          .hyperplaneSig(col("v"), nBits = 64)).head()
    }
  }

  test("kmv_sketch aggregates from SQL: exact below k, estimate above") {
    // 5 distinct hashes with k=8 → exact count 5
    val exact = spark.sql(
      "SELECT kmv_sketch(h, 8) FROM VALUES (1L),(2L),(3L),(2L),(4L),(5L) AS t(h)")
      .head().getLong(0)
    assert(exact === 5L)
    // 100 distinct keys with k=8 → the estimator branch (non-exact but
    // deterministic: same value on every run). The x^5 mixing matters:
    // the bare affine hash leaves 1..100 on an arithmetic progression
    // and the estimate lands ~100x off (9557 observed).
    val mixSql =
      "SELECT kmv_sketch((((h2 * h2) % 2147483647) * h0) % 2147483647, 8) " +
        "FROM (SELECT h0, (h0 * h0) % 2147483647 AS h2 FROM " +
        "(SELECT (h * 131071 + 524287) % 2147483647 AS h0 " +
        "FROM (SELECT explode(sequence(1L, 100L)) AS h)))"
    val est1 = spark.sql(mixSql).head().getLong(0)
    val est2 = spark.sql(mixSql).head().getLong(0)
    assert(est1 === est2)
    assert(est1 > 20L && est1 < 500L, s"estimate $est1 wildly off 100")
    // hashes outside [0, P) (e.g. raw xxhash64) are rejected loudly
    // instead of yielding a negative "count"
    intercept[Exception] {
      spark.sql("SELECT kmv_sketch(h, 8) FROM VALUES (-5L),(3L) AS t(h)")
        .head()
    }
  }

  test("hashed_shingles treats null tokens as empty strings (no NPE)") {
    import org.apache.spark.sql.functions._
    val withNull = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b') AS toks")
      .select(graft.functions.ShingleFunctions
        .hashedShingles(col("toks"), n = 3).as("h"))
      .head().getSeq[Long](0)
    val withEmpty = spark.sql("SELECT array('a', '', 'b') AS toks")
      .select(graft.functions.ShingleFunctions
        .hashedShingles(col("toks"), n = 3).as("h"))
      .head().getSeq[Long](0)
    assert(withNull === withEmpty)
  }

  test("term_counts and cdc_segments are callable from pure SQL and agree " +
       "with the library column API") {
    val tc = spark.sql(
      "SELECT term_counts(array('b', 'a', 'b', '')) AS m")
      .head().getMap[String, Long](0)
    assert(tc === Map("a" -> 1L, "b" -> 2L))
    // library form produces the identical map
    val lib = spark.sql("SELECT array('b', 'a', 'b', '') AS t")
      .select(graft.functions.TermCountFunctions.termCounts(col("t")).as("m"))
      .head().getMap[String, Long](0)
    assert(tc === lib)
    // cdc_segments: modB=1 means every token closes its own segment
    val segs = spark.sql(
      "SELECT cdc_segments(array('x', 'y', 'z'), 1) AS s")
      .head().getSeq[String](0)
    assert(segs === Seq("x", "y", "z"))
    // default modB=8 agrees with the library builder
    val sql8 = spark.sql("SELECT cdc_segments(array('w1','w2','w3','w4')) AS s")
      .head().getSeq[String](0)
    val lib8 = spark.sql("SELECT array('w1','w2','w3','w4') AS t")
      .select(graft.functions.RollingHashFunctions
        .cdcSegments(col("t"), 8).as("s"))
      .head().getSeq[String](0)
    assert(sql8 === lib8)
  }

  test("kmv_sketch_values, mmr_select and edit_within_1 are callable " +
       "from pure SQL") {
    // kmv_sketch_values: k smallest distinct values, sorted
    val sk = spark.sql(
      """SELECT kmv_sketch_values(h, 3) AS s
        |FROM (SELECT explode(array(9L, 2L, 7L, 2L, 5L)) AS h)
        |""".stripMargin).head().getSeq[Long](0)
    assert(sk === Seq(2L, 5L, 7L))
    // mmr_select over a tiny candidate array: duplicate of the first
    // pick sinks below the diverse mirror (the SimilaritySpec case)
    val mmr = spark.sql(
      """SELECT mmr_select(array(
        |  named_struct('vec_id', 10L, 'rel', cast(0.6 as double),
        |    'embedding', array(cast(0.6 as float), cast(0.8 as float))),
        |  named_struct('vec_id', 11L, 'rel', cast(0.6 as double),
        |    'embedding', array(cast(0.6 as float), cast(0.8 as float))),
        |  named_struct('vec_id', 12L, 'rel', cast(0.6 as double),
        |    'embedding', array(cast(0.6 as float), cast(-0.8 as float)))),
        |  3, 70) AS s
        |""".stripMargin)
      .selectExpr("transform(s, x -> x.vec_id) AS ids").head().getSeq[Long](0)
    assert(mmr === Seq(10L, 12L, 11L))
    // edit_within_1: the bounded check, true/false boundaries
    val ed = spark.sql(
      """SELECT edit_within_1('abc', 'axc') AS a,
        |       edit_within_1('abc', 'axx') AS b,
        |       edit_within_1('abc', 'abcd') AS c
        |""".stripMargin).head()
    assert(ed.getBoolean(0) && !ed.getBoolean(1) && ed.getBoolean(2))
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout (operators/Layout.scala): the key arithmetic and —
  * the point of the operator — a measured data-skipping win: the same
  * selective 2-D filter reads an order of magnitude fewer rows from a
  * Z-clustered parquet layout than from an id-ordered one, via
  * nothing but parquet min/max file stats.
  */
class LayoutSpec extends TestSpark {
  import spark.implicits._

  test("zorder16 interleaves bits (hand-computed values)") {
    val out = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 1L), (0x10000L, 0L))
      .toDF("x", "y")
      .select(Layout.zorder16(col("x"), col("y")))
      .as[Long].collect().toSeq
    // x fills even bits; y fills odd bits; 3=0b11→0b101=5, 1→0b10=2;
    // bits above 15 are masked off
    assert(out === Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0L))
  }

  /** Rows read by a filtered scan over `path` — the FileSourceScan's
    * numOutputRows, i.e. rows surviving parquet row-group/file
    * pruning BEFORE the exact filter runs. */
  private def scanRows(path: String, cond: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(path).filter(cond)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    scan.metrics("numOutputRows").value
  }

  test("Z-clustered files prune under a 2-D filter; id-ordered files don't") {
    // 64k rows over a 256x256 (user, hour) grid — every (u, h) cell
    // once, row id deterministic
    val dir = Files.createTempDirectory("zorder").toString
    val rows = spark.range(0, 256L * 256L)
      .select(col("id"),
        (col("id") % 256).as("user_id"),
        (col("id") / 256).cast("long").as("hour"))
    // layout A: Z-clustered into 256 files (~256 rows each — at this
    // granularity a file covers roughly one aligned 16x16 rectangle)
    Layout.zorderLayout(rows, col("user_id"), col("hour"), buckets = 256)
      .write.parquet(s"$dir/z")
    // layout B: id-ordered (hour-major) into the same 256 files —
    // the best case for the HOUR dimension (contiguous) and the
    // worst for the user dimension (every file spans all users)
    rows.repartitionByRange(256, col("id")).sortWithinPartitions("id")
      .write.parquet(s"$dir/flat")

    // a selective rectangle: 16/256 of users x 16/256 of hours
    val cond = col("user_id").between(64, 79) && col("hour").between(128, 143)
    val zRows = scanRows(s"$dir/z", cond)
    val flatRows = scanRows(s"$dir/flat", cond)
    val total = 256L * 256L

    // the answer itself is 256 rows either way — correctness first
    assert(spark.read.parquet(s"$dir/z").filter(cond).count() === 256L)
    assert(spark.read.parquet(s"$dir/flat").filter(cond).count() === 256L)

    info(s"scan rows: z=$zRows flat=$flatRows of $total")
    // hour-major order: the hour range spans 16/256 of the curve, so
    // file stats prune the hour dimension only → ~1/16 of rows read.
    // Z-order: each file covers a small (user, hour) rectangle, so
    // BOTH dimensions prune → a small multiple of the 256 target rows.
    assert(flatRows >= total / 32,
      s"flat layout read $flatRows rows — expected >= one file")
    assert(zRows * 4 <= flatRows,
      s"z layout read $zRows rows vs flat $flatRows — no skipping win")
    assert(zRows <= total / 16,
      s"z layout read $zRows of $total rows — stats not pruning")
  }

  test("ensureBucketed reuses a fresh copy and REBUILDS when the " +
      "source data is regenerated (fingerprint staleness check)") {
    val dir = Files.createTempDirectory("fpbucket").toString
    val srcPath = s"$dir/src"
    Seq((1L, 1.0)).toDF("k", "v").write.parquet(srcPath)
    def load = spark.read.parquet(srcPath)
    try {
      assert(Layout.ensureBucketed(spark, load, "fp_bk", s"$dir/b",
        buckets = 4, bucketBy = Seq("k")).count() === 1)
      // unchanged source: second call serves the existing copy — the
      // bucketed files keep their modification times (no rewrite)
      def destMtimes = new java.io.File(s"$dir/b").listFiles()
        .map(f => f.getName -> f.lastModified()).toMap
      val before = destMtimes
      Layout.ensureBucketed(spark, load, "fp_bk", s"$dir/b",
        buckets = 4, bucketBy = Seq("k"))
      assert(destMtimes === before, "unchanged source triggered a rewrite")
      // regenerated source: a stale bucketed copy must NOT be served
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
        .write.mode("overwrite").parquet(srcPath)
      assert(Layout.ensureBucketed(spark, load, "fp_bk", s"$dir/b",
        buckets = 4, bucketBy = Seq("k")).count() === 2)
    } finally spark.sql("DROP TABLE IF EXISTS fp_bk")
  }

  test("ensureBucketed RE-REGISTERS (no data rewrite) when the catalog " +
      "entry is gone but the on-disk copy is current — the fresh-session " +
      "path that used to re-pay the clustered write every bench JVM — " +
      "and still rebuilds when the catalog is gone AND the source moved") {
    val dir = Files.createTempDirectory("rereg").toString
    val srcPath = s"$dir/src"
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v").write.parquet(srcPath)
    def load = spark.read.parquet(srcPath)
    def destMtimes = new java.io.File(s"$dir/b").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    try {
      Layout.ensureBucketed(spark, load, "rr_bk", s"$dir/b",
        buckets = 4, bucketBy = Seq("k"))
      val before = destMtimes
      // simulate a fresh session: the in-memory catalog forgets the
      // table, the files and the fingerprint sidecar survive
      spark.sql("DROP TABLE rr_bk")
      val adopted = Layout.ensureBucketed(spark, load, "rr_bk", s"$dir/b",
        buckets = 4, bucketBy = Seq("k"))
      assert(adopted.count() === 3)
      assert(destMtimes === before,
        "current on-disk copy was rewritten instead of re-registered")
      // the adopted table carries the bucket spec: a self-join on the
      // key is exchange-free
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = spark.table("rr_bk").join(spark.table("rr_bk")
          .select(col("k"), col("v").as("v2")), "k")
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin"), p)
        assert(!p.contains("Exchange hashpartitioning"), p)
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      // catalog gone AND source regenerated: adopt must NOT win — the
      // sidecar fingerprint no longer matches, so the copy rebuilds
      spark.sql("DROP TABLE rr_bk")
      Seq((9L, 9.0)).toDF("k", "v").write.mode("overwrite").parquet(srcPath)
      assert(Layout.ensureBucketed(spark, load, "rr_bk", s"$dir/b",
        buckets = 4, bucketBy = Seq("k")).count() === 1)
    } finally spark.sql("DROP TABLE IF EXISTS rr_bk")
  }

  test("ensureBucketed under CONCURRENT callers: exactly one rebuild, " +
      "no DROP/CREATE interleaving — the loser of the race re-checks " +
      "under the per-table lock and serves the winner's copy") {
    val dir = Files.createTempDirectory("racebucket").toString
    val srcPath = s"$dir/src"
    spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.parquet(srcPath)
    def load = spark.read.parquet(srcPath)
    val rebuildsBefore = Layout.rebuilds.get()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val gate = new java.util.concurrent.CountDownLatch(1)
      val calls = (1 to 2).map { _ =>
        Future {
          gate.await()
          Layout.ensureBucketed(spark, load, "race_bk", s"$dir/b",
            buckets = 4, bucketBy = Seq("k")).count()
        }
      }
      gate.countDown()
      val counts = Await.result(Future.sequence(calls), 120.seconds)
      assert(counts === Seq(1000L, 1000L))
      assert(Layout.rebuilds.get() - rebuildsBefore === 1L,
        s"expected exactly one clustered rewrite under the race, " +
          s"got ${Layout.rebuilds.get() - rebuildsBefore}")
      // the surviving table is whole and bucketed
      assert(spark.table("race_bk").count() === 1000L)
    } finally spark.sql("DROP TABLE IF EXISTS race_bk")
  }
}

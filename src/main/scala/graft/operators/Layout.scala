package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT — the 100 TB data-skipping lever.
  *
  * A parquet scan prunes row groups/files whose min/max column stats
  * exclude the filter range. Clustering the write order by ONE column
  * tightens only that column's stats; interleaving the bits of two
  * columns (a Z-order / Morton curve) tightens BOTH — a file of
  * Z-contiguous rows covers a small rectangle of (x, y) space, so
  * selective filters on either or both dimensions skip most files.
  * This is how lakehouse engines make "WHERE user BETWEEN ... AND ts
  * BETWEEN ..." read ~1/N of a 100 TB table; the cluster key costs
  * one range repartition at write time and nothing at read time.
  *
  * Everything here is plain Column arithmetic (magic-number bit
  * spreading — 5 shift/mask steps per dimension), so it rides
  * whole-stage codegen and any engine can replay it bit-for-bit.
  */
object Layout {

  /** Spread the low 16 bits of `v` to the even bit positions 0,2,..30
    * (the classic Morton magic-number ladder). Non-negative inputs;
    * bits above 15 are masked off first. */
  def spread16(v: Column): Column = {
    val a = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value interleaving the low 16 bits of `x` (even
    * positions) and `y` (odd positions). Z-contiguous ranges cover
    * aligned rectangles of (x, y) space — the clustering key for
    * two-dimensional data skipping. */
  def zorder16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The DuckDB replica of [[spread16]]/[[zorder16]], for oracle SQL
    * generation — same masks, same ladder, BIGINT throughout. */
  def spread16Sql(v: String): String = {
    val a = s"(($v) & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  def zorder16Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** A bucketed copy of a table, written ONCE per (table, path) and
    * reused by every later query — the 100 TB contract:
    * hash-clustering the big fact tables on their join key is paid at
    * ingest/compaction time, and every downstream equi-join or
    * aggregation on that key then runs with ZERO Exchange of the fact
    * table (BucketSpec pins the plan).
    *
    * Freshness has two layers. The SOURCE fingerprint (file listing:
    * path/length/mtime) rides both the catalog table properties and a
    * sidecar file next to the data — so a FRESH session whose
    * in-memory catalog lost the table re-REGISTERS the existing
    * clustered files (metadata-only CREATE TABLE, no data rewrite)
    * instead of re-paying the clustered write. Only a fingerprint
    * mismatch — the source was regenerated — rewrites data. */
  def ensureBucketed(spark: org.apache.spark.sql.SparkSession,
                     load: => DataFrame, table: String, path: String,
                     buckets: Int, bucketBy: Seq[String]): DataFrame = {
    // All path checks go through the Hadoop FileSystem of the path
    // (HDFS/S3/local alike — java.io.File would silently report
    // "missing" for any non-local scheme and rewrite every call).
    val hconf = spark.sparkContext.hadoopConfiguration
    val dest = new org.apache.hadoop.fs.Path(path)
    val destFs = dest.getFileSystem(hconf)
    val src = load
    val fp = sourceFingerprint(hconf, src)
    // Per-table lock: two concurrent callers in one JVM serialize
    // here — the first rebuilds/adopts, the second re-checks the
    // catalog UNDER the lock and finds the fresh fingerprint, so a
    // table is never DROP/CREATE-interleaved and a rebuild happens
    // once per source change even under concurrency.
    val lock = tableLocks.computeIfAbsent(table, _ => new Object)
    lock.synchronized {
      val stored: Option[String] =
        if (!spark.catalog.tableExists(table)) None
        else spark.sql(s"SHOW TBLPROPERTIES `$table`")
          .where(col("key") === FingerprintProp)
          .collect().headOption.map(_.getString(1))
      if (!(stored.contains(fp) && destFs.exists(dest))) {
        val fpFile = new org.apache.hadoop.fs.Path(dest, FingerprintFile)
        val diskFp: Option[String] =
          if (!destFs.exists(fpFile)) None
          else {
            // read the sidecar FULLY — a single read() may return a
            // prefix (FSDataInputStream contract), and a truncated
            // fingerprint would silently demote adoption to a rewrite
            val in = destFs.open(fpFile)
            try {
              val len = destFs.getFileStatus(fpFile).getLen.toInt
              val buf = new Array[Byte](len)
              in.readFully(0, buf)
              Some(new String(buf,
                java.nio.charset.StandardCharsets.UTF_8).trim)
            } finally in.close()
          }
        spark.sql(s"DROP TABLE IF EXISTS `$table`")
        if (diskFp.contains(fp)) {
          // the clustered files are current — adopt them, don't rewrite.
          // CREATE TABLE with bucketing demands an explicit column list;
          // the source's schema IS the bucketed copy's schema.
          System.err.println(s"[layout] re-register $table from $path")
          adoptions.incrementAndGet()
          val schemaDdl = src.schema.map(f =>
            s"`${f.name}` ${f.dataType.sql}").mkString(", ")
          val cols = bucketBy.map(c => s"`$c`").mkString(", ")
          createTolerant(spark, fp,
            s"CREATE TABLE `$table` ($schemaDdl) USING PARQUET " +
            s"CLUSTERED BY ($cols) SORTED BY ($cols) " +
            s"INTO $buckets BUCKETS LOCATION '$path'", table)
        } else {
          // rebuilds should happen once per SOURCE CHANGE — log each one
          // so a bench/ops run can see when the contract is violated
          System.err.println(s"[layout] rebuild $table: stored=$stored " +
            s"diskFp=$diskFp fp=$fp")
          rebuilds.incrementAndGet()
          graft.sinks.ParquetSink.writeBucketed(
            src, table, path, buckets, bucketBy)
          // fingerprint written AFTER the data, to a temp name and
          // RENAMED into place: a crash mid-write leaves no (or a
          // temp-named) sidecar, so the next call rebuilds instead of
          // adopting a half-written copy, and a concurrent reader in
          // another process never sees a partially-written sidecar
          val tmp = new org.apache.hadoop.fs.Path(dest,
            s"$FingerprintFile.tmp-${java.util.UUID.randomUUID()}")
          val out = destFs.create(tmp, true)
          try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          destFs.delete(fpFile, false)
          if (!destFs.rename(tmp, fpFile))
            throw new java.io.IOException(
              s"[layout] sidecar rename failed: $tmp -> $fpFile")
        }
        spark.sql(s"ALTER TABLE `$table` SET TBLPROPERTIES " +
          s"('$FingerprintProp'='$fp')")
      }
    }
    spark.table(table)
  }

  /** CREATE TABLE tolerant of a cross-PROCESS race (the in-process
    * race is already excluded by the per-table lock): if another
    * session created the table between our DROP and CREATE, accept it
    * iff its fingerprint matches ours — same source, same layout —
    * else the sources genuinely diverged and failing loudly beats
    * silently querying the other session's data. */
  private def createTolerant(spark: org.apache.spark.sql.SparkSession,
                             fp: String, ddl: String, table: String): Unit =
    try spark.sql(ddl)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("already exists") =>
        val theirs = spark.sql(s"SHOW TBLPROPERTIES `$table`")
          .where(col("key") === FingerprintProp)
          .collect().headOption.map(_.getString(1))
        if (!theirs.contains(fp)) throw e
    }

  /** Test/ops visibility: how many clustered rewrites and
    * metadata-only adoptions this JVM has performed. */
  private[graft] val rebuilds = new java.util.concurrent.atomic.AtomicLong
  private[graft] val adoptions = new java.util.concurrent.atomic.AtomicLong
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private val FingerprintProp = "graft.source.fingerprint"
  private val FingerprintFile = "_graft_fingerprint"

  /** 64-bit fingerprint of a DataFrame's source FILE LISTING — path,
    * length, modification time per input file (metadata-only: one
    * status call per file on the driver, a one-time-per-session cost,
    * never a data read). Sources with no file listing (in-memory
    * test frames) fingerprint as a constant and so rewrite once per
    * session — the pre-fingerprint behavior. */
  private def sourceFingerprint(hconf: org.apache.hadoop.conf.Configuration,
                                df: DataFrame): String = {
    val parts = df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(hconf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    val h = parts.foldLeft(1125899906842597L) { (acc, s) =>
      s.foldLeft(acc)((a, c) => a * 31 + c)
    }
    java.lang.Long.toHexString(h)
  }

  /** Cluster `df` for two-dimensional skipping: range-partition into
    * `buckets` Z-ranges and sort within each — written as parquet,
    * every file then covers a small (x, y) rectangle and carries
    * tight min/max stats on BOTH source columns. The Z column itself
    * is dropped: the skipping works through the stats of the real
    * filter columns, no schema change. One range exchange (sampled
    * bounds), the same cost class as any clustered write. */
  def zorderLayout(df: DataFrame, x: Column, y: Column,
                   buckets: Int): DataFrame =
    df.withColumn("__z", zorder16(x, y))
      .repartitionByRange(buckets, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}

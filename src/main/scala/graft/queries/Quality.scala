package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** §2 extension — the data-quality family: the audits a pipeline runs
  * BEFORE trusting a table (rule violations, referential integrity),
  * the first-failing-rule attrition report every curation pipeline
  * publishes, and per-group statistical outlier detection. Complements
  * the q75-q78 profiling family: profiling says what a table LOOKS
  * like, this family says what's WRONG with it.
  *
  * Scale shapes: q79 pays exactly two partial-aggregated key shuffles
  * and one co-partitioned full-outer join for all six of its rules —
  * the minimum an exact uniqueness + two-direction FK audit costs at
  * any scale. t18 is one row-local corpus scan. q80 follows q78's
  * two-pass recipe: an output-sized stats pass collected and inlined as
  * literal maps, then one row-local flagging scan — no join, no second
  * shuffle of corpus data.
  */
object Quality {

  val all: Seq[Q] = Seq(

    // -- declarative rule audit --------------------------------------------
    // per-rule violation counts over orders: null / range / domain
    // checks, key uniqueness, and BOTH referential directions
    // (orphaned children, childless parents) — all six rules from TWO
    // partial-aggregated key shuffles and one co-partitioned
    // full-outer join. Each side collapses to one row per key with
    // map-side partials (the row-local CASE-counts ride the orders
    // key aggregate for free), the full-outer join adds NO exchange
    // (both sides already hash-partitioned on the key), and every
    // rule reads off the joined key table in one reduce:
    // uniqueness = Σcnt − |non-null keys with an orders side|,
    // orphans = Σ child rows with no parent side, childless = Σ parent
    // rows with no child side. The first spelling — two separate
    // anti-joins + a countDistinct — paid four key-table shuffles and
    // measured 9.2 s at sf10; this shape is 4.8 s. NULL handling is
    // spelled into every rule (a NULL price is a range violation; a
    // NULL key can't prove uniqueness or match a parent — join
    // equality already treats it as matchless, same as NOT EXISTS).
    // The fixed-width report unpivots via stack(): rule-count rows,
    // never corpus rows, cross the final exchange.
    // Round 13: both key-table aggregations AND the full-outer join
    // sit on the order key, so the query consumes the SHARED bucketed
    // layouts — zero Exchange of either fact (the aggregations and
    // the join reuse the bucket distribution); only the one-row
    // rollup crosses a shuffle. Same oracle, layout is not semantics.
    Q("q79_dq_audit",
      (s, d) => {
        val okeys = Layouts.orders(s, d)
          .groupBy(col("o_orderkey").as("k"))
          .agg(count(lit(1)).as("cnt"),
            count(when(col("o_custkey").isNull, 1)).as("r1p"),
            count(when(col("o_totalprice").isNull ||
              !(col("o_totalprice") > 0.0 && col("o_totalprice") <= 450000.0),
              1)).as("r2p"),
            count(when(col("o_orderstatus").isNull ||
              !col("o_orderstatus").isin("O", "F", "P"), 1)).as("r3p"))
        val lkeys = Layouts.lineitem(s, d)
          .groupBy(col("l_orderkey").as("k"))
          .agg(count(lit(1)).as("lcnt"))
        okeys.join(lkeys, Seq("k"), "full_outer")
          .agg(
            sum(col("r1p")).as("r1"), sum(col("r2p")).as("r2"),
            sum(col("r3p")).as("r3"),
            (sum(col("cnt")) -
              count(when(col("cnt").isNotNull && col("k").isNotNull, 1)))
              .as("r4"),
            sum(when(col("cnt").isNull, col("lcnt"))).as("r5"),
            sum(when(col("lcnt").isNull, col("cnt"))).as("r6"))
          .select(expr(
            """stack(6, 'r1_null_custkey',     r1,
                        'r2_price_range',      r2,
                        'r3_status_domain',    r3,
                        'r4_dup_orderkey',     r4,
                        'r5_orphan_lineitem',  coalesce(r5, 0L),
                        'r6_childless_order',  coalesce(r6, 0L))
               as (rule, n_violations)"""))
          .orderBy("rule")
      },
      Some("""SELECT rule, n_violations FROM (
                SELECT 'r1_null_custkey' AS rule,
                       COUNT(CASE WHEN o_custkey IS NULL THEN 1 END)
                         AS n_violations FROM orders
                UNION ALL
                SELECT 'r2_price_range',
                       COUNT(CASE WHEN o_totalprice IS NULL OR NOT
                         (o_totalprice > 0 AND o_totalprice <= 450000)
                         THEN 1 END) FROM orders
                UNION ALL
                SELECT 'r3_status_domain',
                       COUNT(CASE WHEN o_orderstatus IS NULL OR
                         o_orderstatus NOT IN ('O','F','P') THEN 1 END)
                FROM orders
                UNION ALL
                SELECT 'r4_dup_orderkey',
                       COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
                UNION ALL
                SELECT 'r5_orphan_lineitem', COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)
                UNION ALL
                SELECT 'r6_childless_order', COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
              ORDER BY rule""")),

    // -- first-failing-rule attrition --------------------------------------
    // the curation funnel report: every doc is attributed to the FIRST
    // rule that drops it (length, then language, then repetition), so
    // the stage counts sum to the corpus and each rule's number is its
    // MARGINAL cost given everything before it — the report a data team
    // reads before reordering or retuning a cascade. One row-local
    // corpus scan; the CASE chain and the unique-token ratio are
    // codegen'd expressions; stage rows (4) cross the exchange.
    // Tokenization parity with DuckDB rides t01's proven spelling
    // (trim + whitespace-regex split); the repetition rule is the
    // unique-token ratio (array_distinct / token count), a double
    // division both engines evaluate on identical inputs.
    Q("t18_filter_attrition",
      (s, d) => {
        val toks = TextAnalysis.tokenCount(col("text")).cast("double")
        val uniq = size(array_distinct(split(trim(col("text")), "\\s+")))
          .cast("double")
        val stage = when(col("n_chars") < 120, "1_too_short")
          .when(!col("lang").isin("en", "es", "de", "fr"), "2_lang_filter")
          .when(uniq / toks < 0.45, "3_repetitive")
          .otherwise("0_survived")
        t(s, d, "documents")
          .groupBy(stage.as("stage"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("stage")
      },
      Some("""SELECT stage, COUNT(*) AS n_docs FROM (
                SELECT CASE
                  WHEN n_chars < 120 THEN '1_too_short'
                  WHEN lang NOT IN ('en','es','de','fr') THEN '2_lang_filter'
                  WHEN CAST(len(list_distinct(string_split_regex(trim(text),
                         '\s+'))) AS DOUBLE)
                       / len(string_split_regex(trim(text), '\s+')) < 0.45
                    THEN '3_repetitive'
                  ELSE '0_survived' END AS stage
                FROM documents)
              GROUP BY stage ORDER BY stage""")),

    // -- per-group statistical outliers ------------------------------------
    // count of rows beyond 1.5 sigma of their group's mean — the metric
    // alarm shape ("how many of today's prices are abnormal for this
    // segment"). q78's two-pass recipe: pass 1 computes the per-group
    // algebraic stats (n, Σx, Σx²) exactly (dsum decimal lift) and is
    // COLLECTED — output-sized, one row per group — into literal maps;
    // pass 2 is one row-local scan that flags against the inlined
    // stats. Exactness: the collected sums are bit-equal to the
    // oracle's (dsum contract), and the closing double math
    // (mean = Σx/n, var = Σx²/n − mean², 1.5·√max(var,0)) is spelled
    // IDENTICALLY in both engines, so every intermediate is the same
    // IEEE double and the > comparison is exact. 1.5σ (not 3σ) because
    // the bench corpus is near-uniform — z is bounded by √3 ≈ 1.73 and
    // a 3σ rule can never fire on it; the threshold is a knob, the
    // machinery is the operator.
    Q("q80_group_outliers",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val x = col("l_extendedprice")
        val stats = li.groupBy(col("l_returnflag").as("g"))
          .agg(count(lit(1)).as("n"), dsum(x).as("sx"),
            dsum(x * x).as("sxx"))
          .collect()
        val nM = map(stats.toSeq.flatMap(r =>
          Seq(lit(r.getString(0)), lit(r.getLong(1)))): _*)
        val sxM = map(stats.toSeq.flatMap(r =>
          Seq(lit(r.getString(0)), lit(r.getDouble(2)))): _*)
        val sxxM = map(stats.toSeq.flatMap(r =>
          Seq(lit(r.getString(0)), lit(r.getDouble(3)))): _*)
        val g = col("l_returnflag")
        val n = element_at(nM, g).cast("double")
        val mean = element_at(sxM, g) / n
        val varr = element_at(sxxM, g) / n - mean * mean
        val thr = lit(1.5) * sqrt(greatest(varr, lit(0.0)))
        li.groupBy(g)
          .agg(count(lit(1)).as("n_rows"),
            count(when(abs(x - mean) > thr, 1)).as("n_outliers"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH s AS (
                 SELECT l_returnflag AS g, CAST(COUNT(*) AS DOUBLE) AS n,
                        ${sqlSum("l_extendedprice")} AS sx,
                        ${sqlSum("l_extendedprice*l_extendedprice")} AS sxx
                 FROM lineitem GROUP BY 1)
               SELECT l.l_returnflag, COUNT(*) AS n_rows,
                      COUNT(CASE WHEN abs(l.l_extendedprice - sx/n) >
                        1.5 * sqrt(GREATEST(sxx/n - (sx/n)*(sx/n), 0))
                        THEN 1 END) AS n_outliers
               FROM lineitem l JOIN s ON s.g = l.l_returnflag
               GROUP BY 1 ORDER BY 1""")),

    // -- rolling-window anomaly gauge ---------------------------------------
    // q80's alarm against a MOVING baseline: each event is scored
    // against the exact mean/σ of the 100 events BEFORE it in its
    // type's stream (frame ends at 1 PRECEDING — the scored value
    // never contaminates its own baseline), flagged when it exceeds
    // mean + 1.5σ, and only full-history rows score (the frame holds
    // exactly 100 rows ⇔ global row number ≥ 101 — a warm-up row
    // compared against 3 samples isn't a detection, it's noise).
    //
    // The naive spelling — rowsBetween(-100,-1) over a per-type window
    // — has two 100×-scale killers: Spark re-aggregates all 100 frame
    // rows per output row (O(100·n) decimal adds; 7.75 s at sf0.1,
    // 5× anything else in the suite), and parallelism is bounded by
    // |event_type| = 5, so at scale each type's whole stream sorts and
    // scores on ONE task. This spelling keeps the exact same numbers:
    //   frame_sum(i) = cum(i) − v(i) − cum(i−101)
    // where cum is the RUNNING decimal prefix sum (Spark's O(n)
    // running-frame path) — decimal subtraction is exact, so the
    // frame sums are bit-identical to the recomputed ones. Parallelism
    // comes from ts-range CHUNKS inside each type: three output-sized
    // collect passes (per-type ts min/max for uniform width_bucket
    // chunking — ANY boundary placement yields the same answer,
    // boundaries only set parallelism; exact per-chunk count/Σv/Σv²
    // merged so every chunk can serve a full 100-row history; and the
    // previous chunk's last-100 TAIL via a WindowGroupLimit job) turn
    // local window sums into global ones via literal-map offsets.
    // Rows whose 101-back target is inside their own chunk take
    // lag(cum, 101) over the SAME window sort; the ≤101 chunk-head
    // rows reconstruct it from broadcast tail suffix sums
    // (cum(g−101) = chunk_offset − suffix(L)) — so the carry costs a
    // |types|·|chunks|·101-row broadcast, NOT a second corpus
    // exchange (round 12 exploded chunk tails forward and re-shuffled
    // all n rows; that exchange was half the sf10 cost).
    // Cost: three column-pruned stat scans (|types|·|chunks|·101 rows
    // collected, core-bounded) + ONE corpus exchange — every stage
    // |types|·|chunks|-way parallel, O(1) work per row.
    Q("q81_rolling_anomaly",
      (s, d) => rollingAnomaly(s, d),
      Some("""WITH w AS (
                SELECT event_type, value,
                       COUNT(*) OVER f AS n,
                       CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER f
                         AS VARCHAR) AS DOUBLE) AS sx,
                       CAST(CAST(SUM(CAST(value*value AS DECIMAL(27,4)))
                         OVER f AS VARCHAR) AS DOUBLE) AS sxx
                FROM events
                WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
              SELECT event_type,
                     COUNT(CASE WHEN n = 100 THEN 1 END) AS n_scored,
                     COUNT(CASE WHEN n = 100 AND value > sx/100.0 +
                       1.5 * sqrt(GREATEST(sxx/100.0
                         - (sx/100.0)*(sx/100.0), 0))
                       THEN 1 END) AS n_anomalies
              FROM w GROUP BY 1 ORDER BY 1""")),

    // -- streaming anomaly gauge, batch face ---------------------------------
    // q81 as a STANDING query ([[graft.streaming.Streams.anomalyState]]):
    // per-type ring-buffer state (last 100 sealed values as exact
    // scale-4 longs with exact running integer sums — eviction
    // subtracts exactly, so the moving baseline never drifts from a
    // recompute), watermark reorder buffer, event-time seals. This
    // gate runs the SAME per-key machine over the batch table and must
    // reproduce q81's window plan row-for-row — the oracle is the
    // per-row spelling of q81's SQL filtered to the alerts, so the
    // ring-buffer arithmetic is hash-checked against the independent
    // frame-aggregate derivation at every layout.
    Q("st16_stream_anomaly",
      (s, d) => {
        import s.implicits._
        val ev = t(s, d, "events")
          .select(col("event_type"), col("ts"), col("event_id"), col("value"))
          .as[graft.streaming.Streams.AnomEvent]
        graft.streaming.Streams.anomalyState(ev)
          .toDF().orderBy("event_type", "event_id")
      },
      Some("""WITH w AS (
                SELECT event_type, event_id, value,
                       COUNT(*) OVER f AS n,
                       CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER f
                         AS VARCHAR) AS DOUBLE) AS sx,
                       CAST(CAST(SUM(CAST(value*value AS DECIMAL(27,4)))
                         OVER f AS VARCHAR) AS DOUBLE) AS sxx
                FROM events
                WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
              SELECT event_type, event_id, value FROM w
              WHERE n = 100 AND value > sx/100.0 +
                1.5 * sqrt(GREATEST(sxx/100.0 - (sx/100.0)*(sx/100.0), 0))
              ORDER BY event_type, event_id"""))
  )

  /** q81's chunk-carry plan. See the Q entry's comment for the shape. */
  /** Global [min, max] of a TIMESTAMP_MICROS column in MICROSECONDS,
    * from the parquet footers alone — no data scan. None when any
    * file lacks usable INT64 statistics for the column (legacy INT96
    * timestamps carry none) or the frame has no input files, in which
    * case the caller scans. Footers are read CONCURRENTLY on the
    * driver (a parallel stream over the file list — round-13 advisory:
    * the sequential loop was O(files) serial I/O, at odds with the
    * metadata-only framing); each read is a few KB, so the driver
    * comfortably absorbs 10⁵-file listings at ~3 ms each / #cores. On
    * a deployment whose listing outgrows that, this becomes a tiny
    * Spark job over the path list — the bounds combine is already an
    * associative reduce. Same metadata-only cost class as
    * Layout.sourceFingerprint. */
  private def footerTsBounds(s: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame,
      column: String): Option[(Long, Long)] = {
    val files = df.inputFiles
    if (files.isEmpty) return None
    val hconf = s.sparkContext.hadoopConfiguration
    // per-file bounds, or None when any row group lacks usable stats
    def one(f: String): Option[(Long, Long)] = {
      var lo = Long.MaxValue
      var hi = Long.MinValue
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), hconf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks
        var bi = 0
        while (bi < blocks.size()) {
          val cols = blocks.get(bi).getColumns
          var ci = 0
          while (ci < cols.size()) {
            val c = cols.get(ci)
            if (c.getPath.toDotString == column) {
              c.getStatistics match {
                case ls: org.apache.parquet.column.statistics.LongStatistics
                    if !ls.isEmpty && ls.hasNonNullValue =>
                  lo = math.min(lo, ls.genericGetMin)
                  hi = math.max(hi, ls.genericGetMax)
                case _ => return None // unusable stats: caller scans
              }
            }
            ci += 1
          }
          bi += 1
        }
      } finally reader.close()
      if (lo > hi) None else Some((lo, hi))
    }
    try {
      val perFile = java.util.Arrays.stream(files).parallel()
        .map[Option[(Long, Long)]](f => one(f))
        .collect(java.util.stream.Collectors.toList[Option[(Long, Long)]])
      var lo = Long.MaxValue
      var hi = Long.MinValue
      val it = perFile.iterator()
      while (it.hasNext) it.next() match {
        case Some((l, h)) => lo = math.min(lo, l); hi = math.max(hi, h)
        case None => return None // one unusable file poisons the bounds
      }
      if (lo > hi) None else Some((lo, hi))
    } catch { case _: Exception => None }
  }

  private def rollingAnomaly(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import java.math.{BigDecimal => JBD}
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 4)
    val ev = t(s, d, "events")
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
    val v4 = col("value").cast(D4)
    val vv4 = (col("value") * col("value")).cast(D4)

    // pass 0a: ts range. Chunks are UNIFORM ts buckets inside
    // [min, max] — width_bucket is O(1) codegen'd per row, vs O(chunks)
    // boundary comparisons for percentile splits. Correctness is
    // invariant to where the boundaries land (equal-ts rows always
    // share a chunk because the split key is ts alone, so chunk order
    // refines (ts, event_id) order); they only set parallelism, and
    // the ≥101-row merge below absorbs empty/skewed buckets. Because
    // boundaries are correctness-free, ONE GLOBAL [lo, hi] serves
    // every type — and the global bounds come from the parquet
    // FOOTERS (ts min/max statistics per row group: metadata-only,
    // one footer read per file on the driver, ZERO data scanned —
    // this replaced a full min/max scan that cost ~1.6 s of q81's
    // 4.6 s at sf10 and costs a full cluster scan at 100 TB). Files
    // without usable INT64 ts statistics (e.g. legacy INT96 writers)
    // fall back to the one-row min/max aggregate.
    val nChunks = math.max(8, math.min(64, s.sparkContext.defaultParallelism))
    val tsl = unix_micros(col("ts"))
    val (glo, ghi) = footerTsBounds(s, ev, "ts").getOrElse {
      val r = ev.agg(min(tsl), max(tsl)).head()
      (r.getLong(0), r.getLong(1))
    }
    val chunk = least(greatest(width_bucket(tsl.cast("double"),
      lit(glo).cast("double"),
      lit(ghi + 1L).cast("double"), lit(nChunks)),
      lit(1L)), lit(nChunks.toLong)).cast("int")

    // pass 0b (FUSED): exact per-raw-chunk (count, Σv, Σv²) AND the
    // chunk's last-101 rows, in ONE map-side-combined aggregate
    // (functions/ChunkStatsExpression.scala) — |types|·|chunks| rows
    // collected, each carrying three scalars plus ≤101 tail rows
    // (decimal group sums are exact in any order; the tail is the
    // k-largest-(ts,id) set, scan-order-independent). Round 13 fused
    // what were TWO full fact scans (stats groupBy + a
    // WindowGroupLimit tails job): each stat scan cost ~1.6 s of
    // q81's 4.6 s at sf10. The driver merges adjacent chunks until
    // every non-final chunk holds ≥ 101 rows — the invariant that
    // lets ONE previous chunk serve any row's full 100-row history —
    // and walks the merged chunks into exclusive prefix offsets.
    val rawStats = ev
      .groupBy(col("event_type").as("tpe"), chunk.as("c"))
      .agg(graft.functions.ChunkStatsFunctions.chunkStatsTail(
        tsl, col("event_id"), v4, vv4, 101).as("st"))
      .select(col("tpe"), col("c"), col("st.n").as("n"),
        col("st.sx").as("sx"), col("st.sxx").as("sxx"),
        col("st.tail").as("tail"))
      .collect()
    def bd(x: Any): JBD =
      if (x == null) JBD.ZERO else x.asInstanceOf[JBD]
    final case class Off(m: Int, n: Long, sx: JBD, sxx: JBD)
    // per type: raw chunk (1-based) -> merged id + exclusive offsets
    val offs = scala.collection.mutable.Map.empty[String, Array[Off]]
    val maxM = scala.collection.mutable.Map.empty[String, Int]
    rawStats.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val ordered = rs.sortBy(_.getInt(1))
      // greedy merge: close a group once it reaches 101 rows; a
      // too-small tail folds into the previous group
      var groups = Vector.empty[(Vector[Int], Long, JBD, JBD)]
      var raws = Vector.empty[Int]; var n = 0L
      var sx = JBD.ZERO; var sxx = JBD.ZERO
      for (r <- ordered) {
        raws :+= r.getInt(1); n += r.getLong(2)
        sx = sx.add(bd(r.get(3))); sxx = sxx.add(bd(r.get(4)))
        if (n >= 101) {
          groups :+= ((raws, n, sx, sxx))
          raws = Vector.empty; n = 0L; sx = JBD.ZERO; sxx = JBD.ZERO
        }
      }
      if (raws.nonEmpty) {
        if (groups.nonEmpty) {
          val (gr, gn, gsx, gsxx) = groups.last
          groups = groups.init :+
            ((gr ++ raws, gn + n, gsx.add(sx), gsxx.add(sxx)))
        } else groups = Vector((raws, n, sx, sxx))
      }
      var accN = 0L; var accSx = JBD.ZERO; var accSxx = JBD.ZERO
      val byRaw = new Array[Off](nChunks)
      groups.zipWithIndex.foreach { case ((gr, gn, gsx, gsxx), m) =>
        gr.foreach(rc => byRaw(rc - 1) = Off(m, accN, accSx, accSxx))
        accN += gn; accSx = accSx.add(gsx); accSxx = accSxx.add(gsxx)
      }
      // empty raw buckets never produce rows, but keep the arrays total
      for (i <- byRaw.indices if byRaw(i) == null)
        byRaw(i) = Off(-1, 0L, JBD.ZERO, JBD.ZERO)
      offs(tpe) = byRaw
      maxM(tpe) = groups.length - 1
    }
    // pass 0c (driver-side, no job): previous-chunk TAIL suffix sums —
    // the carry, as a DRIVER-BOUNDED broadcast instead of a second
    // corpus exchange. A row at global position g with chunk-local
    // rank r ≤ 101 needs cum(g−101), which lies in the last 100 rows
    // of the PREVIOUS merged chunk: cum(g−101) = chunk_offset − (sum
    // of the previous chunk's last L values), L = 101 − r ∈ [0, 100].
    // The tails arrived fused with the chunk stats (pass 0b); the
    // driver concatenates each merged chunk's raw tails in order and
    // folds exact decimal suffix sums. Round 12's spelling instead
    // exploded each chunk's last 101 rows into the next chunk and
    // re-shuffled ALL n rows through a second (type, chunk) exchange
    // just to run lag(·,101) — that exchange was half the query's
    // cost at sf10.
    val tailLookup = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Int, JBD, JBD)]
    offs.foreach { case (tpe, arr) =>
      val byChunk = rawStats.filter(_.getString(0) == tpe)
        .map(r => r.getInt(1) ->
          r.getSeq[org.apache.spark.sql.Row](5)).toMap
      for (m <- 1 to maxM(tpe)) {
        val prevRaws = arr.zipWithIndex.collect {
          case (o, i) if o.m == m - 1 => i + 1 }
        val tail = prevRaws
          .flatMap(c => byChunk.getOrElse(c,
            Seq.empty[org.apache.spark.sql.Row]))
          .takeRight(100)
        require(tail.length == 100,
          s"q81: merged chunk ${m - 1} of '$tpe' has <100 tail rows — " +
            "the >=101-row merge invariant is broken")
        var tsx = JBD.ZERO; var tsxx = JBD.ZERO
        tailLookup += ((tpe, m, 0, tsx, tsxx))
        for (l <- 1 to 100) {
          val r = tail(tail.length - l)
          tsx = tsx.add(r.getDecimal(2)); tsxx = tsxx.add(r.getDecimal(3))
          tailLookup += ((tpe, m, l, tsx, tsxx))
        }
      }
    }
    val tailSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("t_m",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("t_l",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("t_ssx", d38),
      org.apache.spark.sql.types.StructField("t_ssxx", d38)))
    val tailDf = s.createDataFrame(
      java.util.Arrays.asList(tailLookup.map { case (t, m, l, a, b) =>
        org.apache.spark.sql.Row(t, m, l, a.setScale(4), b.setScale(4))
      }.toSeq: _*), tailSchema)

    val offM = map(offs.toSeq.sortBy(_._1).flatMap { case (tpe, arr) =>
      Seq(lit(tpe), struct(
        array(arr.toSeq.map(o => lit(o.m)): _*).as("ms"),
        array(arr.toSeq.map(o => lit(o.n)): _*).as("ns"),
        array(arr.toSeq.map(o => lit(o.sx).cast(d38)): _*).as("sxs"),
        array(arr.toSeq.map(o => lit(o.sxx).cast(d38)): _*).as("sxxs"))) }: _*)

    // main pass — the corpus's ONLY exchange: local running sums per
    // merged chunk + literal-array offsets = global prefix sums, then
    // lag(·,101) over the SAME window spec (second Window operator,
    // same partitioning and ordering — no new exchange, no new sort)
    // resolves every row whose 101-back target is in its own chunk;
    // the chunk-head rows (local rank ≤ 101) take the broadcast tail
    // path instead.
    val wOrd = Window.partitionBy("event_type", "m")
      .orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p1 = ev.withColumn("c", chunk)
      .withColumn("S", element_at(offM, col("event_type")))
      .withColumn("m", element_at(col("S.ms"), col("c")))
      .withColumn("offn", element_at(col("S.ns"), col("c")))
      .withColumn("offsx", element_at(col("S.sxs"), col("c")))
      .withColumn("offsxx", element_at(col("S.sxxs"), col("c")))
      // one select = the three same-spec window functions fuse into a
      // single Window operator over one sort
      .select(col("event_type"), col("ts"), col("event_id"), col("value"),
        col("m"), col("offsx"), col("offsxx"), col("offn"),
        (row_number().over(wOrd) + col("offn")).as("rn"),
        (sum(v4).over(wRun) + col("offsx")).as("cum"),
        (sum(vv4).over(wRun) + col("offsxx")).as("cumq"))
    val p2 = p1
      .withColumn("lc", lag(col("cum"), 101).over(wOrd))
      .withColumn("lq", lag(col("cumq"), 101).over(wOrd))
      .withColumn("lkey",
        when(col("rn") > 101L && col("rn") - col("offn") <= 101L,
          (lit(101L) - (col("rn") - col("offn"))).cast("int")))
    val p3 = p2.join(broadcast(tailDf),
      p2("event_type") === tailDf("t_type") &&
        p2("m") === tailDf("t_m") && p2("lkey") === tailDf("t_l"),
      "left")
    // rn ≥ 101 ⇔ the 1-PRECEDING frame holds exactly 100 rows. At
    // rn = 101 the frame starts at row 1, so cum(g−101) = 0; at
    // rn > 101 the in-chunk lag and the broadcast tail are mutually
    // exhaustive by construction — a row hitting neither means the
    // ≥101-row merge invariant broke, so fail loudly.
    val zero = lit(JBD.ZERO.setScale(4)).cast(d38)
    def lagged(local: Column, off: Column, suf: Column): Column =
      when(col("rn") === 101L, zero)
        .when(col("rn") > 101L && local.isNotNull, local)
        .when(col("rn") > 101L && suf.isNotNull, (off - suf).cast(d38))
        .when(col("rn") > 101L, raise_error(concat(
          lit("q81: missing carry at rn="), col("rn"))).cast(d38))
        .otherwise(zero)
    val sxF = (col("cum") - v4 -
      lagged(col("lc"), col("offsx"), col("t_ssx"))).cast("double")
    val sxxF = (col("cumq") - vv4 -
      lagged(col("lq"), col("offsxx"), col("t_ssxx"))).cast("double")
    val mean = sxF / 100.0
    val thr = mean + lit(1.5) *
      sqrt(greatest(sxxF / 100.0 - mean * mean, lit(0.0)))
    val full = col("rn") >= 101L
    p3.groupBy("event_type")
      .agg(count(when(full, 1)).as("n_scored"),
        count(when(full && col("value") > thr, 1)).as("n_anomalies"))
      .orderBy("event_type")
  }
}

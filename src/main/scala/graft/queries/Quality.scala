package graft.queries

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
    Q("q79_dq_audit",
      (s, d) => {
        val okeys = t(s, d, "orders")
          .groupBy(col("o_orderkey").as("k"))
          .agg(count(lit(1)).as("cnt"),
            count(when(col("o_custkey").isNull, 1)).as("r1p"),
            count(when(col("o_totalprice").isNull ||
              !(col("o_totalprice") > 0.0 && col("o_totalprice") <= 450000.0),
              1)).as("r2p"),
            count(when(col("o_orderstatus").isNull ||
              !col("o_orderstatus").isin("O", "F", "P"), 1)).as("r3p"))
        val lkeys = t(s, d, "lineitem")
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
    // mean + 1.5σ, and only full-history rows score (count over the
    // frame == 100 — a warm-up row compared against 3 samples isn't a
    // detection, it's noise). ONE event_type exchange + one
    // partition-local sort; the three frame aggregates share the
    // window buffer; the report is |types| rows. Exactness in a
    // ROLLING frame needs the decimal spelling, not dsum (partial
    // window state must travel as decimal values): sums are
    // DECIMAL(27,4) — frame addition order is fixed by the frame
    // itself — and the closing double math is spelled identically in
    // both engines over the same VARCHAR-hop doubles. Order is total
    // by (ts, event_id), so both engines score identical frames.
    // 1.5σ for the same reason as q80 (near-uniform bench data);
    // production tunes the knob, the one-exchange shape is the
    // operator.
    Q("q81_rolling_anomaly",
      (s, d) => {
        val f = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-100, -1)
        val v = col("value")
        val scored = t(s, d, "events")
          .withColumn("n", count(lit(1)).over(f))
          .withColumn("sx", sum(v.cast(D4)).over(f).cast("double"))
          .withColumn("sxx", sum((v * v).cast(D4)).over(f).cast("double"))
        val mean = col("sx") / 100.0
        val thr = mean + lit(1.5) *
          sqrt(greatest(col("sxx") / 100.0 - mean * mean, lit(0.0)))
        scored.groupBy("event_type")
          .agg(count(when(col("n") === 100, 1)).as("n_scored"),
            count(when(col("n") === 100 && v > thr, 1)).as("n_anomalies"))
          .orderBy("event_type")
      },
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
}

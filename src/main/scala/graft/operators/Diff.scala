package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot DIFF — derive a change stream (insert/update/delete rows)
  * from two table snapshots, the CDC shape every incremental pipeline
  * (q54's rollup maintenance, d10's incremental dedup) consumes when
  * the upstream system only publishes full dumps.
  *
  * ONE co-partitioned full-outer join on the key; the row comparison
  * is null-safe column equality evaluated row-locally inside the join
  * (no fingerprint hashing: a cross-engine row hash would have to
  * canonicalize double/timestamp formatting, while `IS DISTINCT
  * FROM` compares the VALUES and is exact in both engines). At
  * 100 TB both snapshots shuffle once on the key — the cost class of
  * any join — and bucketed snapshot storage makes even that exchange
  * disappear (BucketSpec's zero-Exchange join applies verbatim).
  */
object Diff {

  /** Rows of `nu` not matching `old` → `insert`; rows of `old` gone
    * from `nu` → `delete`; shared keys whose non-key columns differ
    * anywhere (null-safe) → `update`. Unchanged rows are dropped
    * BEFORE the result leaves the join — the output is change-sized,
    * not snapshot-sized. Key columns must be non-null and unique per
    * snapshot (the primary-key contract CDC requires anyway). */
  def snapshotDiff(old: DataFrame, nu: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(old.columns.sameElements(nu.columns),
      s"snapshot schemas differ: ${old.columns.toSeq} vs ${nu.columns.toSeq}")
    val cmp = old.columns.filterNot(keys.contains).toSeq
    val a = old.as("a")
    val b = nu.as("b")
    val keyCond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val hasA = col(s"a.${keys.head}").isNotNull
    val hasB = col(s"b.${keys.head}").isNotNull
    val changed = cmp.map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    a.join(b, keyCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) :+
          when(!hasA, lit("insert"))
            .when(!hasB, lit("delete"))
            .when(changed, lit("update"))
            .otherwise(lit("unchanged")).as("status"): _*)
      .filter(col("status") =!= "unchanged")
  }

  /** MERGE/upsert — apply a changeset to a snapshot, the inverse of
    * [[snapshotDiff]] and the write half of every incremental pipeline
    * (a warehouse that can only diff but not apply still re-dumps).
    *
    * `changes` carries the snapshot's columns plus `opCol` ∈
    * {insert, update, delete} (snapshotDiff's vocabulary, so
    * diff → enrich-with-payload → apply composes). Semantics:
    * delete drops the key, insert/update both land the change row
    * (upsert — the op tag is validated, not trusted, since CDC feeds
    * routinely mislabel the two after replays). Unknown op values
    * fail LOUDLY per row (`raise_error` branch — a silently dropped
    * typo'd op is an unnoticed data loss). When `seqCol` is given,
    * the latest change per key wins (ties fail the unique contract);
    * without it the batch must be key-unique — enforced by the same
    * loud error, because "two changes, arbitrary winner" is the
    * classic nondeterministic-merge bug.
    *
    * Scale shape: one window over the (change-sized, not
    * snapshot-sized) batch to pick winners, then ONE co-partitioned
    * full-outer join on the key — and a bucketed snapshot layout
    * (q65's) makes the snapshot side of that exchange disappear,
    * which is how a 100 TB table absorbs a daily changeset without
    * ever being re-shuffled. */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
                     keys: Seq[String], opCol: String = "op",
                     seqCol: Option[String] = None): DataFrame = {
    val payload = snapshot.columns.filterNot(keys.contains).toSeq
    // ordering: latest seq first; with no seq every row is a "peer"
    // of every other (constant sort key), so the peer count below
    // flags ANY key with >1 change
    val ord = seqCol.map(c => col(c).desc).getOrElse(lit(1).asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(ord)
    // op vocabulary is validated BEFORE the winner filter: a typo'd op
    // on a change row that loses the seq race would otherwise be
    // silently discarded with the row — "fail LOUDLY per row" means
    // every row, not just winners
    val validated = changes.withColumn(opCol,
      when(!col(opCol).isin("insert", "update", "delete"),
        raise_error(concat(lit("applyChangeset: unknown op '"),
          col(opCol), lit("'"))))
      .otherwise(col(opCol)))
    val latest = validated
      .withColumn("__rn", row_number().over(w))
      // RANGE CURRENT ROW..CURRENT ROW = this row plus its order-key
      // peers: same-seq ties (or, seq-less, the whole key group)
      .withColumn("__dup", count(lit(1)).over(w.rangeBetween(0, 0)))
      .filter(col("__rn") === 1)
      .withColumn(opCol,
        when(col("__dup") > 1, raise_error(concat(
          lit(s"applyChangeset: multiple changes for key "),
          concat_ws(",", keys.map(col): _*),
          lit(seqCol.fold(" and no seq column orders them")(c =>
            s" share the latest $c")))))
        .otherwise(col(opCol)))
      .drop("__rn", "__dup")
    val s = snapshot.as("s")
    val c = latest.as("c")
    val keyCond = keys.map(k => col(s"s.$k") === col(s"c.$k")).reduce(_ && _)
    val hasChange = col(s"c.$opCol").isNotNull
    s.join(c, keyCond, "full_outer")
      .filter(!hasChange || col(s"c.$opCol") =!= "delete")
      .select(
        keys.map(k => coalesce(col(s"c.$k"), col(s"s.$k")).as(k)) ++
          payload.map(p =>
            when(hasChange, col(s"c.$p")).otherwise(col(s"s.$p")).as(p)): _*)
  }

  /** Merkle-style RANGE DIGEST of a table (q72, build half): group
    * rows into contiguous key ranges and reduce each range to an
    * order-independent fingerprint triple — row count, 64-bit XOR of
    * the row hashes, and a 31-bit-modular SUM of them. Comparing two
    * replicas of a 100 TB table then exchanges RANGE-COUNT rows, not
    * table rows: only ranges whose triples differ need a row-level
    * diff ([[snapshotDiff]] scoped to those key ranges), which is how
    * replica anti-entropy (Dynamo/Cassandra's Merkle repair) avoids
    * ever shipping the table. The digest aggregation is map-side
    * combined (XOR and modular sum are commutative monoids), so the
    * shuffle moves one triple per (partition, range).
    *
    * The row hash is the PORTABLE md5-prefix integer (the md5
    * conventions every sampler here uses): 52 bits survive exactly in
    * any engine's BIGINT and double. `cols` must render identically
    * across engines — integers and strings do; raw doubles do NOT
    * (each engine formats its own shortest decimal), so callers cast
    * doubles to DECIMAL first. XOR alone cancels duplicate row PAIRS;
    * the (count, xor, sum) triple makes a silent collision require
    * three simultaneous coincidences.
    *
    * The per-row rendering is INJECTIVE: each column escapes
    * backslashes and the '|' delimiter (\ → \\, | → \|) and a NULL
    * renders as the sentinel `\0` (backslash + zero — unreachable by
    * escaping, whose backslashes are always followed by '\' or '|'),
    * THEN columns join on '|'. A naive concat_ws both skipped NULLs
    * (("a",NULL,"b") vs ("a","b",NULL) digesting equal) and let a '|'
    * IN the data shift column boundaries (("a|b","c") vs ("a","b|c"))
    * — either way real replica divergence could compare 'equal'. For
    * null-free numeric/clean-string columns the rendering equals the
    * plain concat, so existing digests (and [[graft.streaming.Streams
    * .rangeChecksumStream]]'s JVM twin over "key|value") are
    * unchanged. Keys must be NON-NEGATIVE (enforced loudly): range_id
    * is an exact integral `div`, and floor-vs-truncation division
    * disagree across engines below zero. */
  def rangeDigest(df: DataFrame, key: Column, rangeSize: Long,
                  cols: Seq[Column]): DataFrame = {
    require(rangeSize > 0, s"rangeDigest: rangeSize must be positive")
    // one static codegen call per row; bit-identical to the composable
    // conv(substring(md5(...),1,13),16,10) spelling (parity spec'd)
    val h = org.apache.spark.sql.GraftInternal.column(
      graft.functions.Md5Prefix52(
        org.apache.spark.sql.GraftInternal.expression(col("__rd_cat"))))
    val rendered = cols.map(c => coalesce(
      replace(replace(c.cast("string"), lit("\\"), lit("\\\\")),
        lit("|"), lit("\\|")),
      lit("\\0")))
    val k = when(key.cast("long") < 0, raise_error(concat(
        lit("rangeDigest: negative key "), key.cast("string"),
        lit(" — shift keys to be non-negative (floor and truncation " +
          "division disagree across engines below zero)"))).cast("long"))
      .otherwise(key.cast("long"))
    df.withColumn("__rd_cat", concat_ws("|", rendered: _*))
      .withColumn("__rd_h", h)
      .withColumn("__rd_k", k)
      .groupBy(expr(s"__rd_k div ${rangeSize}L").as("range_id"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__rd_h)").as("xor64"),
        sum(col("__rd_h") % 2147483648L).as("sum31"))
  }

  /** Replica comparison over [[rangeDigest]] triples (q72, compare
    * half): full-outer join the two digest tables on range_id and keep
    * ranges that disagree — `only_a`/`only_b` for ranges one replica
    * lacks entirely, `mismatch` where both have rows but the triples
    * differ. Output is metadata-sized (the damaged ranges), the input
    * to a scoped row-level repair. */
  def checksumDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.as("a"); val r = b.as("b")
    l.join(r, col("a.range_id") === col("b.range_id"), "full_outer")
      .select(
        coalesce(col("a.range_id"), col("b.range_id")).as("range_id"),
        when(col("a.range_id").isNull, lit("only_b"))
          .when(col("b.range_id").isNull, lit("only_a"))
          .when(col("a.n_rows") =!= col("b.n_rows") ||
            col("a.xor64") =!= col("b.xor64") ||
            col("a.sum31") =!= col("b.sum31"), lit("mismatch"))
          .otherwise(lit("equal")).as("status"))
      .filter(col("status") =!= "equal")
  }

  /** SCD TYPE-2 history build (q70): from a CDC changelog
    * (keys, `opCol`, `seqCol`, payload) produce the versioned
    * dimension table warehouses keep — one row per (key, version)
    * with half-open `[valid_from, valid_to)` seq bounds and an
    * `is_current` flag. Every insert/update OPENS a version at its
    * seq (update-on-absent opens too — the upsert convention shared
    * with [[applyChangeset]] and the streaming upsert, because CDC
    * feeds mislabel the two after replays); the NEXT change on the
    * key — any op — CLOSES it (`valid_to` = that change's seq);
    * deletes close their predecessor and open nothing, so a
    * delete-then-reinsert leaves a gap in the key's validity
    * timeline, which is the correct history. Op vocabulary is
    * validated per row BEFORE any filtering (a typo'd op must never
    * be silently absorbed into an interval), and duplicate
    * (key, seq) pairs fail LOUDLY — two versions opening at one
    * instant is [[applyChangeset]]'s arbitrary-winner bug in
    * history form.
    *
    * Scale shape: ONE window shuffle over the CHANGELOG
    * (change-sized, not snapshot-sized) keyed by the dimension key —
    * `lead` and the duplicate-seq peer count share a single Window
    * exec. A 100 TB fact table never participates; the history of a
    * dimension is the changelog reshaped, and even a full rebuild is
    * a single exchange of that changelog. */
  def scd2History(changes: DataFrame, keys: Seq[String],
                  opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = changes.columns
      .filterNot(c => keys.contains(c) || c == opCol || c == seqCol).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(seqCol).asc)
    val validated = changes.withColumn(opCol,
      when(!col(opCol).isin("insert", "update", "delete"),
        raise_error(concat(lit("scd2History: unknown op '"),
          col(opCol), lit("'"))))
      .otherwise(col(opCol)))
    validated
      // RANGE CURRENT ROW..CURRENT ROW = this row plus its seq peers:
      // >1 means two changes share (key, seq)
      .withColumn("__dup", count(lit(1)).over(w.rangeBetween(0, 0)))
      .withColumn("valid_to",
        when(col("__dup") > 1, raise_error(concat(
          lit(s"scd2History: duplicate $seqCol for key "),
          concat_ws(",", keys.map(col): _*))))
        .otherwise(lead(col(seqCol), 1).over(w)))
      .filter(col(opCol) =!= "delete")
      .select(keys.map(col) ++ payload.map(col) ++ Seq(
        col(seqCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Point-in-time reconstruction (q74) — the read that makes SCD2
    * history WORTH keeping: the table AS OF seq `s` is exactly the
    * versions whose half-open validity interval contains `s`
    * (`valid_from <= s < valid_to`, open versions unbounded). Closes
    * the CDC loop: [[snapshotDiff]] derives a changelog,
    * [[applyChangeset]] lands it, [[scd2History]] reshapes it into
    * versions, and this filter reads any historical state back out —
    * the round-trip law `asOf(history(changelog), s) == fold of the
    * changelog truncated at s` is spec-proven.
    *
    * Scale shape: a ROW-LOCAL filter, no shuffle, no window — and
    * with the history table written sorted/partitioned on
    * `valid_from` (q56's layout discipline) the predicate prunes
    * files, so "query last month's state" reads last month's
    * versions, not 100 TB of history. */
  def snapshotAsOf(history: DataFrame, asOfSeq: Long,
                   validFrom: String = "valid_from",
                   validTo: String = "valid_to"): DataFrame =
    history
      .filter(col(validFrom) <= asOfSeq &&
        (col(validTo).isNull || col(validTo) > asOfSeq))
      .drop(validFrom, validTo, "is_current")
}

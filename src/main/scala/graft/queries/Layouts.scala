package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Layout

/** The session's SHARED bucketed fact layouts — one clustered copy
  * per (source, key) ever, adopted across sessions via
  * [[Layout.ensureBucketed]]'s fingerprint sidecar, and consumed by
  * EVERY gated query that joins, aggregates, or windows on that key:
  * orders/lineitem on the order key (q65, q47, q06b, q79), events on
  * user_id (q61, q50). This is the 100 TB ingest-layout contract —
  * the clustering shuffle is paid once at ingest/compaction and every
  * downstream key-aligned operator then plans with ZERO Exchange of
  * the fact table. */
private[queries] object Layouts {

  def orders(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    Layout.ensureBucketed(s, t(s, d, "orders"),
      s"orders_bk$tag", s"/tmp/graft_layout$tag/orders",
      buckets = 32, bucketBy = Seq("o_orderkey"))
  }

  def lineitem(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    Layout.ensureBucketed(s, t(s, d, "lineitem"),
      s"lineitem_bk$tag", s"/tmp/graft_layout$tag/lineitem",
      buckets = 32, bucketBy = Seq("l_orderkey"))
  }

  /** events clustered on user_id — the standing layout for every
    * per-user aggregation/window: HashPartitioning(user_id) satisfies
    * ClusteredDistribution(user_id, ...), so per-user windows AND
    * (user, x) distincts/aggregations run with zero Exchange. */
  def events(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    Layout.ensureBucketed(s, t(s, d, "events"),
      s"events_bk$tag", s"/tmp/graft_layout$tag/events",
      buckets = 32, bucketBy = Seq("user_id"))
  }
}

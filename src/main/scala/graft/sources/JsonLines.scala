package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source — the de-facto interchange format of LLM training
  * corpora (one JSON document per line; the export shape of every
  * public crawl/corpus release).
  *
  * Schema-first by contract: at 100 TB, schema inference is a full
  * extra pass over the data before the real one, so `read` takes the
  * schema and only [[readInferred]] (dev/exploration) pays the pass.
  * Corrupt lines follow Spark's PERMISSIVE mode and are captured in
  * `_corrupt_record` when `keepCorrupt` is set — a crawl shard with a
  * few truncated lines must not kill a 1000-executor job, but the bad
  * lines must stay auditable rather than vanish (DROPMALFORMED's
  * silent row loss is how a dedup pipeline's counts stop reconciling).
  *
  * Uncompressed JSONL is splittable by construction (newline-
  * delimited), so Spark parallelizes a single large file at
  * `maxPartitionBytes` granularity — unlike multi-line JSON, which
  * this source deliberately does not expose. Compressed shards
  * (.gz/.zst) are whole-file units, so there parallelism is the shard
  * count — the standard many-shard corpus layout (see
  * [[graft.sinks.JsonLinesSink]]). */
object JsonLines {

  def read(spark: SparkSession, path: String, schema: StructType,
           keepCorrupt: Boolean = false): DataFrame = {
    val r = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    val s = if (keepCorrupt)
      StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType, nullable = true))
    else schema
    r.schema(s).json(path)
  }

  /** Dev-only: schema inference — an extra full pass; never at scale. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc phase profiler for the d07 corpus-dedup pipeline: times each
  * stage (exact dedup, LSH pair mining, connected components, final
  * anti-join) separately so bench regressions can be localized. */
object DebugD07 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[d07] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // warm-up pass at sf0.001 (codegen compile)
    time("warmup sf0.001") {
      Dedup.dedupCorpus(graft.Tables(spark, "/root/testdata/sf0.001", "documents"),
        col("doc_id"), col("text")).write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()

    (1 to 3).foreach { run =>
      System.err.println(s"--- run $run ---")
      val docs = graft.Tables(spark, sfDir, "documents")
      val survivors = time("exact survivors persist") {
        val s = Dedup.exact(docs, md5(col("text")), col("doc_id")).persist()
        s.write.format("noop").mode("overwrite").save()
        s
      }
      val staged = Dedup.minhashLshPairsStaged(survivors, col("doc_id"), col("text"),
        16, 4, 0.7, 42L, None)
      val pairs = time("lsh pairs materialize") {
        val p = staged.result.persist()
        p.write.format("noop").mode("overwrite").save()
        p
      }
      val cc = time("connected components") {
        Dedup.connectedComponentsStaged(pairs)
      }
      time("final anti-join write") {
        val dupes = cc.result.filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("__dup_id"))
        survivors.join(dupes, col("doc_id") === col("__dup_id"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      // the composed one-call pipeline, as bench runs it
      time("dedupCorpus end-to-end") {
        Dedup.dedupCorpus(docs, col("doc_id"), col("text"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

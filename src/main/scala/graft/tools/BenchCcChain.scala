package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times `dedupCorpus` on a chain-shaped corpus — the adversarial input
  * for connected components, where label propagation's round budget
  * (rounds = component diameter) is guaranteed to blow and
  * `connectedComponentsAuto` must re-route to O(log n) star
  * contraction. DedupSpec proves the ROUTING on 60 docs; this makes
  * the fallback's COST a number at bench scale.
  *
  * Corpus: doc i = tokens w(i)..w(i+11), so consecutive docs share
  * 9/11 distinct 3-gram shingles (J ≈ 0.82) and i,i+2 share 8/12
  * (J ≈ 0.67) — one diameter-n/2 near-dup path. MinHash banding is
  * probabilistic, so a few chain edges can be missed and the chain
  * splits into a handful of components (measured at 50k docs:
  * 4 survivors, 44 s). Generated with spark.range (no driver loop);
  * the timing covers the full auto path: the wasted 20-round
  * propagation attempt, its cleanup, and the star contraction that
  * finishes the job.
  *
  * Usage: BenchCcChain [nDocs]   (default 50000)
  */
object BenchCcChain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(n.toLong).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(k =>
        concat(lit("w"), col("id") + k)): _*).as("text"))
      .localCheckpoint(true) // time the dedup, not the generator
    val t0 = System.nanoTime()
    val survivors = graft.operators.Dedup.dedupCorpus(
      docs, col("doc_id"), col("text"), minJaccard = 0.6).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"cc_chain_fallback","n_docs":$n,"survivors":$survivors,"secs":$secs%.2f}""")
    spark.stop()
  }
}

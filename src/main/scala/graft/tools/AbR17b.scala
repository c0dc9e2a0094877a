package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization A/B harness: INTERLEAVED same-JVM timing of
  * code variants (candidate rewrite vs current shape), so host steal
  * waves land on every arm instead of poisoning one sequential block.
  * Variants are built as DataFrames and timed round-robin against the
  * noop sink, clearCache + RDD unpersist + System.gc between samples
  * (the Bench discipline).
  *
  * usage: AbR17b <case> [pairs]   (SPARK_GRAFT_SF_DIR selects SF)
  */
object AbR17b {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("t11")
    val pairs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.TextAnalysis.{piiEmailRe, piiIpRe, piiPhoneRe}

    def docs(d: String) = graft.Tables(spark, d, "documents")
    def piiText(d: String): DataFrame = docs(d).select(col("doc_id"),
      concat(col("text"), lit(" contact: u"),
        col("doc_id").cast("string"), lit("@example.com ip 10.0.0."),
        (col("doc_id") % 250).cast("string"), lit(" tel +15550"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("ptext"))

    // current shape: extract_all count + replace per pattern = 6 regex
    def redactCurrent(text: Column): Column = {
      val nEmails = size(regexp_extract_all(text, lit(piiEmailRe), lit(0))).cast("long")
      val t1 = regexp_replace(text, piiEmailRe, "[EMAIL]")
      val nIps = size(regexp_extract_all(t1, lit(piiIpRe), lit(0))).cast("long")
      val t2 = regexp_replace(t1, piiIpRe, "[IP]")
      val nPhones = size(regexp_extract_all(t2, lit(piiPhoneRe), lit(0))).cast("long")
      val t3 = regexp_replace(t2, piiPhoneRe, "[PHONE]")
      struct(nEmails.as("n_emails"), nIps.as("n_ips"),
        nPhones.as("n_phones"), t3.as("redacted"))
    }
    // candidate: 3 regex replaces; counts from substring occurrence
    // deltas (token can't overlap itself; no pattern's match can
    // contain '[' or ']', so insertion adds exactly one occurrence)
    def redactCandidate(text: Column): Column = {
      def cnt(s: Column, tok: String): Column =
        ((length(s) - length(replace(s, lit(tok), lit("")))) / tok.length).cast("long")
      val t1 = regexp_replace(text, piiEmailRe, "[EMAIL]")
      val t2 = regexp_replace(t1, piiIpRe, "[IP]")
      val t3 = regexp_replace(t2, piiPhoneRe, "[PHONE]")
      struct((cnt(t1, "[EMAIL]") - cnt(text, "[EMAIL]")).as("n_emails"),
        (cnt(t2, "[IP]") - cnt(t1, "[IP]")).as("n_ips"),
        (cnt(t3, "[PHONE]") - cnt(t2, "[PHONE]")).as("n_phones"),
        t3.as("redacted"))
    }
    def t11(redact: Column => Column)(d: String): DataFrame =
      piiText(d).select(col("doc_id"), redact(col("ptext")).as("r"))
        .select(col("doc_id"), col("r.n_emails").as("n_emails"),
          col("r.n_ips").as("n_ips"), col("r.n_phones").as("n_phones"),
          col("r.redacted").as("redacted"))
        .orderBy("doc_id")

    // s06 loop shapes over the SAME knnJoin graph build: the
    // pre-round-17 three-joins-per-iteration loop vs the rewritten
    // one-join-per-round loop (deg via window, implicit teleport
    // mass). Corpus + cap mirror the gated s05CorpusAndCap sizing.
    def s06Corpus(d: String): (DataFrame, Long) = {
      val full = graft.Tables(spark, d, "embeddings")
      val nFull = full.count()
      val m = math.max(1L, nFull / 20000L)
      val corpus = if (m == 1L) full else full.filter(col("vec_id") % m === 0)
      val n = if (m == 1L) nFull else corpus.count()
      (corpus, math.max(8L, 6L * n / (5L * (1L << (16 / 4)))))
    }
    def s06Old(d: String): DataFrame = {
      val (corpus, cap) = s06Corpus(d)
      val edges = graft.operators.Similarity.knnJoin(
          corpus, 3, 16, 4, Some(cap))
        .select(col("query_id").as("src"), col("vec_id").as("dst"))
        .persist()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val nodes = corpus.select(col("vec_id"))
      val init = nodes.withColumn("mass", lit(1000000L))
      (1 to 2).foldLeft(init) { (m, _) =>
        val contrib = edges
          .join(m.withColumnRenamed("vec_id", "src"), "src")
          .join(deg, "src")
          .select(col("dst").as("vec_id"), expr("mass div deg").as("c"))
          .groupBy("vec_id").agg(sum(col("c")).as("inm"))
        nodes.join(contrib, Seq("vec_id"), "left")
          .select(col("vec_id"),
            expr("150000L + (850 * coalesce(inm, 0L)) div 1000").as("mass"))
      }.orderBy("vec_id")
    }
    def s06New(d: String): DataFrame =
      graft.SparkEntry.queries("s06_knn_centrality")(spark, d)

    // t17 training shapes: pre-round-17 two bigramModel scans vs the
    // fused one-scan conditional-count model (dsirScore current code)
    def t17Old(d: String): DataFrame = {
      import graft.operators.Vocab
      val dd = docs(d)
      val (bigRaw, nRaw) = Vocab.bigramModel(dd, col("text"), 64)
      val (bigTgt, nTgt) =
        Vocab.bigramModel(dd.filter(col("lang") === "en"), col("text"), 64)
      dd.select(col("doc_id"),
          graft.functions.VocabFunctions.bigramInfo(
            Vocab.toks(col("text")), bigRaw, nRaw).as("r"),
          graft.functions.VocabFunctions.bigramInfo(
            Vocab.toks(col("text")), bigTgt, nTgt).as("g"))
        .select(col("doc_id"),
          col("r.n_bigrams").as("n_bigrams"),
          col("r.total_bits").as("raw_bits"),
          col("g.total_bits").as("tgt_bits"),
          (col("r.total_bits") - col("g.total_bits")).as("score_bits"))
        .orderBy("doc_id")
    }
    def t17New(d: String): DataFrame =
      graft.SparkEntry.queries("t17_dsir_score")(spark, d)

    val variants: Seq[(String, String => DataFrame)] = which match {
      case "t11" => Seq(
        "current_6regex" -> t11(redactCurrent) _,
        "cand_3regex_cnt" -> t11(redactCandidate) _)
      case "s06" => Seq(
        "old_3join_loop" -> s06Old _,
        "new_1join_loop" -> s06New _)
      case "t17" => Seq(
        "old_2scan_train" -> t17Old _,
        "new_fused_train" -> t17New _)
      case other => sys.error(s"unknown case $other")
    }

    // warm-up both arms at the smallest SF (codegen differs per arm)
    variants.foreach { case (_, fn) =>
      try fn("/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    clean()
    val times = collection.mutable.Map(variants.map(_._1 -> Vector.empty[Double]): _*)
    for (_ <- 1 to pairs; (nm, fn) <- variants) {
      val t0 = System.nanoTime()
      fn(sfDir).write.format("noop").mode("overwrite").save()
      times(nm) :+= (System.nanoTime() - t0) / 1e9
      clean()
    }
    variants.foreach { case (nm, _) =>
      val t = times(nm)
      val med = t.sorted.apply(t.size / 2)
      println(f"$nm%-18s median $med%6.3f  min ${t.min}%6.3f  " +
        s"(${t.map(x => f"$x%.2f").mkString(", ")})")
    }
    // cross-check: identical results (row-for-row) on the bench SF
    val a = variants.head._2(sfDir)
    val b = variants.last._2(sfDir)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"result diff rows: $diff")
    spark.stop()
  }
}

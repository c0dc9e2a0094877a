package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 pass-2 A/B harness (AbR17b's interleaved discipline) for
  * the self-union → explode(array) rewrites:
  *
  *  - "s05": knnJoin's both-directions emission — the pre-pass-2
  *    UNION of the scored subtree with its swapped self vs the current
  *    single-pass explode (Similarity.knnJoin). Driven through the
  *    gated s05 corpus + cap.
  *  - "cc": connectedComponents' symmetric edge list — the
  *    pre-pass-2 UNION of the pair subtree with its swap vs the
  *    current explode, driven over d07's LSH pair miner output (the
  *    most expensive gated pair subtree that feeds CC).
  *
  * usage: AbR17c <case> [pairs]   (SPARK_GRAFT_SF_DIR selects SF)
  */
object AbR17c {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("s05")
    val pairs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Similarity, Staged}

    def s05Corpus(d: String): (DataFrame, Long) = {
      val full = graft.Tables(spark, d, "embeddings")
      val nFull = full.count()
      val m = math.max(1L, nFull / 20000L)
      val corpus = if (m == 1L) full else full.filter(col("vec_id") % m === 0)
      val n = if (m == 1L) nFull else corpus.count()
      (corpus, math.max(8L, 6L * n / (5L * (1L << (16 / 4)))))
    }

    // pre-pass-2 knnJoin: identical to Similarity.knnJoin except the
    // both-directions UNION (the shape being adjudicated)
    def knnJoinOld(corpus: DataFrame, k: Int, cap: Long): DataFrame = {
      val nBits = 16; val bands = 4; val bits = nBits / bands
      val sig = Similarity.hyperplaneSignature(col("embedding"), nBits)
      val banded0 = corpus
        .select(col("vec_id").as("id"), sig.as("sig"))
        .select(col("id"),
          explode(array((0 until bands).map(b => struct(lit(b).as("band"),
            shiftright(col("sig"), b * bits)
              .bitwiseAND((1L << bits) - 1).as("bkey"))): _*)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val staged = Staged.autoFree(banded0)
      val hot = staged.groupBy("band", "bkey")
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
        .select("band", "bkey")
      val banded = staged.join(hot, Seq("band", "bkey"), "left_anti")
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val vecs = corpus.select(col("vec_id"), col("embedding"))
      val scored = cand
        .join(vecs.as("va"), col("id_a") === col("va.vec_id"))
        .join(vecs.as("vb"), col("id_b") === col("vb.vec_id"))
        .select(col("id_a"), col("id_b"),
          Similarity.cosine(col("va.embedding"), col("vb.embedding")).as("cos"))
      val both = scored
        .select(col("id_a").as("query_id"), col("id_b").as("vec_id"), col("cos"))
        .union(scored
          .select(col("id_b").as("query_id"), col("id_a").as("vec_id"), col("cos")))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      both.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    }

    def s05Old(d: String): DataFrame = {
      val (corpus, cap) = s05Corpus(d)
      knnJoinOld(corpus, 3, cap)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }
    def s05New(d: String): DataFrame =
      graft.SparkEntry.queries("s05_knn_join")(spark, d)

    // d07's pair subtree (persisted-signature LSH miner), fed to a CC
    // whose edge list is built the OLD way (self-union) vs the current
    // explode (Dedup.connectedComponents)
    def d07Pairs(d: String): DataFrame = {
      val docs = graft.Tables(spark, d, "documents")
      Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        bands = 16, rowsPerBand = 4, minJaccard = 0.6)
    }
    def ccOld(pairsDf: DataFrame): DataFrame = {
      val edges = pairsDf.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairsDf.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(true)
      val freeRdd = org.apache.spark.sql.GraftInternal.unpersistBackingRdd _
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id"))
      val lblType = labels.schema("lbl").dataType
      var prevRound: DataFrame = null
      var converged = false
      var i = 0
      while (!converged && i < 20) {
        val viaNbr = edges.join(labels, edges("dst") === labels("id"))
          .select(edges("src").as("id"), col("lbl"),
            lit(null).cast(lblType).as("old"))
        val next = labels
          .select(col("id"), col("lbl"), col("lbl").as("old"))
          .unionAll(viaNbr)
          .groupBy("id").agg(min("lbl").as("lbl"), min("old").as("old"))
          .localCheckpoint(false)
        val changed = next
          .agg(count(when(col("lbl") < col("old"), lit(1))).as("c"))
          .first().getLong(0)
        converged = changed == 0L
        if (prevRound != null) freeRdd(prevRound)
        prevRound = next
        labels = next
        i += 1
      }
      freeRdd(edges)
      labels.select(col("id"), col("lbl").as("cluster_id"))
    }
    def ccOldQ(d: String): DataFrame =
      ccOld(d07Pairs(d)).select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    def ccNewQ(d: String): DataFrame =
      Dedup.connectedComponents(d07Pairs(d))
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")

    // s06's edge stage: lazy persist() (current) vs eager
    // localCheckpoint(true) — the PageRank loop's plan reads the edge
    // list in several independent stages, all hitting a COLD cache on
    // the first action (the kmvSetOps race, measured there as a
    // 1.5–15 s spread); an eager checkpoint pays one clean build job
    // and every iteration reads flat blocks.
    def s06Ckpt(d: String): DataFrame = {
      val (corpus, cap) = s05Corpus(d)
      val edges = graft.operators.Similarity.knnJoin(corpus, 3, 16, 4, Some(cap))
        .select(col("query_id").as("src"), col("vec_id").as("dst"),
          count(lit(1)).over(Window.partitionBy("query_id")).as("deg"))
        .localCheckpoint(true)
      val nodes = corpus.select(col("vec_id"))
      val inm = (1 to 2).foldLeft(null: DataFrame) { (prev, _) =>
        val withMass =
          if (prev == null) edges.withColumn("mass", lit(1000000L))
          else edges.join(prev.withColumnRenamed("vec_id", "src"), Seq("src"), "left")
            .withColumn("mass",
              expr("150000L + (850 * coalesce(inm, 0L)) div 1000"))
        withMass
          .select(col("dst").as("vec_id"), expr("mass div deg").as("c"))
          .groupBy("vec_id").agg(sum(col("c")).as("inm"))
      }
      val r = nodes.join(inm, Seq("vec_id"), "left")
        .select(col("vec_id"),
          expr("150000L + (850 * coalesce(inm, 0L)) div 1000").as("mass"))
        .orderBy("vec_id")
      r
    }
    def s06Cur(d: String): DataFrame =
      graft.SparkEntry.queries("s06_knn_centrality")(spark, d)

    // d03's signature stage: lazy persist (current minhashLshPairs)
    // vs eager localCheckpoint — the band self-join's two map stages
    // and the two verify-side hash joins all read the cold sigs cache
    // under one action.
    def d03Docs(d: String): DataFrame = {
      val full = graft.Tables(spark, d, "documents")
      val m = math.max(1L, full.count() / 50000L)
      if (m == 1L) full else full.filter(col("doc_id") % m === 0)
    }
    def d03Ckpt(d: String): DataFrame = {
      val bands = 16; val rowsPerBand = 4; val seed = 42L
      val docs = d03Docs(d)
      val sigs = docs
        .select(col("doc_id").as("id"), Dedup.shingleHashes(col("text")).as("h"))
        .filter(size(col("h")) > 0)
        .select(col("id"), col("h"),
          graft.functions.MinHashFunctions
            .minhashSig(col("h"), bands * rowsPerBand, seed).as("sig"))
        .localCheckpoint(true)
      val bandCols = (0 until bands).map { b =>
        val bandSig = concat_ws("_",
          (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1).cast("string")): _*)
        struct(lit(b).as("band"), xxhash64(bandSig).as("bkey"))
      }
      val buckets = sigs
        .select(col("id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("id"), col("bk.band"), col("bk.bkey"))
      val candIds = buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val hTab = sigs.select(col("id"), col("h"))
      candIds
        .join(hTab.toDF("id_a", "ha"), "id_a")
        .join(hTab.toDF("id_b", "hb"), "id_b")
        .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("ha")) + size(col("hb")) - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select("id_a", "id_b", "inter", "jaccard")
        .withColumn("jaccard", round(col("jaccard"), 4))
        .orderBy("id_a", "id_b")
    }
    def d03Cur(d: String): DataFrame =
      graft.SparkEntry.queries("d03_minhash_lsh")(spark, d)

    // knnJoin with the banded (id, band, bkey) stage EAGERLY
    // checkpointed instead of Staged.autoFree's lazy persist — the hot
    // agg and the anti-join's left side race on the cold cache.
    def s05Banded(d: String): DataFrame = {
      val (corpus, cap) = s05Corpus(d)
      val k = 3; val nBits = 16; val bands = 4; val bits = nBits / bands
      val sig = Similarity.hyperplaneSignature(col("embedding"), nBits)
      val banded0 = corpus
        .select(col("vec_id").as("id"), sig.as("sig"))
        .select(col("id"),
          explode(array((0 until bands).map(b => struct(lit(b).as("band"),
            shiftright(col("sig"), b * bits)
              .bitwiseAND((1L << bits) - 1).as("bkey"))): _*)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
        .localCheckpoint(true)
      val hot = banded0.groupBy("band", "bkey")
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
        .select("band", "bkey")
      val banded = banded0.join(hot, Seq("band", "bkey"), "left_anti")
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val vecs = corpus.select(col("vec_id"), col("embedding"))
      val scored = cand
        .join(vecs.as("va"), col("id_a") === col("va.vec_id"))
        .join(vecs.as("vb"), col("id_b") === col("vb.vec_id"))
        .select(col("id_a"), col("id_b"),
          Similarity.cosine(col("va.embedding"), col("vb.embedding")).as("cos"))
      val both = scored
        .select(explode(array(
          struct(col("id_a").as("query_id"), col("id_b").as("vec_id"), col("cos")),
          struct(col("id_b").as("query_id"), col("id_a").as("vec_id"), col("cos"))))
          .as("e"))
        .select(col("e.query_id").as("query_id"), col("e.vec_id").as("vec_id"),
          col("e.cos").as("cos"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      both.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }

    val variants: Seq[(String, String => DataFrame)] = which match {
      case "s05" => Seq("old_union_both" -> s05Old _,
                        "new_explode_both" -> s05New _)
      case "cc" => Seq("old_union_edges" -> ccOldQ _,
                       "new_explode_edges" -> ccNewQ _)
      case "s06edges" => Seq("cur_lazy_persist" -> s06Cur _,
                             "cand_eager_ckpt" -> s06Ckpt _)
      case "d03sigs" => Seq("cur_lazy_persist" -> d03Cur _,
                            "cand_eager_ckpt" -> d03Ckpt _)
      case "s05banded" => Seq("cur_autofree_persist" -> s05New _,
                              "cand_eager_banded" -> s05Banded _)
      case other => sys.error(s"unknown case $other")
    }

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
    val a = variants.head._2(sfDir)
    val b = variants.last._2(sfDir)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"result diff rows: $diff")
    spark.stop()
  }
}

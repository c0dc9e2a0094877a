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

    // the CC pattern applied to s06: edges eagerly checkpointed, the
    // FINAL in-mass aggregate checkpointed too (materializing the
    // whole loop), then the big edge stage freed deterministically
    // INSIDE the operator — the result plan references only the tiny
    // mass blocks.
    def s06V3(d: String): DataFrame = {
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
      }.localCheckpoint(true)
      org.apache.spark.sql.GraftInternal.unpersistBackingRdd(edges)
      nodes.join(inm, Seq("vec_id"), "left")
        .select(col("vec_id"),
          expr("150000L + (850 * coalesce(inm, 0L)) div 1000").as("mass"))
        .orderBy("vec_id")
    }

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

    // q63's vocabulary aggregate: autoFree lazy persist (current) vs
    // eager localCheckpoint — cl/cw/n are three concurrently-launched
    // broadcast jobs racing on the cold cwl cache.
    def q63Cur(d: String): DataFrame =
      graft.SparkEntry.queries("q63_mi_feature_select")(spark, d)
    def q63Eager(d: String): DataFrame = {
      val tok = graft.Tables(spark, d, "documents")
        .select(col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val cwl = tok.groupBy("lang", "w").agg(count(lit(1)).as("c_wl"))
        .localCheckpoint(true)
      val cl = cwl.groupBy("lang").agg(sum("c_wl").as("c_l"))
      val cw = cwl.groupBy("w").agg(sum("c_wl").as("c_w"))
      val n = cwl.agg(sum("c_wl").as("n"))
      val wRank = Window.partitionBy("lang")
        .orderBy(col("lift_ppm").desc, col("c_wl").desc, col("w").asc)
      cwl.join(broadcast(cl), "lang").join(broadcast(cw), "w")
        .crossJoin(broadcast(n))
        .filter(col("c_wl") >= 5)
        .withColumn("lift_ppm",
          expr("((c_wl * 1000000L) div c_w) * n div c_l"))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
        .select(col("lang"), col("rank"), col("w").as("token"),
          col("c_wl"), col("lift_ppm"))
        .orderBy("lang", "rank")
    }

    // q55's assigned-cells stage: autoFree lazy persist (current) vs
    // eager localCheckpoint — both self-join sides + the anti-join's
    // left map stage read the cold cache. The centroid trainer is
    // replicated from Similarity.trainCentroids (private there).
    def embSubset(d: String): DataFrame = {
      val full = graft.Tables(spark, d, "embeddings")
      val m = math.max(1L, full.count() / 200000L)
      if (m == 1L) full else full.filter(col("vec_id") % m === 0)
    }
    def q55Cur(d: String): DataFrame =
      graft.SparkEntry.queries("q55_semdedup")(spark, d)
    def q55Eager(d: String): DataFrame = {
      val corpus = embSubset(d)
      val nCells = 16; val eps = 0.4
      def centsArray(cent: DataFrame): DataFrame =
        cent.agg(transform(
          array_sort(collect_list(struct(col("cell_id"), col("centroid")))),
          s => s.getField("centroid")).as("cents"))
      def assign(df: DataFrame, centsArr: DataFrame, keep: Int): DataFrame =
        df.crossJoin(broadcast(centsArr))
          .select(col("vec_id"), col("embedding"),
            graft.functions.VectorFunctions
              .nearestCells(col("embedding"), col("cents"), keep).as("cells"))
      val seeds = corpus
        .orderBy(md5(col("vec_id").cast("string").cast("binary")).asc,
          col("vec_id").asc)
        .limit(nCells)
        .agg(transform(
          array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
          s => s.getField("embedding")).as("cents"))
      val step1 = centsArray(assign(corpus, seeds, 1)
        .select(element_at(col("cells"), 1).as("cell_id"),
          posexplode(col("embedding")))
        .groupBy("cell_id", "pos")
        .agg((sum(col("col").cast(org.apache.spark.sql.types.DecimalType(27, 8)))
          .cast("double") / count(lit(1))).as("m"))
        .groupBy("cell_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid")))
      val cells = assign(corpus, step1, 1)
        .select(col("vec_id"), col("embedding"),
          element_at(col("cells"), 1).as("cell_id"))
        .localCheckpoint(true)
      val drops = cells.as("a").join(cells.as("b"),
          col("a.cell_id") === col("b.cell_id") &&
          col("a.vec_id") < col("b.vec_id"))
        .filter(Similarity.cosine(col("a.embedding"), col("b.embedding")) >= eps)
        .select(col("b.vec_id").as("vec_id"))
        .distinct()
      val kept = cells.join(drops, Seq("vec_id"), "left_anti")
      val w = Window.partitionBy("cell_id")
      kept.withColumn("cell_rep", min(col("vec_id")).over(w))
        .select(col("vec_id"), col("cell_rep"))
        .orderBy("vec_id")
    }

    // q53's staged (id, hash, token-count) projection: autoFree lazy
    // persist (current) vs eager localCheckpoint — globalRunningSum's
    // per-bucket window branch and bucket-totals branch race on it.
    def q53Cur(d: String): DataFrame =
      graft.SparkEntry.queries("q53_shard_pack")(spark, d)
    def q53Eager(d: String): DataFrame = {
      val docs = graft.Tables(spark, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .localCheckpoint(true)
      graft.operators.Packing.globalRunningSum(
          docs,
          bucket = substring(col("h"), 1, 1),
          ordCols = Seq(col("h"), col("doc_id")),
          weight = col("n_tokens"),
          outCol = "cum_tokens")
        .withColumn("shard_id", expr("(cum_tokens - n_tokens) div 1024"))
        .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
        .orderBy("doc_id")
    }

    val variants: Seq[(String, String => DataFrame)] = which match {
      case "s05" => Seq("old_union_both" -> s05Old _,
                        "new_explode_both" -> s05New _)
      case "cc" => Seq("old_union_edges" -> ccOldQ _,
                       "new_explode_edges" -> ccNewQ _)
      case "s06edges" => Seq("cur_lazy_persist" -> s06Cur _,
                             "cand_eager_ckpt" -> s06Ckpt _)
      case "s06v3" => Seq("cur_eager_cache" -> s06Cur _,
                          "cand_internal_mat" -> s06V3 _)
      case "d03sigs" => Seq("cur_lazy_persist" -> d03Cur _,
                            "cand_eager_ckpt" -> d03Ckpt _)
      case "s05banded" => Seq("cur_autofree_persist" -> s05New _,
                              "cand_eager_banded" -> s05Banded _)
      case "q63" => Seq("cur_autofree_cwl" -> q63Cur _,
                        "cand_eager_cwl" -> q63Eager _)
      case "q55cells" => Seq("cur_autofree_cells" -> q55Cur _,
                             "cand_eager_cells" -> q55Eager _)
      case "q53" => Seq("cur_autofree_docs" -> q53Cur _,
                        "cand_eager_docs" -> q53Eager _)
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

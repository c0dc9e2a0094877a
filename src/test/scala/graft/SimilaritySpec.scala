package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends TestSpark {
  import spark.implicits._

  /** Deterministic synthetic corpus: 3 tight clusters of 20 vectors in
    * 16 dims + the cluster centers as queries. Near-dup pairs within a
    * cluster have cosine ~0.99; across clusters ~0. */
  private def clustered = {
    val dims = 16
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val base = Array.tabulate(dims)(k => if (k % 3 == c) 1.0f else 0.05f)
      // deterministic jitter per (c, i, k)
      val v = base.zipWithIndex.map { case (x, k) =>
        x + 0.02f * (((c * 31 + i * 7 + k * 13) % 5) - 2)
      }
      (c * 100L + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks same-cluster vectors first") {
    val corpus = clustered
    val queries = clustered.filter(col("vec_id") % 100 === 0) // one per cluster
    val top = Similarity.bruteForceTopK(corpus, queries, k = 10)
    val byQuery = top.select("query_id", "vec_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for ((q, ids) <- byQuery) {
      assert(ids.size === 10)
      assert(ids.forall(id => id / 100 === q / 100),
        s"query $q pulled cross-cluster neighbours: $ids")
    }
  }

  test("LSH ANN reaches high recall vs brute force on clustered data") {
    val corpus = clustered
    val queries = clustered.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
  }

  test("IVF ANN reaches reasonable recall vs brute force") {
    val corpus = clustered
    val queries = clustered.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.ivfTopK(corpus, queries, 10, nCells = 6, nProbe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("IVF ANN with two Lloyd iterations keeps (or improves) recall") {
    val corpus = clustered
    val queries = clustered.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ann2 = Similarity.ivfTopK(corpus, queries, 10, nCells = 6, nProbe = 3,
        lloydIters = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann2).size.toDouble / exact.size
    // after 2 k-means refinements the centroids sit on the true cluster
    // centres, so the probed cells should cover the exact neighbours
    assert(recall >= 0.8, s"IVF lloydIters=2 recall $recall too low")
  }

  test("PQ ANN reaches high recall vs brute force on clustered data") {
    val corpus = clustered
    val queries = clustered.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(corpus, queries, 10, dims = 16, nSub = 4,
        nCodes = 6, lloydIters = 1, rerank = 30)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(pq.size === exact.size)
    val recall = (exact & pq).size.toDouble / exact.size
    // quantization error only affects CANDIDATE selection — the exact
    // re-rank restores true cosines, so with rerank covering half the
    // corpus the clustered neighbours must survive
    assert(recall >= 0.8, s"PQ recall $recall too low")
  }

  test("near-dup pairs finds intra-cluster pairs only") {
    val pairs = Similarity.nearDupPairs(clustered, minCos = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a / 100 == b / 100 })
  }

  test("nearDupPairs maxBucketSize: the recall contract — a clique " +
       "denser than the cap emits ZERO pairs (dense in every band), " +
       "clusters under the cap keep exactly their uncapped pairs") {
    val uncapped = Similarity.nearDupPairs(clustered, minCos = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // cap = corpus size: no bucket can exceed it, identical output.
    // (25 is NOT safe here: with 16 bucket values per band two
    // 20-vector clusters can COLLIDE into one 40-member bucket, and
    // cap=25 rightly drops it — observed: 16 cluster-0 pairs whose
    // only sub-threshold co-bucket was the collided band vanish.)
    val keeps = Similarity.nearDupPairs(clustered, minCos = 0.95,
        maxBucketSize = Some(60L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(keeps === uncapped,
      "a cap above the whole corpus size changed the pair set")
    // a TRUE clique — identical copies — shares ONE bucket in every
    // band by construction (noisy clusters can split across a
    // hyperplane and dodge the cap through a small sub-bucket;
    // identical vectors cannot), so a 30-copy clique under cap=25
    // emits ZERO pairs while the noisy clusters keep pairing
    val clique = spark.range(1000, 1030)
      .select(col("id").as("vec_id"),
        typedLit(Array.fill(16)(0.5f)).as("embedding"))
    val mixed = clustered.unionByName(clique)
    val capped = Similarity.nearDupPairs(mixed, minCos = 0.95,
        maxBucketSize = Some(25L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b) => a >= 1000 && b >= 1000 },
      "the over-cap identical-copy clique still emitted pairs")
    assert(capped.nonEmpty,
      "the cap silenced the under-cap clusters too")
  }

  test("megaBucketCap: one formula serves both engines and scales with " +
       "the banding geometry (the round-14 advisory's drift guard)") {
    // the gated 16/4 geometry must reproduce the historic 3n/40 cap
    // exactly — the value every committed gate row was produced under
    for (n <- Seq(0L, 7L, 40L, 199999L, 200000L, 12345678L))
      assert(graft.queries.Pipeline.megaBucketCap(n, 16, 4) ===
        math.max(8L, 3L * n / 40L), s"n=$n")
    // halving the per-band bucket count doubles the cap (same n)
    assert(graft.queries.Pipeline.megaBucketCap(80000L, 12, 4) ===
      2L * graft.queries.Pipeline.megaBucketCap(80000L, 16, 4))
    // the SQL half spells the same truncating arithmetic
    val sql = graft.queries.Pipeline.megaBucketCapSql("src", 16, 4)
    assert(sql.contains("// 80") && sql.contains("6 *"), sql)
  }

  test("cosine matches plain-scala computation on real embeddings") {
    val two = Tables(spark, sfDir, "embeddings").filter(col("vec_id") < 2)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1).map(_._2)
    val expected = {
      val dot = two(0).zip(two(1)).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val na = math.sqrt(two(0).map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(two(1).map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val got = Tables(spark, sfDir, "embeddings").filter(col("vec_id") === 0).as("a")
      .crossJoin(Tables(spark, sfDir, "embeddings").filter(col("vec_id") === 1).as("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
  }

  test("knnJoin ranks same-cluster neighbours for EVERY vector") {
    val out = Similarity.knnJoin(clustered, k = 3)
      .select("query_id", "rank", "vec_id", "cos")
      .as[(Long, Int, Long, Double)].collect()
    // every one of the 60 vectors is a query (tight clusters of 20 —
    // LSH blocking cannot isolate anybody)
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size === 60, s"queries: ${byQuery.size}")
    for ((q, rows) <- byQuery) {
      val sorted = rows.sortBy(_._2)
      // ranks contiguous from 1, cos non-increasing
      assert(sorted.map(_._2).toSeq === (1 to sorted.size).toSeq)
      assert(sorted.map(_._4).toSeq.reverse.sorted.reverse ===
        sorted.map(_._4).toSeq)
      // all neighbours of a clustered vector are same-cluster
      assert(rows.forall { case (_, _, v, _) => v / 100 === q / 100 },
        s"query $q pulled cross-cluster neighbours")
    }
  }

  test("knnJoin agrees with brute force where candidates exist") {
    // with 3 tight clusters every exact top-3 neighbour shares all
    // bands with its query, so the kNN graph must equal brute force
    val exact = Similarity.bruteForceTopK(clustered, clustered, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val knn = Similarity.knnJoin(clustered, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & knn).size.toDouble / exact.size
    assert(recall >= 0.9, s"knn-graph recall $recall too low")
  }

  test("knnJoin maxBucketSize: the mega-bucket cap bounds candidates — " +
       "a degenerate bucket is dropped (its pairs vanish) while " +
       "non-degenerate neighbourhoods keep their exact top-k; uncapped " +
       "behavior is the default") {
    // the 3 tight clusters of 20 land each cluster in one bucket per
    // band: cap=25 keeps them (20 <= 25, graph unchanged); cap=10
    // drops every cluster bucket and the graph loses those edges —
    // the candidate bound the 100 TB deployment relies on
    val uncapped = Similarity.knnJoin(clustered, 3)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)]
      .collect().toSet
    val capKeeps = Similarity.knnJoin(clustered, 3,
        maxBucketSize = Some(25L))
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(capKeeps === uncapped,
      "a cap above every bucket's population changed the graph")
    val capDrops = Similarity.knnJoin(clustered, 3,
        maxBucketSize = Some(10L))
      .select("query_id").as[Long].collect().toSet
    assert(capDrops.size < uncapped.map(_._1).size,
      "a cap below every bucket's population still produced all pairs")
  }

  test("knnCentrality: cluster cores collect mass, an unreferenced " +
       "outlier bottoms out at the teleport floor; partition-invariant") {
    // append one far-away vector: nobody's top-3 neighbour → zero
    // in-edges → after any iteration its mass is exactly the teleport
    // term 150000 (integer arithmetic, no approximation)
    val outlier = Seq((999L, Array.tabulate(16)(k =>
      if (k % 4 == 3) -1.0f else 0.01f))).toDF("vec_id", "embedding")
    val corpus = clustered.union(outlier)
    val mass = Similarity.knnCentrality(corpus, k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(mass(999L) === 150000L)
    // clustered vectors are somebody's neighbour: strictly above floor
    assert(mass.filter(_._1 < 999L).values.forall(_ > 150000L))
    // bit-identical under a different partitioning
    val mass7 = Similarity.knnCentrality(corpus.repartition(7), k = 3,
      iters = 2).as[(Long, Long)].collect().toMap
    assert(mass === mass7)
  }

  test("semDedup collapses tight clusters to their lowest-id member") {
    // eps=0.9: the three synthetic clusters are ~0.99 within and ~0.1
    // across, so whenever a cell holds several same-cluster vectors
    // only the lowest id survives. Across cells recall is bounded by
    // the clustering (the SemDeDup contract) — so assert the DROP
    // rule's invariants, not a fixed survivor set:
    val cells = 6
    val out = Similarity.semDedup(clustered, eps = 0.9, nCells = cells,
        lloydIters = 1)
      .as[(Long, Long)].collect()
    val survivors = out.map(_._1).toSet
    // survivors are unique and each cluster keeps >= 1 member
    assert(out.length === survivors.size)
    for (c <- 0 until 3)
      assert(survivors.exists(_ / 100 === c), s"cluster $c wiped out")
    // cell_rep is a surviving member and the min of its group
    val byRep = out.groupBy(_._2)
    for ((rep, members) <- byRep) {
      assert(survivors.contains(rep))
      assert(members.map(_._1).min === rep)
    }
    // the drop rule actually fired: 60 near-identical-in-cluster
    // vectors cannot all survive a 6-cell clustering at eps=0.9
    assert(survivors.size < 60, s"nothing dropped: ${survivors.size}")
    // and every dropped vector really has a lower-id survivor it is
    // near-identical to (same cluster — the only source of cos>=0.9)
    val dropped = (clustered.select("vec_id").as[Long].collect().toSet
      -- survivors)
    for (d <- dropped)
      assert(survivors.exists(s => s < d && s / 100 === d / 100),
        s"dropped $d has no lower-id same-cluster survivor")
  }
  test("mmrTopK diversifies: a near-duplicate of the first pick loses " +
      "to a diverse candidate that plain top-k ranks below it") {
    // query [1,0,0]; ids 10/11 are the SAME vector (rel 0.6), id 12 is
    // its mirror (rel 0.6, cos(12,10) = -0.28). Plain top-k order by
    // (rel, id) = [10, 11, 12]; MMR (lam=0.7) picks 10, then the
    // penalty sinks 11 (0.42 - 0.3*1.0 = 0.12) below 12
    // (0.42 - 0.3*(-0.28) = 0.504), then 11 last.
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(0.6f, 0.8f, 0.0f)),
      (11L, Array(0.6f, 0.8f, 0.0f)),
      (12L, Array(0.6f, -0.8f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(rows, rows.filter(col("vec_id") === 0L),
        k = 3, cand = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out === Seq(10L, 12L, 11L))
    // selection is stable and each id appears exactly once
    assert(out.distinct === out)
  }

  test("kmeansModel: sizes partition the corpus, centroids have the " +
      "corpus dimensionality, labels are member ids") {
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Similarity.kmeansModel(emb, nCells = 8, lloydIters = 1)
      .collect()
    assert(model.map(_.getAs[Long]("n_members")).sum === emb.count())
    val dims = emb.selectExpr("size(embedding)").as[Int].head()
    assert(model.forall(_.getAs[Seq[Double]]("centroid").length === dims))
    // every cell label is one of its members' ids (min member)
    val ids = emb.select("vec_id").as[Long].collect().toSet
    assert(model.forall(r => ids(r.getAs[Long]("cell_rep"))))
  }

  test("clusterBalancedSample: quota enforced per cell, every cell " +
      "covered, deterministic under repartitioning") {
    val emb = Tables(spark, sfDir, "embeddings")
    val quota = 3
    val sample = Similarity.clusterBalancedSample(emb, quota,
      nCells = 8, lloydIters = 1)
    val perCell = sample.groupBy("cell_rep").count().collect()
    assert(perCell.forall(_.getAs[Long]("count") <= quota))
    // cells large enough hit the quota exactly (coverage, not a cap)
    val model = Similarity.kmeansModel(emb, nCells = 8, lloydIters = 1)
      .collect().map(r => r.getAs[Long]("cell_rep") -> r.getAs[Long]("n_members"))
      .toMap
    perCell.foreach { r =>
      val want = math.min(quota.toLong, model(r.getAs[Long]("cell_rep")))
      assert(r.getAs[Long]("count") === want, r)
    }
    // same rows under a different physical layout
    val again = Similarity.clusterBalancedSample(emb.repartition(7), quota,
      nCells = 8, lloydIters = 1)
    assert(sample.orderBy("vec_id").collect().toSeq ===
      again.orderBy("vec_id").collect().toSeq)
  }
}

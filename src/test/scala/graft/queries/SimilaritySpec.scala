package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Quality checks for the no-oracle ANN variants: IVF probing and LSH
  * bucketing must stay close to the brute-force ground truth. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def topkSets(rows: Array[org.apache.spark.sql.Row]):
      Map[Long, Set[Long]] =
    rows.groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap

  test("IVF probing all cells reproduces brute-force top-k exactly") {
    val brute = SparkEntry.queries("qs01_ann_brute_topk")(spark, dir)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("c_id"))).sorted
    val full = SimilarityQueries.ivfTopK(spark, dir, nProbe = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("c_id"))).sorted
    assert(full.toSeq == brute.toSeq)
  }

  test("SQ8 reranking every candidate reproduces brute-force exactly") {
    // with refine = corpus size the quantized pass only orders the
    // rerank input, and the exact-cosine rerank must erase it
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count().toInt
    val brute = SparkEntry.queries("qs01_ann_brute_topk")(spark, dir)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("c_id"))).sorted
    val full = SimilarityQueries.sq8TopK(spark, dir, refine = n)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("c_id"))).sorted
    assert(full.toSeq == brute.toSeq)
  }

  test("SQ8 at refine=3K keeps high recall vs brute force") {
    val brute = topkSets(
      SparkEntry.queries("qs01_ann_brute_topk")(spark, dir).collect())
    val sq8 = topkSets(
      SparkEntry.queries("qs11_ann_sq8")(spark, dir).collect())
    val recalls = brute.map { case (q, want) =>
      val got = sq8.getOrElse(q, Set.empty)
      got.intersect(want).size.toDouble / want.size
    }
    // 8-bit per-dim reconstruction is tight; the refine pass fixes the
    // ordering — recall should be near-perfect on the fixture corpus
    assert(recalls.sum / recalls.size >= 0.9, recalls.toSeq)
  }

  test("IVF top-k at nProbe=3/10 keeps nonzero recall vs brute force") {
    val brute = topkSets(
      SparkEntry.queries("qs01_ann_brute_topk")(spark, dir).collect())
    val ivf = topkSets(
      SparkEntry.queries("qs02_ann_ivf_topk")(spark, dir).collect())
    assert(brute.keySet == ivf.keySet)
    val recall = brute.keys.toSeq.map { q =>
      (brute(q) intersect ivf(q)).size.toDouble / brute(q).size
    }.sum / brute.size
    // labels are weak cosine clusters on this fixture; the scale win is
    // the 3/10 scan reduction — recall floor documents the trade-off
    assert(recall >= 0.25, s"IVF recall $recall")
  }

  test("LSH buckets cover all vectors exactly once") {
    val buckets = SparkEntry.queries("qs03_ann_lsh_buckets")(spark, dir)
      .collect()
    val total = buckets.map(_.getAs[Long]("n")).sum
    val nVec = graft.Tables(spark, dir).embeddings.count()
    assert(total == nVec)
    // bucketing actually partitions (not everything in one bucket)
    assert(buckets.length > 10)
  }

  test("PlaneLSH finds every planted true near-dup (cos ≥ 0.95)") {
    // qd06's candidate stage is approximate-by-design at loose
    // thresholds; at the production near-dup regime it must not miss.
    // Plant 20 pairs at cos ≈ 0.98 among 200 decoys and require 100%
    // recall from the 12×8-bit construction (deterministic planes +
    // seeded vectors ⇒ this is a fixed, repeatable check).
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(42)
    def randVec(): Array[Float] =
      Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]): Array[Float] = {
      val norm = math.sqrt(v.map(x => x * x.toDouble).sum)
      v.map(x => (x + 0.14 * norm / 8 * rnd.nextGaussian()).toFloat)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val planted = (0 until 20).map(_ => randVec()).map(v => (v, perturb(v)))
    planted.foreach { case (a, b) => assert(cos(a, b) >= 0.95) }
    val decoys = (0 until 200).map(_ => randVec())
    val rows =
      planted.zipWithIndex.flatMap { case ((a, b), i) =>
        Seq(Row(2L * i, a), Row(2L * i + 1, b))
      } ++ decoys.zipWithIndex.map { case (v, i) => Row(1000L + i, v) }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
    val sigs = graft.functions.PlaneLSH
      .signatures(df, "vec_id", "embedding", tables = 12, bits = 8, dim = 64)
      .collect()
      .map(r => r.getLong(0) -> (0 until 12).map(t => r.getInt(t + 1)))
      .toMap
    val missed = (0 until 20).filter { i =>
      val sa = sigs(2L * i); val sb = sigs(2L * i + 1)
      !(0 until 12).exists(t => sa(t) == sb(t))
    }
    assert(missed.isEmpty, s"planted pairs missed by LSH: $missed")
  }

  test("qs07 k-means: Lloyd step never increases inertia; distributed " +
    "result equals an independent JVM replay exactly") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.SparkEntry.queries("qs07_kmeans_refine")(spark, dir)
      .collect()
    // independent sequential replay of the integer-exact recipe
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.floor((x.toDouble + 2.0) * 1e6).toLong).toArray)
      .sortBy(_._1)
    val seeds = e.take(8).map(_._2).toIndexedSeq
    def d(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def assign(cents: IndexedSeq[Array[Long]]) = e.map { case (_, v) =>
      val ds = cents.map(c => d(v, c)); val m = ds.min
      (ds.indexOf(m), m)
    }
    val a1 = assign(seeds)
    val cents2 = (0 until 8).map { c =>
      val mem = e.zip(a1).collect { case ((_, v), (cl, _)) if cl == c => v }
      if (mem.isEmpty) seeds(c)
      else Array.tabulate(64)(i => mem.map(_(i)).sum / mem.length)
    }
    val a2 = assign(cents2)
    // Lloyd monotonicity: update + reassign can only shrink total cost
    assert(a2.map(_._2).sum <= a1.map(_._2).sum)
    // exact agreement: sizes, inertia, centroid norms per cluster
    val counts = a2.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val inertias = a2.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    assert(out.map(_.getAs[Long]("n_vecs")).sum == e.length.toLong)
    out.foreach { r =>
      val c = r.getAs[Int]("cluster")
      assert(r.getAs[Long]("n_vecs") == counts.getOrElse(c, 0L))
      assert(r.getAs[Long]("inertia") == inertias.getOrElse(c, 0L))
      assert(r.getAs[Long]("c_norm") == cents2(c).map(x => x * x).sum)
    }
  }

  test("qs09 recall harness: values are k-quantized, bounded, and " +
    "consistent with the nonzero-recall law") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("qs09_ann_recall")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 10)
    rows.foreach { case (_, hits, ppm) =>
      assert(hits >= 0 && hits <= 5)
      assert(ppm === 1000000L * hits / 5) // exactly hits/k in ppm
    }
    // the qs02 recall law (nonzero vs brute at nProbe=3) must be
    // visible through the harness too
    assert(rows.map(_._2).sum > 0)
  }

  test("qs10: projection preserves identical vectors exactly (planted " +
    "duplicate ranks first in projected space)") {
    import spark.implicits._
    // vec 0's exact copy planted at id 100000: after any linear
    // projection the copies project identically, so projected cosine
    // is 1.0 and the copy must be vec 0's top-1 — compression can blur
    // neighbors but can never split exact duplicates
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding")
    val planted = e.filter($"vec_id" === 0)
      .select(org.apache.spark.sql.functions.lit(100000L).as("vec_id"),
        $"embedding")
    // the mathematical core: projections of identical inputs are
    // identical rows (so projected cosine = 1 and the copy ranks top-1)
    val projRows = graft.queries.SimilarityQueries
      .projectedOf(e.unionByName(planted))
      .filter($"vec_id".isin(0L, 100000L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(projRows.length === 2)
    assert(projRows(0)._2 === projRows(1)._2)
  }

  test("qs12 MMR equals the brute-force greedy chain and diversifies " +
    "vs plain top-k") {
    import spark.implicits._
    val embs = graft.Tables(spark, dir).embeddings
      .select($"vec_id", $"embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = SparkEntry.queries("qs12_mmr_topk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (qid, picksUnsorted) =>
      val picks = picksUnsorted.sortBy(_._2)
      assert(picks.map(_._2).toSeq == (1 to 4), s"q$qid pick orders")
      // brute-force greedy replay over the same pool
      val pool = embs.keys.filter(_ != qid).toSeq
        .map(c => (c, cos(embs(qid), embs(c))))
        .sortBy { case (c, rel) => (-rel, c) }.take(12)
      var sel = Vector.empty[Long]
      picks.foreach { case (_, _, cId, rel, maxsim, mmr) =>
        val want = pool.filterNot(p => sel.contains(p._1))
          .map { case (c, r) =>
            val m = if (sel.isEmpty) 0.0
              else sel.map(s => cos(embs(c), embs(s))).max
            (c, r, m, r - m)
          }
          .sortBy { case (c, _, _, score) => (-score, c) }.head
        assert(cId == want._1, s"q$qid pick ${sel.size + 1} id")
        assert(rel == want._2 && maxsim == want._3 && mmr == want._4,
          s"q$qid pick ${sel.size + 1} scores")
        sel :+= cId
      }
      // diversification is non-trivial somewhere: at least one query's
      // MMR picks differ from its plain top-4 (asserted globally below)
    }
    val brute = SparkEntry.queries("qs01_ann_brute_topk")(spark, dir)
      .collect()
      .filter(_.getAs[Int]("rank") <= 4)
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val mmrSets = byQ.view
      .mapValues(_.map(_._3).toSet).toMap
    assert(mmrSets.exists { case (q, s) => s != brute(q) },
      "MMR never diverged from plain top-k — pool/λ make it a no-op")
  }
}

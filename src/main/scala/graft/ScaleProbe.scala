package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: replicates `documents` N× (distinct doc_ids) and times
  * the dedup chain (signatures → LSH pairs → verified keep-list shape)
  * at each multiple, to observe scaling behavior beyond the fixtures.
  * Usage: sbt "runMain graft.ScaleProbe [sfDir] [multiples...]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 5, 20)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, sfDir).documents.select("doc_id", "text")
    val baseN = base.count()
    multiples.foreach { m =>
      // m distinct copies; texts perturbed per copy so near-dup structure
      // scales instead of becoming m-way exact duplicates
      val big = (0 until m).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" copytag$i")).as("text"))
      }.reduce(_ union _).repartition(spark.sparkContext.defaultParallelism)
        .cache()
      val n = big.count() // materialize cache
      val t0 = System.nanoTime()
      val sigs = functions.MinHash.signatures(big, 8).cache()
      sigs.count()
      val tSig = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val bands = sigs.select(col("doc_id"), explode(array(
        (0 until 4).map(b => md5(to_binary(concat_ws("|",
          lit(b.toString), col(s"h${2 * b}"), col(s"h${2 * b + 1}")),
          lit("utf-8")))): _*)).as("band"))
      val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
      val nPairs = pairs.count()
      val tLsh = (System.nanoTime() - t1) / 1e9
      // 64-bit simhash + Manku C(6,3) combo-table join (qd07 shape):
      // candidate count must stay near-linear in docs, not quadratic
      val t2 = System.nanoTime()
      val sim = functions.SimHash.signatures(big)
      val nSimPairs = functions.SimHash.candidatePairs(sim)
        .select(col("a_id"), col("b_id")).count()
      val tSim = (System.nanoTime() - t2) / 1e9
      println(f"[scale] docs=$n%8d sig=$tSig%6.2fs lsh=$tLsh%6.2fs " +
        f"pairs=$nPairs%d simhash=$tSim%6.2fs simPairs=$nSimPairs%d")
      sigs.unpersist(); big.unpersist()
    }

    // embedding LSH bucket balance (qd06 shape): distinct synthetic
    // vectors — measures ACCIDENTAL bucket collisions when there are no
    // true near-dups at all. Signature width follows the documented
    // scale rule (bits ~ log2(n/bucketTarget)): fixed-width buckets
    // would go quadratic as n grows past 2^bits
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    Seq(10000, 100000, 1000000).foreach { nv =>
      // the query-path candidate stage + width rule, verbatim (qd06)
      val bits = queries.DedupQueries.embedBitsFor(nv.toLong)
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val vecs = spark.createDataFrame(
        spark.sparkContext.parallelize(0L until nv.toLong,
          spark.sparkContext.defaultParallelism).map { id =>
          // deterministic pseudo-random coords from a splitmix-style mix
          val arr = Array.tabulate(64) { i =>
            var z = id * 64 + i + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            (((z ^ (z >>> 31)) & 0xffff) / 32768.0f) - 1.0f
          }
          Row(id, arr)
        }, schema)
      val t0 = System.nanoTime()
      val cands = queries.DedupQueries
        .embCandidates(vecs, tables = 12, bits = bits, dim = 64)
        .count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scale] vecs=$nv%8d bits=$bits%2d embLsh=$t%6.2fs " +
        f"candPairs=$cands%d")
      // qs07's Lloyd refinement over the same synthetic frame — the
      // QUERY-PATH code: per iteration one pruned scan + broadcast-
      // literal assignment + a k×dim partial agg; cost must stay
      // linear in vectors with no embedding ever crossing an exchange
      val t1 = System.nanoTime()
      val km = queries.SimilarityQueries.kmeansRefineOf(vecs).collect()
      val tKm = (System.nanoTime() - t1) / 1e9
      val inertia = km.map(_.getAs[Long]("inertia")).sum
      println(f"[scale] vecs=$nv%8d kmeans2iter=$tKm%6.2fs " +
        f"clusters=${km.length}%d inertiaSum=$inertia%d")
    }

    // connected components at 1M vertices (qd09 shape) with a reliable
    // checkpoint dir — the fault-tolerant path a 100 TB dedup job runs.
    // Star-shaped clusters of 200 (hub + spokes, diameter 2, plus a
    // bridge chain every 10 clusters) mirror real near-dup clusters:
    // LSH candidates are dense around shared content, not long chains
    {
      val ckpt = java.nio.file.Files
        .createTempDirectory("scale_ckpt").toString
      spark.sparkContext.setCheckpointDir(ckpt)
      val nVerts = 1000000L
      val clusterSize = 200L
      val verts = spark.range(nVerts).select(col("id"))
      val hub = (col("id") / clusterSize).cast("long") * clusterSize
      val spokes = spark.range(nVerts)
        .filter(col("id") % clusterSize =!= 0)
        .select(hub.as("a_id"), col("id").as("b_id"))
      // bridges merge each run of 10 stars into one component
      val bridges = spark.range(nVerts / clusterSize)
        .filter(col("id") % 10 =!= 9)
        .select((col("id") * clusterSize).as("a_id"),
          ((col("id") + 1) * clusterSize).as("b_id"))
      val t0 = System.nanoTime()
      val labels = functions.ConnectedComponents.run(
        spokes.union(bridges), verts)
      val nClusters = labels.select("label").distinct().count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scale] ccVerts=$nVerts%8d cc=$t%6.2fs " +
        f"clusters=$nClusters%d (expect ${nVerts / clusterSize / 10}%d)")
      spark.sparkContext.setCheckpointDir(null)
    }

    // Skewed-join probe: half of 16M fact rows share one key (the hot-
    // user / hot-dedup-key shape). Measures the engine-controlled
    // mitigation — TARGETED salting (only the hot key is salted; its
    // one dim row replicates across the salt range; uniform keys join
    // plainly) — against the plain shuffle join whose stage wall is the
    // single hot task. AQE's built-in skew split is the zero-code path
    // on a real cluster, where hot partitions cross its stock 256 MB
    // threshold; this fixture's hot partition compresses far below
    // that, so the probe demonstrates the salting pattern instead.
    {
      val n = 16000000L
      val salts = 32
      val fact = spark.range(n).select(
        when(col("id") % 2 === 0, lit(0L))
          .otherwise(col("id") % 65536).as("key"),
        xxhash64(col("id")).as("payload")).cache()
      val perKey = spark.range(65536).select(
        col("id").as("key"), (col("id") * 7).as("attr")).cache()
      fact.count(); perKey.count() // materialize: time the join, not the scan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val plain = time {
        fact.join(perKey, "key").agg(sum(col("attr"))).collect()
      }
      // DETECT the hot keys with the Misra-Gries aggregate (one cheap
      // bounded-state pass; anything holding > n/(k+1) of the rows is
      // guaranteed in the candidate map), then salt exactly those — the
      // self-contained detect→mitigate loop a 100 TB job runs when key
      // skew isn't known a priori
      var detected: Seq[Long] = Nil
      val tDetect = time {
        val sk = fact.agg(
          functions.FreqSketch.freqSketch(col("key"), 16).as("sk"))
          .head().getMap[Long, Long](0)
        detected = sk.filter(_._2 > n / 10).keys.toSeq.sorted
      }
      assert(detected == Seq(0L), s"hot-key detection found $detected")
      val salted = time {
        val isHot = col("key").isin(detected: _*)
        val hot = fact.filter(isHot).withColumn("salt",
          pmod(xxhash64(col("payload")), lit(salts)).cast("int"))
        val rest = fact.filter(!isHot)
        val hotDim = perKey.filter(isHot).join(
          spark.range(salts.toLong).select(col("id").cast("int").as("salt")))
        val a = hot.join(hotDim, Seq("key", "salt")).select(col("attr"))
        val b = rest.join(perKey, "key").select(col("attr"))
        a.union(b).agg(sum(col("attr"))).collect()
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      fact.unpersist(); perKey.unpersist()
      println(f"[scale] skewJoin n=$n%d hotKeyShare=0.5 " +
        f"plain=$plain%6.2fs detect=$tDetect%6.2fs " +
        f"salted=$salted%6.2fs (salts=$salts)")
    }

    // Corpus-analytics probes (qt12 LM count-table join, qd13 KMV
    // sketch vs exact distinct) on replicated documents. copytag
    // perturbation keeps a Zipf-like shared vocabulary head, so the
    // LM count tables grow sub-linearly while occurrences scale — the
    // real-corpus shape. KMV is timed against the exact count(DISTINCT)
    // it replaces; its error is reported against that exact answer.
    multiples.foreach { m =>
      val big = (0 until m).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" copytag$i")).as("text"),
          concat(lit("src"), (col("doc_id") % 20).cast("string"))
            .as("source"))
      }.reduce(_ union _).repartition(spark.sparkContext.defaultParallelism)
        .cache()
      val n = big.count()
      val t0 = System.nanoTime()
      queries.TextQueries.lmScoreOf(big).foreach(_ => ())
      val tLm = (System.nanoTime() - t0) / 1e9
      // opt-in detect-then-salt on the Zipf-hot (w1[,w2]) join keys:
      // one Misra-Gries pass finds >1/16-share words, only those salt
      val t0s = System.nanoTime()
      queries.TextQueries.lmScoreOf(big, saltHotWords = 16).foreach(_ => ())
      val tLmSalt = (System.nanoTime() - t0s) / 1e9
      // KMV sketch agg (k longs of partial state per group) vs the
      // exact count(DISTINCT) it replaces, over the same hash frame
      val hashed = queries.DedupQueries.bigramHashes(big).cache()
      hashed.count()
      val t1 = System.nanoTime()
      val exact = hashed.groupBy(col("source"))
        .agg(count_distinct(col("h")).as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val tExact = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val est = hashed.groupBy(col("source"))
        .agg(functions.KmvSketch.kmvSketch(col("h"), 64).as("sk"))
        .select(col("source"),
          functions.KmvSketch.estimate(col("sk"), 64).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val tKmv = (System.nanoTime() - t2) / 1e9
      val maxErr = exact.map { case (s, nd) =>
        math.abs(est(s).toDouble - nd) / nd }.max
      println(f"[scale] corpusDocs=$n%8d lmScore=$tLm%6.2fs " +
        f"lmScoreSalted=$tLmSalt%6.2fs " +
        f"exactDistinct=$tExact%6.2fs kmvAgg=$tKmv%6.2fs " +
        f"kmvMaxErr=${maxErr * 100}%5.1f%%")
      hashed.unpersist(); big.unpersist()
    }

    // Global-rank A/B (qc03 shape): the two-level range rank vs the
    // naive corpus-wide single-partition window — the plan Spark gives
    // row_number() OVER (ORDER BY …) and the one that cannot scale
    // (every row through one task)
    {
      import org.apache.spark.sql.expressions.Window
      val n = 10000000L
      val df = spark.range(n).select(col("id").as("doc_id"),
        pmod(xxhash64(col("id")), lit(100000L)).as("score")).cache()
      df.count()
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val naive = time {
        df.select(row_number().over(
            Window.orderBy(col("score").desc, col("doc_id"))).as("rank"),
            col("doc_id"))
          .foreach(_ => ())
      }
      val twoLevel = time {
        queries.CurationQueries.curriculumOf(df,
          spark.sparkContext.defaultParallelism).foreach(_ => ())
      }
      df.unpersist()
      println(f"[scale] globalRank n=$n%d naiveWindow=$naive%6.2fs " +
        f"twoLevel=$twoLevel%6.2fs")
    }

    // PageRank power-iteration probe (qg01/qg02 shape): per-iteration
    // cost must be linear in EDGES with no driver materialization
    // between rounds. Graph = 1M vertices, ~3M edges with hub skew
    // (each vertex links to id/2 and id/3, hubs accumulate in-degree —
    // the Zipf shape of real link/co-occurrence graphs). The aggregated-
    // graph story of the gate queries (vocab-bounded) is the EASY case;
    // this measures the hard one where the graph itself is corpus-sized.
    {
      val nVerts = 1000000L
      val verts = spark.range(nVerts).select(col("id").cast("string")
        .as("node")).cache()
      val e0 = spark.range(1L, nVerts)
      val edges = e0.select(col("id").as("s"), (col("id") / 2).cast("long").as("d"))
        .union(e0.select(col("id").as("s"), (col("id") / 3).cast("long").as("d")))
        .union(e0.select(col("id").as("s"), ((col("id") * 7919L) % nVerts).as("d")))
        .filter(col("s") =!= col("d"))
        .select(col("s").cast("string").as("src"),
          col("d").cast("string").as("dst"), lit(1L).as("w"))
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val nEdges = edges.count(); verts.count()
      def timePr(iters: Int): Double = {
        val t0 = System.nanoTime()
        queries.GraphQueries.pagerankPpm(edges, verts, iters)
          .foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = timePr(1); val t3 = timePr(3)
      println(f"[scale] pagerank verts=$nVerts%d edges=$nEdges%d " +
        f"iter1=$t1%6.2fs iter3=$t3%6.2fs perIterDelta=${(t3 - t1) / 2}%6.2fs")
      verts.unpersist(); edges.unpersist()
    }

    // Iterative-lineage probe: unchecked loops stack one plan layer per
    // round, so ANALYSIS time (not data) comes to dominate long trains —
    // the qt14/pagerank "planner death spiral". Tiny inputs on purpose:
    // compute is negligible, wall time ≈ planning. A/B = no checkpoint
    // vs localCheckpoint every 8 rounds (the production default).
    {
      val docs = base.limit(200).cache(); docs.count()
      def bpe(merges: Int, ckpt: Int): Double = {
        val vocab = queries.TextQueries.bpeVocabOf(docs).cache()
        vocab.count()
        val t0 = System.nanoTime()
        val got = queries.TextQueries.bpeTrain(vocab, merges,
          batchK = 1, checkpointEvery = ckpt)
        val t = (System.nanoTime() - t0) / 1e9
        vocab.unpersist()
        require(got.nonEmpty)
        t
      }
      val n25 = bpe(25, Int.MaxValue)
      val n50 = bpe(50, Int.MaxValue)
      val c50 = bpe(50, 8)
      val b50 = {
        val vocab = queries.TextQueries.bpeVocabOf(docs).cache()
        vocab.count()
        val t0 = System.nanoTime()
        queries.TextQueries.bpeTrain(vocab, 50, batchK = 8,
          checkpointEvery = 8)
        val t = (System.nanoTime() - t0) / 1e9
        vocab.unpersist(); t
      }
      println(f"[scale] bpeLineage merges25NoCkpt=$n25%6.2fs " +
        f"merges50NoCkpt=$n50%6.2fs merges50Ckpt8=$c50%6.2fs " +
        f"merges50Ckpt8Batch8=$b50%6.2fs")
      val vertsS = spark.range(2000).select(
        col("id").cast("string").as("node")).cache()
      val edgesS = spark.range(1, 2000)
        .select(col("id").as("s"), (col("id") / 2).cast("long").as("d"))
        .filter(col("s") =!= col("d"))
        .select(col("s").cast("string").as("src"),
          col("d").cast("string").as("dst"), lit(1L).as("w")).cache()
      vertsS.count(); edgesS.count()
      def pr(iters: Int, ckpt: Int): Double = {
        val t0 = System.nanoTime()
        queries.GraphQueries.pagerankPpm(edgesS, vertsS, iters, ckpt)
          .foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val p12 = pr(12, Int.MaxValue)
      val p24 = pr(24, Int.MaxValue)
      val pc24 = pr(24, 8)
      println(f"[scale] pagerankLineage iters12NoCkpt=$p12%6.2fs " +
        f"iters24NoCkpt=$p24%6.2fs iters24Ckpt8=$pc24%6.2fs")
      docs.unpersist(); vertsS.unpersist(); edgesS.unpersist()
    }

    // CDC chunking probe (qd17 shape): per-doc HOF work scales with
    // bytes, only (source, hash, len) shuffles — wall time must stay
    // linear in corpus bytes
    multiples.lastOption.foreach { m =>
      val big = (0 until m).map { i =>
        base.select(concat(lit("src"), (col("doc_id") % 20).cast("string"))
            .as("source"),
          concat(col("text"), lit(s" copytag$i")).as("text"))
      }.reduce(_ union _).repartition(spark.sparkContext.defaultParallelism)
        .cache()
      val n = big.count()
      val t0 = System.nanoTime()
      val stats = queries.DedupQueries.cdcStatsOf(big).collect()
      val t = (System.nanoTime() - t0) / 1e9
      val chunks = stats.map(_.getAs[Long]("n_chunks")).sum
      val dup = chunks - stats.map(_.getAs[Long]("n_distinct")).sum
      println(f"[scale] cdcDocs=$n%8d cdc=$t%6.2fs chunks=$chunks%d " +
        f"dupChunks=$dup%d")
      big.unpersist()
    }

    // E1→E3 spine at documents×N: pack → tokenize → index/check wall
    // times and shard counts (synthetic media; real tar I/O)
    multiples.lastOption.foreach { m =>
      val meta = (0 until m).map { i =>
        base.select(
          format_string("videos/%09d.mp4",
            col("doc_id") + lit(i.toLong * 1000000L)).as("video_path"),
          concat(col("text"), lit(s" copytag$i")).as("value"))
      }.reduce(_ union _)
      val packOut = java.nio.file.Files
        .createTempDirectory("scale_pack").toString
      val t0 = System.nanoTime()
      val info = pack.PackStage.run(meta, packOut,
        pack.PackStage.PackOptions(numSegments = 2, samplesPerTar = 500))
      val urls = queries.WdsQueries.shardUrls(info)
      val tPack = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val tokOut = java.nio.file.Files
        .createTempDirectory("scale_tok").toString
      val tokInfo = tokenize.TokenizeStage.run(
        wds.WdsReader.readUrls(spark, urls), tokOut)
      val tokUrls = queries.WdsQueries.shardUrls(tokInfo)
      val tTok = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val idx = index.CheckStage.index(
        wds.WdsReader.readUrls(spark, tokUrls), strict = true)
      val nSamples = idx.agg(sum(col("nsamples"))).head().getLong(0)
      val tIdx = (System.nanoTime() - t2) / 1e9
      println(f"[scale] spineDocs=${baseN * m}%8d pack=$tPack%6.2fs " +
        f"(${urls.length}%d tars) tokenize=$tTok%6.2fs " +
        f"(${tokUrls.length}%d tars) check=$tIdx%6.2fs " +
        f"packedSamples=$nSamples%d")
    }
    spark.stop()
  }
}

/** S12 epoch-cache probe: A/B of repeated-epoch reads over wds shards —
  * re-scan (fetch + untar + group) the source every epoch vs ONE
  * DISK_ONLY materialization + cached re-reads (`SampleOps.epochs`, the
  * reference's download-through LRU shard cache re-expressed in Spark's
  * storage layer). Local FS understates the win: on s3a/hdfs the cold
  * path re-pays the network fetch per epoch on top of the untar.
  * Usage: sbt "runMain graft.EpochProbe [sfDir] [copies] [epochs]" */
object EpochProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(20)
    val nEpochs = args.lift(2).map(_.toInt).getOrElse(3)
    require(nEpochs >= 2,
      s"steady-state comparison needs >= 2 epochs, got $nEpochs")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-epoch-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import wds.SampleOps._
    implicit val enc: org.apache.spark.sql.Encoder[wds.Sample] =
      org.apache.spark.sql.Encoders.product[wds.Sample]
    val docs = Tables(spark, sfDir).documents
    val meta = (0 until copies).map { i =>
      docs.select(
        format_string("videos/%09d.mp4",
          col("doc_id") + lit(i.toLong * 1000000L)).as("video_path"),
        col("text").as("value"))
    }.reduce(_ union _)
    val out = queries.WdsQueries.scratchDir("graft_epoch_probe")
    // ~8 KB deterministic media per sample: epoch reads are dominated
    // by shard untar + sample grouping, as with real image/video shards
    val info = pack.PackStage.run(meta, out,
      pack.PackStage.PackOptions(numSegments = 2, samplesPerTar = 1000),
      mediaFor = p => {
        val seed = p.hashCode
        Array.tabulate(8192)(i => ((seed * 31 + i * 7) & 0xff).toByte)
      })
    val urls = queries.WdsQueries.shardUrls(info)
    val src = spark.read.format("wds").load(urls: _*).as[wds.Sample]
    val n = src.count()
    // the noop sink consumes every row in epoch order (a count would
    // let the optimizer eliminate the shuffle entirely)
    def scan(d: org.apache.spark.sql.Dataset[wds.Sample]): Double = {
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = (0 until nEpochs).map(e => scan(src.shuffled(e.toLong)))
    val (handle, eps) = src.epochs(nEpochs)
    val warm = eps.map(scan)
    handle.unpersist()
    def fmt(ts: Seq[Double]) = ts.map(t => f"$t%5.2f").mkString("[", " ", "]s")
    println(f"[epoch] samples=$n%d shards=${urls.length}%d " +
      f"cold=${fmt(cold)} cached=${fmt(warm)} " +
      f"steadySpeedup=${cold.drop(1).sum / warm.drop(1).sum.max(1e-9)}%4.1fx")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 scale probes for the curation/ordering operators, driving the
  * QUERY-PATH code (CurationQueries.*From, EventQueries.asofFrom,
  * RelationalQueries' bucketed-join shape) at fixture ×N — the SCALE.md
  * evidence that each plan's cost is the claimed shape, not just green
  * at 500 rows. Usage:
  * sbt "runMain graft.CurationProbe [sfDir] [multiples...]"
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 20, 100)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curation-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- decontam + dup-spans at documents ×N ----
    // per-copy perturbation tag keeps most shingles distinct per copy
    // (realistic: n-gram space grows with the corpus) while the base
    // overlap structure persists inside each copy
    val base = Tables(spark, sfDir).documents
      .select("doc_id", "text", "lang")
    multiples.foreach { m =>
      val big = (0 until m).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" copytag$i tail$i")).as("text"),
          col("lang"))
      }.reduce(_ union _)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val n = big.count()
      val sh = functions.ShingleHash.exploded(big, 5).cache()
      val tKernel = time { sh.count() }
      val nGrams = sh.count()
      var contaminated = 0L
      val tDecon = time {
        contaminated = queries.CurationQueries.decontamFrom(sh)
          .filter(col("contaminated") === 1).count()
      }
      var dupDocs = 0L
      val tSpans = time {
        dupDocs = queries.CurationQueries.dupSpansFrom(sh)
          .filter(col("n_dup_spans") > 0).count()
      }
      println(f"[curation] docs=$n%8d grams=$nGrams%9d " +
        f"kernel=$tKernel%6.2fs decontam=$tDecon%6.2fs " +
        f"(contaminated=$contaminated%d) dupSpans=$tSpans%6.2fs " +
        f"(docsWithDups=$dupDocs%d)")
      // the full user-facing funnel (quality → mix → exact → spans);
      // maxDupFrac opens to 1.0 because the replicated probe corpus is
      // 100% near-dup by construction — at the default 0.5 the span
      // filter (correctly) keeps nothing at ×20+, which would time an
      // empty tail instead of the whole funnel
      var curatedN = 0L
      val tCurate = time {
        val res = curate.CurateStage.run(big,
          curate.CurateStage.CurateOptions(
            rates = Seq("en" -> 80), defaultRate = 50, maxDupFrac = 1.0))
        curatedN = res.curated.count()
        res.close()
      }
      println(f"[curation] curateDocs=$n%8d curate=$tCurate%6.2fs " +
        f"(kept=$curatedN%d)")
      sh.unpersist(); big.unpersist()
    }

    // ---- as-of join at events ×N (more users, same per-user sizes —
    // the dimension that grows at 100 TB) ----
    val events = Tables(spark, sfDir).events
      .select("event_id", "ts", "user_id", "event_type", "value")
    multiples.foreach { m =>
      val big = (0 until m).map { i =>
        events.select(
          (col("event_id") + lit(i.toLong * 10000000L)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i.toLong * 1000L)).as("user_id"),
          col("event_type"), col("value"))
      }.reduce(_ union _)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val n = big.count()
      var matched = 0L
      val t = time {
        matched = queries.EventQueries.asofFrom(big)
          .filter(col("p_event_id").isNotNull).count()
      }
      println(f"[curation] asofEvents=$n%9d asof=$t%6.2fs " +
        f"(matchedClicks=$matched%d)")
      big.unpersist()
    }

    // ---- interval join: naive user-key join vs qe08 hour binning ----
    // copies shift ts by i×7 days, users unchanged: per-user history
    // grows ×m (the long-lived-user shape) while per-(user, hour)
    // density stays constant — the naive per-user cross product is m²,
    // the binned candidate set is linear
    multiples.foreach { m =>
      val big = (0 until m).map { i =>
        events.select(col("event_id"),
          (col("ts") + expr(s"INTERVAL ${i * 7} DAYS")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
      }.reduce(_ union _)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val n = big.count()
      var rows = 0L
      val tNaive = time {
        rows = queries.EventQueries.intervalNaiveFrom(big).count()
      }
      var rowsB = 0L
      val tBin = time {
        rowsB = queries.EventQueries.intervalBinFrom(big).count()
      }
      // same naive code, with the BinnedIntervalJoin optimizer rule
      // installed: the rewrite must recover the hand-binned plan's time
      var rowsR = 0L
      val prevOpts = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations =
        prevOpts :+ plans.BinnedIntervalJoin
      val tRule =
        try time {
          rowsR = queries.EventQueries.intervalNaiveFrom(big).count()
        } finally spark.experimental.extraOptimizations = prevOpts
      require(rows == rowsB && rows == rowsR,
        s"join variants disagree: $rows / $rowsB / $rowsR")
      println(f"[curation] ivEvents=$n%9d naive=$tNaive%6.2fs " +
        f"binned=$tBin%6.2fs ruleRewrite=$tRule%6.2fs (pairs=$rows%d)")
      big.unpersist()
    }

    // ---- incremental dedup: fixed daily increment vs growing corpus ----
    // the qd15 sell: a daily batch keyed against the standing signature
    // index costs ~|increment|, not ~|corpus| — full re-dedup re-pays
    // the whole corpus every day
    {
      val base = Tables(spark, sfDir).documents.select("doc_id", "text")
      val incrSize = base.count()
      multiples.foreach { m =>
        val corpus = (0 until m).map { i =>
          base.select((col("doc_id") * 1000 + lit(i.toLong * 2)).as("doc_id"),
            concat(col("text"), lit(s" corpustag$i")).as("text"))
        }.reduce(_ union _)
        val incr = base.select(
          (col("doc_id") * 1000 + lit(1L)).as("doc_id"),
          concat(col("text"), lit(" incrtag")).as("text"))
        val all = corpus.unionByName(incr)
          .repartition(spark.sparkContext.defaultParallelism).cache()
        val n = all.count()
        // standing index: signatures for the corpus are already built
        // (cached), as a lake would have them materialized
        val sigs = functions.MinHash.signatures(all, 8).cache()
        sigs.count()
        var dups = 0L
        val tIncr = time {
          dups = queries.DedupQueries
            .incrementalFrom(sigs, col("doc_id") % 2 === 1)
            .filter(col("is_dup") === 1).count()
        }
        // full re-dedup of the whole lake (the qd03 all-pairs shape)
        var fullPairs = 0L
        val tFull = time {
          fullPairs = queries.DedupQueries.lshPairsFrom(sigs).count()
        }
        println(f"[curation] corpus=${n - incrSize}%8d incr=$incrSize%7d " +
          f"incrDedup=$tIncr%6.2fs fullDedup=$tFull%6.2fs " +
          f"(incrDups=$dups%d fullPairs=$fullPairs%d)")
        sigs.unpersist(); all.unpersist()
      }
    }

    // ---- SemDeDup at 1M vectors, cluster count dialed with n ----
    // (clusters ≈ n/50: in-cluster pair work stays ~25n, never O(n²))
    Seq(100000, 1000000).foreach { nv =>
      val nClusters = nv / 50
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("label", IntegerType),
        StructField("embedding", ArrayType(FloatType))))
      val vecs = spark.createDataFrame(
        spark.sparkContext.parallelize(0L until nv.toLong,
          spark.sparkContext.defaultParallelism).map { id =>
          val arr = Array.tabulate(64) { i =>
            var z = id * 64 + i + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            (((z ^ (z >>> 31)) & 0xffff) / 32768.0f) - 1.0f
          }
          Row(id, (id % nClusters).toInt, arr)
        }, schema).cache()
      vecs.count()
      var pruned = 0L
      val t = time {
        pruned = queries.CurationQueries.semDedupFrom(vecs, 0.3)
          .filter(col("is_kept") === 0).count()
      }
      println(f"[curation] semVecs=$nv%8d clusters=$nClusters%d " +
        f"semDedup=$t%6.2fs (pruned=$pruned%d)")
      vecs.unpersist()
    }

    // ---- PQ-ADC scan (qs06 shape) at 100k / 1M vectors ----
    // codebook + query tables are driver constants; the scan is one
    // narrow kernel pass emitting (q, c, approx) for 10 queries
    Seq(100000, 1000000).foreach { nv =>
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val vecs = spark.createDataFrame(
        spark.sparkContext.parallelize(0L until nv.toLong,
          spark.sparkContext.defaultParallelism).map { id =>
          val arr = Array.tabulate(64) { i =>
            var z = id * 64 + i + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            (((z ^ (z >>> 31)) & 0xffff) / 32768.0f) - 1.0f
          }
          Row(id, arr)
        }, schema).cache()
      vecs.count()
      val head = vecs.filter(col("vec_id") < 16)
        .orderBy(col("vec_id")).collect()
        .map(r => r.getSeq[Float](1).toArray.map(_.toDouble))
      val queries = head.take(10).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
      var top = 0L
      val t = time {
        val adc = functions.ProductQuantizer.adcScores(
          vecs, head, queries, m = 8, subDim = 8)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("approx"), col("c_id"))
        top = adc.withColumn("rank",
            row_number().over(w)).filter(col("rank") <= 5).count()
      }
      println(f"[curation] pqVecs=$nv%8d adcTopK=$t%6.2fs (rows=$top%d)")
      vecs.unpersist()
    }

    // ---- bucketed vs shuffle fact-fact join at 16M×4M rows ----
    // the q21 trade measured: one-time bucketed write, then the join
    // with no Exchange vs the plain join's two full shuffles
    {
      val nFact = 16000000L
      val nDim = 4000000L
      val fact = spark.range(nFact).select(
        (col("id") % nDim).as("key"), xxhash64(col("id")).as("payload"))
      val dim = spark.range(nDim).select(
        col("id").as("key"), (col("id") * 7).as("attr"))
      // registered with the shared shutdown-hook registry: cleanup
      // happens even if a timed block throws
      val wh = queries.WdsQueries.scratchDir("graft_bucket_probe")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val tWrite = time {
        fact.repartition(32, col("key")).write.mode("overwrite")
          .bucketBy(32, "key").sortBy("key")
          .option("path", s"$wh/fact").saveAsTable("probe_fact_b")
        dim.repartition(32, col("key")).write.mode("overwrite")
          .bucketBy(32, "key").sortBy("key")
          .option("path", s"$wh/dim").saveAsTable("probe_dim_b")
      }
      val fb = spark.table("probe_fact_b")
      val db = spark.table("probe_dim_b")
      val tBucketed = time {
        fb.join(db, "key").agg(sum(col("attr"))).collect()
      }
      val tPlain = time {
        fact.join(dim, "key").agg(sum(col("attr"))).collect()
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // DROP TABLE on an external (explicit-path) table removes only
      // catalog metadata; the files under wh go with the scratch
      // registry's shutdown hook
      spark.sql("DROP TABLE IF EXISTS probe_fact_b")
      spark.sql("DROP TABLE IF EXISTS probe_dim_b")
      println(f"[curation] bucketJoin fact=$nFact%d write=$tWrite%6.2fs " +
        f"bucketed=$tBucketed%6.2fs plain=$tPlain%6.2fs")
    }

    // ---- qc07 funnel stage attribution (round 10) ----
    // the full CurateStage funnel is the perennial bench top item;
    // attribute its wall to the optional heavy stages by toggling
    // them (near-dup = LSH + Jaccard + connected components;
    // decontam = broadcast eval-gram scrub) against the base
    // quality/mix/exact/span spine
    {
      import graft.curate.CurateStage
      val evalDir = java.nio.file.Files
        .createTempDirectory("probe_eval").toString
      base.filter(col("doc_id") % 31 === 0).select("text")
        .write.mode("overwrite").parquet(evalDir)
      def funnel(near: Option[Double], eval: Option[String]): Double =
        time {
          val res = CurateStage.run(base, CurateStage.CurateOptions(
            minWords = 30, maxDupFrac = 0.5,
            rates = Seq("en" -> 90), defaultRate = 100, gramK = 5,
            evalPath = eval, nearDupJaccard = near))
          res.stats.collect(): Unit
          res.close()
        }
      funnel(None, None): Unit // JIT + codegen warm-up
      val baseT = funnel(None, None)
      val nearT = funnel(Some(0.5), None)
      val evalT = funnel(None, Some(evalDir))
      val fullT = funnel(Some(0.5), Some(evalDir))
      println(f"[curation] funnel base=$baseT%5.2fs " +
        f"+nearDup=${nearT - baseT}%5.2fs +decontam=${evalT - baseT}%5.2fs " +
        f"full=$fullT%5.2fs")
    }
    spark.stop()
  }
}

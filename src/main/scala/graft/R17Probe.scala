package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-17 optimization probe: run named queries in a Bench-identical
  * JVM and attribute the wall to SEQUENTIAL Spark jobs — the measured
  * r15/r17 mechanism behind most heavy rows at sf0.1 is serial
  * stage latency (AQE coalesces small inputs to 1 partition, so the
  * critical path is one thread across N materialized jobs), and the
  * optimization lever under guide §2.4 is removing jobs/exchanges, not
  * shrinking bytes. Per rep: wall, job count, per-job wall (top 12,
  * with the job's running description), spill/shuffle/input totals.
  *
  * Usage: sbt "runMain graft.R17Probe <sfDir> <reps> <query> [query...]"
  */
object R17Probe {

  private final class Agg extends SparkListener {
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobWall = new java.util.concurrent.ConcurrentHashMap[Int, (Double, String)]()
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var input = 0L
    @volatile var runMs = 0L
    @volatile var tasks = 0
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) synchronized {
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        input += m.inputMetrics.bytesRead
        runMs += m.executorRunTime
        tasks += 1
      }
    }
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("")
      jobStart.put(j.jobId, (System.nanoTime(), desc)): Unit
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      Option(jobStart.remove(j.jobId)).foreach { case (t0, desc) =>
        jobWall.put(j.jobId,
          ((System.nanoTime() - t0) / 1e9, desc)): Unit
      }
    }
    // per-stage: (name, wall s, tasks, executor run ms) — the stage
    // name carries the callsite, which is the attribution the job rows
    // lack (no setJobDescription in the query paths)
    val stageRows =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Int, Long)]()
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val wall = (for {
        a <- i.submissionTime; b <- i.completionTime
      } yield (b - a) / 1e3).getOrElse(0.0)
      stageRows.add((i.name, wall, i.numTasks,
        i.taskMetrics.executorRunTime)): Unit
    }
    def reset(): Unit = synchronized {
      jobStart.clear(); jobWall.clear(); stageRows.clear()
      memSpill = 0; diskSpill = 0; shufRead = 0; shufWrite = 0
      input = 0; runMs = 0; tasks = 0
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: R17Probe <sfDir> <reps> <query>...")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-r17-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" for config experiments
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim): Unit
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("r17_ckpt").toString)
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    // bench-parity warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    queries.WdsQueries.warmEventsStage(spark, sfDir)

    // --funnel: decompose the curate funnel's near-dup stage (the r10
    // CurationProbe attribution stops at "near-dup = 85%"; this times
    // signatures / LSH candidates / exact verify / CC standalone over
    // the same survivor frame the funnel feeds them)
    if (names == Seq("--funnel")) {
      import org.apache.spark.sql.functions._
      val docs = Tables(spark, sfDir).documents
        .select(col("doc_id"), col("text"), col("lang"))
      def t(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[funnel] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { pass =>
        println(s"-- pass $pass")
        // the funnel spine up to exact survivors (reproduces CurateStage
        // stages 1-3 so the near-dup inputs are the real ones)
        val withQ = docs.withColumn("qk",
          when(size(split(col("text"), " ")) >= 30 &&
            ((length(col("text")) - (size(split(col("text"), " ")) - 1))
              .cast("double") / size(split(col("text"), " ")))
              .between(3.0, 10.0) &&
            !(lower(col("text")).contains("lorem ipsum") ||
              col("text").contains("{") ||
              lower(col("text")).contains("javascript")), 1).otherwise(0))
        val s1 = withQ.filter(col("qk") === 1)
        val mixK = queries.CurationQueries
          .mixProjection(s1, Seq("en" -> 90, "de" -> 50, "fr" -> 50, "es" -> 50, "zh" -> 25), 0)
          .select(col("doc_id"), col("kept").as("mk"))
        val s2 = s1.join(mixK, Seq("doc_id")).filter(col("mk") === 1)
        val exactK = s2.groupBy(md5(to_binary(col("text"), lit("utf-8")))
            .as("h")).agg(min(col("doc_id")).as("doc_id"))
        val s3 = s2.join(exactK.select(col("doc_id")), Seq("doc_id"))
          .select(col("doc_id"), col("text"))
          .persist()
        t("spine (q+mix+exact)") { noop(s3) }
        val sig = graft.functions.MinHash.signatures(s3, 8)
          .persist()
        t("minhash signatures") { noop(sig) }
        var cand: org.apache.spark.sql.DataFrame = null
        t("lsh candidates") {
          cand = queries.DedupQueries.lshPairsFrom(sig).persist()
          noop(cand)
        }
        var pairs: org.apache.spark.sql.DataFrame = null
        t("exact jaccard verify") {
          pairs = queries.DedupQueries
            .jaccardOverCands(s3, cand, 0.5)
            .select(col("a_id"), col("b_id")).persist()
          noop(pairs)
        }
        t("connected components") {
          noop(graft.functions.ConnectedComponents.run(
            pairs, s3.select(col("doc_id").as("id"))))
        }
        val sh5 = graft.functions.ShingleHash.exploded(
          s3.select(col("doc_id"), col("text")), 5).persist()
        t("5-gram explode") { noop(sh5) }
        t("gram df + span fracs") {
          noop(queries.CurationQueries.dupSpansFrom(sh5, None))
        }
        Seq(s3, sig, cand, pairs, sh5).foreach(_.unpersist(true))
      }
      spark.stop()
      return
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        agg.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkShim.drainListenerBus(spark.sparkContext)
        import scala.jdk.CollectionConverters._
        val jobs = agg.jobWall.asScala.toSeq.sortBy(_._1)
        val totJob = jobs.map(_._2._1).sum
        println(f"== $name rep $rep wall $wall%6.2f s  jobs ${jobs.size}%3d " +
          f"(Σjob $totJob%6.2f)  tasks ${agg.tasks}%5d  " +
          f"run ${agg.runMs / 1e3}%6.1f core-s  " +
          f"spill ${(agg.memSpill + agg.diskSpill) / 1e6}%8.1f MB  " +
          f"shuf ${(agg.shufRead + agg.shufWrite) / 1e6}%8.1f MB  " +
          f"input ${agg.input / 1e6}%8.1f MB")
        if (rep == reps) {
          jobs.sortBy(-_._2._1).take(12).foreach {
            case (id, (w, desc)) =>
              println(f"     job $id%4d  $w%6.2f s  ${desc.take(110)}")
          }
          // group stages by name: total wall / tasks / core-s per site
          agg.stageRows.asScala.toSeq.groupBy(_._1).map { case (n, rs) =>
            (n, rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum,
              rs.size)
          }.toSeq.sortBy(-_._2).take(16).foreach {
            case (n, w, t, rms, cnt) =>
              println(f"     stage×$cnt%-3d $w%7.2f s  $t%5d tasks  " +
                f"${rms / 1e3}%7.1f core-s  ${n.take(90)}")
          }
        }
      }
    }
    spark.stop()
  }
}

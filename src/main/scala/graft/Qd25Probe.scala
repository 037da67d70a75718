package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-15 directive #2: root-cause qd25_span_scrub_runs' 3× official-
  * capture swing (7.31 s driver capture vs 2.41 s kept min, code
  * unchanged). Runs qd25 repeatedly inside one Bench-identical JVM and
  * prints, per rep: wall, Spark task-metric aggregates (memory/disk
  * spill, shuffle read/write bytes, input bytes, GC time, executor run
  * time) and /proc deltas (iowait jiffies, mem-PSI stall, disk
  * sectors) — enough to adjudicate shuffle-spill vs machine-IO vs GC.
  *
  * `--cold-cache` unpersists CurationQueries' shared exploded-shingle
  * relation between reps, isolating the persist-build share of a cold
  * first rep (in the official bench qd21 runs before qd25, so qd25's
  * reps are normally warm).
  *
  * Usage: sbt "runMain graft.Qd25Probe [sfDir] [reps] [--cold-cache]"
  */
object Qd25Probe {

  private final class Agg extends SparkListener {
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var input = 0L
    @volatile var gcMs = 0L
    @volatile var runMs = 0L
    @volatile var tasks = 0
    @volatile var jobs = 0
    @volatile var stages = 0
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) synchronized {
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        input += m.inputMetrics.bytesRead
        gcMs += m.jvmGCTime
        runMs += m.executorRunTime
        tasks += 1
      }
    }
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted)
        : Unit = synchronized { stages += 1 }
    def reset(): Unit = synchronized {
      memSpill = 0; diskSpill = 0; shufRead = 0; shufWrite = 0
      input = 0; gcMs = 0; runMs = 0; tasks = 0; jobs = 0; stages = 0
    }
  }

  /** Process-wide GC (not just task-attributed): pause time + count. */
  private def gcTotals: (Long, Long) = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.foldLeft((0L, 0L)) { case ((c, t), b) =>
        (c + b.getCollectionCount.max(0), t + b.getCollectionTime.max(0))
      }
  }

  private def procStat(field: Int): Long =
    try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/stat"))
      .linesIterator.next().trim.split("\\s+").drop(1)(field).toLong
    catch { case _: Exception => 0L }

  private def memPsiUs: Long =
    try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/pressure/memory"))
      .linesIterator.next().split("total=")(1).trim.toLong
    catch { case _: Exception => 0L }

  def main(args: Array[String]): Unit = {
    // positional parse: flags consume their operand explicitly, so a
    // numeric --preload value is never misread as the reps count and a
    // trailing flag with no operand is a clean error, not an AIOOBE
    var sfDir = "/root/testdata/sf0.1"
    var reps = 6
    var cold = false
    var preload: Option[Seq[String]] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--cold-cache" => cold = true
        case "--preload" =>
          require(i + 1 < args.length, "--preload needs prefix list")
          preload = Some(args(i + 1).split(',').toSeq); i += 1
        case a if a.startsWith("/") => sfDir = a
        case a if a.forall(_.isDigit) && a.nonEmpty => reps = a.toInt
        case a => sys.error(s"unknown arg: $a")
      }
      i += 1
    }
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qd25-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("qd25_ckpt").toString)
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)

    // bench-parity warmup + the qd21-before-qd25 ordering (warms the
    // shared exploded-shingle persist exactly like the official run)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    SparkEntry.queries("qd21_span_scrub")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // --preload p1[,p2...]: run every bench query with a matching name
    // prefix FIRST, reproducing the official capture's heap state by
    // qd25's slot (persisted relations, broadcast remains, code cache)
    // — the arm that tests the GC-pause mechanism
    preload.foreach { pfx =>
      SparkEntry.benchQueries.toSeq.sortBy(_._1)
        .filter { case (n, _) => pfx.exists(n.startsWith) }
        .foreach { case (n, fn) =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite")
            .save()
          catch { case e: Exception =>
            System.err.println(s"[qd25probe] preload $n failed: $e") }
          System.err.println(f"[qd25probe] preload $n " +
            f"${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
    }

    println("rep  wall_s  memSpill  diskSpill  shufRd_MB  shufWr_MB  " +
      "input_MB  taskgc_ms  run_s  jobs  stages  tasks  gc_n  gc_ms  " +
      "d_iowait_j  d_psi_ms  note")
    (1 to reps).foreach { rep =>
      if (cold) queries.CurationQueries.clearExplodedCache(spark)
      agg.reset()
      val iow0 = procStat(4); val psi0 = memPsiUs
      val (gcN0, gcT0) = gcTotals
      val t0 = System.nanoTime()
      SparkEntry.queries("qd25_span_scrub_runs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (gcN1, gcT1) = gcTotals
      // listener bus is async — barrier until task-end events delivered
      org.apache.spark.GraftSparkShim.drainListenerBus(spark.sparkContext)
      println(f"$rep%3d  $wall%6.2f  ${agg.memSpill / 1e6}%8.1f  " +
        f"${agg.diskSpill / 1e6}%9.1f  ${agg.shufRead / 1e6}%9.1f  " +
        f"${agg.shufWrite / 1e6}%9.1f  ${agg.input / 1e6}%8.1f  " +
        f"${agg.gcMs}%9d  ${agg.runMs / 1e3}%5.1f  ${agg.jobs}%4d  " +
        f"${agg.stages}%6d  ${agg.tasks}%5d  ${gcN1 - gcN0}%4d  " +
        f"${gcT1 - gcT0}%5d  " +
        f"${procStat(4) - iow0}%10d  ${(memPsiUs - psi0) / 1000}%8d  " +
        s"${if (cold) "cold" else "warm"}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-15 directive #3: the sf0.1 → sf1 → sf10 DECADE ring. Runs the
  * flagship scale rows at each scale-factor directory and prints, per
  * (query, sf): kept-min wall over `reps`, shuffle read/write bytes,
  * spill bytes, input bytes, task count, and max per-task peak
  * execution memory — the wall + bytes + peak-state numbers the
  * SCALE.md decade table records. Sub-linear growth across decades is
  * the pass criterion; any super-linear row is a fix, not a footnote.
  *
  * Usage:
  *   sbt "runMain graft.DecadeProbe [--reps N] [--queries a,b,...]
  *     sfDir1 [sfDir2 ...]"
  * Defaults: reps 2; queries = the six flagship scale rows; dirs =
  * /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10 (generate the latter two
  * with scripts/gen_sf1.py <dir> <factor>).
  */
object DecadeProbe {

  private final class Agg extends SparkListener {
    @volatile var spill = 0L
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var input = 0L
    @volatile var tasks = 0
    @volatile var peakMem = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) synchronized {
        spill += m.memoryBytesSpilled
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        input += m.inputMetrics.bytesRead
        tasks += 1
        peakMem = peakMem.max(m.peakExecutionMemory)
      }
    }
    def reset(): Unit = synchronized {
      spill = 0; shufRead = 0; shufWrite = 0; input = 0; tasks = 0
      peakMem = 0
    }
  }

  val DefaultQueries: Seq[String] = Seq(
    "qd26_containment_capped", "qd27_lsh_bucket_cap",
    "qd28_bloom_incremental", "mm30_media_dup_clusters",
    "qc07_curate_funnel", "wds20_compaction_exec")

  def main(args: Array[String]): Unit = {
    var reps = 2
    var queries = DefaultQueries
    val dirs = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--queries" =>
          queries = args(i + 1).split(',').toSeq; i += 2
        case d => dirs += d; i += 1
      }
    }
    if (dirs.isEmpty)
      dirs ++= Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-decade-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("decade_ckpt").toString)
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    println("query                     sf           wall_s  shufRd_MB " +
      " shufWr_MB  spill_MB  input_MB  tasks  peakTaskMem_MB")
    dirs.foreach { dir =>
      val sfName = dir.split('/').last
      spark.read.parquet(s"$dir/region.parquet").count()
      queries.foreach { name =>
        // ring-only spellings not registered as oracle rows
        val fn = name match {
          case "qc07_capped" =>
            graft.queries.CurationQueries.curateFunnelCapped _
          case n => SparkEntry.queries(n)
        }
        // kept-min tracked separately from failures: a transient
        // failed rep must not hide a valid measurement (ADVICE r15)
        var best = Double.MaxValue
        var bestLine = ""
        var lastFailure: Option[String] = None
        var failedReps = 0
        (1 to reps).foreach { _ =>
          agg.reset()
          val t0 = System.nanoTime()
          try {
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            val wall = (System.nanoTime() - t0) / 1e9
            // barrier, not a fixed sleep: all task-end events posted
            org.apache.spark.GraftSparkShim
              .drainListenerBus(spark.sparkContext)
            if (wall < best) {
              best = wall
              bestLine = f"$name%-24s  $sfName%-11s  $wall%6.1f  " +
                f"${agg.shufRead / 1e6}%9.1f  ${agg.shufWrite / 1e6}%9.1f" +
                f"  ${agg.spill / 1e6}%8.1f  ${agg.input / 1e6}%8.1f  " +
                f"${agg.tasks}%5d  ${agg.peakMem / 1e6}%14.1f"
            }
          } catch { case e: Throwable =>
            failedReps += 1
            lastFailure = Some(s"$name  $sfName  FAILED: ${e.getMessage}")
          }
        }
        // a flaky query must stay visible even when one rep succeeded
        // (r16 ADVICE: silent discard masked k-of-N failures)
        val flakyNote =
          if (bestLine.nonEmpty && failedReps > 0)
            s"  ($failedReps/$reps reps failed: " +
              s"${lastFailure.getOrElse("")})"
          else ""
        println(if (bestLine.nonEmpty) bestLine + flakyNote
                else lastFailure.getOrElse(s"$name  $sfName  (no reps)"))
      }
    }
    spark.stop()
  }
}

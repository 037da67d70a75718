package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 directive #1: root-cause qd26's decade curve (the r15 ring
  * measured 4.8 s → 25.2 s sf1 → sf10 — 5.3× for 10×, the steepest
  * production row, 2.2 GB shuffle, zero spill — with no mechanism
  * note). The probe re-derives the operator's pipeline PHASE BY PHASE
  * from the same shared persisted shingle relation the query uses and
  * materializes each phase through the noop sink with task-metric
  * attribution, plus the density counters (rows per intermediate) that
  * decide between the three candidate mechanisms the verdict names:
  * shingle-explode width, cached-relation rebuild, and candidate-pair
  * density.
  *
  * Phases (ATTRIBUTION IS BY DIFFERENCE — each phase re-derives from
  * the persisted `sh`, exactly like the query's own five consumers):
  *   explode   build + persist the (doc_id, sh) relation
  *   sizes     groupBy(doc_id) count
  *   bk        bottom-k sketch (collect_list sort) + df-ceiling anti
  *   cand      sketch ⋈ sh equi-join, pair distinct
  *   shared    cand ⋈ sh ⋈ sh shared-shingle count
  *   full      the registered qd26 query end-to-end
  *
  * Usage: SPARK_DRIVER_MEM=24g sbt "runMain graft.Qd26Probe
  *   [--reps N] sfDir1 [sfDir2 ...]"
  */
object Qd26Probe {

  private final class Agg extends SparkListener {
    var spill = 0L; var shufRead = 0L; var shufWrite = 0L
    var input = 0L; var tasks = 0; var peakMem = 0L; var runMs = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) synchronized {
        spill += m.memoryBytesSpilled
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        input += m.inputMetrics.bytesRead
        tasks += 1
        runMs += m.executorRunTime
        peakMem = peakMem.max(m.peakExecutionMemory)
      }
    }
    def reset(): Unit = synchronized {
      spill = 0; shufRead = 0; shufWrite = 0; input = 0; tasks = 0
      peakMem = 0; runMs = 0
    }
  }

  def main(args: Array[String]): Unit = {
    var reps = 2
    val dirs = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" =>
          require(i + 1 < args.length, "--reps needs a count")
          reps = args(i + 1).toInt; i += 1
        case d => dirs += d
      }
      i += 1
    }
    if (dirs.isEmpty) dirs ++= Seq("/tmp/sf1", "/tmp/sf10")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qd26-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import spark.implicits._
    println("phase      sf        wall_s  shufRd_MB  shufWr_MB  " +
      "spill_MB  input_MB  tasks  runCpu_s  peakMB")
    dirs.foreach { dir =>
      val sfName = dir.split('/').last
      val docs = Tables(spark, dir).documents
      // the query's own shared relation (memoized persist — same
      // object the five consumers read)
      val sh = queries.DedupQueries.cachedShingleRelation(docs)
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val bk0 = sh.groupBy($"doc_id").agg(
          slice(sort_array(collect_list($"sh")), 1, 4).as("bks"))
        .select($"doc_id".as("bk_id"), explode($"bks").as("sh"))
      val hot = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .filter($"df" > 20).select($"sh")
      val bk = bk0.join(hot, Seq("sh"), "left_anti")
      val cand = bk.join(sh.as("o"), Seq("sh"))
        .filter($"bk_id" =!= col("o.doc_id"))
        .select(least($"bk_id", col("o.doc_id")).as("a_id"),
          greatest($"bk_id", col("o.doc_id")).as("b_id"))
        .distinct()
      val shared = cand
        .join(sh.as("sa"), col("a_id") === col("sa.doc_id"))
        .join(sh.as("sb"), col("b_id") === col("sb.doc_id") &&
          col("sa.sh") === col("sb.sh"))
        .groupBy($"a_id", $"b_id")
        .agg(count(lit(1)).as("shared"))
      val full = SparkEntry.queries("qd26_containment_capped")
      def measure(name: String, run: () => Unit): Unit = {
        var best = Double.MaxValue; var line = ""
        (1 to reps).foreach { _ =>
          agg.reset()
          val t0 = System.nanoTime()
          run()
          val wall = (System.nanoTime() - t0) / 1e9
          org.apache.spark.GraftSparkShim
            .drainListenerBus(spark.sparkContext)
          if (wall < best) {
            best = wall
            line = f"$name%-9s  $sfName%-8s  $wall%6.1f  " +
              f"${agg.shufRead / 1e6}%9.1f  ${agg.shufWrite / 1e6}%9.1f" +
              f"  ${agg.spill / 1e6}%8.1f  ${agg.input / 1e6}%8.1f  " +
              f"${agg.tasks}%5d  ${agg.runMs / 1e3}%8.1f  " +
              f"${agg.peakMem / 1e6}%6.1f"
          }
        }
        println(line)
      }
      def noop(df: DataFrame): () => Unit =
        () => df.write.format("noop").mode("overwrite").save()
      measure("explode", noop(sh))
      measure("sizes", noop(sizes))
      measure("bk", noop(bk))
      measure("cand", noop(cand))
      measure("shared", noop(shared))
      measure("full", noop(full(spark, dir)))
      // density counters — the mechanism diagnostics
      val nDocs = docs.count()
      val nSh = sh.count()
      val nShKeys = sh.select($"sh").distinct().count()
      val nHot = hot.count()
      val nBk = bk.count()
      val nCand = cand.count()
      val nShared = shared.count()
      println(s"[qd26probe] $sfName docs=$nDocs sh=$nSh shKeys=$nShKeys" +
        s" hot=$nHot bk=$nBk cand=$nCand shared=$nShared")
      queries.DedupQueries.invalidateRelationCache(spark)
    }
    spark.stop()
  }
}

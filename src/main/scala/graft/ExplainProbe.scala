package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of a registered query at each
  * scale directory — the ring's plan-shape companion (a decade row
  * whose BYTES bend needs the plan diff, e.g. an AQE broadcast→SMJ
  * transition; wall numbers alone can't show it). AQE finalizes plans
  * at runtime, so the query is EXECUTED (noop sink) and the final
  * adaptive plan is printed.
  *
  * Usage: sbt "runMain graft.ExplainProbe <queryName> dir1 [dir2 ...]"
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainProbe <queryName> dirs...")
    val name = args.head
    val dirs =
      if (args.length > 1) args.tail.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-explain-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val fn = SparkEntry.queries(name)
    // The noop write runs a SEPARATE QueryExecution from
    // df.queryExecution (r16 ADVICE, verified on Spark 4.1.2: printing
    // df.queryExecution.executedPlan after the write shows the INITIAL
    // AdaptiveSparkPlan, isFinalPlan=false — useless for the probe's
    // purpose of showing AQE broadcast↔SMJ transitions). Capture the
    // QueryExecution the write ACTUALLY ran via a
    // QueryExecutionListener; its executedPlan is the finalized plan.
    val captured = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.execution.QueryExecution]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = captured.set(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    dirs.foreach { dir =>
      captured.set(null)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      // listener events deliver asynchronously — barrier before reading
      org.apache.spark.GraftSparkShim.drainListenerBus(spark.sparkContext)
      println(s"===== $name @ $dir (final adaptive plan)")
      Option(captured.get()) match {
        case Some(qe) =>
          println(qe.executedPlan.toString.linesIterator
            .filter(l => l.contains("Join") || l.contains("Exchange") ||
              l.contains("Scan") || l.contains("Aggregate") ||
              l.contains("isFinalPlan"))
            .mkString("\n"))
        case None =>
          println("(listener did not deliver the executed plan)")
      }
    }
    spark.stop()
  }
}

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
    dirs.foreach { dir =>
      val df = fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $name @ $dir (final adaptive plan)")
      // executedPlan after execution carries the finalized AQE plan
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Aggregate"))
        .mkString("\n"))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs `SparkEntry.benchQueries` against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Results are forced through the `noop` sink so the full plan executes
  * (a bare `count()` would let Catalyst prune away most of the work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production parity with Verify: extensions installed
    GraftExtensions.register(spark)
    // warm the JVM/codegen/FS paths so the first measured query isn't
    // charged session startup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // streaming fixtures stage a micros-timestamp parquet copy once per
    // JVM — do it here so st03 times the stream-stream join, not the copy
    queries.WdsQueries.warmEventsStage(spark, sfDir)
    val results = SparkEntry.benchQueries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a red query must not silently deflate the headline number: failed
    // timings are excluded from the total and reported by name
    val qs = results.collect { case (k, v, true) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // per-family subtotals (family = name prefix before the number) and
    // >2×-family-median outliers — the round-over-round regression radar
    val family = (n: String) => n.takeWhile(!_.isDigit)
    val byFam = results.collect { case (k, v, true) => (family(k), v) }
      .groupBy(_._1).toSeq.sortBy(_._1)
    val fams = byFam.map { case (f, vs) =>
      "\"" + f + f"\":${vs.map(_._2).sum}%.3f" }.mkString("{", ",", "}")
    val outliers = byFam.flatMap { case (f, vs) =>
      val sorted = vs.map(_._2).sorted
      val med = sorted(sorted.length / 2)
      results.collect { case (k, v, true)
        if family(k) == f && vs.length >= 3 && v > 2 * med => "\"" + k + "\"" }
    }.mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"families":$fams,"outliers":$outliers,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // per-round history so future rounds can diff without the driver
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_history.jsonl"), line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND): Unit
    } catch { case _: Exception => () }
    spark.stop()
  }
}

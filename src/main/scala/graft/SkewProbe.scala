package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** qd27 skew-guard probe (round-13 directive 2): measures the banded
  * MinHash-LSH candidate stage with and without the bucket-size
  * ceiling on an adversarial corpus where ONE bucket is huge — the
  * boilerplate-family shape the guard exists for. `hotN` identical
  * docs collide in every band (a hot bucket of hotN members per
  * band = C(hotN,2) candidate pairs before the cap); `bgN` unique
  * docs supply the background the capped run must still process.
  *
  * Usage: sbt "runMain graft.SkewProbe [hotN] [bgN]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val hotN = args.lift(0).map(_.toInt).getOrElse(10000)
    val bgN = args.lift(1).map(_.toInt).getOrElse(40000)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.range(hotN + bgN).select(
      $"id".as("doc_id"),
      when($"id" < hotN,
        lit("hot boilerplate template page body repeated across the " +
          "whole mirror family word for word"))
        .otherwise(format_string(
          "unique doc %d alpha %d beta %d gamma %d delta %d epsilon %d",
          $"id", $"id" * 3, $"id" * 7, $"id" * 11, $"id" * 13, $"id" * 17))
        .as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    val n = docs.count()
    val sig = functions.MinHash.signatures(
      docs.select($"doc_id", $"text"), 8).cache()
    sig.count()
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[skew] $label%-10s docs=$n%d pairs=$rows%d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    // order: capped first so the uncapped blow-up can't warm its caches
    time("capped")(queries.DedupQueries.lshPairsCapped(sig, 10).count())
    time("uncapped")(queries.DedupQueries.lshPairsFrom(sig).count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ConnectedComponents chain probe (round 13): the star fallback's
  * scale evidence beyond the 10k-chain spec. A single n-link chain is
  * the adversarial diameter case — min-label propagation needs n
  * rounds, the star phase O(log n) alternations. Prints phase round
  * counts and wall time; the label check (all = 1) is asserted.
  *
  * Usage: sbt "runMain graft.CcProbe [n] [extraComponents]"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
    val extra = args.lift(1).map(_.toInt).getOrElse(100000)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cc-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("ccprobe_ckpt").toString)
    import spark.implicits._
    // one n-link chain (ids 1..n) + `extra` isolated 2-cliques as
    // background (ids above the chain), so the star phase runs over a
    // mixed component-size distribution, not just the one chain
    val chain = spark.range(1L, n.toLong)
      .select($"id".as("a_id"), ($"id" + 1).as("b_id"))
    val cliques = spark.range(extra.toLong).select(
      ($"id" * 2 + n + 1).as("a_id"), ($"id" * 2 + n + 2).as("b_id"))
    val edges = chain.union(cliques)
      .repartition(spark.sparkContext.defaultParallelism).cache()
    val verts = spark.range(1L, n + 2L * extra + 1).select($"id").cache()
    edges.count(); verts.count()
    val t0 = System.nanoTime()
    val (labels, stats) = functions.ConnectedComponents
      .runWithStats(edges, verts)
    val chainOk = labels.filter($"id" <= n && $"label" =!= 1L).count()
    val wall = (System.nanoTime() - t0) / 1e9
    require(chainOk == 0, s"$chainOk chain vertices mislabeled")
    println(f"[cc] n=$n%d extra=$extra%d propagation=" +
      f"${stats.propagationRounds}%d star=${stats.starRounds}%d " +
      f"fallback=${stats.usedStarFallback} wall=$wall%8.2fs")
    spark.stop()
  }
}

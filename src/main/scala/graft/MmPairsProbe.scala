package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 directive #1 (third-decade ring): quantifies WHERE the
  * sf30 spill on the mm pairs rows comes from. For each mm pairs query
  * and scale dir it prints the signature-class shape (takes, classes,
  * max class size), the collapse-gate statistic Σ(c²−c)·n_sh (so the
  * 64 M crossover is re-tested a decade up), and the VERIFIED-PAIR
  * output count of the collapsed arm — the row count the per-take
  * aggregation behind mm27/mm29 must shuffle. If pairs grow ~(sf)²
  * while the wall stays ~linear, the spill is the quadratic pair
  * OUTPUT the pairs semantics demand (adjudicated output-bound; the
  * production termination is clusters/mm30), not a plan defect.
  *
  * The single arm is deliberately NOT timed at sf30: its measured
  * sf10 spill was 136/122 GB (SCALE.md), and 3× that exceeds the
  * sandbox disk.
  *
  * Usage: sbt "runMain graft.MmPairsProbe dir1 [dir2 ...]"
  */
object MmPairsProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf10")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-mm-pairs-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    for (dir <- dirs;
         q <- Seq("mm27_video_near_dup", "mm29_audio_near_dup")) {
      val sigs = graft.queries.MediaQueries.probeStagedSigs(spark, dir, q)
        .persist()
      val cls = sigs.groupBy(col("media_id"), col("take"))
        .agg(struct(count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(sh))").as("x1"),
          expr("bit_xor(xxhash64(sh, 2))").as("x2")).as("sig"),
          max(col("n_sh")).as("n_sh"))
        .groupBy(col("sig")).agg(count(lit(1)).as("c"),
          max(col("n_sh")).as("m"))
      val r = cls.agg(sum(col("c")).as("takes"), count(lit(1)).as("d"),
        max(col("c")).as("mx"),
        sum((col("c").cast("double") * col("c") - col("c")) * col("m"))
          .as("saved")).head()
      val t0 = System.nanoTime()
      val pairs = graft.multimodal.MediaDedup
        .probePairsCollapsed(sigs, 400000L).count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[mmpairs] $q dir=$dir takes=${r.getLong(0)} " +
        f"classes=${r.getLong(1)} maxClass=${r.getLong(2)} " +
        f"saved=${r.getDouble(3)}%.3e gateFires=${r.getDouble(3) > 64e6} " +
        f"verifiedPairs=$pairs collapsedWall=$w%.1fs")
      sigs.unpersist()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fan-out statistics of the media near-dup signature classes per mm
  * query — the number `MediaDedup.pairsMaybeCollapsed`'s adaptive gate
  * keys on (Σc²/Σc = expected class size of a random take), printed
  * with class counts so the gate constant is an evidenced choice, not
  * a guess. Also times both arms of the operator on the same staged
  * relation for the A/B.
  *
  * Usage: sbt "runMain graft.MediaGateProbe [sfDir]"
  */
object MediaGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-media-gate-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    for (q <- Seq("mm27_video_near_dup", "mm28_video_phash_dup",
        "mm29_audio_near_dup", "mm31_image_phash_dup")) {
      val sigs = graft.queries.MediaQueries.probeStagedSigs(spark, dir, q)
        .persist()
      val cls = sigs.groupBy(col("media_id"), col("take"))
        .agg(struct(count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(sh))").as("x1"),
          expr("bit_xor(xxhash64(sh, 2))").as("x2")).as("sig"))
        .groupBy(col("sig")).agg(count(lit(1)).as("c"),
          max(col("sig.n")).as("m"))
      val r = cls.agg(sum(col("c")).as("n"), count(lit(1)).as("d"),
        sum(col("c") * col("c")).as("c2"), max(col("c")).as("mx"),
        sum((col("c").cast("double") * col("c") - col("c")) * col("m"))
          .as("saved")).head()
      val fanout = r.getLong(2).toDouble / r.getLong(0)
      val saved = r.getDouble(4)
      def time(label: String, f: => Unit): Double = {
        val t0 = System.nanoTime(); f
        val w = (System.nanoTime() - t0) / 1e9
        w
      }
      val tSingle = time("single", graft.multimodal.MediaDedup
        .probePairsSingle(sigs, 400000L)
        .write.format("noop").mode("overwrite").save())
      val tCollapsed = time("collapsed", graft.multimodal.MediaDedup
        .probePairsCollapsed(sigs, 400000L)
        .write.format("noop").mode("overwrite").save())
      println(f"[gateprobe] $q takes=${r.getLong(0)} " +
        f"classes=${r.getLong(1)} fanout=$fanout%.2f " +
        f"maxClass=${r.getLong(3)} savedRows=$saved%.3e " +
        f"single=$tSingle%.2fs collapsed=$tCollapsed%.2fs")
      sigs.unpersist()
    }
    spark.stop()
  }
}

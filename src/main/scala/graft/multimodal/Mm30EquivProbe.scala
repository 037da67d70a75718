package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-ring equivalence check for the mm30 exact-dup pre-collapse
  * (round 15): runs BOTH spellings — the original all-pairs verified
  * join and the collapsed [[MediaDedup.nearDupClusters]] — over the
  * mm30 fixture at a given sf dir and diffs the cluster assignments
  * row-for-row. The MediaDedupSpec law pins the equivalence on a
  * hand-built fixture; this replays it at ring scale, where the sf10
  * identical-content classes (~52 takes average) exercise the collapse
  * for real. Usage: sbt "runMain graft.multimodal.Mm30EquivProbe
  * [sfDir]" — prints rows + mismatches; 0 mismatches = pass.
  */
object Mm30EquivProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("mm30-equiv-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("mm30eq_ckpt").toString)

    // the mm27/mm30 fixture media over this sf's documents spine
    val mm27Video = udf { (id: Long, take: Int) =>
      val nx = (6 + (id % 3) * 3).toInt
      graft.multimodal.h264.H264Fixtures.video(
        id, if (take == 0) nx else nx + 3)
    }
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id").as("media_id"),
        explode(array(lit(0), lit(1))).as("take"))
      .withColumn("content", mm27Video(col("media_id"), col("take")))
    val fp = MediaDedup.exactVideoFingerprint(
      graft.pack.FrameSource.Mp4Frames)

    def key(id: org.apache.spark.sql.Column,
        take: org.apache.spark.sql.Column) =
      struct(id.as("media_id"), take.as("take"))

    val t0 = System.nanoTime()
    val collapsed = MediaDedup.nearDupClusters(media,
      java.nio.file.Files.createTempDirectory("mm30eq_a").toString, fp)
      .select(col("media_id"), col("take"),
        col("cluster_id"), col("cluster_take"))
    val nC = collapsed.persist().count()
    println(f"[mm30equiv] collapsed: $nC rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs")

    val t1 = System.nanoTime()
    val sigs = MediaDedup.stageShingles(media,
      java.nio.file.Files.createTempDirectory("mm30eq_b").toString, fp)
    val allEdges = MediaDedup.pairsFromSigs(sigs, 400000L).select(
      key(col("a_id"), col("a_take")).as("a_id"),
      key(col("b_id"), col("b_take")).as("b_id"))
    val vertices = media
      .select(key(col("media_id"), col("take")).as("id")).distinct()
    val allPairs = graft.functions.ConnectedComponents
      .run(allEdges, vertices, 50)
      .select(col("id.media_id").as("media_id"),
        col("id.take").as("take"),
        col("label.media_id").as("cluster_id"),
        col("label.take").as("cluster_take"))
    val nA = allPairs.persist().count()
    println(f"[mm30equiv] all-pairs: $nA rows in " +
      f"${(System.nanoTime() - t1) / 1e9}%.1fs")

    val mismatches = collapsed.as("c").join(allPairs.as("a"),
        col("c.media_id") === col("a.media_id") &&
          col("c.take") === col("a.take"))
      .where(col("c.cluster_id") =!= col("a.cluster_id") ||
        col("c.cluster_take") =!= col("a.cluster_take"))
      .count()
    println(s"[mm30equiv] rows=$nC/$nA mismatches=$mismatches " +
      (if (mismatches == 0 && nC == nA) "PASS" else "FAIL"))
    spark.stop()
  }
}

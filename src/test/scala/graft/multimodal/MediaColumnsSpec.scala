package graft.multimodal

import graft.SparkSpec
import graft.wds.Codecs
import org.apache.spark.sql.functions._

class MediaColumnsSpec extends SparkSpec {

  private def png(id: Long): Array[Byte] =
    Codecs.encodeImage(
      Codecs.ImageData(2, 2, 3, "RGB",
        Array.tabulate(12)(i => ((id + i) % 256).toByte)), "png")

  private lazy val media = {
    import spark.implicits._
    (0L until 10L).map(i => (i, "image", png(i), s"""{"id":$i}"""))
      .toDF("media_id", "kind", "content", "meta_json")
  }

  test("imageFeatures decodes binary column to typed features") {
    val out = MediaColumns.imageFeatures(media).orderBy("media_id").collect()
    assert(out.length == 10)
    val r = out.head
    assert(r.getAs[Int]("height") == 2 && r.getAs[Int]("width") == 2)
    assert(r.getAs[Int]("nChannels") == 3)
    val luma = r.getAs[Double]("mean_luma")
    assert(luma == (0 until 12).sum.toDouble / 12)
  }

  test("sampleFrames fans one video row out to n deterministic frames") {
    import spark.implicits._
    val vids = Seq((1L, "video", "fakevideobytes".getBytes, "{}"))
      .toDF("media_id", "kind", "content", "meta_json")
    val frames = MediaColumns.sampleFrames(vids, numSegments = 6).collect()
    assert(frames.length == 6)
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == (0 until 6))
    val idxs = frames.map(_.getAs[Int]("frame_index")).toSeq
    assert(idxs == idxs.sorted && idxs.distinct.size == 6)
    // frames decode back and encode their frame index in pixel 0
    val f0 = Codecs.decodeImage(frames.head.getAs[Array[Byte]]("frame"))
    assert((f0.data(0) & 0xff) == idxs.head % 256)
  }

  test("metadata-only plans prune the binary column from the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(dir)
    val cat = MediaColumns.mediaCatalog(
      spark.read.parquet(dir).select(col("media_id"), col("kind"),
        col("content"), col("meta_json")))
    // total_bytes needs content length; catalog on kinds-only must not:
    val kindCount = spark.read.parquet(dir).groupBy("kind").count()
    val plan = kindCount.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("content"),
      s"binary column not pruned:\n$plan")
    // and the full catalog still computes
    assert(cat.collect().head.getAs[Long]("n") == 10)
  }

  test("audio stub keeps deterministic plumbing") {
    val out = MediaColumns.audioFeaturesStub(media).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n_bytes") > 0))
  }
}

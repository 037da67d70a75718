package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Media-tier scale probe: frame-decode throughput (the per-call-
  * overhead axis the PNG fast path exists for) and scene-cut scaling at
  * documents ×N with production-shaped frames (32×32 RGB, 8 frames per
  * video — tiny fixtures would measure fixture synthesis, not decode).
  * Usage: sbt "runMain graft.MediaProbe [sfDir] [multiples...]"
  */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 10, 50)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-media-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // single-thread codec A/B: per-call overhead is the quantity of
    // interest, so measure it without task parallelism in the frame
    val frames = (0 until 5000).map { f =>
      val px = Array.tabulate(32 * 32 * 3)(i => ((f * 31 + i) % 251).toByte)
      graft.wds.Png.encode(graft.wds.Codecs.ImageData(32, 32, 3, "RGB", px))
    }
    def timeIt(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[media] $label%-28s ${dt}%6.2fs " +
        f"(${frames.size / dt}%,.0f frames/s)")
      dt
    }
    timeIt("warmup (fast path)") {
      frames.foreach(b => graft.wds.Png.decode(b).get)
    }
    timeIt("Png.decode (fast path)") {
      frames.foreach(b => graft.wds.Png.decode(b).get)
    }
    timeIt("ImageIO.read (legacy path)") {
      frames.foreach { b =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b))
        require(img != null)
      }
    }

    val base = Tables(spark, sfDir).documents.select("doc_id")
    multiples.foreach { m =>
      val big = (0 until m).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"))
      }.reduce(_ union _)
        .repartition(spark.sparkContext.defaultParallelism)
      val mkMp4 = udf { (id: Long) =>
        val fs = (0 until 8).map { f =>
          val px = Array.tabulate(32 * 32 * 3)(i =>
            ((id * 31 + (f / 3) * 53 + i * 7) % 251).toByte)
          graft.wds.Codecs.encodeImage(
            graft.wds.Codecs.ImageData(32, 32, 3, "RGB", px), "png")
        }
        graft.multimodal.Mp4Samples.encodeFrames(fs, codec = "png ",
          fps = 5, width = 32, height = 32, syncEvery = 3)
      }
      val media = big.select(col("doc_id").as("media_id"),
        mkMp4(col("doc_id")).as("content")).cache()
      val nVideos = media.count() // materialize: synth priced separately
      val t0 = System.nanoTime()
      val agg = graft.multimodal.MediaColumns
        .sceneCuts(media, graft.pack.FrameSource.Mp4Frames, threshold = 30)
        .agg(sum("n_cuts"), sum("sad_total")).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[media] sceneCuts videos=$nVideos%8d frames=${nVideos * 8}%9d " +
        f"wall=$dt%6.2fs (${nVideos * 8 / dt}%,.0f frames/s) " +
        s"cuts=${agg.getLong(0)}")
      media.unpersist()
    }
    spark.stop()
  }
}

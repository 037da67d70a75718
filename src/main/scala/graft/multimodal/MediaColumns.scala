package graft.multimodal

import graft.wds.Codecs
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` columns with
  * typed metadata structs, plus the decode / feature-extract / resize /
  * frame-sample operators a training-data pipeline runs over them.
  *
  * The Spark-side plumbing — schemas, batch iteration via mapPartitions,
  * partition sizing — is real and tested; the codec boundary is the
  * pluggable seam: images use the JVM's ImageIO (real), audio/video
  * decoders (no JVM parity for decord/ffmpeg in this container) are
  * clearly-marked deterministic stubs behind the same interface, exactly
  * where a JavaCV binding would plug in (reference:
  * `pack/dataset.py:10-122`, `pack/samplers.py:53-58`).
  *
  * Scale notes: media bytes never pass through a shuffle — every operator
  * here is a narrow mapPartitions; metadata-only plans prune the binary
  * column away at the parquet scan (test-asserted in MediaColumnsSpec).
  */
object MediaColumns {

  /** Spark image-schema-aligned struct. */
  val ImageMetaSchema: StructType = StructType(Seq(
    StructField("height", IntegerType),
    StructField("width", IntegerType),
    StructField("nChannels", IntegerType),
    StructField("mode", StringType)))

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      meta_json: String)

  final case class ImageFeatures(
      media_id: Long,
      height: Int,
      width: Int,
      nChannels: Int,
      mode: String,
      mean_luma: Double)

  /** Decode + feature-extract images: batched per partition, binary in /
    * typed struct out. Real ImageIO decode. */
  def imageFeatures(df: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[ImageFeatures]
    df.select(col("media_id"), col("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Codecs.decodeImage(bytes)
          var sum = 0L
          var i = 0
          while (i < img.data.length) { sum += img.data(i) & 0xff; i += 1 }
          ImageFeatures(id, img.height, img.width, img.nChannels, img.mode,
            sum.toDouble / img.data.length)
        }
      }.toDF()
  }

  /** Frame-sample a video column: selection math is the real pack-stage
    * logic ([[graft.pack.Frames.segmentCenters]]); the byte decode is the
    * FrameSource seam (synthetic here — ffmpeg/JavaCV in production).
    * One input row fans out to n frame rows (the reference's only UDTF
    * shape, `pack/samplers.py:102-157`). */
  def sampleFrames(
      df: DataFrame,
      numSegments: Int,
      frames: graft.pack.FrameSource = graft.pack.FrameSource.Synthetic)
      : DataFrame = {
    implicit val enc = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaInt, Encoders.BINARY)
    df.select(col("media_id"), col("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, video) =>
          val total = frames.frameCount(video)
          val fps = frames.fps(video)
          val idxs = graft.pack.Frames.segmentCenters(
            numSegments, fps, total - 1, bound = Some((0.0, total / fps)))
          idxs.zipWithIndex.map { case (fi, i) =>
            (id, i, fi, frames.frame(video, fi))
          }
        }
      }.toDF("media_id", "frame_no", "frame_index", "frame")
  }

  final case class AudioFeatures(
      media_id: Long,
      n_samples: Int, // frames per channel
      channels: Int,
      sample_rate: Int,
      duration_sec: Double,
      rms: Double,
      peak: Int)

  /** Audio feature extraction over a WAV/PCM binary column — real
    * decode via [[WavCodec]] (pure JVM). Narrow mapPartitions, audio
    * bytes never shuffle. Compressed codecs stay at the ffmpeg seam. */
  def audioFeatures(df: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[AudioFeatures]
    df.select(col("media_id"), col("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val w = WavCodec.decode(bytes)
          AudioFeatures(id, w.frames, w.channels, w.sampleRate,
            w.durationSec, WavCodec.rms(w), WavCodec.peak(w))
        }
      }.toDF()
  }

  /** Legacy byte-stats fallback for non-WAV audio (the pre-decode
    * stub, kept for opaque codecs until the ffmpeg seam is wired). */
  def audioFeaturesStub(df: DataFrame): DataFrame =
    df.select(col("media_id"),
      length(col("content")).cast("long").as("n_bytes"),
      // placeholder for real spectral features: deterministic byte crc
      crc32(col("content")).as("content_crc"))

  /** Pack media rows for training: metadata-only projection — asserts
    * the binary column is pruned from the scan (see spec). */
  def mediaCatalog(df: DataFrame): DataFrame =
    df.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("content"))).as("total_bytes"))
      .orderBy(col("kind"))
}

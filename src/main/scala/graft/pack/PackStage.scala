package graft.pack

import graft.wds.{Sample, TarIO, WdsWriter}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

/** E1 — the pack stage: normalized metadata (video_path, value) + media
  * bytes → WebDataset pair/interleave shards (`pack/pack.py:230-310`).
  *
  * Spark restatement (SURVEY.md §3 E1): metadata is a DataFrame; frame
  * selection is pure index math ([[Frames]]); video decode is the
  * pluggable [[FrameSource]] seam; output shards are written by
  * [[WdsWriter]] with the pack stage's 500-samples-per-tar roll and
  * worker-addressed naming. Sampler fan-out (1 video → n frame entries)
  * is the flatMap/UDTF shape (§2.11).
  */
object PackStage {

  /** Sampler type dispatch (`pack/pack.py:67-85`). */
  sealed trait SamplerType { def name: String }
  object SamplerType {
    case object Uniform extends SamplerType { val name = "un" }
    case object VideoOnly extends SamplerType { val name = "video-only" }
    case object Pair extends SamplerType { val name = "video_text_pair" }
  }

  final case class PackOptions(
      samplerType: SamplerType = SamplerType.Uniform,
      numSegments: Int = 16, // `read_video(num_segments=16)`, samplers.py:110
      samplesPerTar: Long = 500L, // `tar_size`, pack/pack.py:17
      frames: FrameSource = FrameSource.Synthetic)

  private def js(v: JValue): Array[Byte] =
    TarIO.utf8(JsonMethods.compact(JsonMethods.render(v)))

  /** Build one pack sample from (fileIdx, videoBytes, caption).
    * Emits the interleave-compatible json shape (prompt/txt/
    * image_name_list) so E2 consumes E1 output directly, plus the
    * conversations/videos fields of the pair shape. */
  def buildSample(
      fileIdx: Long,
      video: Array[Byte],
      caption: String,
      opts: PackOptions): Sample = {
    val key = f"$fileIdx%09d"
    opts.samplerType match {
      case SamplerType.VideoOnly =>
        val json: JValue =
          ("caption" -> caption) ~ ("video_id" -> key)
        Sample(key, "", Map("json" -> js(json), "mp4" -> video))
      case SamplerType.Pair =>
        val convs = Conversations.defaultConversation("<video>", caption)
        val json: JValue =
          ("conversations" -> convs.map(t =>
            ("from" -> t.from) ~ ("value" -> t.value))) ~
            ("videos" -> Seq(key))
        Sample(key, "", Map("json" -> js(json), "mp4" -> video))
      case SamplerType.Uniform =>
        val total = opts.frames.frameCount(video)
        val fps = opts.frames.fps(video)
        val idxs = Frames.segmentCenters(
          opts.numSegments, fps, total - 1,
          bound = Some((0.0, total / fps)))
        val names = idxs.indices.map(i => s"$key-$i")
        val prompt = Conversations.ImageToken * names.length
        val json: JValue =
          ("prompt" -> prompt) ~ ("txt" -> caption) ~
            ("image_name_list" -> names) ~
            ("conversations" -> Conversations
              .defaultConversation(prompt, caption)
              .map(t => ("from" -> t.from) ~ ("value" -> t.value)))
        val frameEntries = idxs.zipWithIndex.map { case (fi, i) =>
          s"$i.jpg" -> opts.frames.frame(video, fi)
        }.toMap
        // entries named <i>.jpg inside the sample ⇒ written as
        // <key>-<i>.jpg alongside <key>.json via flattenForWrite
        Sample(key, "", frameEntries + ("json" -> js(json)))
    }
  }

  /** The pack tar layout writes frames as sibling entries `<key>-<i>.jpg`
    * AFTER `<key>.json` (`pack/pack.py:222-224`) — the interleave
    * convention our reader re-groups. Flatten one logical sample into its
    * physical write-order keys. */
  def flattenForWrite(s: Sample): Seq[Sample] = {
    val (frames, rest) = s.entries.partition(_._1.endsWith(".jpg"))
    val head = Sample(s.key, s.url, rest)
    val tail = frames.toSeq
      .sortBy { case (k, _) => k.stripSuffix(".jpg").toInt }
      .map { case (k, v) =>
        Sample(s"${s.key}-${k.stripSuffix(".jpg")}", s.url, Map("jpg" -> v))
      }
    head +: tail
  }

  /** Run E1: metadata (video_path, value) × media lookup → shards.
    * `mediaFor` supplies video bytes (production: Hadoop FS read of the
    * path column — binaryFile join; tests: synthetic bytes). */
  def run(
      meta: DataFrame,
      outDir: String,
      opts: PackOptions = PackOptions(),
      mediaFor: String => Array[Byte] = p => p.getBytes("UTF-8")): DataFrame = {
    val spark = meta.sparkSession
    implicit val enc = Encoders.product[Sample]
    // deterministic dense file_idx WITHOUT a global window (row_number
    // over an unpartitioned Window funnels everything through one task):
    // distributed sort, then order-preserving zipWithIndex — each
    // partition learns only its offset, parallelism is preserved
    val ordered = meta.select(col("video_path"), col("value"))
      .orderBy("video_path", "value")
      .as[(String, String)](Encoders.tuple(Encoders.STRING, Encoders.STRING))
    val packed = spark.createDataset(
      ordered.rdd.zipWithIndex().map { case ((path, caption), idx) =>
        (idx, path, caption)
      })(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING))
      .mapPartitions { it =>
        it.map { case (idx, path, caption) =>
          buildSample(idx, mediaFor(path), caption, opts)
        }
      }
    WdsWriter.write(packed, outDir,
      WdsWriter.WriterOptions(
        maxCount = opts.samplesPerTar,
        pattern = (p, i) => f"shard-$p%d-$i%06d.tar",
        explode = flattenForWrite))
  }
}

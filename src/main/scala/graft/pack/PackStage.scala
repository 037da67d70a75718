package graft.pack

import graft.wds.{Sample, TarIO, WdsWriter}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

/** E1 — the pack stage: normalized metadata (video_path, value[,
  * media_paths]) + media bytes → WebDataset shards
  * (`pack/pack.py:230-310`).
  *
  * Spark restatement (SURVEY.md §3 E1): metadata is a DataFrame; frame
  * selection is pure index math ([[Frames]]); video decode is the
  * pluggable [[FrameSource]] seam; output shards are written by
  * [[WdsWriter]] with the pack stage's 500-samples-per-tar roll and
  * worker-addressed naming. Sampler fan-out (1 video → n frame entries)
  * is the flatMap/UDTF shape (§2.11).
  *
  * All ten reference sampler types are dispatched
  * (`pack/pack.py:67-85`): un, kf, video-only, video_text_pair,
  * video_interleave, video_sft, merlin-s, image, merlin-un, unicontrol. Where the
  * reference computes a conversation and then drops it on the floor
  * (kf's `human_value`, merlin-s's `conversations` — both built at
  * `pack.py:96-148` but absent from the written json), we keep the
  * computed value in the json ("prompt"/"conversations") because the
  * tokenize stage's kf/merlin-s token expansion consumes it.
  */
object PackStage {

  // not `private`: encoder codegen instantiates these from generated code
  final case class MetaRow(
      video_path: String, value: String, media_paths: Seq[String])
  final case class IndexedRow(
      idx: Long, media_paths: Seq[String], value: String)

  /** Sampler type dispatch (`pack/pack.py:67-85`). */
  sealed trait SamplerType { def name: String }
  object SamplerType {
    case object Uniform extends SamplerType { val name = "un" }
    case object Kf extends SamplerType { val name = "kf" }
    case object VideoOnly extends SamplerType { val name = "video-only" }
    case object Pair extends SamplerType { val name = "video_text_pair" }
    case object Interleave extends SamplerType { val name = "video_interleave" }
    case object Sft extends SamplerType { val name = "video_sft" }
    case object MerlinS extends SamplerType { val name = "merlin-s" }
    case object Unicontrol extends SamplerType { val name = "unicontrol" }
    case object Image extends SamplerType { val name = "image" }
    case object MerlinUn extends SamplerType { val name = "merlin-un" }

    val all: Seq[SamplerType] = Seq(Uniform, Kf, VideoOnly, Pair,
      Interleave, Sft, MerlinS, Unicontrol, Image, MerlinUn)
    def byName(n: String): SamplerType =
      all.find(_.name == n.toLowerCase).getOrElse(
        throw new IllegalArgumentException(
          s"sample types $n is not supported"))
  }

  final case class PackOptions(
      samplerType: SamplerType = SamplerType.Uniform,
      numSegments: Int = 16, // `read_video(num_segments=16)`, samplers.py:110
      samplesPerTar: Long = 500L, // `tar_size`, pack/pack.py:17
      frames: FrameSource = FrameSource.Synthetic,
      iFrames: Int = 8, // `args.Iframes`, samplers.py:169-175
      totalFrames: Int = 24, // `args.total_frames`
      timeScale: Int = 1000, // `args.time_scale`
      // exact idx/samplesPerTar chunk→shard alignment: every tar holds
      // exactly its ceil-chunk of the globally ordered input, making
      // per-shard counts a pure function of n (oracle-checkable) — and
      // matching the reference's sequential tar_size slicing
      // (`pack/pack.py:58-60`) instead of partition-local rolling
      alignShards: Boolean = false)

  private def js(v: JValue): Array[Byte] =
    TarIO.utf8(JsonMethods.compact(JsonMethods.render(v)))

  private def turnsJson(ts: Seq[Conversations.Turn]): JValue =
    ts.map(t => ("from" -> t.from) ~ ("value" -> t.value))

  /** Build one pack sample from (fileIdx, mediaPaths, value).
    * `mediaFor` supplies media bytes for a path (production: Hadoop FS
    * read; gate/tests: deterministic synthetic bytes). */
  def buildSample(
      fileIdx: Long,
      paths: Seq[String],
      value: String,
      opts: PackOptions,
      mediaFor: String => Array[Byte]): Sample = {
    val key = f"$fileIdx%09d"

    def frameEntries(frames: Seq[Array[Byte]], ext: String) =
      frames.zipWithIndex.map { case (b, i) => s"$i.$ext" -> b }.toMap

    opts.samplerType match {
      case SamplerType.VideoOnly =>
        // `pack.py:151-160`
        val json: JValue = ("caption" -> value) ~ ("video_id" -> key)
        Sample(key, "", Map("json" -> js(json), "mp4" -> mediaFor(paths.head)))

      case SamplerType.Pair =>
        // `pack.py:100-103,171-179`
        val convs = Conversations.defaultConversation("<video>", value)
        val json: JValue =
          ("conversations" -> turnsJson(convs)) ~ ("videos" -> Seq(key))
        Sample(key, "", Map("json" -> js(json), "mp4" -> mediaFor(paths.head)))

      case SamplerType.Uniform =>
        // `pack.py:69-70,91-95` + uniformSampler (`samplers.py:103-120`)
        val video = mediaFor(paths.head)
        val total = opts.frames.frameCount(video)
        val fps = opts.frames.fps(video)
        val idxs = Frames.segmentCenters(
          opts.numSegments, fps, total - 1,
          bound = Some((0.0, total / fps)))
        val names = idxs.indices.map(i => s"$key-$i")
        val prompt = Conversations.ImageToken * names.length
        val json: JValue =
          ("prompt" -> prompt) ~ ("txt" -> value) ~
            ("image_name_list" -> names) ~
            ("conversations" -> turnsJson(Conversations
              .defaultConversation(prompt, value)))
        Sample(key, "",
          frameEntries(idxs.map(opts.frames.frame(video, _)), "jpg") +
            ("json" -> js(json)))

      case SamplerType.Kf =>
        // keyFrameSampler (`samplers.py:121-157`): I-frames capped at
        // iFrames, P-frames fill to totalFrames, sort-merged; prompt is
        // "<Iimage>#ts" / "<Pimage>#ts" runs (`pack.py:96-99`)
        val video = mediaFor(paths.head)
        val (iImgs, iIdx, total) =
          Samplers.keyframes(video, 'I', opts.iFrames, opts.frames)
        val (pImgs, pIdx, _) =
          Samplers.keyframes(video, 'P', opts.totalFrames - iImgs.length,
            opts.frames)
        val (imgs, idxs, types) =
          Frames.combineKeyFrames(iImgs, iIdx, pImgs, pIdx)
        val ts = idxs.map(Frames.scaleIndex(_, total, opts.timeScale))
        val prompt = types.zip(ts)
          .map { case (t, s) => s"<${t}image>#$s" }.mkString
        val names = imgs.indices.map(i => s"$key-$i")
        val json: JValue =
          ("image_name_list" -> names) ~ ("prompt" -> prompt) ~
            ("txt" -> value)
        Sample(key, "", frameEntries(imgs, "jpg") + ("json" -> js(json)))

      case SamplerType.Interleave | SamplerType.Sft =>
        // getVideoList (`samplers.py:74-101`) + the video_data_types
        // write branch (`pack.py:171-179`); the reference's
        // conversations branch is dead code (`pack.py:105-113`) — we
        // emit the evident intent: Sft builds videochat2 turns from
        // the QA list,
        // Interleave a default turn with one <video> token per clip
        val videos = paths.map(mediaFor)
        val names =
          if (videos.length == 1) Seq(key)
          else videos.indices.map(i => s"$key-$i")
        val convs = opts.samplerType match {
          case SamplerType.Sft =>
            val qaList = JsonMethods.parse(value) match {
              case JArray(items) => items.map {
                case JObject(fields) => fields.map {
                  case (k, JString(s)) => k -> s
                  case (k, v) => k -> JsonMethods.compact(JsonMethods.render(v))
                }
                case other => Seq("q" -> JsonMethods.compact(
                  JsonMethods.render(other)))
              }
              case _ => Seq(Seq("q" -> value))
            }
            Conversations.videochat2Conversation(qaList, "video",
              numSamples = videos.length)
          case _ =>
            Conversations.defaultConversation("<video>" * videos.length, value)
        }
        val json: JValue =
          ("conversations" -> turnsJson(convs)) ~ ("videos" -> names)
        val entries =
          if (videos.length == 1) Map("mp4" -> videos.head)
          else frameEntries(videos, "mp4")
        Sample(key, "", entries + ("json" -> js(json)))

      case SamplerType.MerlinS =>
        // Merlin_S_sampler (`samplers.py:48-72`): black-background synth
        // or image load per path; QA transcript split by
        // merlin_s_qa_process (`pack.py:129-148`); json carries
        // image_name_list (`pack.py:162-169`) + the built conversations
        val imgs = paths.map(p => Samplers.resolveImage(p, mediaFor))
        val names = imgs.indices.map(i => s"$key-$i")
        val (qs, as) = Conversations.merlinSQaProcess(value)
        val convs = qs.zip(as).flatMap { case (q, a) =>
          Conversations.defaultConversation(q, a)
        }
        val json: JValue =
          ("image_name_list" -> names) ~ ("conversations" -> turnsJson(convs))
        Sample(key, "", frameEntries(imgs, "jpg") + ("json" -> js(json)))

      case SamplerType.Image =>
        // get_image (`samplers.py:13-22`) + the image write branch
        // (`pack.py:181-190`): ONE image carrying the sample's own key
        // (so it lands inside the same tar group, no sibling naming),
        // QA-list value → videochat2 conversation with <image> on the
        // first question
        val qaList = JsonMethods.parse(value) match {
          case JArray(items) => items.collect {
            case JObject(fields) => fields.collect {
              case (k, JString(s)) => k -> s
            }
          }
          case _ => Seq(Seq("q" -> value))
        }
        val convs = Conversations.videochat2Conversation(qaList, "image")
        val json: JValue =
          ("conversations" -> turnsJson(convs)) ~ ("image" -> Seq(key))
        Sample(key, "",
          Map("json" -> js(json), "jpg" -> mediaFor(paths.head)))

      case SamplerType.MerlinUn =>
        // get_images (`samplers.py:24-34`) + the merlin-un branch
        // (`pack.py:115-127,202-213`): value carries ready-made
        // conversations; even-human turns become `prompt`, odd-gpt
        // turns `txt`
        val imgs = paths.map(mediaFor)
        val names = imgs.indices.map(i => s"$key-$i")
        implicit val fmts: Formats = DefaultFormats
        val turns = (JsonMethods.parse(value) match {
          case JArray(items) => items.collect {
            case JObject(fields) =>
              val m = fields.collect { case (k, JString(s)) => k -> s }.toMap
              Conversations.Turn(m.getOrElse("from", ""),
                m.getOrElse("value", ""))
          }
          case _ => Seq.empty
        })
        val (prompt, txt) = Conversations.merlinUnSplit(turns)
        val json: JValue =
          ("prompt" -> prompt) ~ ("txt" -> txt) ~
            ("image_name_list" -> names) ~
            ("conversations" -> turnsJson(turns))
        Sample(key, "", frameEntries(imgs, "jpg") + ("json" -> js(json)))

      case SamplerType.Unicontrol =>
        // get_unicontrol_images (`samplers.py:36-46`) + write branch
        // (`pack.py:191-200`): exactly (source, target) image pair
        require(paths.length == 2,
          s"unicontrol needs (source, target) paths, got ${paths.length}")
        val imgs = paths.map(mediaFor)
        val names = imgs.indices.map(i => s"$key-$i")
        val json: JValue =
          ("source" -> names(0)) ~ ("target" -> names(1)) ~
            ("prompt" -> value)
        Sample(key, "", frameEntries(imgs, "jpg") + ("json" -> js(json)))
    }
  }

  /** Back-compat single-video entry point (un/video-only/pair). */
  def buildSample(
      fileIdx: Long,
      video: Array[Byte],
      caption: String,
      opts: PackOptions): Sample =
    buildSample(fileIdx, Seq("mem"), caption, opts, _ => video)

  /** The pack tar layout writes media as sibling entries
    * `<key>-<i>.<ext>` AFTER `<key>.json` (`pack/pack.py:222-224`) — the
    * interleave convention our reader re-groups. Flatten one logical
    * sample into its physical write-order keys. */
  def flattenForWrite(s: Sample): Seq[Sample] = {
    val sibling = "^(\\d+)\\.([a-z0-9]+)$".r
    val (frames, rest) = s.entries.partition {
      case (k, _) => sibling.matches(k)
    }
    val head = Sample(s.key, s.url, rest)
    val tail = frames.toSeq
      .map { case (k, v) =>
        val sibling(idx, ext) = k
        (idx.toInt, ext, v)
      }
      .sortBy(_._1)
      .map { case (i, ext, v) => Sample(s"${s.key}-$i", s.url, Map(ext -> v)) }
    head +: tail
  }

  /** Run E1: metadata (video_path, value[, media_paths]) × media lookup
    * → shards. `mediaFor` supplies media bytes (production: Hadoop FS
    * read of the path column — binaryFile join; tests: synthetic
    * bytes). When `media_paths` (array) is present it carries the
    * multi-media types (interleave clips, merlin-s images, unicontrol
    * source/target); otherwise `video_path` alone is used. */
  def run(
      meta: DataFrame,
      outDir: String,
      opts: PackOptions = PackOptions(),
      mediaFor: String => Array[Byte] = p => p.getBytes("UTF-8")): DataFrame = {
    val spark = meta.sparkSession
    implicit val enc = Encoders.product[Sample]
    val hasMulti = meta.columns.contains("media_paths")
    // deterministic dense file_idx WITHOUT a global window (row_number
    // over an unpartitioned Window funnels everything through one task):
    // distributed sort, then order-preserving zipWithIndex — each
    // partition learns only its offset, parallelism is preserved
    val ordered = meta
      .select(col("video_path"), col("value"),
        (if (hasMulti) col("media_paths")
         else array(col("video_path"))).as("media_paths"))
      // media_paths tie-breaks rows equal on (video_path, value):
      // a range-partitioned sort is not stable for equal keys, so
      // without it two such rows could swap file_idx between runs or
      // task retries, shifting keys/tar contents nondeterministically
      .orderBy(col("video_path"), col("value"),
        concat_ws("\u0000", col("media_paths")))
      .as[MetaRow](Encoders.product[MetaRow])
    val indexed = ordered.rdd.zipWithIndex().map {
      case (m, idx) => IndexedRow(idx, m.media_paths, m.value)
    }
    // alignShards: place rows into exact ceil(idx/samplesPerTar) chunks
    // so every tar is a deterministic slice of the global order — one
    // extra count() job to size the partitioner, as with any
    // total-order write
    val placed =
      if (!opts.alignShards) indexed
      else {
        val n = indexed.count()
        val chunks = math.max(1, ((n + opts.samplesPerTar - 1) /
          opts.samplesPerTar).toInt)
        // key by idx (not chunk) so repartitionAndSortWithinPartitions
        // both routes to the right chunk AND restores ascending idx order
        // inside it — shuffle block fetch order is nondeterministic, so a
        // bare partitionBy would write tar entries out of global order
        // whenever a chunk straddles >1 upstream map partition
        indexed.map(r => (r.idx, r))
          .repartitionAndSortWithinPartitions(new org.apache.spark.Partitioner {
            def numPartitions: Int = chunks
            def getPartition(k: Any): Int =
              (k.asInstanceOf[Long] / opts.samplesPerTar).toInt
          })
          .map(_._2)
      }
    val packed = spark.createDataset(placed)(Encoders.product[IndexedRow])
      .mapPartitions { it =>
        it.map(r => buildSample(r.idx, r.media_paths, r.value, opts, mediaFor))
      }
    WdsWriter.write(packed, outDir,
      WdsWriter.WriterOptions(
        maxCount = opts.samplesPerTar,
        pattern = (p, i) => f"shard-$p%d-$i%06d.tar",
        explode = flattenForWrite))
  }
}

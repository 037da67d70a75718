package graft.queries

import java.nio.file.Files

import graft.{QueryDef, QueryRegistry, Tables}
import graft.index.CheckStage
import graft.multimodal.MediaColumns
import graft.pack.PackStage
import graft.streaming.EventStreams
import graft.tokenize.TokenizeStage
import graft.wds.WdsReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The WebDataset pipeline + streaming + multimodal surfaces exposed as
  * driver-checkable queries. The tar stages drive real shard files
  * through a scratch directory (write → read-back → aggregate), so the
  * whole E1/E2/E3 spine executes inside the correctness gate; outputs
  * project only run-invariant columns (counts, token totals — never
  * scratch paths), keeping results deterministic.
  *
  * The streaming query has a DuckDB oracle: Complete-mode windowed
  * aggregation over the bounded event stream must equal the batch
  * tumbling-window query — exactly-once semantics made visible.
  */
object WdsQueries extends QueryRegistry {

  /** Scratch directory for shard round-trips, deleted on JVM exit (the
    * query result is lazy, so eager cleanup would race evaluation). */
  private def scratchDir(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  /** documents → pack-stage metadata (deterministic fake video paths;
    * text as caption). */
  private def docMeta(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(
        format_string("videos/%09d.mp4", col("doc_id")).as("video_path"),
        col("text").as("value"))

  /** E1 as a query: pack documents into 500-sample tars; report per-tar
    * sample counts by shard ordinal. */
  private def packStats(s: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("graft_e1")
    val info = PackStage.run(docMeta(s, dir), out,
      PackStage.PackOptions(numSegments = 4, samplesPerTar = 500))
    info.select(
      col("partition"),
      regexp_extract(col("url"), "-(\\d+)\\.tar$", 1).cast("int").as("shard"),
      col("nsamples"))
      .orderBy(col("partition"), col("shard"))
  }

  /** E1→read-back as a query: adjacency/interleave grouping over real
    * tar bytes; per-sample entry histogram. */
  private def roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("graft_rt")
    val info = PackStage.run(docMeta(s, dir), out,
      PackStage.PackOptions(numSegments = 4, samplesPerTar = 100))
    val urls = info.collect().map(_.getAs[String]("url")).toSeq.sorted
    // read back through the DataSource V2 path — format("wds") is what
    // the driver's gate exercises here
    s.read.format("wds").load(urls: _*)
      .select(col("key"), size(map_keys(col("entries"))).as("n_entries"))
      .groupBy(col("n_entries")).agg(count(lit(1)).as("n_samples"))
      .orderBy(col("n_entries"))
  }

  /** E1→E2 as a query: tokenize + greedy 8k packing; pack-level stats
    * (deterministic under the fixed single merge group). */
  private def tokenizePack(s: SparkSession, dir: String): DataFrame = {
    val packOut = scratchDir("graft_e1b")
    val tokOut = scratchDir("graft_e2")
    val info = PackStage.run(docMeta(s, dir), packOut,
      PackStage.PackOptions(numSegments = 4, samplesPerTar = 100))
    val urls = info.collect().map(_.getAs[String]("url")).toSeq.sorted
    val packed = WdsReader.readUrls(s, urls).coalesce(1)
    val tokInfo = TokenizeStage.run(packed, tokOut)
    val tokUrls = tokInfo.collect().map(_.getAs[String]("url")).toSeq.sorted
    CheckStage.checked(WdsReader.readUrls(s, tokUrls))
      .select(col("key"), col("n_tokens"), col("n_images"))
      .orderBy(col("key"))
  }

  /** E3 as a query: strict invariant gate + shard index over freshly
    * built tokenized shards. */
  private def indexCheck(s: SparkSession, dir: String): DataFrame = {
    val packOut = scratchDir("graft_e1c")
    val tokOut = scratchDir("graft_e3")
    val info = PackStage.run(docMeta(s, dir), packOut,
      PackStage.PackOptions(numSegments = 2, samplesPerTar = 100))
    val urls = info.collect().map(_.getAs[String]("url")).toSeq.sorted
    val tokInfo = TokenizeStage.run(WdsReader.readUrls(s, urls).coalesce(1), tokOut)
    val tokUrls = tokInfo.collect().map(_.getAs[String]("url")).toSeq.sorted
    CheckStage.index(WdsReader.readUrls(s, tokUrls), strict = true)
      .select(
        regexp_extract(col("url"), "([^/]+)\\.tar$", 1).as("shard"),
        col("nsamples"))
      .orderBy(col("shard"))
  }

  /** Streaming tumbling-window agg (Complete mode, AvailableNow) — must
    * equal the batch hourly query, so it shares its DuckDB oracle. */
  private def streamHourly(s: SparkSession, dir: String): DataFrame = {
    // stream from a parquet copy with micros timestamps (the nanos
    // source needs the same conversion the batch path applies)
    val stage = scratchDir("graft_stream")
    Tables(s, dir).events.write.mode("overwrite").parquet(stage)
    val name = "stream_hourly_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val result = EventStreams.runToMemory(s,
      EventStreams.hourlyCounts(EventStreams.readEventStream(s, stage)),
      name, org.apache.spark.sql.streaming.OutputMode.Complete())
    result.orderBy(col("hour"), col("event_type"))
  }

  private val streamHourlySql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      | count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Multimodal: synthesize per-doc PNGs (deterministic), decode +
    * feature-extract through the binary-column path. */
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val mkPng = udf { (id: Long) =>
      val px = Array.tabulate(3 * 4 * 3)(i => ((id * 31 + i) % 251).toByte)
      graft.wds.Codecs.encodeImage(
        graft.wds.Codecs.ImageData(3, 4, 3, "RGB", px), "png")
    }
    val media = Tables(s, dir).documents
      .select(col("doc_id").as("media_id"), mkPng(col("doc_id")).as("content"))
    MediaColumns.imageFeatures(media)
      .select(col("media_id"), col("height"), col("width"),
        col("nChannels"), round(col("mean_luma"), 4).as("mean_luma"))
      .orderBy(col("media_id"))
  }

  /** Multimodal: video frame sampling fan-out (segment-center math over
    * a synthetic decoder). */
  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    val media = Tables(s, dir).documents
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"))
    MediaColumns.sampleFrames(media, numSegments = 8)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("frame_index")).as("max_frame_index"))
      .orderBy(col("media_id"))
  }

  override val defs: Map[String, QueryDef] = Map(
    "wds01_pack_stats" -> QueryDef(packStats, None),
    "wds02_roundtrip" -> QueryDef(roundtrip, None, bench = true),
    "wds03_tokenize_pack" -> QueryDef(tokenizePack, None),
    "wds04_index_check" -> QueryDef(indexCheck, None),
    "st01_stream_hourly" -> QueryDef(streamHourly, Some(streamHourlySql)),
    "mm01_image_features" -> QueryDef(mediaFeatures, None),
    "mm02_frame_sample" -> QueryDef(frameSample, None),
  )
}

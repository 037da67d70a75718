package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 annual-ring measurement for the WdsPayloadPrune rule over REAL
  * pack-produced shards (round-13 directive #7 — FatProbe's 508× is a
  * synthetic 4-shard shape; this is the fixture-backed number at the
  * scale ring).
  *
  * Shape: the sf1 `documents` table (50k docs) packed by the engine's
  * own E1 stage (video-only sampler: `json` caption + `mp4` payload per
  * sample, 500/tar, aligned — the reference's production layout) with
  * 128 KiB deterministic media per doc → ~100 shards / ~6.4 GB. The
  * sweep is the metadata query every corpus audit runs: parse the json
  * caption, never touch the media. `select=*` blocks the rule (the
  * unpruned cost); the bare read lets the optimizer inject
  * `payload_select=[*.json]` and the scan seeks past every mp4.
  *
  * Prints bytes-read (Hadoop FS stats — page cache does not hide the
  * metric) and wall per run; the SCALE.md ring row records them. */
object Sf1PruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val mediaKb = sys.env.getOrElse("SPARK_GRAFT_PROBE_MEDIA_KB", "128").toInt
    // round-16 directive #5 (payload-size × byte-ratio sweep): the
    // 2 MiB arm at full sf1 doc count would need ~100 GB of scratch;
    // shrinking samples/tar instead keeps the SHARD COUNT at the sf1
    // ring's ~100 (the prune ratio is per-shard seek arithmetic —
    // payload size is the variable, shard count just multiplies)
    val perTar = sys.env.getOrElse("SPARK_GRAFT_PROBE_TAR_COUNT", "500").toLong
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("sf1-prune-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val out = java.nio.file.Files.createTempDirectory("sf1prune").toString
    val meta = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        format_string("videos/%09d.mp4", col("doc_id")).as("video_path"),
        col("text").as("value"))
    // deterministic pseudo-media: path-seeded bytes, incompressible-ish
    val mediaBytes = mediaKb * 1024
    val t0 = System.nanoTime()
    // the try opens BEFORE the pack: a mid-pack crash (disk-full is
    // the likely one on a constrained box) must also hit the cleanup
    try {
    val info = pack.PackStage.run(meta, out,
      pack.PackStage.PackOptions(
        samplerType = pack.PackStage.SamplerType.VideoOnly,
        samplesPerTar = perTar, alignShards = true),
      mediaFor = p => {
        val b = new Array[Byte](mediaBytes)
        val seed = p.hashCode.toLong
        val rnd = new java.util.Random(seed)
        rnd.nextBytes(b)
        b
      })
    val nShards = info.count()
    println(f"[sf1prune] packed $nShards shards in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs (media = $mediaKb KiB/doc)")

    val shardList = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).sorted
    println(f"[sf1prune] shard bytes total = " +
      f"${shardList.map(new java.io.File(_).length()).sum}%,d")

    def bytesRead: Long = {
      val s = org.apache.hadoop.fs.FileSystem
        .getGlobalStorageStatistics.get("file")
      if (s == null) 0L else s.getLong("bytesRead").longValue()
    }
    def run(label: String, select: Option[String]): Unit = {
      val base = spark.read.format("wds")
      val df = select.fold(base)(s => base.option("select", s))
        .load(shardList.toIndexedSeq: _*)
        .select(get_json_object(element_at(col("entries"), "json")
          .cast("string"), "$.caption").as("q"))
        .agg(count(lit(1)).as("n"), sum(length(col("q"))).as("chars"))
      val b0 = bytesRead; val t = System.nanoTime()
      val row = df.collect().head
      println(f"[sf1prune] $label%-8s rows=${row.getLong(0)}%,d " +
        f"chars=${row.getLong(1)}%,d bytes=${bytesRead - b0}%,d " +
        f"wall=${(System.nanoTime() - t) / 1e9}%6.2fs")
    }
    run("warmup", Some("*"))
    run("full", Some("*"))
    run("pruned", None)
    run("full2", Some("*"))
    run("pruned2", None)
    } finally {
      // scratch cleanup: ~6 GB of probe shards must not outlive the
      // run EVEN ON FAILURE — a crashed probe repeated on a
      // constrained box would otherwise fill /tmp. Recursive: the
      // pack stage may leave marker subdirectories.
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(out))
      spark.stop()
    }
  }
}

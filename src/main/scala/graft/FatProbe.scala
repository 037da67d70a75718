package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** one-off measurement: payload-prune vs full read over a fat shard */
object FatProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("fat-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("fatp").toString
    // 4 shards x 16 samples x (4 MB "mp4" + ~200 B json) = ~256 MB
    val payload = Array.fill[Byte](4 << 20)(3)
    for (sh <- 0 until 4) {
      val out = new java.io.FileOutputStream(f"$dir/shard-$sh%06d.tar")
      val w = new wds.TarIO.TarWriter(out)
      for (i <- 0 until 16)
        w.write(wds.Sample(f"$sh-$i%06d", "", Map(
          "json" -> s"""{"caption":"sample $sh-$i","n":$i}""".getBytes("UTF-8"),
          "mp4" -> payload)))
      w.close()
    }
    def bytes: Long = {
      val s = org.apache.hadoop.fs.FileSystem
        .getGlobalStorageStatistics.get("file")
      if (s == null) 0L else s.getLong("bytesRead").longValue()
    }
    def run(label: String, select: Option[String]): Unit = {
      val base = spark.read.format("wds")
      val df = select.fold(base)(s => base.option("select", s))
        .load(s"$dir/shard-{000000..000003}.tar")
        .select(get_json_object(element_at(col("entries"), "json")
          .cast("string"), "$.caption").as("cap"))
      val b0 = bytes; val t0 = System.nanoTime()
      val n = df.collect().length
      println(f"[fat] $label%-8s rows=$n bytes=${bytes - b0}%,d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    run("warmup", Some("*"))       // codegen/page-cache warmup
    run("full", Some("*"))         // select=* blocks the rule
    run("pruned", None)            // rule injects payload_select
    run("full2", Some("*"))
    run("pruned2", None)
    spark.stop()
  }
}

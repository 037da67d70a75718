package graft.pack

import java.nio.file.Files

import graft.SparkSpec
import graft.wds.WdsReader

/** alignShards total-order law: every tar must hold exactly its
  * ceil-chunk of the globally ordered input, written in ascending idx
  * order, even when a chunk straddles several upstream map partitions
  * (shuffle block fetch order is nondeterministic — only an explicit
  * within-partition sort guarantees this). */
class AlignShardsSpec extends SparkSpec {

  test("chunks straddling many map partitions still write in idx order") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // 16 sort partitions × chunk size 7 → every chunk straddles
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      val n = 60
      val spt = 7L
      val meta = (0 until n)
        .map(i => (f"videos/$i%09d.mp4", s"cap $i"))
        .toDF("video_path", "value")
        .repartition(16)
      val out = Files.createTempDirectory("align_order").toString
      PackStage.run(meta, out,
        PackStage.PackOptions(samplerType = PackStage.SamplerType.VideoOnly,
          samplesPerTar = spt, alignShards = true)).collect()

      val tars = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".tar")).map(_.toString).toSeq.sorted
      assert(tars.length == ((n + spt - 1) / spt).toInt)
      tars.zipWithIndex.foreach { case (url, p) =>
        val keys = WdsReader.readUrls(spark, Seq(url))
          .collect().map(_.key.toLong).toSeq
        val expect = (p * spt) until math.min(n.toLong, (p + 1) * spt)
        assert(keys == expect.toSeq,
          s"tar $p not the ascending global chunk: $keys")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}

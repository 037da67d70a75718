package graft.tokenize

import java.nio.file.Files

import graft.SparkSpec
import graft.pack.PackStage
import graft.wds.WdsReader
import org.apache.spark.sql.functions._

/** Parallel-packing correctness law: running E2 over N merge groups in
  * one multi-partition job must produce, group for group, exactly the
  * bins a serial per-shard run produces. This is the property wds11
  * exposes to the gate (as partition-invariant totals); here it is
  * asserted bin-by-bin. */
class TokenizeMultiSpec extends SparkSpec {

  private def packDir(): (Seq[String], String) = {
    import spark.implicits._
    val meta = (0 until 12)
      .map(i => (f"videos/$i%09d.mp4", s"caption words number $i repeated " * 3))
      .toDF("video_path", "value")
    val out = Files.createTempDirectory("tokmulti_pack").toString
    val info = PackStage.run(meta, out,
      PackStage.PackOptions(numSegments = 2, samplesPerTar = 3,
        alignShards = true))
    val urls = info.collect().map(_.getAs[String]("url")).toSeq.sorted
    (urls, out)
  }

  /** read tokenize output tars back as (key → json). Keys are
    * group-LOCAL ("<tarIdx within group>-<fileIdx>", the reference's
    * cached_key), so a group's map from a multi-group run must equal
    * the same shard's solo-run map VERBATIM. */
  private def binsOfFiles(files: Seq[String]): Map[String, String] =
    WdsReader.readUrls(spark, files).collect()
      .flatMap(s => s.utf8("json").map(j => s.key -> j))
      .toMap

  private def binsOf(dir: String): Map[String, String] =
    binsOfFiles(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).toSeq.sorted)

  test("multi-group tokenize-pack equals per-shard serial runs") {
    val (urls, _) = packDir()
    assert(urls.length == 4)

    // pick maxTokens so one doc always fits but two always flush —
    // derived from the actual per-doc token counts, not guessed
    val tok = Tokenizers.testTokenizer()
    val tokenCounts = (0 until 12).map { i =>
      val turns = graft.pack.Conversations.conversate(
        "<image>" * 2, s"caption words number $i repeated " * 3, "un")
      Tokenizers.tokenizeConversation(turns, tok)._1.length
    }
    val maxTok = tokenCounts.max + tokenCounts.min / 2
    assert(tokenCounts.min * 2 > maxTok)

    // one job, 4 merge groups (1 shard = 1 partition by construction)
    val multiOut = Files.createTempDirectory("tokmulti_m").toString
    val samples = WdsReader.readUrls(spark, urls)
    assert(samples.rdd.getNumPartitions == 4)
    TokenizeStage.run(samples, multiOut, maxTokens = maxTok).collect()

    // serial reference: each shard alone; the multi run's group g lives
    // in shard_g-000000.tar and must match the solo run key-for-key
    // (keys are group-local, so no normalization is needed)
    urls.zipWithIndex.foreach { case (url, g) =>
      val serialOut = Files.createTempDirectory(s"tokmulti_s$g").toString
      TokenizeStage.run(WdsReader.readUrls(spark, Seq(url)), serialOut,
        maxTokens = maxTok).collect()
      val serial = binsOf(serialOut)
      val multiGroup = binsOfFiles(Seq(s"$multiOut/shard_$g-000000.tar"))
      assert(multiGroup == serial, s"group $g diverges from serial run")
    }
  }
}

package graft.wds

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec

/** `pipe:` scheme parity (S8, gopen.py:153-330): subprocess stdout is
  * a first-class shard source, exit statuses surface as open errors
  * through the handler policy, SIGPIPE from early close is tolerated. */
class GopenSpec extends SparkSpec {

  private def writeTar(n: Int): String = {
    val dir = Files.createTempDirectory("gopen").toString
    val out = new java.io.FileOutputStream(s"$dir/shard.tar")
    val w = new TarIO.TarWriter(out)
    (0 until n).foreach { i =>
      w.write(Sample(f"$i%06d", "", Map(
        "txt" -> s"payload $i".getBytes(UTF_8))))
    }
    w.close()
    s"$dir/shard.tar"
  }

  test("pipe:cat streams a tar identically to the file: path") {
    val tar = writeTar(5)
    val direct = WdsReader.readUrls(spark, Seq(tar))
      .collect().map(s => s.key -> new String(s.entries("txt"), UTF_8))
    val piped = WdsReader.readUrls(spark, Seq(s"pipe:cat $tar"))
      .collect().map(s => s.key -> new String(s.entries("txt"), UTF_8))
    assert(piped.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
    assert(piped.length == 5)
  }

  test("pipe producer failure surfaces per handler policy") {
    val tar = writeTar(3)
    // reraise: the nonzero exit at EOF propagates
    val ex = intercept[org.apache.spark.SparkException] {
      WdsReader.readUrls(spark, Seq("pipe:false"),
        TarIO.ReadOptions(handler = Handler.Reraise)).collect()
    }
    assert(ex.getMessage.contains("pipe") ||
      Option(ex.getCause).exists(_.getMessage.contains("exited")))
    // continue: the bad shard is skipped, the good one read
    val got = WdsReader.readUrls(spark,
      Seq("pipe:false", s"pipe:cat $tar"),
      TarIO.ReadOptions(handler = Handler.WarnContinue)).collect()
    assert(got.length == 3)
  }

  test("DSv2 format(wds) reads pipe: urls") {
    val tar = writeTar(4)
    val df = spark.read.format("wds")
      .option("paths", s"pipe:cat $tar").load()
    assert(df.count() == 4)
  }

  test("http: scheme streams a tar identically to the file: path") {
    val tar = writeTar(6)
    val port = graft.queries.WdsQueries.httpFixturePort
    val url = s"http://127.0.0.1:$port$tar"
    val direct = WdsReader.readUrls(spark, Seq(tar))
      .collect().map(s => s.key -> new String(s.entries("txt"), UTF_8))
    val http = WdsReader.readUrls(spark, Seq(url))
      .collect().map(s => s.key -> new String(s.entries("txt"), UTF_8))
    assert(http.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
    // and through the DSv2 path
    assert(spark.read.format("wds").option("paths", url).load()
      .count() == 6)
  }

  test("early close tolerates SIGPIPE (slice stops the producer)") {
    val tar = writeTar(50)
    import SampleOps._
    val got = WdsReader.readUrls(spark, Seq(s"pipe:cat $tar"))
      .slice(3).collect()
    assert(got.length == 3)
  }
}

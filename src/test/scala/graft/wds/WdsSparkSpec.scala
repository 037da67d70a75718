package graft.wds

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import graft.wds.SampleOps._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Distributed wds surface: writer→reader round-trip through real files,
  * shard rolling, and the operator vocabulary on Dataset[Sample]. */
class WdsSparkSpec extends SparkSpec {

  private implicit lazy val enc: org.apache.spark.sql.Encoder[Sample] =
    Encoders.product[Sample]

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  private def mkSamples(n: Int): Seq[Sample] =
    (0 until n).map { i =>
      Sample(f"$i%09d", "mem",
        Map("cls" -> bytes((i % 10).toString), "txt" -> bytes(s"doc $i")))
    }

  test("WdsWriter→WdsReader round-trip preserves samples and rolls shards") {
    val dir = Files.createTempDirectory("wds").toString
    val in = mkSamples(100)
    val ds = spark.createDataset(in).repartition(2)
    val info = WdsWriter.write(ds, dir,
      WdsWriter.WriterOptions(maxCount = 20))
    val shards = info.collect()
    // 100 samples / 2 partitions / 20 per shard = ~5 shards (>= 5 if
    // partitions uneven)
    assert(shards.map(_.getAs[Long]("nsamples")).sum == 100)
    assert(shards.forall(_.getAs[Long]("nsamples") <= 20))
    assert(shards.length >= 5)

    // brace-expanded spec over-lists shards; missing ones are skipped
    // under IgnoreContinue (url_opener handler semantics)
    val back = WdsReader.read(spark,
      s"$dir/shard-{00000..00001}-{000000..000009}.tar",
      TarIO.ReadOptions(handler = Handler.IgnoreContinue))
    val out = back.collect().sortBy(_.key)
    assert(out.length == 100)
    assert(out.map(_.key).toSeq == in.map(_.key).sorted)
    val s0 = out.head
    assert(s0.utf8("txt").contains("doc 0"))
  }

  test("readUrlsGrouped: shard_size consecutive tars share one partition") {
    val dir = Files.createTempDirectory("wds-grp").toString
    WdsWriter.write(spark.createDataset(mkSamples(60)).repartition(1), dir,
      WdsWriter.WriterOptions(maxCount = 10)).collect()
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).sorted.toSeq
    assert(shards.length == 6)
    val grouped = WdsReader.readUrlsGrouped(spark, shards, groupSize = 3)
    assert(grouped.rdd.getNumPartitions == 2)
    assert(grouped.count() == 60)
    // partition boundaries follow the grouping: first 30 keys in p0
    val byPart = grouped.rdd.mapPartitionsWithIndex((p, it) =>
      it.map(s => (p, s.key))).collect()
    assert(byPart.filter(_._1 == 0).map(_._2).sorted.toSeq ==
      mkSamples(60).map(_.key).sorted.take(30))
  }

  test("writes leave no stray temp files (attempt-scoped rename commits)") {
    val dir = Files.createTempDirectory("wds-tmp").toString
    WdsWriter.write(spark.createDataset(mkSamples(40)).repartition(3), dir,
      WdsWriter.WriterOptions(maxCount = 7)).collect()
    // Hadoop's local FS adds .crc sidecars; the invariant is that no
    // attempt-scoped temp survives a successful commit
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.endsWith(".crc"))
    assert(names.nonEmpty)
    assert(names.forall(n => n.endsWith(".tar") && !n.contains(".tmp-")),
      names.mkString(", "))
  }

  test("gzip shards round-trip (.tar.gz write + transparent gunzip read)") {
    val dir = Files.createTempDirectory("wds-gz").toString
    val in = mkSamples(30)
    WdsWriter.write(spark.createDataset(in).repartition(1), dir,
      WdsWriter.WriterOptions(
        maxCount = 10,
        pattern = (p, i) => f"shard-$p%05d-$i%06d.tar.gz",
        tar = TarIO.WriteOptions(gzip = true))).collect()
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar.gz")).map(_.toString).sorted.toSeq
    assert(shards.length == 3)
    // compressed: a 10-sample gz shard of tiny text must undercut the
    // uncompressed tar's 512-byte-per-entry framing
    assert(new java.io.File(shards.head).length() < 10 * 2 * 512)
    val back = WdsReader.readUrls(spark, shards).collect().sortBy(_.key)
    assert(back.length == 30)
    assert(back.map(_.key).toSeq == in.map(_.key).sorted)
    assert(back.head.utf8("txt").contains("doc 0"))
  }

  test("shard-open error matrix: continue skips, stop truncates, reraise throws") {
    val dir = Files.createTempDirectory("wds-open").toString
    val in = mkSamples(10)
    WdsWriter.write(spark.createDataset(in).repartition(1), dir,
      WdsWriter.WriterOptions(maxCount = 5)).collect()
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).sorted.toSeq
    assert(shards.length == 2)
    val urls = Seq(shards.head, s"$dir/missing.tar", shards(1))
    val conf = spark.sparkContext.hadoopConfiguration
    def run(h: Handler): Seq[String] =
      WdsReader.readPartition(urls.iterator, conf,
        TarIO.ReadOptions(handler = h)).map(_.key).toSeq
    // continue: the bad shard is skipped, both good shards are read
    assert(run(Handler.IgnoreContinue).length == 10)
    // stop: the stream truncates at the failure — only the first shard
    assert(run(Handler.IgnoreStop).length == 5)
    assertThrows[Exception](run(Handler.Reraise))
  }

  test("toTuple coalesces alternatives; missing field raises") {
    val ds = spark.createDataset(Seq(
      Sample("a", "u", Map("jpg" -> bytes("J"), "json" -> bytes("{}"))),
      Sample("b", "u", Map("png" -> bytes("P"), "json" -> bytes("{}")))))
    val got = ds.toTuple("jpg;png", "json").collect()
    assert(got.map(r => new String(r.getAs[Array[Byte]]("jpg"), UTF_8))
      .sorted.toSeq == Seq("J", "P"))
    val bad = spark.createDataset(Seq(
      Sample("c", "u", Map("json" -> bytes("{}")))))
    assertThrows[Exception](bad.toTuple("jpg;png").collect())
  }

  test("toDict keeps matching suffixes only") {
    val ds = spark.createDataset(mkSamples(5))
    val kept = ds.toDict("cls").collect()
    assert(kept.forall(_.entries.keySet == Set("cls")))
  }

  test("renameKeys with glob patterns, mustMatch, duplicate detection") {
    val ds = spark.createDataset(Seq(
      Sample("a", "u", Map("input.jpg" -> bytes("1"), "meta.json" -> bytes("{}")))))
    val out = ds.renameKeys(Seq("image" -> "*.jpg", "meta" -> "*.json"))
      .collect().head
    assert(out.entries.keySet == Set("image", "meta"))
    assertThrows[org.apache.spark.SparkException](
      ds.renameKeys(Seq("nope" -> "*.txt")).collect())
  }

  test("associate joins broadcast metadata by key") {
    val ds = spark.createDataset(mkSamples(4))
    import spark.implicits._
    val lookup = Seq(("000000000", "cat"), ("000000001", "dog"))
      .toDF("key", "label")
    val out = ds.associate(lookup).orderBy("key").collect()
    assert(out.length == 4)
    assert(out.head.getAs[String]("label") == "cat")
    assert(out(2).getAs[String]("label") == null)
  }

  test("shuffled is a seed-deterministic permutation") {
    val ds = spark.createDataset(mkSamples(50))
    val a = ds.shuffled(7L).collect().map(_.key).toSeq
    val b = ds.shuffled(7L).collect().map(_.key).toSeq
    val c = ds.shuffled(8L).collect().map(_.key).toSeq
    assert(a == b)
    assert(a != c)
    assert(a.sorted == mkSamples(50).map(_.key).sorted)
  }

  test("rsample keeps a seed-stable subset; slice limits") {
    val ds = spark.createDataset(mkSamples(100))
    val n1 = ds.rsample(0.3).count()
    val n2 = ds.rsample(0.3).count()
    assert(n1 == n2)
    assert(n1 > 5 && n1 < 60)
    assert(ds.slice(7).count() == 7)
  }

  test("mixWith unions sources; roundRobin interleaves deterministically") {
    val a = spark.createDataset(mkSamples(10))
    val b = spark.createDataset((0 until 10).map(i =>
      Sample(f"B$i%08d", "u2", Map("txt" -> bytes(s"b $i")))))
    val mixed = a.mixWith(Seq((b, 1.0)), seed = 3L).collect()
    assert(mixed.length == 20)
    // equal weights must mean ~equal CONTRIBUTIONS even when sources
    // have very different sizes (RandomMix is size-independent): the
    // 200-sample source is downsampled toward the 10-sample source
    val big = spark.createDataset((0 until 200).map(i =>
      Sample(f"C$i%08d", "u3", Map("txt" -> bytes(s"c $i")))))
    val skewMix = a.mixWith(Seq((big, 1.0)), seed = 3L).collect()
    val nBig = skewMix.count(_.key.startsWith("C"))
    assert(nBig < 40, s"big source contributed $nBig of ${skewMix.length}")
    val rr = a.roundRobinWith(b).collect().map(_.key).toSeq
    assert(rr.length == 20)
    // positions alternate source A (digits) and source B
    assert(rr.take(2).count(_.startsWith("B")) == 1)
  }

  test("validSamples drops empty-entry samples") {
    val ds = spark.createDataset(Seq(
      Sample("a", "u", Map("txt" -> bytes("x"))),
      Sample("b", "u", Map.empty)))
    assert(ds.validSamples.collect().map(_.key).toSeq == Seq("a"))
  }

  test("seekable close registry: exhausted readers deregister (stay " +
      "GC-able); only the early-stopped one waits for task end") {
    // a task that walks many shards must not accumulate one completion
    // listener (pinning the TarFile) per EXHAUSTED reader
    val dir = Files.createTempDirectory("wds_reg").toString
    (0 until 3).foreach { i =>
      val out = new java.io.FileOutputStream(s"$dir/t$i.tar")
      val w = new TarIO.TarWriter(out)
      (0 until 3).foreach(j =>
        w.write(Sample(f"$j%03d", "", Map("txt" -> bytes(s"v$i$j")))): Unit)
      w.close()
    }
    val counts = spark.sparkContext.parallelize(Seq(0), 1)
      .mapPartitions { _ =>
        val sizes = Seq.newBuilder[Int]
        (0 until 3).foreach { i =>
          val ch = java.nio.channels.FileChannel.open(
            java.nio.file.Paths.get(s"$dir/t$i.tar"))
          val it = TarIO.entriesSeekable(ch, s"t$i",
            TarIO.ReadOptions(selectFiles = Some(_ => true)))
          if (i < 2) while (it.hasNext) it.next() // exhaust → deregister
          else { assert(it.hasNext); it.next(): Unit } // leave open
          sizes += TarIO.TaskCloseRegistry.openCount
        }
        Iterator.single(sizes.result())
      }.collect().head
    // after each exhausted reader the registry is empty again; the
    // early-stopped third stays registered for the task-end listener
    assert(counts == Seq(0, 0, 1), counts.toString)
  }
}

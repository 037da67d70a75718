package graft.wds

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** DataSource V2 `wds` format: format("wds") read, shard-per-partition
  * planning, select pushdown, column pruning, handler policies. */
class WdsDataSourceSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("wdsv2").toString
    implicit val enc = Encoders.product[Sample]
    val samples = (0 until 60).map { i =>
      Sample(f"$i%09d", "",
        Map("cls" -> bytes((i % 7).toString), "txt" -> bytes(s"text $i"),
          "bin" -> bytes("blob")))
    }
    WdsWriter.write(spark.createDataset(samples).repartition(1), d,
      WdsWriter.WriterOptions(maxCount = 25,
        pattern = (p, i) => f"part-$i%03d.tar")).collect()
    d
  }

  test("format(wds).load with brace spec reads all samples") {
    val df = spark.read.format("wds").load(s"$dir/part-{000..002}.tar")
    assert(df.count() == 60)
    assert(df.schema.fieldNames.toSeq == Seq("key", "url", "entries"))
    val first = df.orderBy("key").collect().head
    assert(first.getAs[String]("key") == "000000000")
    assert(new String(first.getAs[Map[String, Array[Byte]]]("entries")("txt"),
      UTF_8) == "text 0")
  }

  test("one shard = one input partition") {
    val df = spark.read.format("wds").load(s"$dir/part-{000..002}.tar")
    assert(df.rdd.getNumPartitions == 3)
  }

  test("select option pushes entry filtering into the tar scan") {
    val df = spark.read.format("wds")
      .option("select", "*.cls,*.txt")
      .load(s"$dir/part-{000..002}.tar")
    val keys = df.select(map_keys(col("entries"))).collect()
      .flatMap(_.getSeq[String](0)).toSet
    assert(keys == Set("cls", "txt"))
  }

  test("column pruning skips entry payloads for key-only queries") {
    val df = spark.read.format("wds").load(s"$dir/part-{000..002}.tar")
      .select("key", "url")
    assert(df.count() == 60)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan wds[key") && !plan.contains("entries"),
      plan)
  }

  test("missing shards skip under handler=ignore_continue, fail by default") {
    val lenient = spark.read.format("wds")
      .option("handler", "ignore_continue")
      .load(s"$dir/part-{000..009}.tar")
    assert(lenient.count() == 60)
    val strict = spark.read.format("wds").load(s"$dir/part-{000..009}.tar")
    assertThrows[org.apache.spark.SparkException](strict.count())
  }

  test("url filters prune shards at planning (partition pruning analog)") {
    import org.apache.spark.sql.functions.col
    val all = spark.read.format("wds").load(s"$dir/part-{000..002}.tar")
    assert(all.rdd.getNumPartitions == 3)
    val one = all.filter(col("url").endsWith("part-001.tar"))
    // only the matching shard is planned — not scanned-then-filtered
    assert(one.rdd.getNumPartitions == 1)
    val direct = spark.read.format("wds").load(s"$dir/part-001.tar").count()
    assert(one.count() == direct)
    val none = all.filter(col("url").contains("nonexistent"))
    assert(none.count() == 0)
  }

  test("multi-path load (Spark passes a JSON array in the paths option)") {
    val df = spark.read.format("wds")
      .load(s"$dir/part-000.tar", s"$dir/part-001.tar")
    assert(df.count() == 50)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("DSv2 write: format(wds).save round-trips with shard rolling") {
    import spark.implicits._
    val out = Files.createTempDirectory("wdsv2w").toString
    val src = spark.read.format("wds").load(s"$dir/part-{000..002}.tar")
    src.repartition(2)
      .write.format("wds").option("maxcount", "15")
      .mode("overwrite").save(out)
    // ignore the local FS's .crc checksum sidecars
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.nonEmpty && files.forall(_.endsWith(".tar")))
    val back = spark.read.format("wds").load(
      files.map(f => s"$out/$f").toIndexedSeq: _*)
    assert(back.count() == 60)
    // per-shard counts respect the roll limit
    val perShard = back.groupBy("url").count().collect()
      .map(_.getAs[Long]("count"))
    assert(perShard.forall(_ <= 15))
    // overwrite truncates
    src.limit(5).repartition(1)
      .write.format("wds").mode("overwrite").save(out)
    val files2 = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files2.length == 1)
  }

  test("SQL over the wds source") {
    spark.read.format("wds").load(s"$dir/part-{000..002}.tar")
      .createOrReplaceTempView("shards")
    val n = spark.sql(
      "SELECT count(*) FROM shards WHERE decode(entries['cls'], 'UTF-8') = '3'")
      .collect().head.getLong(0)
    assert(n == (0 until 60).count(_ % 7 == 3))
  }

  private def writeShard(d: String, name: String, keys: Range): Unit = {
    implicit val enc = Encoders.product[Sample]
    val samples = keys.map(i =>
      Sample(f"$i%09d", "", Map("txt" -> bytes(s"text $i"))))
    WdsWriter.write(spark.createDataset(samples).repartition(1), d,
      WdsWriter.WriterOptions(maxCount = 1000,
        pattern = (_, _) => name)).collect()
  }

  test("readStream(wds): url-watermark offsets resume across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("wdsstream").toString
    val ckpt = Files.createTempDirectory("wdsstream_ck").toString
    val sink = Files.createTempDirectory("wdsstream_out").toString
    writeShard(d, "shard-000000.tar", 0 until 3)
    def runOnce(): Seq[String] = {
      // parquet sink: recoverable, so the restarted query resumes from
      // the checkpointed url watermark (memory sink forbids recovery)
      val q = spark.readStream.format("wds").load(d)
        .select(col("key"))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(sink).collect().map(_.getString(0)).toSeq.sorted
    }
    assert(runOnce() == (0 until 3).map(i => f"$i%09d"))
    // a new shard lands with the next monotone name; the restarted
    // stream on the SAME checkpoint picks up exactly the new samples
    writeShard(d, "shard-000001.tar", 3 until 8)
    assert(runOnce() == (0 until 8).map(i => f"$i%09d"))
    // nothing new -> no duplicates, no re-read
    assert(runOnce() == (0 until 8).map(i => f"$i%09d"))
  }

  test("streaming re-shard: readStream(wds) -> writeStream(wds) re-chunks") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("wdsrs_src").toString
    val dst = Files.createTempDirectory("wdsrs_dst").toString
    val ckpt = Files.createTempDirectory("wdsrs_ck").toString
    // two source shards -> two input partitions in the first epoch
    writeShard(src, "shard-000000.tar", 0 until 10)
    writeShard(src, "shard-000001.tar", 10 until 20)
    def runOnce(): Unit = {
      val q = spark.readStream.format("wds").load(src)
        .writeStream.format("wds")
        .option("path", dst)
        .option("maxcount", "6")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    def shardNames = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.getName).sorted.toSeq
    val epoch0 = shardNames
    // epoch-primary padded names: lexicographic == (epoch, partition,
    // task, shard) — the chained-readStream watermark contract
    assert(epoch0.forall(
      _.matches("part-e\\d{9}-\\d{5}-\\d{9}-\\d{6}\\.tar")), epoch0)
    // a later epoch's shards all sort after every earlier shard
    writeShard(src, "shard-000002.tar", 20 until 31)
    runOnce()
    val all = shardNames
    val epoch1 = all.diff(epoch0)
    assert(epoch1.nonEmpty && epoch0.max < epoch1.min,
      s"epoch names not monotone: ${epoch0.max} vs ${epoch1.min}")
    // nothing staged left behind; full content round-trips
    assert(!new java.io.File(dst, ".staging").exists() ||
      new java.io.File(dst, ".staging").listFiles().isEmpty)
    val shardPaths = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).sorted
    val back = spark.read.format("wds").load(shardPaths: _*)
    val keys = back.select("key").collect().map(_.getString(0)).toSeq.sorted
    assert(keys == (0 until 31).map(i => f"$i%09d"))
  }

  test("stream watermark uses NATURAL order: unpadded shard-10 follows shard-9") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("wdsnat").toString
    val ckpt = Files.createTempDirectory("wdsnat_ck").toString
    val sink = Files.createTempDirectory("wdsnat_out").toString
    // 11 shards with UNPADDED numbers (PackStage's reference-parity
    // naming): lexicographic order would put shard-10 before shard-2
    // and a restarted stream would drop it below the watermark
    for (i <- 0 to 9) writeShard(d, s"shard-$i-000000.tar", i until (i + 1))
    def runOnce(): Seq[String] = {
      val q = spark.readStream.format("wds").load(d)
        .select(col("key"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(sink).collect().map(_.getString(0)).toSeq.sorted
    }
    assert(runOnce().length == 10)
    writeShard(d, "shard-10-000000.tar", 10 until 12)
    assert(runOnce() == (0 until 12).map(i => f"$i%09d"))
    // natural order invariants incl. padding tie-break totality
    import graft.wds.datasource.NaturalOrder
    assert(NaturalOrder.compare("shard-10-000000.tar", "shard-9-000000.tar") > 0)
    assert(NaturalOrder.compare("shard-2-000000.tar", "shard-10-000000.tar") < 0)
    assert(NaturalOrder.compare("shard-01.tar", "shard-1.tar") != 0)
    assert(NaturalOrder.compare("a-5b", "a-5b") == 0)
  }

  test("streaming write in Complete mode replaces prior epochs") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("wdscm_src").toString
    val dst = Files.createTempDirectory("wdscm_dst").toString
    val ckpt = Files.createTempDirectory("wdscm_ck").toString
    writeShard(src, "shard-000000.tar", 0 until 5)
    def runOnce(): Unit = {
      val agg = spark.readStream.format("wds").load(src)
        .groupBy().count()
        .select(lit("totals").as("key"), lit("").as("url"),
          map(lit("count.txt"),
            encode(col("count").cast("string"), "UTF-8")).as("entries"))
      val q = agg.writeStream.format("wds")
        .outputMode("complete")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    writeShard(src, "shard-000001.tar", 5 until 12)
    runOnce()
    val shards = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString)
    // Complete mode = snapshot: exactly ONE current shard, count = 12
    assert(shards.length == 1, shards.mkString(","))
    val row = spark.read.format("wds").load(shards.head).collect().head
    val entries = row.getAs[Map[String, Array[Byte]]]("entries")
    assert(new String(entries("count.txt"), UTF_8) == "12")
  }

  test("stale .staging orphans are swept at stream start") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("wdsorph_src").toString
    val dst = Files.createTempDirectory("wdsorph_dst").toString
    val ckpt = Files.createTempDirectory("wdsorph_ck").toString
    writeShard(src, "shard-000000.tar", 0 until 4)
    // plant orphans a dead attempt would leave: abort only deletes
    // files NAMED in commit messages, so these survive a crash
    val staging = new java.io.File(dst, ".staging")
    assert(staging.mkdirs())
    val orphan = new java.io.File(staging,
      "part-e000000000-00000-000000042-000000.tar")
    Files.write(orphan.toPath, Array.fill(16)(0: Byte))
    val junk = new java.io.File(staging, "part-e-garbage.tar")
    Files.write(junk.toPath, Array.fill(4)(1: Byte))
    val q = spark.readStream.format("wds").load(src)
      .writeStream.format("wds")
      .option("path", dst)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(!orphan.exists() && !junk.exists(),
      "stream start did not sweep stale .staging orphans")
    // the epoch's real shards still committed
    val shards = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".tar"))
    assert(shards.nonEmpty)
  }

  test("Complete mode retainepochs=2 keeps one prior epoch as a " +
    "chained-reader grace window") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("wdsret_src").toString
    val dst = Files.createTempDirectory("wdsret_dst").toString
    val ckpt = Files.createTempDirectory("wdsret_ck").toString
    def runOnce(): Unit = {
      val agg = spark.readStream.format("wds").load(src)
        .groupBy().count()
        .select(lit("totals").as("key"), lit("").as("url"),
          map(lit("count.txt"),
            encode(col("count").cast("string"), "UTF-8")).as("entries"))
      val q = agg.writeStream.format("wds")
        .outputMode("complete")
        .option("path", dst)
        .option("retainepochs", "2")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def epochsPresent: Seq[Long] = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".tar")).toSeq
      .map(_.getName.stripPrefix("part-e").takeWhile(_.isDigit).toLong)
      .distinct.sorted
    writeShard(src, "shard-000000.tar", 0 until 3)
    runOnce()
    writeShard(src, "shard-000001.tar", 3 until 7)
    runOnce()
    assert(epochsPresent.length == 2, s"want 2 epochs: $epochsPresent")
    writeShard(src, "shard-000002.tar", 7 until 9)
    runOnce()
    val eps = epochsPresent
    assert(eps.length == 2 && eps.min > 0,
      s"oldest epoch not dropped past the grace window: $eps")
  }
}

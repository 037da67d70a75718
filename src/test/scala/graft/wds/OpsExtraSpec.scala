package graft.wds

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import graft.pack.Samplers
import graft.wds.SampleOps._
import org.apache.spark.sql.Encoders

/** Coverage for the remaining operator vocabulary: MultiShardSample,
  * batched/unbatched, repeat/with_epoch, observe taps, black-frame
  * synthesis. */
class OpsExtraSpec extends SparkSpec {

  private implicit lazy val enc: org.apache.spark.sql.Encoder[Sample] =
    Encoders.product[Sample]

  private def mkSamples(n: Int, tag: String = ""): Seq[Sample] =
    (0 until n).map(i =>
      Sample(f"$tag$i%07d", "u", Map("txt" -> s"d $i".getBytes(UTF_8))))

  test("MultiShardSample: yaml parse, choose/resample, deterministic") {
    val dirA = Files.createTempDirectory("msA").toString
    val dirB = Files.createTempDirectory("msB").toString
    WdsWriter.write(spark.createDataset(mkSamples(40, "a")).repartition(1),
      dirA, WdsWriter.WriterOptions(maxCount = 10,
        pattern = (_, i) => f"a-$i%02d.tar")).collect()
    WdsWriter.write(spark.createDataset(mkSamples(20, "b")).repartition(1),
      dirB, WdsWriter.WriterOptions(maxCount = 10,
        pattern = (_, i) => f"b-$i%02d.tar")).collect()
    val yaml =
      s"""datasets:
         |  - name: corpusA
         |    shards: $dirA/a-{00..03}.tar
         |    choose: 2
         |  - name: corpusB
         |    shards: $dirB/b-{00..01}.tar
         |""".stripMargin
    val spec = MultiShardSample.parseYaml(yaml)
    assert(spec.sources.map(_.name) == Seq("corpusA", "corpusB"))
    assert(spec.sources.head.shards.size == 4)
    val r1 = MultiShardSample.resolve(spec, seed = 5L)
    val r2 = MultiShardSample.resolve(spec, seed = 5L)
    assert(r1 == r2)
    assert(r1.size == 4) // 2 chosen + 2 full
    val ds = MultiShardSample.read(spark, yaml, seed = 5L)
    assert(ds.count() == 40) // 2×10 from A + 20 from B
    // resample draws with replacement
    val spec2 = spec.copy(sources = spec.sources.map(s =>
      s.copy(choose = None, resample = Some(8))))
    assert(MultiShardSample.resolve(spec2, 1L).size == 16)
  }

  test("wds16's seed-17 selection pin: A{1,3} chosen, B{0,1,2} resampled") {
    // the wds16 oracle inlines this exact Random(17) outcome — if a
    // scala-library RNG change ever shifts it, fail HERE with a clear
    // message instead of as an opaque gate hash mismatch
    val spec = MultiShardSample.Spec(Seq(
      MultiShardSample.SourceSpec("a",
        (0 until 4).map(i => s"A$i"), choose = Some(2)),
      MultiShardSample.SourceSpec("b",
        (0 until 4).map(i => s"B$i"), resample = Some(3))))
    assert(MultiShardSample.resolve(spec, seed = 17L).sorted ==
      Seq("A1", "A3", "B0", "B1", "B2"),
      "Random(17) outcome moved — update wds16's oracle chunk literals")
  }

  test("wds30's seed-17 global-shuffle pin: [A0,A1,A2,B0,B1] -> " +
    "[A0,A2,B1,B0,A1]") {
    // the wds30 oracle inlines this exact 5-element Random(17) shuffle
    // (plain sources consume NO rng before the final shuffle) — if a
    // scala-library RNG change ever shifts it, fail HERE with a clear
    // message instead of as an opaque gate hash mismatch
    val spec = MultiShardSample.Spec(Seq(
      MultiShardSample.SourceSpec("a", Seq("A0", "A1", "A2")),
      MultiShardSample.SourceSpec("b", Seq("B0", "B1"))))
    assert(MultiShardSample.resolve(spec, seed = 17L) ==
      Seq("A0", "A2", "B1", "B0", "A1"),
      "Random(17) shuffle moved — update wds30's oracle position literals")
  }

  test("batched/unbatched round-trip; partial batch control") {
    val ds = spark.createDataset(mkSamples(25)).repartition(1)
    val full = ds.batched(10)
    assert(full.collect().map(_.samples.size).sorted.toSeq == Seq(5, 10, 10))
    val noPartial = ds.batched(10, partial = false)
    assert(noPartial.collect().forall(_.samples.size == 10))
    val back = ds.unbatchedFrom(full)
    assert(back.count() == 25)
  }

  test("repeated and withEpoch bound the stream") {
    val ds = spark.createDataset(mkSamples(10))
    assert(ds.repeated(3).count() == 30)
    assert(ds.withEpoch(25).count() == 25)
    assert(ds.withEpoch(5).count() == 5)
  }

  test("epochs: second epoch reads DISK_ONLY-cached samples, not shards") {
    val dir = Files.createTempDirectory("msEp").toString
    WdsWriter.write(spark.createDataset(mkSamples(60, "e")).repartition(2),
      dir, WdsWriter.WriterOptions(maxCount = 20,
        pattern = (p, i) => f"e-$p%d-$i%02d.tar")).collect()
    val urls = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).sorted.toSeq
    val ds = spark.read.format("wds").load(urls: _*).as[Sample]
    val (handle, eps) = ds.epochs(2, seed = 7L)
    try {
      // epoch 0 materializes the cache
      assert(eps(0).count() == 60)
      // match on the DISK_ONLY storage level, not "first cached RDD":
      // the shared test session may carry memory-backed caches from
      // earlier suites (CheckStage.index, CurationQueries.exploded)
      val info = spark.sparkContext.getRDDStorageInfo
        .find(i => i.numCachedPartitions > 0 &&
          i.storageLevel.useDisk && !i.storageLevel.useMemory)
      assert(info.nonEmpty, "no DISK_ONLY-cached RDD after first epoch")
      assert(info.get.diskSize > 0, s"no disk blocks: $info")
      // epoch 1's plan scans the InMemoryRelation, not the wds source
      // (AQE off for the check: AdaptiveSparkPlanExec hides its subtree
      // from collect; it changes planning introspection, not semantics)
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan2 =
        try eps(1).queryExecution.executedPlan
        finally spark.conf.set("spark.sql.adaptive.enabled", prev)
      val cachedScan = plan2.collectFirst {
        case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
      }
      assert(cachedScan.nonEmpty, s"second epoch not cache-backed:\n$plan2")
      assert(plan2.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.isEmpty, "second epoch still scans the shard source")
      // deterministic per-epoch orders, distinct across epochs
      val o0 = eps(0).select("key").collect().map(_.getString(0)).toSeq
      val o1 = eps(1).select("key").collect().map(_.getString(0)).toSeq
      assert(o0.sorted == o1.sorted && o0 != o1)
      assert(o0 == eps(0).select("key").collect().map(_.getString(0)).toSeq)
    } finally { handle.unpersist(); () }
  }

  test("observed registers metrics without changing results") {
    val ds = spark.createDataset(mkSamples(12))
    val obs = ds.observed("tap")
    assert(obs.count() == 12)
  }

  test("quarantine transform routes failures to data, keeps clean rows") {
    val ds = spark.createDataset(mkSamples(10))
    val (good, bad) = ds.mapSamplesQuarantined { s =>
      if (s.key.endsWith("3")) throw new IllegalStateException("boom")
      s.copy(url = "ok")
    }
    assert(good.count() == 9)
    assert(good.collect().forall(_.url == "ok"))
    val q = bad.collect()
    assert(q.length == 1)
    assert(q.head.getAs[String]("key") == "0000003")
    assert(q.head.getAs[String]("error").contains("boom"))
  }

  test("black-frame synthesis and path normalization") {
    assert(Samplers.parseBlackBackground("Black background: 8, 6")
      .contains((8, 6)))
    assert(Samplers.parseBlackBackground("videos/x.mp4").isEmpty)
    val img = Codecs.decodeImage(Samplers.blackFrame(8, 6))
    assert(img.width == 8 && img.height == 6)
    assert(img.data.forall(_ == 0))
    assert(Samplers.normalizeMediaPath("x/data//y.jpg") == "x/data/y.jpg")
    val viaSynth = Samplers.resolveImage("Black background: 4, 4",
      _ => fail("loader must not be called"))
    assert(viaSynth.nonEmpty)
  }
}

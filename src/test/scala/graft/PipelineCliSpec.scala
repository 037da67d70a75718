package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The user-facing CLI contract: the reference's three stages run
  * back-to-back through `Pipeline.run` with reference-shaped flags. */
class PipelineCliSpec extends SparkSpec {

  test("pack → tokenize → check through the CLI surface") {
    // internvid-style jsonl metadata
    val metaDir = Files.createTempDirectory("cli_meta").toString
    import spark.implicits._
    (0 until 12)
      .map(i => (f"vid$i%04d", "0:01", "0:09",
        s"a caption about scene $i with words " * 3))
      .toDF("YoutubeID", "Start_timestamp", "End_timestamp", "Caption")
      .write.mode("overwrite").json(metaDir)

    val packOut = Files.createTempDirectory("cli_pack").toString
    val packInfo = Pipeline.run(spark, Map(
      "stage" -> "pack", "dataset" -> "internvid",
      "meta-path" -> metaDir, "prefix" -> "videos/",
      "type" -> "un", "num-segments" -> "2",
      "save-path" -> packOut, "samples-per-tar" -> "4",
      "align-shards" -> "true", "synthetic-media" -> "true"))
    assert(packInfo.agg(sum("nsamples")).collect().head.getLong(0) == 12)

    val tokOut = Files.createTempDirectory("cli_tok").toString
    val tokInfo = Pipeline.run(spark, Map(
      "stage" -> "tokenize", "input" -> s"$packOut/shard-{0..2}-000000.tar",
      "save-path" -> tokOut, "max-tokens" -> "600"))
    assert(tokInfo.count() > 0)

    val idxOut = Files.createTempDirectory("cli_idx").toString
    val pklPath = s"$idxOut/index.pkl"
    val tokShards = new java.io.File(tokOut).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).sorted
    val idx = Pipeline.run(spark, Map(
      "stage" -> "check", "input" -> tokShards.mkString("::"),
      "pickle-index" -> pklPath, "save-path" -> idxOut))
    assert(idx.count() > 0)
    assert(new java.io.File(idxOut).listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // --pickle-index writes the reference's .pkl artifact
    // (list[dict(url, nsamples)], check_pair.py:66) — decode it with
    // the JVM codec and diff against the parquet index
    val pkl = graft.wds.Pickle.decode(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pklPath)))
      .asInstanceOf[Vector[Any]]
      .map(d => {
        val m = graft.wds.Pickle.toMap(d)
        m("url").asInstanceOf[String] -> m("nsamples").asInstanceOf[Long]
      })
    val fromParquet = idx.select("url", "nsamples").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(pkl == fromParquet && pkl.nonEmpty)
    // ...and the read seam: our own artifact round-trips through
    // CheckStage.readPickleIndex
    val back = graft.index.CheckStage.readPickleIndex(spark, pklPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(back == fromParquet)
    // ...and a CPython-PRODUCED index (pickle.dumps of the fleet's
    // list[dict] shape) parses identically — the reverse migration
    // path for users bringing existing .pkl indexes
    val cpy = ("80049576000000000000005d94287d94288c0375726c948c24733" +
      "33a2f2f6275636b65742f686f77326c696e6b2f73686172645f302d302d332e" +
      "746172948c086e73616d706c6573944df305757d942868028c2473333a2f2f6" +
      "275636b65742f686f77326c696e6b2f73686172645f302d332d362e74617294" +
      "68044dda0575652e")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val cpyPath = s"$idxOut/cpython.pkl"
    java.nio.file.Files.write(java.nio.file.Paths.get(cpyPath), cpy)
    val ref = graft.index.CheckStage.readPickleIndex(spark, cpyPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(ref == Seq(
      "s3://bucket/how2link/shard_0-0-3.tar" -> 1523L,
      "s3://bucket/how2link/shard_0-3-6.tar" -> 1498L))
  }

  test("readPickleIndex: protocol-0 legacy index parses; an oversized " +
      "path is refused before buffering") {
    val dir = Files.createTempDirectory("pkl_legacy").toString
    // CPython pickle.dumps([{url, nsamples}...], protocol=0)
    val p0 = ("286c70300a286470310a5675726c0a70320a5673686172642d302d30" +
      "2d3530302d302e7461720a70330a73566e73616d706c65730a70340a4935303" +
      "00a7361286470350a67320a5673686172642d302d3530302d313030302d312e" +
      "7461720a70360a7367340a493439390a73612e")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val p0Path = s"$dir/legacy.pkl"
    Files.write(java.nio.file.Paths.get(p0Path), p0)
    val got = graft.index.CheckStage.readPickleIndex(spark, p0Path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("shard-0-0-500-0.tar" -> 500L,
      "shard-0-500-1000-1.tar" -> 499L))
    // a shard-sized file is refused by the ceiling, not buffered then
    // rejected by the decoder (sparse-ish: just over the limit)
    val fatPath = s"$dir/not_an_index.pkl"
    val raf = new java.io.RandomAccessFile(fatPath, "rw")
    try raf.setLength(graft.index.CheckStage.MaxPickleIndexBytes + 1)
    finally raf.close()
    val e = intercept[IllegalArgumentException](
      graft.index.CheckStage.readPickleIndex(spark, fatPath))
    assert(e.getMessage.contains("ceiling"))
  }

  test("pack --mix-spec: weighted two-source mix through the CLI") {
    import spark.implicits._
    // two corpora of internvid-style jsonl FILES: A = even ids split
    // across two files by id%4, choose: 1 (seeded); B = odd ids, both
    // files, unweighted. Synthetic media makes the mp4 bytes carry the
    // video path, so provenance is directly observable downstream.
    val metaDir = Files.createTempDirectory("cli_mix_meta").toString
    def writeFile(name: String, ids: Seq[Int]): String = {
      val lines = ids.map(i =>
        s"""{"YoutubeID":"${f"vid$i%09d"}","Start_timestamp":"0",""" +
          s""""End_timestamp":"1","Caption":"caption $i"}""")
      val p = java.nio.file.Paths.get(metaDir, name)
      Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      p.toString
    }
    val ids = 0 until 16
    writeFile("a0.jsonl", ids.filter(_ % 4 == 0))
    writeFile("a1.jsonl", ids.filter(_ % 4 == 2))
    writeFile("b0.jsonl", ids.filter(_ % 4 == 1))
    writeFile("b1.jsonl", ids.filter(_ % 4 == 3))
    val yaml =
      s"""datasets:
         |  - name: corpusA
         |    dataset: internvid
         |    prefix: va/
         |    shards: $metaDir/a{0..1}.jsonl
         |    choose: 1
         |  - name: corpusB
         |    dataset: internvid
         |    prefix: vb/
         |    shards: $metaDir/b{0..1}.jsonl
         |""".stripMargin
    val specPath = java.nio.file.Paths.get(metaDir, "mix.yaml")
    Files.write(specPath, yaml.getBytes("UTF-8"))
    val packOut = Files.createTempDirectory("cli_mix_pack").toString
    Pipeline.run(spark, Map(
      "stage" -> "pack", "mix-spec" -> specPath.toString,
      "type" -> "video-only", "save-path" -> packOut,
      "samples-per-tar" -> "6", "synthetic-media" -> "true")).collect()
    val tars = new java.io.File(packOut).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toString).sorted.toSeq
    val got = spark.read.format("wds").load(tars: _*)
      .select(col("entries")("mp4").cast("string").as("path"))
      .as[String].collect().sorted.toSeq
    // seed-17 choose over (a0, a1) picks a0: id%4==0 from A, all odd
    // ids from B, with each source's OWN media prefix applied
    val want = (ids.filter(_ % 4 == 0).map(i => s"va/${f"vid$i%09d"}_0_1.mp4") ++
      ids.filter(_ % 2 == 1).map(i => s"vb/${f"vid$i%09d"}_0_1.mp4")).sorted
    assert(got == want)
    // a mistyped spec path and an empty selection fail loudly
    assertThrows[Exception](Pipeline.run(spark, Map(
      "stage" -> "pack", "mix-spec" -> s"$metaDir/nope.yaml",
      "save-path" -> packOut, "synthetic-media" -> "true")))
  }

  test("tokenize --mix-spec: seeded mixed tar selection feeds the " +
    "merge groups") {
    import spark.implicits._
    // two packed corpora, one tar each; the mix-spec selection is the
    // seeded global shuffle of [tarA, tarB] and shard-size 2 makes ONE
    // merge group spanning both corpora
    def packCorpus(tag: String, ids: Seq[Int]): String = {
      val out = Files.createTempDirectory(s"cli_mt$tag").toString
      val meta = ids
        .map(i => (f"videos/$i%09d.mp4", s"caption words for doc $i"))
        .toDF("video_path", "value")
      graft.pack.PackStage.run(meta, out,
        graft.pack.PackStage.PackOptions(numSegments = 2,
          samplesPerTar = 100, alignShards = true)).collect()
      new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".tar")).map(_.toString).sorted.head
    }
    val tarA = packCorpus("a", 0 until 20)
    val tarB = packCorpus("b", 100 until 120)
    val yaml =
      s"""datasets:
         |  - name: corpusA
         |    shards: $tarA
         |  - name: corpusB
         |    shards: $tarB
         |""".stripMargin
    val specPath = java.nio.file.Paths.get(
      Files.createTempDirectory("cli_mt_spec").toString, "mix.yaml")
    Files.write(specPath, yaml.getBytes("UTF-8"))
    val tokOut = Files.createTempDirectory("cli_mt_tok").toString
    Pipeline.run(spark, Map(
      "stage" -> "tokenize", "mix-spec" -> specPath.toString,
      "shard-size" -> "2", "save-path" -> tokOut)).collect()
    def dump(dir: String): Seq[(String, String)] = {
      val tars = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tar")).map(_.toString).sorted.toSeq
      spark.read.format("wds").load(tars: _*)
        .select(col("key"),
          col("entries")("json").cast("string").as("j"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
    }
    val got = dump(tokOut)
    assert(got.nonEmpty, "no complete bins flushed")
    // equivalent to tokenizing the resolved url list directly
    val direct = Files.createTempDirectory("cli_mt_direct").toString
    val urls = graft.wds.MultiShardSample.resolve(
      graft.wds.MultiShardSample.parseYaml(yaml), 17L)
    graft.tokenize.TokenizeStage.run(
      graft.wds.WdsReader.readUrlsGrouped(spark, urls, 2), direct)
      .collect()
    assert(got == dump(direct))
    // the single merge group straddles the corpus boundary: some bin
    // merges captions from BOTH corpora
    assert(got.exists { case (_, j) =>
      j.contains("doc 19") && j.contains("doc 100") ||
        j.contains("doc 119") && j.contains("doc 0")
    }, "no bin crossed the corpus boundary")
    // without --mix-spec, tokenize still demands --input
    val e = intercept[IllegalArgumentException](Pipeline.run(spark, Map(
      "stage" -> "tokenize", "save-path" -> tokOut)))
    assert(e.getMessage.contains("--input"))
    // --start/--end: the reference's tar-range resume — a slice of the
    // resolved list; [1:2] over the seed-17 shuffle names exactly its
    // second shard, so the output equals tokenizing that url alone.
    // A ranged run writes under <save-path>/<start>-<end>/, the
    // reference's resume layout (tokenize/main.py:151)
    val resolved = urls
    val sliceOut = Files.createTempDirectory("cli_mt_slice").toString
    Pipeline.run(spark, Map(
      "stage" -> "tokenize", "mix-spec" -> specPath.toString,
      "start" -> "1", "end" -> "2", "save-path" -> sliceOut)).collect()
    val directSlice = Files.createTempDirectory("cli_mt_dslice").toString
    graft.tokenize.TokenizeStage.run(
      graft.wds.WdsReader.readUrlsGrouped(spark, resolved.slice(1, 2), 1),
      directSlice).collect()
    assert(dump(s"$sliceOut/1-2") == dump(directSlice))
    // an empty slice fails loudly instead of writing nothing
    val e2 = intercept[IllegalArgumentException](Pipeline.run(spark, Map(
      "stage" -> "tokenize", "mix-spec" -> specPath.toString,
      "start" -> "5", "save-path" -> sliceOut)))
    assert(e2.getMessage.contains("select no shards"))
    // passing BOTH --mix-spec and --input is a misconfigured job —
    // loud failure, not mix-spec silently winning
    val e3 = intercept[IllegalArgumentException](Pipeline.run(spark, Map(
      "stage" -> "tokenize", "mix-spec" -> specPath.toString,
      "input" -> tarA, "save-path" -> sliceOut)))
    assert(e3.getMessage.contains("mutually exclusive"))
  }

  test("fleet chain e2e: curate → pack → tokenize in two resumed " +
      "ranges → check; ranges reproduce the single run byte-for-byte") {
    import spark.implicits._
    // corpus with quality chaff the curate stage must drop
    val docsIn = Files.createTempDirectory("cli_fc_docs").toString
    (0 until 60).map { i =>
      val text =
        if (i % 10 == 9) "short junk" // < 30 words → curated away
        else s"document $i body " + (s"token$i word text here " * 20)
      (i.toLong, text, "en")
    }.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(docsIn)
    val curatedOut = Files.createTempDirectory("cli_fc_cur").toString
    Pipeline.run(spark, Map(
      "stage" -> "curate", "input" -> docsIn,
      "min-words" -> "30", "max-dup-frac" -> "1.0",
      "save-path" -> curatedOut)).collect()
    val curated = spark.read.parquet(curatedOut)
    assert(curated.count() == 54, "quality filter should drop the chaff")
    // pack the curated docs → 4 aligned tars
    val packOut = Files.createTempDirectory("cli_fc_pack").toString
    val info = graft.pack.PackStage.run(
      curated.select(
        format_string("videos/%09d.mp4", col("doc_id")).as("video_path"),
        col("text").as("value")),
      packOut,
      graft.pack.PackStage.PackOptions(numSegments = 2,
        samplesPerTar = 14, alignShards = true))
    val urls = graft.queries.WdsQueries.numericShardUrls(info)
    assert(urls.length == 4)
    def tokenize(out: String, ranges: Seq[(Int, Int)]): Unit =
      ranges.foreach { case (a, b) =>
        Pipeline.run(spark, Map(
          "stage" -> "tokenize", "input" -> urls.mkString("::"),
          "start" -> a.toString, "end" -> b.toString,
          "shard-size" -> "1", "max-tokens" -> "4000",
          "save-path" -> out)).collect()
      }
    val oneRun = Files.createTempDirectory("cli_fc_tok1").toString
    tokenize(oneRun, Seq((0, 4)))
    val twoRuns = Files.createTempDirectory("cli_fc_tok2").toString
    tokenize(twoRuns, Seq((0, 2), (2, 4)))
    // byte-identity: single-run group g == its range's group (g - a);
    // each ranged invocation writes its own <start>-<end>/ subdir
    // (the reference's resume layout, tokenize/main.py:151) and the
    // TarWriter pins mtime, so resume MUST be bitwise reproducible
    for (g <- 0 until 4) {
      val single = java.nio.file.Paths.get(
        oneRun, "0-4", s"shard_$g-000000.tar")
      val (rangeDir, local) = if (g < 2) ("0-2", g) else ("2-4", g - 2)
      val ranged = java.nio.file.Paths.get(
        twoRuns, rangeDir, s"shard_$local-000000.tar")
      assert(java.nio.file.Files.exists(single), s"missing $single")
      assert(java.nio.file.Files.exists(ranged), s"missing $ranged")
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(single),
        java.nio.file.Files.readAllBytes(ranged)),
        s"group $g differs between the single run and the resumed pair")
    }
    // chained check over the resumed outputs matches the single run's
    def indexCounts(dir: String): Seq[Long] = {
      val tars = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      val list = scala.collection.mutable.ArrayBuffer.empty[String]
      tars.forEachRemaining(p =>
        if (p.toString.endsWith(".tar")) list += p.toString: Unit)
      val idxOut = Files.createTempDirectory("cli_fc_idx").toString
      Pipeline.run(spark, Map(
        "stage" -> "check", "input" -> list.sorted.mkString("::"),
        "save-path" -> idxOut))
        .select("nsamples").as[Long].collect().sorted.toSeq
    }
    val c1 = indexCounts(oneRun)
    val c2 = indexCounts(twoRuns)
    assert(c1 == c2 && c1.nonEmpty && c1.sum > 0)
  }

  test("kf pack → tokenize with --type kf keeps every sample") {
    val metaDir = Files.createTempDirectory("cli_kf_meta").toString
    import spark.implicits._
    (0 until 8)
      .map(i => (f"kf$i%04d", "0:01", "0:09", s"scene $i described"))
      .toDF("YoutubeID", "Start_timestamp", "End_timestamp", "Caption")
      .write.mode("overwrite").json(metaDir)
    val packOut = Files.createTempDirectory("cli_kf_pack").toString
    Pipeline.run(spark, Map(
      "stage" -> "pack", "dataset" -> "internvid",
      "meta-path" -> metaDir, "type" -> "kf",
      "save-path" -> packOut, "samples-per-tar" -> "8",
      "align-shards" -> "true", "synthetic-media" -> "true")).collect()
    val tokOut = Files.createTempDirectory("cli_kf_tok").toString
    val tokInfo = Pipeline.run(spark, Map(
      "stage" -> "tokenize", "type" -> "kf",
      "input" -> s"$packOut/shard-0-000000.tar",
      "save-path" -> tokOut))
    // every kf sample must survive the <Iimage>/<Pimage>-aware
    // validation; a kf doc is ~6.2k tokens, so the 8k packer flushes
    // one-doc bins (final partial dropped by design) — under the old
    // hardcoded 'un' parse ALL samples were filtered and this was 0
    assert(tokInfo.agg(sum("nsamples")).collect().head.getLong(0) >= 6)
  }

  test("audit stage profiles any parquet and validates ;-separated rules") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("audit_in").toString
    val out = java.nio.file.Files.createTempDirectory("audit_out").toString
    Seq((1L, "a", 10.0), (2L, "b", -3.0), (3L, null.asInstanceOf[String], 5.0))
      .toDF("id", "tag", "score").write.mode("overwrite").parquet(in)
    val checks = Pipeline.run(spark, Map(
      "stage" -> "audit", "input" -> in, "save-path" -> out,
      "rules" -> "score_positive=score > 0;tag_present=tag IS NOT NULL"))
    val byRule = checks.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRule == Map("score_positive" -> 1L, "tag_present" -> 1L))
    val prof = spark.read.parquet(s"$out/profile").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof("id").getAs[Long]("n_distinct") == 3)
    assert(prof("tag").getAs[Long]("n_nulls") == 1)
    assert(prof("score").getAs[Double]("min_num") == -3.0)
    assert(prof("tag").getAs[String]("max_str") == "b")
    // rule syntax errors fail fast
    assertThrows[IllegalArgumentException](
      graft.curate.AuditStage.parseRules("broken"))
  }

  test("audit profile survives map columns, quotes, and colliding names") {
    import spark.implicits._
    val df = Seq((1L, Map("k" -> 2L), "x", "y"), (2L, Map("j" -> 3L), "z", "w"))
      .toDF("id", "m", "a b", "a_b")
      .withColumnRenamed("a b", "it's a b")
    val prof = graft.curate.AuditStage.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("id", "m", "it's a b", "a_b"))
    // map column: nulls counted, distinct reported as null, min/max null
    assert(prof("m").getAs[Long]("n_nulls") == 0)
    assert(prof("m").isNullAt(prof("m").fieldIndex("n_distinct")))
    assert(prof("it's a b").getAs[Long]("n_distinct") == 2)
    assert(prof("a_b").getAs[String]("min_str") == "w")
  }

  test("arg parsing and unknown stage rejection") {
    assert(Pipeline.parseArgs(Array("--stage", "pack", "--type", "kf")) ==
      Map("stage" -> "pack", "type" -> "kf"))
    // trailing bare flag records "true" (not silently dropped)
    assert(Pipeline.parseArgs(Array("--stage", "check", "--lenient")) ==
      Map("stage" -> "check", "lenient" -> "true"))
    // mid-list bare flag does not shift later pairs
    assert(Pipeline.parseArgs(Array(
      "--synthetic-media", "--save-path", "/tmp/x", "--lenient")) ==
      Map("synthetic-media" -> "true", "save-path" -> "/tmp/x",
        "lenient" -> "true"))
    // stray non-flag token fails fast instead of mispairing
    assertThrows[IllegalArgumentException](
      Pipeline.parseArgs(Array("stage", "pack")))
    assertThrows[IllegalArgumentException](
      Pipeline.run(spark, Map("stage" -> "nope")))
    assertThrows[IllegalArgumentException](
      Pipeline.run(spark, Map("stage" -> "pack"))) // missing meta-path
  }

  test("mediadedup stage: audio near-dup pairs and clusters over parquet") {
    import spark.implicits._
    // three WAV items: (1,1) is (1,0) gain-doubled + one extra window
    // (signs preserved => near-dup); (2,0) is pattern-disjoint
    def win(k: Int): Seq[Short] = (0 until 50).map(i =>
      (if ((k * 13 + i * 7) % 31 < 16) 1000 else -1000).toShort)
    def wav(ks: Seq[Int], gain: Int = 1): Array[Byte] =
      graft.multimodal.WavCodec.encode(graft.multimodal.WavCodec.Wav(
        16000, 1, ks.flatMap(win).map(v => (v * gain).toShort).toArray))
    val mediaDir = Files.createTempDirectory("cli_media").toString
    Seq((1L, 0, wav(Seq(1, 2, 3, 4))),
        (1L, 1, wav(Seq(1, 2, 3, 4, 5), gain = 2)),
        (2L, 0, wav(Seq(11, 12, 13))))
      .toDF("media_id", "take", "content")
      .write.mode("overwrite").parquet(mediaDir)

    val pairsOut = Files.createTempDirectory("cli_md_pairs").toString
    val pairs = Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "audio", "output" -> "pairs",
      "save-path" -> pairsOut))
    assert(pairs.collect().head.getLong(0) == 1L) // exactly one pair
    val detail = spark.read.parquet(s"$pairsOut/result").collect()
    assert(detail.length == 1)
    // A: 2 shingles of 4 windows, B: 3 of 5; shared 2, union 3
    assert(detail.head.getLong(4) == 2L && detail.head.getLong(5) == 3L)

    val clusOut = Files.createTempDirectory("cli_md_clus").toString
    val clus = Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "audio", "save-path" -> clusOut)).collect().head
    assert(clus.getLong(0) == 3L, "n_takes") // 3 media rows
    assert(clus.getLong(1) == 2L, "n_clusters") // {(1,*)}, {(2,0)}
    assert(clus.getLong(2) == 2L, "n_survivors")
    // --output segments: the alignment operator through the CLI —
    // (1,0)'s two shingles both match (1,1) at offset 0 (shared
    // prefix), span [0, 1]
    val segOut = Files.createTempDirectory("cli_md_seg").toString
    val seg = Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "audio", "output" -> "segments",
      "save-path" -> segOut)).collect().head
    assert(seg.getLong(0) == 1L, "one aligned pair")
    val segRow = spark.read.parquet(s"$segOut/result").collect()
    assert(segRow.length == 1)
    assert(segRow.head.getLong(4) == 2L, "n_match")
    assert(segRow.head.getInt(5) == 0, "offset")
    assert(segRow.head.getLong(6) == 2L, "seg_len")
    assert(segRow.head.getInt(7) == 0 && segRow.head.getInt(8) == 1,
      "span")
    // --threshold-ppm with segments must fail loudly (it would be
    // silently ignored); --min-seg is the segments knob
    assertThrows[IllegalArgumentException](Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "audio", "output" -> "segments",
      "threshold-ppm" -> "900000", "save-path" -> segOut)))
    val segHi = Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "audio", "output" -> "segments",
      "min-seg" -> "3", "save-path" -> segOut)).collect().head
    assert(segHi.getLong(0) == 0L, "min-seg 3 filters the 2-vote pair")
    assertThrows[IllegalArgumentException](Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "nope", "save-path" -> clusOut)))
    // a mistyped --output must fail like --fingerprint does, not
    // silently run the clusters default
    assertThrows[IllegalArgumentException](Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "audio", "output" -> "pair",
      "save-path" -> clusOut)))
  }

  test("mediadedup --fingerprint image: brightness-shifted stills cluster") {
    import spark.implicits._
    import graft.wds.Codecs
    // a photo, its +30 re-exposure (every pixel differs, aHash equal),
    // and a structurally different image
    def png(shift: Int, flip: Boolean): Array[Byte] = {
      val px = Array.tabulate(768) { j =>
        val i = j / 3
        val bright = if (flip) i % 16 >= 8 else i % 16 < 8
        ((if (bright) 180 else 40) + shift).toByte
      }
      Codecs.encodeImage(Codecs.ImageData(16, 16, 3, "RGB", px), "png")
    }
    val mediaDir = Files.createTempDirectory("cli_img").toString
    Seq((1L, 0, png(0, flip = false)),
        (1L, 1, png(30, flip = false)),
        (2L, 0, png(0, flip = true)))
      .toDF("media_id", "take", "content")
      .write.mode("overwrite").parquet(mediaDir)
    val out = Files.createTempDirectory("cli_img_out").toString
    val report = Pipeline.run(spark, Map(
      "stage" -> "mediadedup", "input" -> mediaDir,
      "fingerprint" -> "image", "window" -> "1",
      "save-path" -> out)).collect().head
    assert(report.getLong(0) == 3L) // takes
    assert(report.getLong(1) == 2L) // clusters: {(1,0),(1,1)}, {(2,0)}
    assert(report.getLong(2) == 2L) // survivors
  }

  test("audioaudit stage: mp3/aac/ogg entries walk to per-shard " +
      "corruption rates through the CLI") {
    import graft.multimodal.{AacProbe, Mp3Probe, OggProbe}
    val dir = Files.createTempDirectory("cli_audio").toString
    val out = new java.io.FileOutputStream(s"$dir/audio-000000.tar")
    val w = new graft.wds.TarIO.TarWriter(out)
    def sample(key: String, entries: Map[String, Array[Byte]]): Unit =
      w.write(graft.wds.Sample(key, "", entries)): Unit
    // clean mp3 + mp3 with one corrupt frame CRC; the fat mp4 payload
    // pins that the stage's payloadFiles pushdown SEEKS past
    // non-audio bytes instead of reading them
    sample("000000", Map(
      "mp3" -> Mp3Probe.encodeHeaders(8, _ => 9, withCrc = true),
      "mp4" -> Array.fill[Byte](4 << 20)(7), // 4 MiB ignored payload
      "json" -> "{}".getBytes("UTF-8"))) // non-audio entry: ignored
    sample("000001", Map("mp3" -> Mp3Probe.encodeHeaders(8, _ => 9,
      withCrc = true, corruptCrcAt = 3)))
    // clean aac + truncated aac
    sample("000002", Map("aac" -> AacProbe.encodeAdts(6, _ => 100,
      srIdx = 3, channels = 2, profile = 1, withCrc = true)))
    sample("000003", Map("aac" -> AacProbe.encodeAdts(6, _ => 100,
      srIdx = 3, channels = 2, profile = 1, withCrc = true,
      truncateTail = 5)))
    // clean ogg + page-CRC-corrupt ogg
    sample("000004", Map("ogg" -> OggProbe.encodeMinimalOpus(
      2, 100, 48000, 10)))
    sample("000005", Map("ogg" -> OggProbe.encodeMinimalOpus(
      2, 100, 48000, 10, corruptCrcAt = 4)))
    // clean flac + bit-flipped flac (frame CRC mismatch -> typed
    // error -> parse_error); clean wav + truncated wav
    import graft.multimodal.{FlacCodec, WavCodec}
    val flac = FlacCodec.encode(FlacCodec.Flac(8000, 1, 16,
      Array.tabulate(4096)(i => (i * 37 % 2048) - 1024)))
    sample("000006", Map("flac" -> flac))
    val badFlac = flac.clone()
    badFlac(badFlac.length - 10) =
      (badFlac(badFlac.length - 10) ^ 0x40).toByte
    sample("000007", Map("flac" -> badFlac))
    val wav = WavCodec.encode(WavCodec.Wav(8000, 1,
      Array.tabulate(800)(i => (i * 13).toShort)))
    sample("000008", Map("wav" -> wav))
    sample("000009", Map("wav" ->
      java.util.Arrays.copyOfRange(wav, 0, wav.length - 100)))
    w.close()

    val save = Files.createTempDirectory("cli_audio_out").toString
    def fileBytesRead: Long = {
      val st = org.apache.hadoop.fs.FileSystem
        .getGlobalStorageStatistics.get("file")
      if (st == null) 0L else st.getLong("bytesRead").longValue()
    }
    val b0 = fileBytesRead
    val report = Pipeline.run(spark, Map(
      "stage" -> "audioaudit", "input" -> s"$dir/audio-000000.tar",
      "save-path" -> save))
      .orderBy(col("kind")).collect()
    // payload pruning: the 4 MiB mp4 must be seeked past, not read —
    // the whole audit (including the parquet write/re-read) moves a
    // fraction of the shard (readahead granularity keeps this a
    // ratio, not an absolute; shard is ~4.3 MiB)
    val shardBytes = new java.io.File(s"$dir/audio-000000.tar").length()
    assert(fileBytesRead - b0 < shardBytes / 2,
      s"audioaudit read ${fileBytesRead - b0} of $shardBytes shard bytes")
    // per-kind report: (kind, n_streams, n_corrupt, crc_bad,
    // truncated_bytes, dur_ms)
    assert(report.map(_.getString(0)).toSeq ==
      Seq("aac", "flac", "mp3", "ogg", "wav"))
    assert(report.forall(_.getLong(1) == 2L), "2 streams per kind")
    assert(report.forall(_.getLong(2) == 1L),
      "exactly one corrupt stream per kind")
    val perShard = spark.read.parquet(save).collect()
    assert(perShard.length == 5, "one row per (shard, kind)")
    assert(perShard.forall(_.getAs[Long]("corrupt_ppm") == 500000L))
    val mp3Row = perShard.find(_.getAs[String]("kind") == "mp3").get
    assert(mp3Row.getAs[Long]("crc_bad") == 1L)
    assert(mp3Row.getAs[Long]("n_frames") == 16L)
    val aacRow = perShard.find(_.getAs[String]("kind") == "aac").get
    assert(aacRow.getAs[Long]("truncated_bytes") == (9 + 100 - 5).toLong)
    val oggRow = perShard.find(_.getAs[String]("kind") == "ogg").get
    assert(oggRow.getAs[Long]("crc_bad") == 1L)
  }

  test("audioaudit --quarantine names each offending entry with its " +
      "reason; clean entries stay out") {
    import graft.multimodal.{AacProbe, FlacCodec, Mp3Probe, OggProbe, WavCodec}
    val dir = Files.createTempDirectory("cli_audio_q").toString
    val out = new java.io.FileOutputStream(s"$dir/audio-000000.tar")
    val w = new graft.wds.TarIO.TarWriter(out)
    def sample(key: String, entries: Map[String, Array[Byte]]): Unit =
      w.write(graft.wds.Sample(key, "", entries)): Unit
    sample("000000", Map("mp3" -> Mp3Probe.encodeHeaders(8, _ => 9,
      withCrc = true)))
    sample("000001", Map("mp3" -> Mp3Probe.encodeHeaders(8, _ => 9,
      withCrc = true, corruptCrcAt = 3)))
    sample("000003", Map("aac" -> AacProbe.encodeAdts(6, _ => 100,
      srIdx = 3, channels = 2, profile = 1, withCrc = true,
      truncateTail = 5)))
    sample("000005", Map("ogg" -> OggProbe.encodeMinimalOpus(
      2, 100, 48000, 10, corruptCrcAt = 4)))
    val flac = FlacCodec.encode(FlacCodec.Flac(8000, 1, 16,
      Array.tabulate(4096)(i => (i * 37 % 2048) - 1024)))
    val badFlac = flac.clone()
    badFlac(badFlac.length - 10) =
      (badFlac(badFlac.length - 10) ^ 0x40).toByte
    sample("000007", Map("flac" -> badFlac))
    val wav = WavCodec.encode(WavCodec.Wav(8000, 1,
      Array.tabulate(800)(i => (i * 13).toShort)))
    sample("000009", Map("wav" ->
      java.util.Arrays.copyOfRange(wav, 0, wav.length - 100)))
    w.close()

    val save = Files.createTempDirectory("cli_audio_q_out").toString
    val quar = Files.createTempDirectory("cli_audio_q_bad").toString
    Pipeline.run(spark, Map(
      "stage" -> "audioaudit", "input" -> s"$dir/audio-000000.tar",
      "save-path" -> save, "quarantine" -> quar)).collect(): Unit
    val rows = spark.read.parquet(quar)
      .orderBy(col("entry")).collect()
      .map(r => (r.getAs[String]("entry"), r.getAs[String]("kind"),
        r.getAs[String]("reason")))
    assert(rows.toSeq == Seq(
      ("000001.mp3", "mp3", "crc_bad"),
      ("000003.aac", "aac", "truncated"),
      ("000005.ogg", "ogg", "crc_bad"),
      ("000007.flac", "flac", "parse_error"),
      ("000009.wav", "wav", "parse_error")),
      s"quarantine rows: ${rows.toSeq}")
    // every quarantine row carries the shard url for the re-fetch
    assert(spark.read.parquet(quar).collect()
      .forall(_.getAs[String]("url").endsWith("audio-000000.tar")))
    // the aggregate report is unchanged by quarantining (same scan)
    val perShard = spark.read.parquet(save).collect()
    assert(perShard.map(_.getAs[Long]("n_corrupt")).sum == 5L)
  }

  test("mediaaudit stage: mp4/webm/image entries audit to per-shard " +
      "rates; unsupported codecs are typed signals, not corruption") {
    import graft.multimodal.{Mp4Samples, WebmProbe}
    import graft.wds.Codecs
    val dir = Files.createTempDirectory("cli_media").toString
    val out = new java.io.FileOutputStream(s"$dir/media-000000.tar")
    val w = new graft.wds.TarIO.TarWriter(out)
    def sample(key: String, entries: Map[String, Array[Byte]]): Unit =
      w.write(graft.wds.Sample(key, "", entries)): Unit
    // decodable avc1 (the h264 I/P fixture) + an hev1 container the
    // engine triages as unsupported + a truncated avc1
    val avc = graft.multimodal.h264.H264Fixtures.videoGop(3L, 6)
    sample("000000", Map("mp4" -> avc,
      "json" -> "{}".getBytes("UTF-8"))) // non-media entry: ignored
    val hev = Mp4Samples.encodeFrames(
      (0 until 4).map(f => Array.fill(64 + f)(0x41.toByte)),
      codec = "hev1", fps = 10, width = 2, height = 2, syncEvery = 3)
    sample("000001", Map("mp4" -> hev))
    // tail-truncated FRAGMENTED container (moov-first streaming
    // layout): the download cut mid-mdat, the sample table survives,
    // and the last trun sample points past the file — the real shape
    // of a truncated fetch. (Tail-truncating the plain ftyp+mdat+moov
    // layout instead kills the moov and reads as parse_error.)
    val frag = graft.multimodal.h264.H264Fixtures.videoGopFragmented(3L, 6)
    sample("000002", Map("mp4" ->
      java.util.Arrays.copyOfRange(frag, 0, frag.length - 20)))
    // garbage behind a .mp4 name: no sample table at all
    sample("000003", Map("mp4" -> Array.fill[Byte](256)(0x55)))
    // clean webm (VP9 stays a typed unsupported signal) + garbage webm
    sample("000004", Map("webm" -> WebmProbe.encodeMinimal(
      "webm", 2000, 320, 240, "V_VP9")))
    sample("000005", Map("webm" -> Array.fill[Byte](128)(0x33)))
    // clean png + bit-chopped jpeg
    val png = Codecs.encodeImage(Codecs.ImageData(4, 4, 3, "RGB",
      Array.tabulate(48)(i => (i * 5 % 251).toByte)), "png")
    sample("000006", Map("png" -> png))
    val jpg = Codecs.encodeImage(Codecs.ImageData(4, 4, 3, "RGB",
      Array.tabulate(48)(i => (i * 7 % 251).toByte)), "jpeg")
    sample("000007", Map("jpg" ->
      java.util.Arrays.copyOfRange(jpg, 0, jpg.length / 2)))
    w.close()

    val save = Files.createTempDirectory("cli_media_out").toString
    val quar = Files.createTempDirectory("cli_media_bad").toString
    val report = Pipeline.run(spark, Map(
      "stage" -> "mediaaudit", "input" -> s"$dir/media-000000.tar",
      "save-path" -> save, "quarantine" -> quar))
      .orderBy(col("kind")).collect()
    // per-kind report: (kind, n_streams, n_corrupt, n_frames,
    // unsupported, dur_ms)
    assert(report.map(_.getString(0)).toSeq ==
      Seq("jpeg", "mp4", "png", "webm"))
    val mp4Rep = report.find(_.getString(0) == "mp4").get
    assert(mp4Rep.getLong(1) == 4L) // 4 mp4 streams
    assert(mp4Rep.getLong(2) == 2L) // truncated + garbage corrupt
    assert(mp4Rep.getLong(4) == 1L) // hev1 = one typed unsupported
    val webmRep = report.find(_.getString(0) == "webm").get
    assert(webmRep.getLong(1) == 2L && webmRep.getLong(2) == 1L)
    assert(webmRep.getLong(4) == 1L) // VP9: typed signal, not corrupt
    assert(report.find(_.getString(0) == "png").get.getLong(2) == 0L)
    assert(report.find(_.getString(0) == "jpeg").get.getLong(2) == 1L)
    // per-shard table carries the audit detail
    val perShard = spark.read.parquet(save).collect()
    val mp4Row = perShard.find(_.getAs[String]("kind") == "mp4").get
    assert(mp4Row.getAs[Long]("truncated_samples") > 0L)
    assert(mp4Row.getAs[Long]("parse_errors") == 1L)
    assert(mp4Row.getAs[Long]("corrupt_ppm") == 500000L)
    val webmRow = perShard.find(_.getAs[String]("kind") == "webm").get
    assert(webmRow.getAs[Long]("dur_ms") == 2000L)
    // quarantine: exactly the structurally-damaged entries, with
    // reasons; the hev1 and VP9 entries (valid data, typed signals)
    // must NOT appear
    val rows = spark.read.parquet(quar)
      .orderBy(col("entry")).collect()
      .map(r => (r.getAs[String]("entry"), r.getAs[String]("kind"),
        r.getAs[String]("reason")))
    assert(rows.toSeq == Seq(
      ("000002.mp4", "mp4", "truncated"),
      ("000003.mp4", "mp4", "parse_error"),
      ("000005.webm", "webm", "parse_error"),
      ("000007.jpg", "jpeg", "parse_error")),
      s"quarantine rows: ${rows.toSeq}")
    assert(spark.read.parquet(quar).collect()
      .forall(_.getAs[String]("url").endsWith("media-000000.tar")))
  }
}

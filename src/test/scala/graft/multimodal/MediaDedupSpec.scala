package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions.{min, struct}

/** Library-level laws of the [[MediaDedup.shingleNearDup]] operator,
  * on hand-built media where every shingle set is enumerable by eye —
  * the fixture-scale mm27/mm28/mm29 specs cover the codec-real
  * fingerprints; this one pins the operator algebra itself. */
class MediaDedupSpec extends SparkSpec {

  private def fp2: Array[Byte] => IndexedSeq[String] =
    b => b.grouped(2).map(g => g.map(x => f"$x%02x").mkString)
      .toIndexedSeq

  private def run(media: Seq[(Long, Int, Array[Byte])], window: Int,
      thresholdPpm: Long = 400000L): Seq[(Long, Int, Long, Int, Long, Long, Long)] = {
    import spark.implicits._
    val stage =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    MediaDedup.shingleNearDup(
      media.toDF("media_id", "take", "content"), stage, fp2,
      window = window, thresholdPpm = thresholdPpm)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
  }

  test("prefix-sharing takes pair with exact Jaccard; disjoint items never") {
    // units: A = [0101 0202 0303 0404], B = A + [0505], C disjoint
    val out = run(Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)),
      (1L, 1, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5)),
      (2L, 0, Array[Byte](9, 9, 8, 8, 7, 7, 6, 6))), window = 2)
    // A: 3 bigram shingles, B: 4, shared 3, union 4 -> 750000 ppm
    assert(out == Seq((1L, 0, 1L, 1, 3L, 4L, 750000L)))
  }

  test("threshold filters weak overlaps") {
    // share ONE bigram of many: jaccard 1/9 < 0.4 -> dropped; raise
    // threshold semantics checked by lowering it and seeing the pair
    val media = Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 9, 9, 8, 8, 7, 7, 6, 6)),
      (2L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 0, 0)))
    assert(run(media, window = 2).isEmpty)
    val low = run(media, window = 2, thresholdPpm = 100000L)
    assert(low == Seq((1L, 0, 2L, 0, 1L, 9L, 111111L)))
  }

  test("window 1 degenerates to unit-set Jaccard, duplicates collapse") {
    // repeated unit 0101 counts once (distinct shingles)
    val out = run(Seq(
      (1L, 0, Array[Byte](1, 1, 1, 1, 2, 2)),
      (2L, 0, Array[Byte](1, 1, 2, 2, 3, 3))), window = 1)
    // sets {0101,0202} vs {0101,0202,0303}: shared 2, union 3
    assert(out == Seq((1L, 0, 2L, 0, 2L, 3L, 666666L)))
  }

  test("items shorter than the window emit no shingles and never pair") {
    val out = run(Seq(
      (1L, 0, Array[Byte](1, 1)),
      (2L, 0, Array[Byte](1, 1))), window = 3)
    assert(out.isEmpty)
  }

  test("fingerprints honor the image's own channel layout (gray, RGB)") {
    import graft.wds.Codecs
    // 16x16 grayscale: brighter top half -> aHash rows 0-3 set. A
    // 3-channel-stride walk would read past 256 bytes and crash.
    val grayPx = Array.tabulate(256)(i =>
      (if (i < 128) 200 else 40).toByte)
    val gray = Codecs.encodeImage(
      Codecs.ImageData(16, 16, 1, "L", grayPx), "png")
    val fp = MediaDedup.perceptualImageFingerprint()(gray)
    assert(fp == IndexedSeq("1" * 32 + "0" * 32))
    // the equivalent RGB image hashes to the same pattern
    val rgbPx = Array.tabulate(768)(j =>
      (if (j / 3 < 128) 200 else 40).toByte)
    val rgb = Codecs.encodeImage(
      Codecs.ImageData(16, 16, 3, "RGB", rgbPx), "png")
    assert(MediaDedup.perceptualImageFingerprint()(rgb) == fp)
  }

  test("skipCorrupt: a bad row stays a no-shingle singleton; default throws") {
    import spark.implicits._
    // the audio fingerprint on garbage bytes (neither RIFF nor fLaC)
    // throws inside WavCodec — exactly the corrupt-row shape a 100 TB
    // corpus WILL contain
    def wav(signs: Seq[Int]): Array[Byte] =
      WavCodec.encode(WavCodec.Wav(16000, 1,
        signs.flatMap(s => Seq.fill(50)((s * 1000).toShort)).toArray))
    val media = Seq(
      (1L, 0, wav(Seq(1, -1, 1, -1))),
      (1L, 1, wav(Seq(1, -1, 1, -1, 1))),
      (7L, 0, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)))
      .toDF("media_id", "take", "content")
    val fp = MediaDedup.signPatternAudioFingerprint(50)
    def stage() =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    // fail-fast default: the corrupt row aborts the job loudly
    assertThrows[org.apache.spark.SparkException](
      MediaDedup.shingleNearDup(media, stage(), fp).collect())
    // warnAndContinue posture: pair found, corrupt row isolated
    val clusters = MediaDedup.nearDupClusters(media, stage(), fp,
      skipCorrupt = true).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getBoolean(4))).toSeq
    assert(clusters == Seq(
      (1L, 0, 1L, 0, true), (1L, 1, 1L, 0, false),
      (7L, 0, 7L, 0, true)))
  }

  test("pairs pre-collapse == all-pairs spelling on identical classes, " +
      "cross-class near-dups, and singletons (round-16 mm27/mm29 fix)") {
    import spark.implicits._
    // A = 4 units, B = A + one unit (near-dup, jaccard 3/4 on window-2
    // shingle sets), C disjoint. Classes: X = {(1,0),(3,0),(5,1)} all
    // content A; Y = {(2,0),(4,0)} content B; singleton (9,0) = C.
    val a = Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)
    val b = Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5)
    val c = Array[Byte](9, 9, 8, 8, 7, 7, 6, 6)
    val media = Seq((1L, 0, a), (3L, 0, a), (5L, 1, a),
      (2L, 0, b), (4L, 0, b), (9L, 0, c))
      .toDF("media_id", "take", "content")
    val stage =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    val sigs = MediaDedup.stageShingles(media, stage, fp2, window = 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    // collapseGate = -1 forces the collapsed arm (this fixture saves
    // only a handful of pre-agg rows, far below the production 64 M
    // saved-rows gate — the gate arm is checked right after)
    val collapsed =
      rows(MediaDedup.pairsMaybeCollapsed(sigs, 400000L,
        collapseGate = -1.0))
    val allPairs = rows(MediaDedup.pairsFromSigs(sigs, 400000L))
    assert(collapsed == allPairs, s"collapsed $collapsed != $allPairs")
    // the production gate keeps the single-join plan on this low-
    // fan-out shape, and it is the same result either way
    assert(rows(MediaDedup.pairsMaybeCollapsed(sigs, 400000L)) ==
      allPairs)
    // shape sanity: 3 within-X + 1 within-Y at jaccard 1e6, 6 cross
    // X×Y at 750000 ppm, nothing touches (9,0)
    assert(collapsed.size == 10)
    assert(collapsed.count(_._7 == 1000000L) == 4)
    assert(collapsed.count(_._7 == 750000L) == 6)
    assert(!collapsed.exists(p => p._1 == 9L || p._3 == 9L))
  }

  test("nearDupClusters: thresholdPpm > 1e6 is the 'nothing clusters' " +
      "sentinel — all singletons, even for byte-identical takes") {
    import spark.implicits._
    val media = Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3)),
      (1L, 1, Array[Byte](1, 1, 2, 2, 3, 3)), // exact dup of (1,0)
      (7L, 0, Array[Byte](9, 9, 8, 8, 7, 7)))
      .toDF("media_id", "take", "content")
    val stage =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    val out = MediaDedup.nearDupClusters(media, stage, fp2,
      window = 2, thresholdPpm = 1000001L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, 0, 1L, 0, true), (1L, 1, 1L, 1, true), (7L, 0, 7L, 0, true)))
  }

  test("nearDupClusters sentinel enforces the same staging contract " +
      "as the normal arm (r16 ADVICE: arms must not disagree)") {
    import spark.implicits._
    // duplicate (media_id, take) key with CONFLICTING content — the
    // normal arm's staging pass rejects it; the sentinel must too
    // (the old short-circuit silently emitted it as a singleton)
    val bad = Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3)),
      (1L, 0, Array[Byte](9, 9, 8, 8, 7, 7)))
      .toDF("media_id", "take", "content")
    def stage() =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    val normalArm = intercept[Exception] {
      MediaDedup.nearDupClusters(bad, stage(), fp2,
        window = 2, thresholdPpm = 400000L).collect()
    }
    val sentinelArm = intercept[Exception] {
      MediaDedup.nearDupClusters(bad, stage(), fp2,
        window = 2, thresholdPpm = 1000001L).collect()
    }
    // both arms fail, both with the staging contract's message
    for (e <- Seq(normalArm, sentinelArm))
      assert(Option(e.getMessage)
        .getOrElse(e.getCause.getMessage).contains("conflicting content"))
    // and a corrupt take under skipCorrupt=true is a singleton in BOTH
    // arms (identical key sets)
    val corrupt = Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3)),
      (8L, 0, Array.empty[Byte])) // fp2 yields no shingles either way
    val fpStrict: Array[Byte] => IndexedSeq[String] =
      b => { // self-contained: must not capture the spec instance
        require(b.nonEmpty, "corrupt")
        b.grouped(2).map(g => g.map(x => f"$x%02x").mkString)
          .toIndexedSeq
      }
    def keys(thr: Long) = MediaDedup.nearDupClusters(
      corrupt.toDF("media_id", "take", "content"), stage(), fpStrict,
      window = 2, thresholdPpm = thr, skipCorrupt = true).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(keys(400000L) == keys(1000001L))
    assert(keys(1000001L) == Seq((1L, 0), (8L, 0)))
  }

  test("streamingNearDupVerdicts: first-arrival owner across epochs") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    def wav(signs: Seq[Int]): Array[Byte] =
      WavCodec.encode(WavCodec.Wav(16000, 1,
        signs.flatMap(s => Seq.fill(50)((s * 1000).toShort)).toArray))
    val a = wav(Seq(1, -1)) // identical content => identical fingerprint
    // NOT wav(Seq(-1, 1)): that is a PERMUTATION of a's window set,
    // and shingle SETS ignore order — alternate within the window
    val b = WavCodec.encode(WavCodec.Wav(16000, 1,
      Array.tabulate(100)(i => (if (i % 2 == 0) 1000 else -1000).toShort)))
    val dir = java.nio.file.Files.createTempDirectory("st_media").toString
    // epoch 0: (5,0); epoch 1: (2,0) with the SAME content but a
    // SMALLER key, plus distinct (9,0)
    Seq((5L, 0, a)).toDF("media_id", "take", "content")
      .coalesce(1).write.parquet(s"$dir/f0")
    Seq((2L, 0, a), (9L, 0, b)).toDF("media_id", "take", "content")
      .coalesce(1).write.parquet(s"$dir/f1")
    def run(maxFiles: Option[Int]): Map[(Long, Int), (Long, Int)] = {
      val reader = spark.readStream
        .schema("media_id LONG, take INT, content BINARY")
      maxFiles.foreach(n => reader.option("maxFilesPerTrigger", n))
      val src = reader.parquet(s"$dir/*")
      val name = "stmd_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = MediaDedup.streamingNearDupVerdicts(src,
        MediaDedup.signPatternAudioFingerprint(50), window = 1)
        .toDF().writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).groupBy($"media_id", $"take")
        .agg(min(struct($"owner_id", $"owner_take")).as("o"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getStruct(2).getLong(0), r.getStruct(2).getInt(1))).toMap
    }
    // one batch: the bucket owner is the min key present
    assert(run(None) == Map(
      (2L, 0) -> ((2L, 0)), (5L, 0) -> ((2L, 0)), (9L, 0) -> ((9L, 0))))
    // two epochs: (5,0) arrived first and STAYS owner; the later
    // smaller key is flagged dup against it, never a second original
    assert(run(Some(1)) == Map(
      (5L, 0) -> ((5L, 0)), (2L, 0) -> ((5L, 0)), (9L, 0) -> ((9L, 0))))
  }

  test("composes with format(\"wds\"): dedup straight off tar shards") {
    // the production shape: media lives in WebDataset tars; the DSv2
    // reader's (key, entries) rows map to the operator's media frame
    // with no intermediate copy of the payload
    import spark.implicits._
    import graft.wds.{Sample, TarIO}
    import org.apache.spark.sql.functions.{col, element_at}
    def wav(signs: Seq[Int]): Array[Byte] =
      WavCodec.encode(WavCodec.Wav(16000, 1,
        signs.flatMap(s => Seq.fill(50)((s * 1000).toShort)).toArray))
    val a = wav(Seq(1, -1, 1))
    val dup = WavCodec.encode(WavCodec.Wav(16000, 1, // gain-halved a
      WavCodec.decode(a).samples.map(v => (v / 2).toShort)))
    // window SETS ignore order, so "other" must differ within a
    // window, not merely permute a's constant-sign windows
    val other = WavCodec.encode(WavCodec.Wav(16000, 1,
      Array.tabulate(150)(i => (if (i % 2 == 0) 1000 else -1000).toShort)))
    val dir = java.nio.file.Files.createTempDirectory("wds_dedup")
    val out = new java.io.FileOutputStream(s"$dir/shard.tar")
    val w = new TarIO.TarWriter(out)
    Seq("000000" -> a, "000001" -> dup, "000002" -> other).foreach {
      case (k, bytes) => w.write(Sample(k, "", Map("wav" -> bytes)))
    }
    w.close()
    val media = spark.read.format("wds")
      .option("paths", s"$dir/shard.tar").load()
      .select(col("key").cast("long").as("media_id"),
        org.apache.spark.sql.functions.lit(0).as("take"),
        element_at(col("entries"), "wav").as("content"))
    val stage =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    val clusters = MediaDedup.nearDupClusters(media, stage,
      MediaDedup.signPatternAudioFingerprint(50), window = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4))).toSeq
    assert(clusters == Seq((0L, 0L, true), (1L, 0L, false),
      (2L, 2L, true)))
  }

  test("nearDupClusters: transitive chains collapse, singletons survive") {
    import spark.implicits._
    // (1,0)~(1,1) at 3/4 and (1,1)~(3,0) at exactly 2/5 = the 0.4
    // threshold, but (1,0)~(3,0) only 1/5 — a pairwise keep-list
    // would mishandle the chain; components must not
    val media = Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)),
      (1L, 1, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5)),
      (3L, 0, Array[Byte](3, 3, 4, 4, 5, 5, 6, 6)),
      (9L, 0, Array[Byte](7, 7, 8, 8, 9, 9)))
      .toDF("media_id", "take", "content")
    val stage =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    val out = MediaDedup.nearDupClusters(media, stage, fp2, window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, 0, 1L, 0, true), (1L, 1, 1L, 0, false),
      (3L, 0, 1L, 0, false), (9L, 0, 9L, 0, true)))
  }

  test("exact-dup pre-collapse: clusters equal the all-pairs spelling " +
      "on identical-content classes + cross-class near-dups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct => fstruct}
    // class A: three byte-identical takes; class B: two identical
    // takes NEAR class A (share 3 of 4/5 units); class C: disjoint
    // pair of identical takes; singleton; corrupt zero-shingle row
    val a = Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)
    val b = Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5)
    val c = Array[Byte](7, 7, 8, 8, 9, 9, 10, 10)
    val media = Seq(
      (1L, 0, a), (2L, 0, a), (2L, 1, a),
      (4L, 0, b), (5L, 0, b),
      (6L, 0, c), (7L, 0, c),
      (9L, 0, Array[Byte](11, 11, 12, 12, 13, 13)),
      (10L, 0, Array[Byte](0))) // shorter than window: no shingles
      .toDF("media_id", "take", "content")
    val stage1 =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    val got = MediaDedup.nearDupClusters(media, stage1, fp2, window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getBoolean(4))).toSeq
    // the reference spelling: ALL verified pairs -> CC (the
    // pre-collapse must be invisible to the result)
    val stage2 =
      java.nio.file.Files.createTempDirectory("mediadedup").toString
    val sigs = MediaDedup.stageShingles(media, stage2, fp2, window = 2)
    val allPairs = MediaDedup.pairsFromSigs(sigs, 400000L)
    val edges = allPairs.select(
      fstruct(col("a_id").as("media_id"), col("a_take").as("take"))
        .as("a_id"),
      fstruct(col("b_id").as("media_id"), col("b_take").as("take"))
        .as("b_id"))
    val vertices = media.select(
      fstruct(col("media_id"), col("take")).as("id")).distinct()
    val want = graft.functions.ConnectedComponents
      .run(edges, vertices, 50)
      .select(col("id.media_id"), col("id.take"),
        col("label.media_id"), col("label.take"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(0) == r.getLong(2) && r.getInt(1) == r.getInt(3)))
      .toSeq.sorted
    assert(got.sorted == want,
      s"pre-collapsed clusters diverge from all-pairs:\n$got\nvs\n$want")
    // sanity on the shape itself: A+B merge (near-dup across classes),
    // C is its own 2-cluster, 9 and 10 are singletons
    val byCluster = got.groupBy(t => (t._3, t._4)).view
      .mapValues(_.map(t => (t._1, t._2)).sorted).toMap
    assert(byCluster((1L, 0)) ==
      Seq((1L, 0), (2L, 0), (2L, 1), (4L, 0), (5L, 0)))
    assert(byCluster((6L, 0)) == Seq((6L, 0), (7L, 0)))
    assert(byCluster((9L, 0)) == Seq((9L, 0)))
    assert(byCluster((10L, 0)) == Seq((10L, 0)))
  }

  test("compactVerdicts: streaming end state equals the batch keep-list") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // chain with a Jaccard-failing bucket candidate: (1,0)~(1,1) at
    // 3/4, (1,1)~(3,0) at exactly the 0.4 threshold, but (3,0) ALSO
    // shares a bucket with (1,0) at 1/5 — an unrefined min-owner
    // reduction would partner (3,0) with (1,0); the exact-Jaccard
    // refinement must reject that owner and land on (1,1)
    val media = Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)),
      (1L, 1, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5)),
      (3L, 0, Array[Byte](3, 3, 4, 4, 5, 5, 6, 6)),
      (9L, 0, Array[Byte](7, 7, 8, 8, 9, 9)))
    val dir = java.nio.file.Files.createTempDirectory("st_cmp").toString
    media.toDF("media_id", "take", "content")
      .coalesce(1).write.parquet(s"$dir/in")
    val src = spark.readStream
      .schema("media_id LONG, take INT, content BINARY")
      .parquet(s"$dir/in")
    val name = "stcmp_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = MediaDedup.streamingNearDupVerdicts(src, fp2, window = 2)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val staged = MediaDedup.stageShingles(
      media.toDF("media_id", "take", "content"), s"$dir/sigs", fp2,
      window = 2)
    val out = MediaDedup.compactVerdicts(spark.table(name), staged)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4))).toSeq
    assert(out == Seq(
      (1L, 0, 1L, 0, 0), // owner of its buckets: kept
      (1L, 1, 1L, 0, 1), // 3/4 to (1,0): dup
      (3L, 0, 1L, 1, 1), // (1,0) fails Jaccard, (1,1) qualifies
      (9L, 0, 9L, 0, 0))) // disjoint: kept
    // end state equals the batch operator's keep-list on this corpus
    val survivors = MediaDedup.nearDupClusters(
      media.toDF("media_id", "take", "content"), s"$dir/sigs2", fp2,
      window = 2)
      .collect().filter(_.getBoolean(4))
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out.filter(_._5 == 0).map(t => (t._1, t._2)).toSet == survivors)
  }

  test("conflicting content behind one key fails loudly; exact replays heal") {
    import spark.implicits._
    // at-least-once ingest replaying the SAME bytes is healed by the
    // staged distinct — pair output identical to the clean corpus
    val clean = run(Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)),
      (1L, 1, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5))), window = 2)
    val replayed = run(Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)),
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)),
      (1L, 1, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5))), window = 2)
    assert(replayed == clean && clean.nonEmpty)
    // DIFFERENT content behind one key is an ingest contract violation
    // that must abort (silently unioning shingles can push Jaccard
    // past 1.0), not produce out-of-range rows
    val ex = intercept[IllegalArgumentException](run(Seq(
      (1L, 0, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)),
      (1L, 0, Array[Byte](9, 9, 8, 8, 7, 7, 6, 6))), window = 2))
    assert(ex.getMessage.contains("conflicting content"))
  }

  test("cmpProducts: exact 128-bit sign agrees with BigInt past Long range") {
    // gigapixel aHash shape: cells ≤ px·765 — products exceed 2^63
    val cases = Seq(
      (765L * 2000000000L, 2000000000L, 765L * 2000000000L, 1999999999L),
      (Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue - 1),
      (Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue),
      (3L, 5L, 4L, 4L), (0L, 7L, 1L, 1L), (1L, 0L, 0L, 0L))
    for ((a, b, c, d) <- cases) {
      val want = (BigInt(a) * BigInt(b)).compare(BigInt(c) * BigInt(d))
      assert(Integer.signum(MediaDedup.cmpProducts(a, b, c, d)) == want,
        s"($a,$b,$c,$d)")
    }
  }

  test("dupSegmentAlign: shifted clip localizes at its offset; held " +
    "frames keep one vote per position; ingest replays heal; " +
    "conflicting content is rejected") {
    import spark.implicits._
    def align(media: Seq[(Long, Int, Array[Byte])])
        : Seq[(Long, Int, Long, Int, Long, Int, Long, Int, Int)] = {
      val stage =
        java.nio.file.Files.createTempDirectory("mseg").toString
      MediaDedup.dupSegmentAlign(
        media.toDF("media_id", "take", "content"), stage, fp2,
        window = 2)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
          r.getLong(4), r.getInt(5), r.getLong(6), r.getInt(7),
          r.getInt(8))).toSeq
    }
    // A = units [01 02 03 04 05]; B = units [03 04 05] (clip at 2):
    // B's bigram shingles at pos 0,1 match A's at pos 2,3 → offset 2
    val a = Array[Byte](1, 1, 2, 2, 3, 3, 4, 4, 5, 5)
    val clip = Array[Byte](3, 3, 4, 4, 5, 5)
    assert(align(Seq((1L, 0, a), (1L, 1, clip))) ==
      Seq((1L, 0, 1L, 1, 2L, 2, 2L, 2, 3)))
    // an exact ingest REPLAY of the clip row must not double votes
    assert(align(Seq((1L, 0, a), (1L, 1, clip), (1L, 1, clip))) ==
      Seq((1L, 0, 1L, 1, 2L, 2, 2L, 2, 3)))
    // a held frame (unit 03 twice) is two POSITIONS, two votes kept
    val held = Array[Byte](3, 3, 3, 3, 4, 4)
    val out = align(Seq((1L, 0, Array[Byte](3, 3, 3, 3, 4, 4, 5, 5)),
      (1L, 1, held)))
    assert(out.length == 1 && out.head._7 == 2L,
      s"held-frame votes: $out")
    // same key, different content → loud failure, like stageShingles
    val ex = intercept[IllegalArgumentException](
      align(Seq((1L, 0, a), (1L, 0, clip))))
    assert(ex.getMessage.contains("conflicting content"))
    // the sneaky variant: same key, one content a strict PREFIX of
    // the other — every shared position dedupes cleanly and only the
    // n_pos disagreement betrays the conflict
    val aPlus = a ++ Array[Byte](6, 6)
    val ex2 = intercept[IllegalArgumentException](
      align(Seq((1L, 0, a), (1L, 0, aPlus))))
    assert(ex2.getMessage.contains("conflicting content"))
  }

  test("alignment law: 40 random sequences with planted clips all " +
    "localize at their offset with the exact vote count and span") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val plan = (1L to 40L).map { d =>
      val n = 6 + rnd.nextInt(10)
      val off = rnd.nextInt(n - 5)
      val k = 4 + rnd.nextInt(n - off - 4 + 1)
      (d, n, off, k)
    }
    // unit i of doc d = bytes (i, d): distinct within AND across docs,
    // so every shingle match is a true planted match
    def unit(d: Long, i: Int) = Seq(i.toByte, d.toByte)
    val media = plan.flatMap { case (d, n, off, k) =>
      val full = (0 until n).flatMap(unit(d, _)).toArray
      val clip = (off until off + k).flatMap(unit(d, _)).toArray
      Seq((d, 0, full), (d, 1, clip))
    }
    val stage = java.nio.file.Files.createTempDirectory("mlaw").toString
    val got = MediaDedup.dupSegmentAlign(
      media.toDF("media_id", "take", "content"), stage, fp2, window = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getLong(6), r.getInt(7),
        r.getInt(8)))).toMap
    assert(got.size == 40)
    plan.foreach { case (d, _, off, k) =>
      assert(got(d) == ((0, d, 1, (k - 1).toLong, off, (k - 1).toLong,
        off, off + k - 2)), s"doc $d (off=$off k=$k): ${got(d)}")
    }
  }

  test("audio sniff requires the full fLaC magic, not just the first bytes") {
    // a non-audio blob starting 'f','L' must NOT be fed to FlacCodec —
    // it falls through to the WAV path and fails as a non-RIFF stream
    val notFlac = "fLak-not-audio".getBytes("US-ASCII")
    val ex = intercept[IllegalArgumentException](
      MediaDedup.signPatternAudioFingerprint(50)(notFlac))
    assert(ex.getMessage.contains("RIFF"))
  }
}

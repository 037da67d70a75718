package graft.queries

import graft.SparkSpec
import graft.wds.Codecs

/** mm28 laws: the perceptual (aHash-shingle) near-dup pass must
  *
  *  1. EQUAL an independent brute-force all-pairs replay (bucketing
  *     loses/invents nothing),
  *  2. be genuinely re-encode ROBUST — each doc's pair is found even
  *     though the two encodes reconstruct DIFFERENT pixel values on
  *     the quantized frame kinds (asserted, so the claim is not
  *     vacuous: mm27's exact fingerprints differ on those frames),
  *  3. confine cross-doc matches to the fixture's true perceptual
  *     clusters (docs congruent mod 251 synthesize identical I_PCM
  *     pixels — brightness-shift classes aHash is designed to fold),
  *  4. decode each document exactly once per invocation.
  */
class VideoPerceptualDupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def decodeRgb(bytes: Array[Byte], f: Int): Array[Byte] =
    Codecs.decodeImage(
      graft.pack.FrameSource.Mp4Frames.frame(bytes, f)).data

  private def aHash(data: Array[Byte]): String = {
    val bs = new Array[Long](64); var tot = 0L
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val i = (y * 16 + x) * 3
        val g3 = (data(i) & 0xff) + (data(i + 1) & 0xff) +
          (data(i + 2) & 0xff)
        bs((y >> 1) * 8 + (x >> 1)) += g3; tot += g3
        x += 1
      }
      y += 1
    }
    (0 until 64).map(b => if (64L * bs(b) > tot) '1' else '0').mkString
  }

  private def shingleSet(docId: Long, n: Int, qp: Int): Set[String] = {
    val bytes = graft.multimodal.h264.H264Fixtures.videoQp(docId, n, qp)
    val fp = (0 until n).map(f => aHash(decodeRgb(bytes, f)))
    (0 to n - 3).map(t => md5hex(fp(t) + "|" + fp(t + 1) + "|" + fp(t + 2)))
      .toSet
  }

  private lazy val docIds: Seq[Long] = {
    import spark.implicits._
    graft.Tables(spark, sf).documents.select($"doc_id".as[Long])
      .collect().toSeq.sorted
  }

  private lazy val bruteSets: Map[(Long, Int), Set[String]] =
    docIds.flatMap { d =>
      val nx = (6 + (d % 3) * 3).toInt
      val qpA = graft.multimodal.h264.H264Fixtures.qpFor(d)
      val qpB = 16 + ((d + 7) % 24).toInt
      Seq((d, 0) -> shingleSet(d, nx, qpA),
        (d, 1) -> shingleSet(d, nx + 3, qpB))
    }.toMap

  private lazy val bruteExpected: Seq[(Long, Int, Long, Int, Long, Long, Long)] = {
    val keys = bruteSets.keys.toSeq.sorted
    for {
      i <- keys.indices
      j <- (i + 1) until keys.size
      a = keys(i); b = keys(j)
      shared = (bruteSets(a) & bruteSets(b)).size.toLong
      union = (bruteSets(a) | bruteSets(b)).size.toLong
      if shared > 0 && 1000000L * shared / union >= 400000L
    } yield (a._1, a._2, b._1, b._2, shared, union,
      1000000L * shared / union)
  }

  test("mm28 bucket-join equals brute-force all-pairs perceptual Jaccard") {
    val got = graft.SparkEntry.queries("mm28_video_phash_dup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq.sorted
    assert(got == bruteExpected.sorted,
      s"bucket-join ${got.size} pairs != brute ${bruteExpected.size}")
  }

  test("mm28 re-encode robustness is non-vacuous: pixels differ, pairs found") {
    val fx = graft.multimodal.h264.H264Fixtures
    var sawPixelDiff = false
    docIds.take(24).foreach { d => // one full qp cycle
      val nx = (6 + (d % 3) * 3).toInt
      val qpA = fx.qpFor(d)
      val qpB = 16 + ((d + 7) % 24).toInt
      assert(qpA != qpB)
      val va = fx.videoQp(d, nx, qpA)
      val vb = fx.videoQp(d, nx, qpB)
      (0 until nx).foreach { f =>
        val pa = decodeRgb(va, f)
        val pb = decodeRgb(vb, f)
        if (f % 3 == 0) // I_PCM bypasses quantization: bit-identical
          assert(pa.sameElements(pb), s"doc $d PCM frame $f differs")
        else if (!pa.sameElements(pb)) sawPixelDiff = true
        // the perceptual hash folds the difference either way
        assert(aHash(pa) == aHash(pb), s"doc $d frame $f aHash differs")
      }
      // the planted re-encode pair survives the 0.4 threshold
      assert(bruteExpected.exists(p => p._1 == d && p._2 == 0 &&
        p._3 == d && p._4 == 1), s"doc $d re-encode pair missing")
    }
    assert(sawPixelDiff,
      "no quantized frame differed between encodes - robustness vacuous")
  }

  test("mm28 cross-doc matches are exactly the mod-251 brightness classes") {
    val cross = bruteExpected.filter(p => p._1 != p._3)
    assert(cross.nonEmpty) // the fixture DOES contain true clusters
    cross.foreach { p =>
      assert(p._1 % 251 == p._3 % 251,
        s"cross pair ${p._1}/${p._3} outside a perceptual class")
    }
  }

  test("mm28 decode subtree evaluates exactly once per take") {
    MediaQueries.mm28DecodeCalls.set(0L)
    val df = graft.SparkEntry.queries("mm28_video_phash_dup")(spark, sf)
    assert(df.count() >= docIds.size.toLong)
    assert(MediaQueries.mm28DecodeCalls.get() == 2L * docIds.size,
      s"decode ran ${MediaQueries.mm28DecodeCalls.get()} times for " +
        s"${2 * docIds.size} takes - the staged fan-out must decode once")
  }
}

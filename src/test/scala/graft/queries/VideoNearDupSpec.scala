package graft.queries

import graft.SparkSpec
import graft.wds.Codecs

/** mm27 laws the scaladoc claims, enforced against an independent
  * in-memory brute force over the same public decode contract
  * ([[graft.pack.FrameSource.Mp4Frames]]):
  *
  *  1. EQUALITY — the bucket-join output equals the all-pairs
  *     shingle-set Jaccard computed brute-force (same threshold),
  *     i.e. hash-bucketing loses no candidate and invents none.
  *  2. TRIM ROBUSTNESS — every doc's prefix-sharing re-upload pair
  *     exceeds the 0.4 threshold with the closed-form Jaccard
  *     (nx-2)/(nx+1); fully disjoint videos (different docs) produce
  *     NO candidate pair at all.
  *  3. SINGLE EVALUATION — the expensive decode subtree runs exactly
  *     once per document per invocation (the staged-parquet fan-out;
  *     [[MediaQueries.mm27DecodeCalls]] counts UDF activations), not
  *     once per join branch as a naive self-join plan would.
  */
class VideoNearDupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Independent shingle-set derivation: decode every frame through
    * the public contract, fingerprint per-channel sums, md5 3-grams. */
  private def shingleSet(docId: Long, n: Int): Set[String] = {
    val bytes = graft.multimodal.h264.H264Fixtures.video(docId, n)
    val src = graft.pack.FrameSource.Mp4Frames
    val fp = (0 until n).map { f =>
      val img = Codecs.decodeImage(src.frame(bytes, f))
      var rs = 0L; var gs = 0L; var bs = 0L
      var i = 0
      while (i < img.data.length) {
        rs += img.data(i) & 0xff
        gs += img.data(i + 1) & 0xff
        bs += img.data(i + 2) & 0xff
        i += 3
      }
      s"$rs:$gs:$bs"
    }
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
      Seq((d, 0) -> shingleSet(d, nx), (d, 1) -> shingleSet(d, nx + 3))
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

  test("mm27 bucket-join equals brute-force all-pairs Jaccard") {
    val got = graft.SparkEntry.queries("mm27_video_near_dup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq.sorted
    assert(got == bruteExpected.sorted,
      s"bucket-join ${got.size} pairs != brute ${bruteExpected.size}")
  }

  test("mm27 trim robustness: prefix pair passes, disjoint docs never pair") {
    // closed form: vid0's shingles are a strict subset of vid1's
    // (frame content is a pure function of (doc, frame)), so
    // shared = nx-2, union = nx+1
    docIds.foreach { d =>
      val nx = (6 + (d % 3) * 3).toInt
      assert(bruteSets((d, 0)).subsetOf(bruteSets((d, 1))))
      assert(bruteExpected.exists(p =>
        p._1 == d && p._2 == 0 && p._3 == d && p._4 == 1 &&
          p._5 == nx - 2L && p._6 == nx + 1L &&
          p._7 == 1000000L * (nx - 2) / (nx + 1)), s"doc $d pair missing")
    }
    // no cross-doc candidate survives (fingerprints are doc-keyed)
    assert(bruteExpected.forall(p => p._1 == p._3),
      "unexpected cross-doc near-dup pair")
    assert(bruteExpected.size == docIds.size)
  }

  test("mm27 decode subtree evaluates exactly once per take") {
    MediaQueries.mm27DecodeCalls.set(0L)
    val df = graft.SparkEntry.queries("mm27_video_near_dup")(spark, sf)
    assert(df.count() == docIds.size.toLong)
    assert(MediaQueries.mm27DecodeCalls.get() == 2L * docIds.size,
      s"decode ran ${MediaQueries.mm27DecodeCalls.get()} times for " +
        s"${2 * docIds.size} takes — the staged fan-out must decode once")
  }

  test("mm32 localizes each clip at its closed-form offset and span; " +
    "the clip decodes bit-identically to the full video's range") {
    // fixture contract first: frame i of videoClip(d, off, nx) must
    // decode to the same pixels as frame off+i of the full video —
    // the pure-function-of-content-index property mm32 rests on
    val d0 = docIds.head
    val off0 = (1 + d0 % 3).toInt
    val nx0 = (6 + (d0 % 3) * 3).toInt
    val full = graft.multimodal.h264.H264Fixtures.video(d0, nx0 + 4)
    val clip = graft.multimodal.h264.H264Fixtures.videoClip(d0, off0, nx0)
    val src = graft.pack.FrameSource.Mp4Frames
    assert(src.frameCount(clip) == nx0)
    (0 until nx0).foreach { i =>
      val a = Codecs.decodeImage(src.frame(clip, i))
      val b = Codecs.decodeImage(src.frame(full, off0 + i))
      assert(java.util.Arrays.equals(a.data, b.data), s"clip frame $i")
    }
    // operator verdicts: per doc exactly one (d,0)-(d,1) row at
    // offset = 1+d%3, all nx-2 clip shingles voting, span covering
    // display positions off .. off+nx-3 of the full take
    val got = graft.SparkEntry.queries("mm32_dup_segments")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getLong(6), r.getInt(7),
        r.getInt(8)))
    val sameDoc = got.filter(p => p._1 == p._3)
    assert(sameDoc.length == docIds.size,
      s"expected one same-doc verdict per doc, got ${sameDoc.length}")
    sameDoc.foreach { case (d, av, _, bv, nMatch, off, segLen, from, to) =>
      val nx = (6 + (d % 3) * 3).toInt
      val expOff = (1 + d % 3).toInt
      assert(av == 0 && bv == 1, s"doc $d take order")
      assert(off == expOff, s"doc $d offset")
      assert(segLen == nx - 2L, s"doc $d votes")
      assert(from == expOff && to == expOff + nx - 3, s"doc $d span")
      assert(nMatch >= segLen, s"doc $d n_match")
    }
  }
}

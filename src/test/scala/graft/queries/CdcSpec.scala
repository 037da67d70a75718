package graft.queries

import graft.SparkSpec

/** Laws for qd17 content-defined chunking beyond the DuckDB gate: the
  * Spark pipeline equals a pure-JVM replay of the boundary rule, chunks
  * reassemble to the document, and boundaries are content-defined (an
  * edit only reshapes chunks that overlap it — the property fixed-width
  * blocks lack, and the reason CDC dedup survives near-duplicates). */
class CdcSpec extends SparkSpec {

  private val Win = 8
  private val Div = 16

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Pure replay of qd17's rule: boundary after CODE POINT i (1-based)
    * when the window ending at i hashes to ≡0 (mod Div) — code-point
    * indexing, like the kernel and Spark/DuckDB substr. */
  private def chunksOf(text: String): Seq[String] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n == 0) return Seq.empty // no chunks on either engine
    val bounds =
      if (n < Win) Seq.empty
      else (Win to n).filter { i =>
        java.lang.Long.parseLong(
          md5hex(new String(cps, i - Win, Win)).take(4), 16) % Div == 0
      }
    val bs = (0 +: bounds :+ n).distinct.sorted
    bs.sliding(2).map { case Seq(a, b) => new String(cps, a, b - a) }
      .toSeq
  }

  test("chunks reassemble to the document; short docs are one chunk") {
    val texts = Seq("tiny", "", "exactly8",
      "the quick brown fox jumps over the lazy dog and runs away fast")
    texts.foreach { t =>
      assert(chunksOf(t).mkString === t)
      assert(chunksOf(t).forall(_.nonEmpty))
    }
    assert(chunksOf("tiny") === Seq("tiny"))
    assert(chunksOf("") === Seq.empty)
  }

  test("empty documents contribute no chunks (and no crash) in the " +
    "Spark path") {
    import spark.implicits._
    val docs = Seq(("srcA", ""), ("srcA", "a short doc"), ("srcB", ""))
      .toDF("source", "text")
    val out = graft.queries.DedupQueries.cdcStatsOf(docs).collect()
    // srcB had only an empty doc → no row; srcA counts only the real doc
    assert(out.map(_.getString(0)).toSeq === Seq("srcA"))
    assert(out.head.getLong(1) === chunksOf("a short doc").size.toLong)
  }

  test("edit locality: an insertion only reshapes chunks overlapping it") {
    val base = ("spark shuffle partition broadcast codegen catalyst " * 8).trim
    val edited = base.substring(0, 100) + "X" + base.substring(100)
    val (a, b) = (chunksOf(base), chunksOf(edited))
    // multiset intersection: far-from-edit chunks must survive verbatim
    val shared = a.groupBy(identity).map { case (c, xs) =>
      math.min(xs.size, b.count(_ == c))
    }.sum
    assert(shared >= a.size - 4,
      s"edit rewrote ${a.size - shared} of ${a.size} chunks")
    assert(shared < a.size) // ...but the edit did change something
  }

  test("kernel == declarative on null text and astral (non-BMP) chars") {
    import spark.implicits._
    // an emoji (U+1F600, 2 UTF-16 units / 1 code point) early in the
    // doc shifts every UTF-16-indexed window; code-point indexing must
    // keep the kernel aligned with Spark length()/substr semantics
    val astral = "😀 the quick brown fox jumps over the " +
      "lazy dog 😀 and runs far away fast today"
    val docs = Seq(
      ("srcA", astral),
      ("srcA", null.asInstanceOf[String]),
      ("srcB", "plain ascii body that chunks normally over here"),
      ("srcB", "")
    ).toDF("source", "text")
    val kernel = graft.queries.DedupQueries.cdcStatsOf(docs).collect()
    val decl = graft.queries.DedupQueries.cdcStatsDeclarativeOf(docs)
      .collect()
    assert(kernel.toSeq === decl.toSeq)
    // chunk lengths are code points: srcA's bytes sum to the astral
    // doc's CODE-POINT count, not its UTF-16 length
    val a = kernel.find(_.getString(0) == "srcA").get
    assert(a.getLong(3) ===
      astral.codePointCount(0, astral.length).toLong)
    assert(astral.codePointCount(0, astral.length) < astral.length)
  }

  test("kernel chunk pass equals the declarative HOF form exactly") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf).documents.select($"source", $"text")
    val kernel = graft.queries.DedupQueries.cdcStatsOf(docs).collect()
    val decl = graft.queries.DedupQueries.cdcStatsDeclarativeOf(docs)
      .collect()
    assert(kernel.toSeq === decl.toSeq)
  }

  test("property: kernel == declarative over generated Unicode corpora " +
    "(ASCII, CJK, emoji, combining marks, lone-surrogate-free)") {
    import spark.implicits._
    // a deterministic pseudo-random corpus mixing scripts and astral
    // chars; 60 docs in one frame so the equality is one Spark job
    val alphabets = Seq(
      "abcdefgh ijklmnop",       // ascii + spaces
      "数据库查询引擎分布式系统",   // CJK (BMP, multibyte UTF-8)
      "😀🚀🎉🌍💡🔥",              // astral (surrogate pairs)
      "éüñāçو عربيהעברית",       // latin-ext + RTL
      "áë combining") // combining marks
    def gen(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      val parts = (0 until rnd.nextInt(40)).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        val cps = a.codePoints().toArray
        val from = rnd.nextInt(cps.length)
        new String(cps, from, rnd.nextInt(cps.length - from))
      }
      parts.mkString(" ")
    }
    val docs = (0 until 60)
      .map(i => (s"src${i % 4}", gen(i))).toDF("source", "text")
    val kernel = graft.queries.DedupQueries.cdcStatsOf(docs).collect()
    val decl = graft.queries.DedupQueries.cdcStatsDeclarativeOf(docs)
      .collect()
    assert(kernel.toSeq === decl.toSeq)
    // and the spec's code-point replay IS the kernel, astral inputs
    // included — (hash, len) for every chunk of every generated doc
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 60).map(gen).foreach { t =>
      val replica = chunksOf(t).map(c => (md5hex(c), c.codePointCount(0, c.length)))
      assert(graft.functions.Cdc.chunks(t, md).toSeq === replica,
        s"kernel != replay for: $t")
      assert(chunksOf(t).mkString === t, s"reassembly failed for: $t")
    }
  }

  test("qd17 equals the JVM replay per source at sf0.001") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf).documents
      .select($"source", $"text").as[(String, String)].collect()
    val want = docs.groupBy(_._1).view.mapValues { ds =>
      val ch = ds.flatMap(d => chunksOf(d._2))
      val n = ch.size.toLong
      val dist = ch.map(md5hex).distinct.size.toLong
      // code points, not UTF-16 units — the kernel counts code points,
      // and the two only agree while the fixture stays BMP-only
      val bytes = ch.map(c => c.codePointCount(0, c.length).toLong).sum
      (n, dist, bytes, 1000000L * (n - dist) / n, bytes / n)
    }.toMap
    val got = graft.SparkEntry.queries("qd17_cdc_chunks")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got === want)
  }
}

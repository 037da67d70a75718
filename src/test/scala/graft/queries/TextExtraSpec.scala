package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-4 text additions (qt09 C4 filters, qt10 NFC
  * cleanup) beyond the gate's value-hash. */
class TextExtraSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("qt09: keep implies every individual flag passes") {
    val rows = q("qt09_c4_filters").collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val nWords = r.getInt(1)
      val meanLen = r.getDouble(2)
      val nSentences = r.getInt(3)
      val endsPunct = r.getInt(4)
      val hasBad = r.getInt(5)
      val keep = r.getInt(6)
      val expect = if (nWords >= 30 && meanLen >= 3.0 && meanLen <= 10.0 &&
        nSentences >= 1 && endsPunct == 1 && hasBad == 0) 1 else 0
      assert(keep == expect, s"row $r")
      kept += keep
    }
    // the injected axes must leave BOTH decisions represented
    assert(kept > 0 && kept < rows.length, s"degenerate: $kept/${rows.length}")
  }

  test("qt10: injected decomposed accents always normalize shorter") {
    val rows = q("qt10_normalize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lenRaw = r.getInt(1)
      val lenNfc = r.getInt(2)
      val changed = r.getInt(3)
      // the query injects 3 combining accents per doc; NFC composes
      // each with its base letter
      assert(lenNfc == lenRaw - 3, s"row $r")
      assert(changed == 1, s"row $r")
    }
  }

  test("qd11: the eval side of the contamination join broadcasts") {
    val plan = graft.SparkEntry.queries("qd11_decontam")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  /** Canonical sequential BPE replay over a word-count dict — the
    * independent implementation both qt14 tests compare against. */
  private def bpeReplay(
      wc: Seq[(String, Long)], m: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      wc.map { case (w, n) => (w.map(_.toString).toVector :+ "</w>", n) }
    (1 to m).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ => ()
        }
      }
      // max count; ties take the smallest (l, r) in UTF-8 BYTE order —
      // Spark orderBy and DuckDB ORDER BY compare UTF-8 bytes, while
      // Scala's Ordering.String compares UTF-16 code units (they
      // disagree between U+E000..U+FFFF and supplementary planes)
      val utf8 = Ordering.fromLessThan[String] { (a, b) =>
        val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
        val m = math.min(x.length, y.length)
        var i = 0
        while (i < m && x(i) == y(i)) i += 1
        if (i < m) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
      }
      val ord = Ordering.Tuple3(Ordering.Long, utf8.reverse, utf8.reverse)
      val ((l, r), n) = counts.toSeq
        .maxBy { case ((a, b), c) => (c, a, b) }(ord)
      vocab = vocab.map { case (syms, w) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), w)
      }
      (k, l, r, n)
    }
  }

  test("qt14: BPE merges match a sequential JVM replay; best-pair " +
    "counts are non-increasing") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.SparkEntry.queries("qt14_bpe_merges")(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    // any pair created by a merge occurs at most count(merged pair)
    // times, so the learned sequence must be count-monotone
    assert(out.map(_._4).toSeq.sliding(2).forall {
      case Seq(a, b) => b <= a
      case _ => true
    })
    val wc = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("explode(split(lower(text), ' ')) AS w")
      .where("length(w) > 0").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out.toSeq == bpeReplay(wc, 6))
  }

  test("qt14 merges ADJACENT pair occurrences canonically (banana)") {
    import spark.implicits._
    // 'banana' has two adjacent (a,n) occurrences sharing a delimiter;
    // a single-space replace merges only the first (the round-5 review
    // catch) — the double-space form must match the token-level scan
    val dir = java.nio.file.Files.createTempDirectory("bpe_adj").toString
    val docs = Seq(
      (0L, "banana banana banana", "en", "s", 20L),
      (1L, "bananas cabana", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("qt14_bpe_merges")(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq
    val wc = Seq("banana" -> 3L, "bananas" -> 1L, "cabana" -> 1L)
    assert(out == bpeReplay(wc, 6), s"\nspark=$out\nreplay=${bpeReplay(wc, 6)}")
  }

  test("bpeTrain: checkpointed training is byte-identical to " +
    "unchecked; batched merges are disjoint and replay-consistent") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val vocab = graft.queries.TextQueries.bpeVocabOf(docs).cache()
    vocab.count()
    // lineage truncation is a PLAN intervention only — results must be
    // invariant to where (or whether) the checkpoint lands
    val plain = graft.queries.TextQueries.bpeTrain(vocab, 12,
      batchK = 1, checkpointEvery = Int.MaxValue)
    val ckpt = graft.queries.TextQueries.bpeTrain(vocab, 12,
      batchK = 1, checkpointEvery = 3)
    assert(plain == ckpt)
    assert(plain.size == 12)
    // batched: rank 1 is still the exact argmax (first acceptance is
    // unconditional); within a pass accepted pairs touch disjoint
    // symbols, so each batch is a valid (approximate) merge set
    val batched = graft.queries.TextQueries.bpeTrain(vocab, 12,
      batchK = 4, checkpointEvery = 3)
    assert(batched.head == plain.head)
    assert(batched.map(_._1) == (1 to batched.size))
    // no pair is learned twice (count-monotonicity does NOT hold for
    // batched training: a pass-1 merge can create a pair outranking
    // pass-1's own later acceptances — the documented approximation)
    val pairs = batched.map(m => (m._2, m._3))
    assert(pairs.size == pairs.distinct.size)
    vocab.unpersist()
  }

  test("qt12: detect-then-salt path returns values identical to the " +
    "plain join") {
    // salting only reroutes rows across salts; any value drift would
    // mean the count-table replication or salt assignment is wrong.
    // The fixture's stopword-heavy texts guarantee >1/16-share words,
    // so the salted branch (not the hot.isEmpty fallback) is exercised.
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
    val plain = TextQueries.lmScoreOf(docs)
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = TextQueries.lmScoreOf(docs, saltHotWords = 8)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(plain.length == salted.length && plain.sameElements(salted))
  }
}

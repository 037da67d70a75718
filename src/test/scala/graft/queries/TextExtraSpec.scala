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

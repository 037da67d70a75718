package graft.functions

import graft.SparkSpec
import graft.functions.NfcNormalize.nfc
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {

  // explicit escapes so decomposed vs precomposed is visible in-source:
  // ́ = combining acute, ̀ = combining grave,
  // é = precomposed é, À = precomposed À
  test("composes decomposed accent sequences") {
    import spark.implicits._
    val df = Seq(
      "café",        // e + combining acute → é
      "À la carte",  // A + combining grave → À
      "plain ascii",
      "already café"  // precomposed — must pass through unchanged
    ).toDF("s")
    val got = df.select(nfc($"s").as("n")).as[String].collect()
    assert(got(0) == "café")
    assert(got(1) == "À la carte")
    assert(got(2) == "plain ascii")
    assert(got(3) == "already café")
  }

  test("matches java.text.Normalizer on random mixed strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(50) {
      (1 to 20).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => "́"
          case 2 => "é"
          case 3 => "̀"
        }
      }.mkString
    }
    val got = samples.toDF("s").select(nfc($"s")).as[String].collect()
    val want = samples.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
  }

  test("SQL registration and null passthrough") {
    import spark.implicits._
    NfcNormalize.register(spark)
    val got = Seq(Some("café"), None).toDF("s")
      .selectExpr("nfc_normalize(s) as n").as[Option[String]].collect()
    assert(got(0).contains("café"))
    assert(got(1).isEmpty)
  }

  test("whole-stage codegen engages on a parquet scan") {
    val plan = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select(nfc(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}

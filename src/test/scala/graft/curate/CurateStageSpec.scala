package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CurateStage laws: the funnel's keep flags match an independent
  * brute-force recomputation, the audit counts are consistent, and the
  * CLI stage round-trips. */
class CurateStageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docsDf() = graft.Tables(spark, sf).documents

  test("curated set equals brute-force funnel recomputation") {
    import spark.implicits._
    val docs = docsDf().select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)].collect()
    val opts = CurateStage.CurateOptions(
      minWords = 30, maxDupFrac = 0.5,
      rates = Seq("en" -> 80), defaultRate = 50, gramK = 5)

    def grams(t: String): Set[String] = {
      val ws = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      if (ws.length >= 5) ws.sliding(5).map(_.mkString(" ")).toSet
      else Set(ws.mkString(" "))
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val gramDf = docs.flatMap { case (id, t, _) => grams(t).map(_ -> id) }
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet.size }
    val exactKeep = docs.groupBy(d => md5hex(d._2))
      .map { case (_, ds) => ds.map(_._1).min }.toSet
    val want = docs.filter { case (id, t, lang) =>
      val ws = t.split(" ", -1)
      val meanLen = (t.length - (ws.length - 1)).toDouble / ws.length
      val quality = ws.length >= 30 && meanLen >= 3.0 && meanLen <= 10.0 &&
        !t.toLowerCase.contains("lorem ipsum") && !t.contains("{") &&
        !t.toLowerCase.contains("javascript")
      val bucket = (java.lang.Long.parseLong(
        md5hex(id.toString).take(6), 16) % 100).toInt
      val rate = if (lang == "en") 80 else 50
      val gs = grams(t)
      val dupFrac = gs.count(g => gramDf(g) >= 2).toDouble / gs.size
      quality && bucket < rate && exactKeep(id) && dupFrac <= 0.5
    }.map(_._1).toSet

    val (curated, stats) = CurateStage.run(
      docsDf(), opts)
    val got = curated.select($"doc_id").as[Long].collect().toSet
    assert(got == want)
    val st = stats.collect().head
    assert(st.getAs[Long]("n_docs") == docs.length)
    assert(st.getAs[Long]("n_curated") == want.size)
    assert(want.nonEmpty && want.size < docs.length,
      s"degenerate funnel: ${want.size}/${docs.length}")
  }

  test("decontamination drops exactly the overlapping docs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curate_ev").toString
    // eval set = 3 docs copied verbatim from the corpus → any doc
    // sharing a 5-gram with them (including themselves) must drop
    val eval = docsDf().filter($"doc_id" % 100 === 0)
      .select($"doc_id", $"text")
    eval.write.mode("overwrite").parquet(s"$tmp/eval.parquet")
    val opts = CurateStage.CurateOptions(
      minWords = 0, maxDupFrac = 1.0, defaultRate = 100,
      evalPath = Some(s"$tmp/eval.parquet"))
    val (curated, _) = CurateStage.run(docsDf(), opts)
    val kept = curated.select($"doc_id").as[Long].collect().toSet
    val evalIds = eval.select($"doc_id").as[Long].collect().toSet
    assert(evalIds.nonEmpty)
    // the eval copies themselves are contaminated by construction
    assert(evalIds.forall(id => !kept.contains(id)), s"eval docs kept")
  }

  test("CLI --stage curate writes curated parquet and audit stats") {
    val tmp = java.nio.file.Files.createTempDirectory("curate_cli").toString
    docsDf().write.mode("overwrite").parquet(s"$tmp/docs.parquet")
    val stats = graft.Pipeline.run(spark, graft.Pipeline.parseArgs(Array(
      "--stage", "curate", "--input", s"$tmp/docs.parquet",
      "--save-path", s"$tmp/out", "--rates", "en=80", "--default-rate",
      "50")))
    val st = stats.collect().head
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == st.getAs[Long]("n_curated"))
    assert(out.columns.toSet ==
      docsDf().columns.toSet, out.columns.mkString(","))
  }
}

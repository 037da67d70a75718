package graft

import java.nio.file.Files

import graft.wds.Sample
import graft.wds.SampleOps._

/** CI guard for the README "Quickstart (library API)" section: this test
  * body IS the published snippet (modulo asserts) — if the API drifts,
  * this fails before the docs lie. */
class QuickstartSpec extends SparkSpec {

  test("README quickstart: wds write -> read -> SampleOps -> curate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("quickstart").toString

    // 1. build + write a WebDataset shard store (rolling 32-sample tars)
    val samples = (0 until 100).map { i =>
      Sample(f"$i%06d", "", Map(
        "txt" -> s"example document number $i about topic ${i % 7}"
          .getBytes("UTF-8"),
        "cls" -> (i % 3).toString.getBytes("UTF-8")))
    }
    spark.createDataset(samples)
      .write.format("wds").option("maxcount", "32")
      .mode("append").save(dir)

    // 2. read back: one task per shard, column pruning + url-filter
    //    shard pruning in the custom source
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.toURI.toString).sorted
    val ds = spark.read.format("wds").load(shards.toIndexedSeq: _*)
      .as[Sample]

    // 3. the WebDataset operator vocabulary (SampleOps)
    val table = ds
      .filter((s: Sample) => s.entries.contains("txt"))
      .mapEntries((ext, bytes) =>
        if (ext == "txt") new String(bytes, "UTF-8").toUpperCase
          .getBytes("UTF-8")
        else bytes)
      .toTuple("txt;text", "cls") // ';' = first-present alternative
    assert(table.count() == 100)
    assert(table.columns.toSeq == Seq("key", "txt", "cls"))

    // 4. the curation funnel: quality -> mix -> exact-dedup -> dup-span
    val docs = ds
      .map(s => (s.key.toLong, s.utf8("txt").get, "en"))
      .toDF("doc_id", "text", "lang")
    val res = graft.curate.CurateStage.run(docs,
      graft.curate.CurateStage.CurateOptions(
        minWords = 3, rates = Seq("en" -> 100)))
    assert(res.stats.select("n_docs").as[Long].head() == 100)
    assert(res.curated.count() > 0)
    res.close()
  }
}

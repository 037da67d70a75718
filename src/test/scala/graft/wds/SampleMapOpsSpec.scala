package graft.wds

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.wds.SampleOps._
import org.apache.spark.sql.Encoders

/** Direct coverage for the per-sample transform ops (P2/P3/P7/P9). */
class SampleMapOpsSpec extends SparkSpec {

  private implicit lazy val enc: org.apache.spark.sql.Encoder[Sample] =
    Encoders.product[Sample]

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  private lazy val ds = spark.createDataset(Seq(
    Sample("a", "u", Map("txt" -> bytes("keep"), "aux.json" -> bytes("{}"))),
    Sample("b", "u", Map("txt" -> bytes("drop me"), "aux.json" -> bytes("{}")))))

  test("mapSamples None-drops rows (P2)") {
    val out = ds.mapSamples { s =>
      if (s.utf8("txt").exists(_.startsWith("drop"))) None
      else Some(s.copy(url = "mapped"))
    }.collect()
    assert(out.map(_.key).toSeq == Seq("a"))
    assert(out.head.url == "mapped")
  }

  test("mapEntries transforms values per key (P3)") {
    val out = ds.mapEntries { (k, v) =>
      if (k == "txt") new String(v, UTF_8).toUpperCase.getBytes(UTF_8) else v
    }.collect().sortBy(_.key)
    assert(out.head.utf8("txt").contains("KEEP"))
    assert(out.head.utf8("aux.json").contains("{}"))
  }

  test("renameFields picks first-present alternative, drops rest (P7)") {
    val mixed = spark.createDataset(Seq(
      Sample("x", "u", Map("jpg" -> bytes("J"), "extra" -> bytes("E"))),
      Sample("y", "u", Map("png" -> bytes("P")))))
    val out = mixed.renameFields(Seq("image" -> "jpg;png")).collect()
      .sortBy(_.key)
    assert(out.forall(_.entries.keySet == Set("image")))
    assert(out(0).utf8("image").contains("J"))
    assert(out(1).utf8("image").contains("P"))
    val kept = mixed.renameFields(Seq("image" -> "jpg;png"),
      keepRest = true).collect().sortBy(_.key)
    assert(kept(0).entries.keySet == Set("image", "extra"))
  }

  test("extractKeys projects glob matches, errors on ambiguity (P9)") {
    val out = ds.extractKeys("*.json").collect()
    assert(out.length == 2)
    assert(new String(out.head.getAs[Array[Byte]]("json"), UTF_8) == "{}")
    val ambiguous = spark.createDataset(Seq(
      Sample("z", "u", Map("a.json" -> bytes("1"), "b.json" -> bytes("2")))))
    assertThrows[org.apache.spark.SparkException](
      ambiguous.extractKeys("*.json").collect())
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel-vs-declarative cross-check: the JVM MinHash kernel must produce
  * exactly the values of the Column-expression form (and therefore of the
  * DuckDB oracle). */
class MinHashSpec extends SparkSpec {

  test("JVM kernel equals HOF expression signatures") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "tiny"),
      (2L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")

    val kernel = MinHash.signatures(docs, 4).orderBy("doc_id").collect()

    val ws = split(lower($"text"), " ")
    val sh = when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2))))
      .otherwise(array(concat_ws(" ", ws)))
    val hofCols = (0 until 4).map(k =>
      array_min(transform(sh, x =>
        md5(to_binary(concat(lit(s"$k|"), x), lit("utf-8"))))).as(s"h$k"))
    val hof = docs.select(($"doc_id" +: hofCols): _*)
      .orderBy("doc_id").collect()

    kernel.zip(hof).foreach { case (a, b) =>
      (0 to 4).foreach(i => assert(a.get(i) == b.get(i), s"col $i"))
    }
  }

  test("shingles: 3-word windows with short-doc fallback") {
    assert(MinHash.shingles("a b c d").toSeq == Seq("a b c", "b c d"))
    assert(MinHash.shingles("A B").toSeq == Seq("a b"))
    assert(MinHash.shingles("solo").toSeq == Seq("solo"))
  }
}

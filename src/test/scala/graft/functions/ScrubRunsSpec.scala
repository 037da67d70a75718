package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r17 scrub kernel vs the declarative HOF spelling it replaced —
  * the run merge, the minRun threshold, and the concat_ws join
  * semantics (a kept EMPTY token still joins with a space) must be
  * value-identical; the qd21/qd25 oracles pin the full operators. */
class ScrubRunsSpec extends SparkSpec {

  test("keptRuns: merge, adjacency, threshold, overrun") {
    // windows of span 3 at 1 and 3 touch/overlap -> one run [1,5]
    assert(ScrubRuns.keptRuns(IndexedSeq(1, 3), 3, 1) ==
      IndexedSeq((1, 5)))
    // adjacent (gap 0): [1,3] and [4,6] coalesce
    assert(ScrubRuns.keptRuns(IndexedSeq(1, 4), 3, 1) ==
      IndexedSeq((1, 6)))
    // true gap: two runs; threshold 4 keeps only the merged long one
    assert(ScrubRuns.keptRuns(IndexedSeq(1, 8, 9), 3, 1) ==
      IndexedSeq((1, 3), (8, 11)))
    assert(ScrubRuns.keptRuns(IndexedSeq(1, 8, 9), 3, 4) ==
      IndexedSeq((8, 11)))
    assert(ScrubRuns.keptRuns(IndexedSeq.empty, 3, 1).isEmpty)
  }

  test("kernel equals the declarative HOF spelling row for row") {
    import spark.implicits._
    // docs with empty tokens (double spaces), short docs, no-dup docs
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f"), Seq(2), 3),
      (2L, Seq("a", "", "b", "c"), Seq(1), 2), // leading kept "" case
      (3L, Seq("x", "y"), Seq.empty[Int], 2),  // untouched
      (4L, Seq("only"), Seq(1), 1),            // fully scrubbed -> ""
      (5L, (1 to 12).map(i => s"t$i"), Seq(3, 4, 9), 2))
    val df = rows.toDF("doc_id", "ws", "starts", "span")
    for (minRun <- Seq(1, 2, 4)) {
      val kernel = ScrubRuns(df, minRun)
        .orderBy("doc_id").collect().toSeq
      val cov = df.select(col("doc_id"), col("ws"),
        array_sort(array_distinct(flatten(transform(col("starts"),
          s0 => sequence(s0, s0 + col("span") - lit(1)))))).as("cov"))
      val rs = filter(
        transform(col("cov"), (c, i) =>
          when(i === 0, c).otherwise(
            when(element_at(col("cov"), i) =!= c - lit(1), c))),
        x => x.isNotNull)
      val re = filter(
        transform(col("cov"), (c, i) =>
          when(i === size(col("cov")) - 1, c).otherwise(
            when(element_at(col("cov"), i + lit(2)) =!= c + lit(1), c))),
        x => x.isNotNull)
      val declarative = cov
        .select(col("doc_id"), col("ws"),
          filter(zip_with(rs, re, (s0, e0) =>
            struct(s0.as("s"), e0.as("e"))),
            r => r("e") - r("s") + lit(1) >= lit(minRun)).as("runs"))
        .select(col("doc_id"), size(col("ws")).as("n_tokens"),
          (size(col("ws")) - size(filter(sequence(lit(1), size(col("ws"))),
            j => !exists(col("runs"), r =>
              r("s") <= j && j <= r("e"))))).as("n_removed"),
          concat_ws(" ", transform(
            filter(sequence(lit(1), size(col("ws"))), j =>
              !exists(col("runs"), r => r("s") <= j && j <= r("e"))),
            j => element_at(col("ws"), j))).as("scrubbed"))
        .orderBy("doc_id").collect().toSeq
      assert(kernel == declarative, s"minRun=$minRun")
    }
  }
}

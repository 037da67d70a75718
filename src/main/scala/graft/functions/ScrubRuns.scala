package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Row-local scrub kernel for the span-scrub operators (qd21, qd25,
  * the funnel's `--span-scrub` stage).
  *
  * The declarative form — expand dup-gram starts to covered positions
  * (`flatten`+`sequence`+`array_distinct`+`array_sort`), mark run
  * boundaries with indexed `transform`s, `zip_with` them into (s, e)
  * runs, then `filter(sequence(1, n), j -> !exists(runs, ...))` — is
  * correct but runs on Catalyst's interpreted higher-order-function
  * path (the MinHash/ShingleHash lesson: HOFs evaluate outside
  * whole-stage codegen, per element, with per-step array
  * materialization), and the final keep-filter is O(n·runs) per
  * document on what is at small scale a ONE-WIDE stage. This kernel is
  * the same decision sequence as one typed pass: merge the sorted
  * start positions into maximal covered runs (adjacent or overlapping
  * windows coalesce), keep runs ≥ `minRun` tokens, emit the tokens
  * outside kept runs — O(n + starts) per document, no intermediate
  * arrays.
  *
  * Value-identity with the declarative spelling is pinned by the qd21/
  * qd25 DuckDB oracles (which replay the run merge independently, via
  * `row_number` gap grouping) and CurationSpec's qd21 == qd25(minRun=1)
  * law. Tokens arrive PRE-SPLIT (and pre-lowercased when the caller
  * wants the folded form) from Catalyst expressions, so the kernel
  * introduces no split/locale semantics of its own; reassembly is the
  * same `concat_ws(" ", kept)` — `split` keeps empty tokens, so
  * consecutive spaces survive scrub-free documents byte-identically.
  *
  * Scale: narrow map, no shuffle — the joins that produce the start
  * lists are untouched upstream.
  */
object ScrubRuns {

  /** Merged covered runs ≥ minRun, as (startIncl, endIncl) 1-based.
    * `starts` must be ascending; windows [s, s+span-1] that touch or
    * overlap coalesce into one run — exactly the distinct-coverage
    * run merge of the declarative form. */
  private[functions] def keptRuns(
      starts: IndexedSeq[Int], span: Int, minRun: Int)
      : IndexedSeq[(Int, Int)] = {
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var rs = -1
    var re = -2
    var i = 0
    while (i < starts.length) {
      val s = starts(i)
      val e = s + span - 1
      if (s <= re + 1) { if (e > re) re = e }
      else {
        if (rs >= 0 && re - rs + 1 >= minRun) out += ((rs, re))
        rs = s
        re = e
      }
      i += 1
    }
    if (rs >= 0 && re - rs + 1 >= minRun) out += ((rs, re))
    out.result()
  }

  /** @param withCov (doc_id, ws: array<string>, starts: array<int>
    *                ascending distinct 1-based, span: int cut width)
    * @param minRun  minimal merged-run length (tokens) that scrubs;
    *                1 = cut every covered token (the qd21 posture)
    * @return (doc_id, n_tokens, n_removed, scrubbed) — unordered */
  def apply(withCov: DataFrame, minRun: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_tokens", IntegerType),
      StructField("n_removed", IntegerType),
      StructField("scrubbed", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    // explicit input schema: the kernel reads rows positionally with
    // hard-coded types, so a caller whose columns differ must fail at
    // ANALYSIS (missing column / impossible cast), not as a runtime
    // ClassCastException mid-job (r17 ADVICE). At the pinned call
    // sites every cast is a no-op the optimizer erases.
    import org.apache.spark.sql.functions.col
    val typed = withCov.select(
      col("doc_id").cast(LongType),
      col("ws").cast(ArrayType(StringType)),
      col("starts").cast(ArrayType(IntegerType)),
      col("span").cast(IntegerType))
    typed.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val ws = r.getSeq[String](1)
        val starts = r.getSeq[Int](2).toIndexedSeq
        val span = r.getInt(3)
        val n = ws.length
        val runs = keptRuns(starts, span, minRun)
        var removed = 0
        val sb = new java.lang.StringBuilder
        var first = true // NOT sb.isEmpty — a kept "" token still joins
        var j = 1 // 1-based token position
        var k = 0 // current run index
        while (j <= n) {
          if (k < runs.length && j >= runs(k)._1 && j <= runs(k)._2) {
            removed += 1
            if (j == runs(k)._2) k += 1
          } else {
            if (!first) sb.append(' ')
            sb.append(ws(j - 1))
            first = false
          }
          j += 1
        }
        Row(id, n, removed, sb.toString)
      }
    }(enc)
  }
}

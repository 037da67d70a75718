package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** qd28 laws: the broadcast-Bloom prefilter PRUNES the lake side (the
  * 100 TB point) while staying INVISIBLE to the result (false positives
  * die in the exact equi-join), and the dedup semantics match a direct
  * unpruned spelling. */
class BloomIncrementalSpec extends SparkSpec {

  import spark.implicits._

  // lake (even ids): 0 and 2 share a prefix; 4/6/8... unique.
  // batch (odd ids): 1 dups lake-0's prefix, 3 dups 1's (earlier batch),
  // 5 is fresh, 7 dups lake-2's, 9 dups 1's AND lake-0's (lake wins the
  // min), the rest fresh.
  private def docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta one"),
    (2L, "k l m n o p two"),
    (4L, "unique lake four text body here four"),
    (6L, "another lake six text body here six"),
    (8L, "yet more lake eight text body eight"),
    (1L, "alpha beta gamma delta epsilon DIFFERENT tail"),
    (3L, "alpha beta gamma delta epsilon other tail"),
    (5L, "completely fresh batch five text body"),
    (7L, "k l m n o q seven"),
    (9L, "alpha beta gamma delta epsilon ninth tail"),
    (11L, "fresh eleven body text nothing shared"),
  ).toDF("doc_id", "text")

  test("dedup semantics: lake matches, earlier-batch matches, min id") {
    val out = DedupQueries
      .bloomIncrementalFrom(docs, col("doc_id") % 2 === 1)
      .orderBy("new_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1, 0L), // lake-0 prefix match
      (3L, 1, 0L), // lake-0 AND earlier batch-1 — min is the lake id
      (5L, 0, -1L),
      (7L, 1, 2L), // lake-2 prefix match
      (9L, 1, 0L),
      (11L, 0, -1L)))
  }

  test("the bloom prunes the lake side and is invisible to the result") {
    var survivors = -1L
    val out = DedupQueries.bloomIncrementalFrom(
      docs, col("doc_id") % 2 === 1,
      onLakeSurvivors = { df =>
        survivors = df.count()
        df
      }).orderBy("new_id").as[(Long, Int, Long)].collect().toSeq
    // 5 lake rows; only the 2 whose fingerprint a batch doc shares
    // (ids 0 and 2) must survive, plus at most the 3%-fpp strays
    assert(survivors >= 2 && survivors < 5,
      s"bloom must prune unmatched lake rows (survivors=$survivors)")
    assert(out.map(_._1) == Seq(1L, 3L, 5L, 7L, 9L, 11L))
    assert(out == DedupQueries
      .bloomIncrementalFrom(docs, col("doc_id") % 2 === 1)
      .orderBy("new_id").as[(Long, Int, Long)].collect().toSeq,
      "pruned and instrumented runs must agree row-for-row")
  }

  test("null texts have no fingerprint: they never dup each other " +
      "or anything else (SQL NULL-equality semantics)") {
    val withNulls = docs.unionByName(Seq(
      (13L, null.asInstanceOf[String]),
      (15L, null.asInstanceOf[String]),
      (12L, null.asInstanceOf[String]), // a lake null, same posture
    ).toDF("doc_id", "text"))
    val out = DedupQueries
      .bloomIncrementalFrom(withNulls, col("doc_id") % 2 === 1)
      .orderBy("new_id").as[(Long, Int, Long)].collect().toSeq
    assert(out.filter(r => r._1 == 13L || r._1 == 15L) ==
      Seq((13L, 0, -1L), (15L, 0, -1L)),
      s"null-text docs must never be duplicates: $out")
    assert(out.map(_._1) == Seq(1L, 3L, 5L, 7L, 9L, 11L, 13L, 15L),
      "null-text batch docs still appear in the output")
    // an ALL-null batch (a corrupt ingest day): every fingerprint is
    // null, so the bloom aggregate would see zero non-null values and
    // return a null buffer — the guard must short-circuit to the
    // trivial result, never NPE
    val allNull = DedupQueries
      .bloomIncrementalFrom(withNulls, col("doc_id").isin(13L, 15L))
      .orderBy("new_id").as[(Long, Int, Long)].collect().toSeq
    assert(allNull == Seq((13L, 0, -1L), (15L, 0, -1L)))
  }

  test("count and sketch are built in ONE fused aggregate: exactly " +
      "one eager action fires before the result is consumed") {
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      DedupQueries.bloomIncrementalFrom(docs, col("doc_id") % 2 === 1)
      // the listener bus is async: wait for the first event, then a
      // settle window long enough that a stray SECOND eager action
      // (the fused build regressing to count-then-sketch) would land
      val deadline = System.nanoTime() + 5000000000L
      while (actions.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(20)
      Thread.sleep(500)
      assert(actions.get() == 1,
        s"the bloom build must be a single fused (count, sketch) " +
          s"aggregate, saw ${actions.get()} eager actions")
    } finally spark.listenerManager.unregister(listener)
  }

  test("an all-fresh batch yields no dups; an empty batch is safe") {
    val fresh = DedupQueries
      .bloomIncrementalFrom(docs, col("doc_id").isin(5L, 11L))
      .orderBy("new_id").as[(Long, Int, Long)].collect().toSeq
    assert(fresh == Seq((5L, 0, -1L), (11L, 0, -1L)))
    val empty = DedupQueries
      .bloomIncrementalFrom(docs, lit(false))
      .collect()
    assert(empty.isEmpty)
  }
}

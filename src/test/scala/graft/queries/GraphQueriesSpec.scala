package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the graph-analytics tier (qg01 TextRank, qg02 near-dup
  * centrality) beyond the DuckDB gate: exact sequential replay of the
  * ppm power iteration, fixed-point sanity on structured graphs, and
  * the vertex-set contract for isolated nodes. */
class GraphQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Driver-side replay of the exact integer recurrence pagerankPpm
    * distributes: per-edge (w·s) div outw, summed, damped in ppm. */
  private def replay(
      edges: Seq[(String, String, Long)], nodes: Seq[String],
      iters: Int): Map[String, Long] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var s = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = edges
        .map { case (src, dst, w) => dst -> (w * s(src)) / outw(src) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      s = nodes.map(n =>
        n -> (150000L + 850000L * inflow.getOrElse(n, 0L) / 1000000L)).toMap
    }
    s
  }

  private def rankOf(
      edges: Seq[(String, String, Long)], nodes: Seq[String],
      iters: Int): Map[String, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "w")
    val n = nodes.toDF("node")
    GraphQueries.pagerankPpm(e, n, iters)
      .as[(String, Long)].collect().toMap
  }

  test("pagerankPpm equals the exact sequential ppm replay") {
    // asymmetric weighted digraph with a sink-ish node and a hub
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L), ("c", "a", 5L),
      ("d", "a", 1L), ("b", "a", 1L))
    val nodes = Seq("a", "b", "c", "d", "iso")
    for (k <- 1 to 4)
      assert(rankOf(edges, nodes, k) === replay(edges, nodes, k),
        s"divergence at $k iterations")
  }

  test("isolated vertices settle at (1-d) ppm; symmetric cycle is uniform") {
    val cycle = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val got = rankOf(cycle, Seq("a", "b", "c", "iso"), 3)
    assert(got("iso") === 150000L)
    // a uniform cycle is a fixed point of the damped recurrence
    assert(Set(got("a"), got("b"), got("c")).size === 1)
    assert(math.abs(got("a") - 1000000L) <= 5) // integer floors shave ulps
  }

  test("qg01 textrank: deterministic across runs, 20 ranked rows, " +
    "scores bounded by the damped recurrence") {
    val q = graft.SparkEntry.queries("qg01_textrank")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 20)
    assert(a.map(_.getInt(0)).toSeq === (1 to 20))
    // after any iteration scores lie in [(1-d), (1-d) + d·max_inflow];
    // inflow can exceed 1e6 for hubs but stays below total mass
    val scores = a.map(_.getLong(2))
    assert(scores.forall(_ >= 150000L))
    assert(scores.toSeq === scores.sortBy(-_).toSeq)
  }

  test("qg02 dup centrality: top ranks are near-dup cluster members " +
    "with positive degree, ordered by score") {
    val rows = graft.SparkEntry.queries("qg02_dup_centrality")(spark, sf)
      .collect()
    assert(rows.length === 20)
    val (withDeg, isolated) = rows.partition(_.getLong(2) > 0)
    // every connected doc outranks every isolated one (isolated = 150000)
    if (withDeg.nonEmpty && isolated.nonEmpty)
      assert(withDeg.map(_.getLong(3)).min >=
        isolated.map(_.getLong(3)).max)
    assert(isolated.forall(_.getLong(3) === 150000L))
  }

  test("qg03: imputed labels equal the JVM majority-vote replay over " +
    "the LSH pair graph") {
    import spark.implicits._
    val pairs = DedupQueries.lshPairsFrom(
      DedupQueries.signatures(spark, sf))
      .as[(Long, Long)].collect()
    val langs = graft.Tables(spark, sf).documents
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val neighbors = (pairs.map(p => p._1 -> p._2) ++
      pairs.map(p => p._2 -> p._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val want = langs.keys.filter(_ % 5 == 0).map { id =>
      val votes = neighbors.getOrElse(id, Nil).filter(_ % 5 != 0)
        .groupBy(langs).view.mapValues(_.size.toLong).toMap
      val winner =
        if (votes.isEmpty) ("und", 0L)
        else votes.toSeq.minBy { case (l, n) => (-n, l) }
      id -> winner
    }.toMap
    val got = graft.SparkEntry.queries("qg03_label_prop")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)), r.getString(3), r.getInt(4)))
      .toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (winner, trueLang, correct)) =>
      assert(winner === want(id), s"doc $id")
      assert(correct === (if (trueLang == winner._1) 1 else 0))
    }
  }

  test("qg01 plan: one exchange feeds the iteration fan-in via reuse " +
    "(edge aggregation is not recomputed per iteration)") {
    // AQE off for the check: with AQE on, exchange reuse happens at
    // runtime inside AdaptiveSparkPlanExec and is invisible to collect
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try graft.SparkEntry.queries("qg01_textrank")(spark, sf)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val reused = plan.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    // 3 iterations × (edges + outw + scores-chain refs) would rescan
    // documents ~9×; ReuseExchange must collapse the identical
    // edge-agg subtrees (perf-only reuse — correctness is oracle-checked)
    assert(reused.nonEmpty, s"no reused exchange in qg01 plan:\n$plan")
  }
}

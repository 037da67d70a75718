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

  test("st09 band-owner state carries across micro-batches: a late " +
    "smaller id is flagged against the standing owner") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // 3 single-file epochs (coalesce(1) pins one part-file per write)
    // => with maxFilesPerTrigger=1 the stream runs exactly 3 epochs;
    // correctness then REQUIRES the keyed state to hold each band's
    // FIRST-arrival owner across epochs
    val dir = Files.createTempDirectory("lsh_epochs").toString
    val docs = Tables(spark, sfDir).documents.select("doc_id", "text")
    docs.filter($"doc_id" % 3 === 0).coalesce(1).write.parquet(s"$dir/f0")
    docs.filter($"doc_id" % 3 === 1).coalesce(1).write.parquet(s"$dir/f1")
    docs.filter($"doc_id" % 3 === 2).coalesce(1).write.parquet(s"$dir/f2")
    val schema = docs.schema
    // the SHIPPED operator (DedupQueries.bandVerdicts), not a copy
    def run(maxFiles: Option[Int]): Map[Long, Long] = {
      val reader = spark.readStream.schema(schema)
      maxFiles.foreach(n => reader.option("maxFilesPerTrigger", n))
      val src = reader.parquet(s"$dir/*").select($"doc_id", $"text")
      val name = "lshst_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.queries.DedupQueries.bandVerdicts(src)
        .toDF().writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).groupBy($"doc_id")
        .agg(min($"band_min").as("p"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val oneBatch = run(None)
    val threeEpochs = run(Some(1))
    assert(oneBatch.nonEmpty && threeEpochs.keySet == oneBatch.keySet)
    // exact expected values from a sequential replay of the SAME
    // arrival order: each band's owner is the min doc_id of its
    // first-arrival epoch and is NEVER replaced; a doc's verdict is
    // the min owner over its bands. An early original is never
    // retroactively re-labeled, and a late smaller id is flagged dup
    // against the standing owner (partner != doc_id) — the qd15
    // incremental contract. One epoch degenerates to the id-min
    // oracle the gate checks.
    val sigBands = graft.functions.MinHash.signatures(docs, 8)
      .select($"doc_id", array((0 until 4).map { b =>
        substring(md5(to_binary(concat_ws("|", lit(b.toString),
          col(s"h${2 * b}"), col(s"h${2 * b + 1}")), lit("utf-8"))),
          1, 16)
      }: _*).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def simulate(epochOf: Long => Int, nEpochs: Int): Map[Long, Long] = {
      val owner = scala.collection.mutable.Map.empty[String, Long]
      val out = scala.collection.mutable.Map.empty[Long, Long]
      (0 until nEpochs).foreach { ep =>
        val arriving = sigBands.keys.filter(epochOf(_) == ep).toSeq.sorted
        val epochMin = scala.collection.mutable.Map.empty[String, Long]
        arriving.foreach(d => sigBands(d).foreach { b =>
          epochMin.update(b, math.min(epochMin.getOrElse(b, d), d))
        })
        epochMin.foreach { case (b, m) =>
          if (!owner.contains(b)) owner.update(b, m)
        }
        arriving.foreach(d => out(d) = sigBands(d).map(owner).min)
      }
      out.toMap
    }
    assert(oneBatch == simulate(_ => 0, 1), "one-batch != id-min replay")
    assert(threeEpochs == simulate(d => (d % 3).toInt, 3),
      "multi-epoch != first-arrival-owner replay")
  }

  test("st11 keyed-state spike monitor equals the batch qa05 audit " +
    "and accumulates counts across micro-batches") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val stream = graft.SparkEntry.queries("st11_stream_spikes")(spark, sf)
      .collect().toSeq
    val batch = graft.SparkEntry.queries("qa05_spike_detect")(spark, sf)
      .collect().toSeq
    assert(stream === batch)
    // the flush sentinels (2h past max ts) must never appear as data
    val maxBatchH = batch.map(_.getTimestamp(1).getTime).max
    assert(stream.forall(_.getTimestamp(1).getTime <= maxBatchH))
    // multi-batch accumulation: two half-corpus files through the same
    // keyed state must equal the one-shot run (state carries the map)
    val ev = graft.Tables(spark, sf).events
    val stage = java.nio.file.Files
      .createTempDirectory("spike_mb").toString
    val maxTs = ev.agg(org.apache.spark.sql.functions.max($"ts"))
      .head().getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 7200000L)
    val sent = ev.select($"event_type").distinct()
      .select(lit(-1L).as("event_id"), lit(flushTs).as("ts"),
        lit(-1L).as("user_id"), $"event_type", lit(0.0).as("value"),
        lit("{}").as("props"))
    // file 1: even event_ids; file 2: odd; file 3: sentinels — the
    // parquet source with maxFilesPerTrigger=1 delivers them as three
    // ordered micro-batches
    ev.filter($"event_id" % 2 === 0).coalesce(1)
      .write.parquet(s"$stage/b0")
    ev.filter($"event_id" % 2 =!= 0).coalesce(1)
      .write.parquet(s"$stage/b1")
    sent.coalesce(1).write.parquet(s"$stage/b2")
    val src = spark.readStream
      .schema(graft.streaming.EventStreams.EventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/b*")
    val name = "spike_mb_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val out = graft.streaming.EventStreams.runToMemory(spark,
      graft.streaming.EventStreams.spikeMonitor(src), name,
      org.apache.spark.sql.streaming.OutputMode.Append(),
      statePartitions = Some(2))
      .orderBy($"event_type", $"h").collect().toSeq
    assert(out === batch, "multi-batch replay diverged from batch audit")
  }

  test("st10 streaming drift snapshot equals the batch qa03 audit") {
    val sf = "/root/testdata/sf0.001"
    val stream = graft.SparkEntry.queries("st10_stream_drift")(spark, sf)
      .collect().toSeq
    val batch = graft.SparkEntry.queries("qa03_drift")(spark, sf)
      .collect().toSeq
    assert(stream === batch)
  }

  test("st14 streaming KS-drift snapshot equals the batch qa08 audit") {
    val sf = "/root/testdata/sf0.001"
    val stream = graft.SparkEntry.queries("st14_stream_length_drift")(
      spark, sf).collect().toSeq
    val batch = graft.SparkEntry.queries("qa08_length_drift")(spark, sf)
      .collect().toSeq
    assert(stream === batch)
  }

  test("st15 streaming embedding-drift snapshot equals the batch " +
    "qa10 audit") {
    val sf = "/root/testdata/sf0.001"
    val stream = graft.SparkEntry
      .queries("st15_stream_embedding_drift")(spark, sf).collect().toSeq
    val batch = graft.SparkEntry.queries("qa10_embedding_drift")(
      spark, sf).collect().toSeq
    assert(stream === batch)
  }
}

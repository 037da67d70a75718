package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10).
  *
  * The reference has no event-time streaming — its "streams" are lazy
  * one-pass iterators plus unbounded epoch repetition. This module is the
  * engine's forward-looking streaming face: the SAME aggregation logic as
  * the batch EventQueries, expressed over `readStream`, with watermarks
  * bounding state. The sequential-state operators the reference does have
  * (bounded-buffer shuffle B1, greedy packer A5) appear here as their
  * keyed-state analog: flatMapGroupsWithState sessionization.
  *
  * Scale: windowed aggs shard by (window, key) with watermark-bounded
  * state; sessionization shards by user with timeout-driven eviction —
  * both are the standard unbounded-input shapes for a 1000-executor
  * cluster.
  */
object EventStreams {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark —
    * streaming twin of EventQueries.hourly. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup → hourly aggregation: duplicate deliveries
    * (at-least-once sources) are dropped on event_id within the
    * watermark horizon, so the downstream agg sees exactly-once input.
    * State is bounded: a dedup key older than the watermark is evicted.
    */
  def dedupHourly(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      // the dedup's watermark carries through — redefining one between
      // stateful operators is disallowed
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Stream-stream interval join: purchases attributed to the same
    * user's clicks within the following hour. Both sides are
    * watermarked so join state is evicted once the event-time horizon
    * passes — the standard bounded-state two-stream shape. */
  def clickAttribution(
      clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p, expr(
      """c_user = p_user AND
        |purchase_ts > click_ts AND
        |purchase_ts <= click_ts + interval 1 hour""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_ts"),
        col("purchase_ts"))
  }

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionAgg(
      user_id: Long, session_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      session_value: Double)
  // public at object scope: Catalyst codegen instantiates state classes
  // reflectively and can't reach private members
  final case class SessionState(
      sessionId: Long, n: Long, start: Long, lastTs: Long, value: Double)

  /** Gap-based sessionization with keyed state + processing-time
    * timeout: the streaming form of EventQueries.sessionize (and the
    * keyed-state restatement of the A5 sequential fold). A session is
    * emitted when a 30-minute event-time gap closes it, or when the
    * processing-time timeout fires (idle user) — the timeout both
    * flushes trailing sessions and evicts state, bounding the store. */
  def sessionize(events: DataFrame): DataFrame =
    sessionize(events, timeoutEviction = true)

  /** @param timeoutEviction true (production, unbounded input): idle
    *   users flush their open session and evict state on a
    *   processing-time timeout. false (bounded replays, e.g.
    *   AvailableNow over a finite directory): no timeout — an
    *   AvailableNow query with pending processing-time timeouts never
    *   terminates, and a bounded replay has no idle-eviction need. */
  def sessionize(events: DataFrame, timeoutEviction: Boolean): DataFrame = {
    import events.sparkSession.implicits._
    val gapSeconds = 30L * 60
    // gap test on SECOND-truncated timestamps: the batch twin compares
    // unix_timestamp (floor-seconds) deltas, so an exact-micros test
    // would split sessions the batch query keeps together whenever a
    // gap straddles (1800s, 1801s) across second boundaries
    def gapExceeded(prevUs: Long, tUs: Long): Boolean =
      Math.floorDiv(tUs, 1000000L) - Math.floorDiv(prevUs, 1000000L) >
        gapSeconds
    val mode =
      if (timeoutEviction) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    // state keeps epoch-MICROS (Timestamp.getTime is millis and would
    // truncate the events table's microsecond precision)
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos % 1000000) / 1000
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
      t
    }
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, mode) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle user: flush the open session and evict state
            val st = state.get
            state.remove()
            if (st.n > 0)
              Iterator(SessionAgg(user, st.sessionId, st.n,
                toTs(st.start), toTs(st.lastTs), st.value))
            else Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val out = Seq.newBuilder[SessionAgg]
            // session ids are 1-based, matching the batch form's
            // running-sum-of-new-session-flags numbering
            var st = state.getOption.getOrElse(
              SessionState(1L, 0L, 0L, Long.MinValue, 0.0))
            sorted.foreach { e =>
              val t = micros(e.ts)
              if (st.lastTs != Long.MinValue && gapExceeded(st.lastTs, t)) {
                out += SessionAgg(user, st.sessionId, st.n,
                  toTs(st.start), toTs(st.lastTs), st.value)
                st = SessionState(st.sessionId + 1, 0L, t, t, 0.0)
              }
              st = st.copy(n = st.n + 1,
                start = if (st.n == 0) t else st.start, lastTs = t,
                value = st.value + e.value)
            }
            state.update(st)
            if (timeoutEviction)
              state.setTimeoutDuration(gapSeconds * 1000)
            out.result().iterator
          }
      }.toDF()
  }

  final case class SpikeRow(
      event_type: String, h: java.sql.Timestamp, n: Long,
      trail_sum: Long, trail_n: Long, ratio_ppm: Long, spike: Int)
  final case class SpikeState(counts: Map[Long, Long])

  /** st11: the qa05 ingest-rate spike detector as keyed streaming
    * state — per event_type, hourly counts accumulate in a (hour →
    * count) map; a flush sentinel (event_id = -1, one per type, beyond
    * the corpus max ts) finalizes the history and emits every hour's
    * trailing-24h ratio with the batch query's exact integer
    * arithmetic. Bounded-replay form (NoTimeout): counts survive
    * micro-batch boundaries, so any event arrival order yields the
    * same finalized history. An unbounded deployment would emit a
    * closed hour as soon as the watermark passes it and evict hours
    * older than the window (state O(25) per type); the flush-sentinel
    * form is the bounded-gate restatement of that, like st04's. */
  def spikeMonitor(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    // Hour bucketing must match the batch audit's session-TZ
    // date_trunc('hour', ts) — a raw UTC epoch floor diverges in any
    // zone whose offset isn't a whole hour, silently breaking the
    // st11↔qa05 shared-oracle contract outside UTC sessions.
    val zoneIdStr =
      events.sparkSession.sessionState.conf.sessionLocalTimeZone
    events.as[Event]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SpikeState, SpikeRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, batch: Iterator[Event], state: GroupState[SpikeState]) =>
          val zone = java.time.ZoneId.of(zoneIdStr)
          var counts = state.getOption.map(_.counts)
            .getOrElse(Map.empty[Long, Long])
          var flush = false
          batch.foreach { e =>
            if (e.event_id == -1L) flush = true
            else {
              val hSec = java.time.ZonedDateTime
                .ofInstant(e.ts.toInstant, zone)
                .truncatedTo(java.time.temporal.ChronoUnit.HOURS)
                .toEpochSecond
              counts = counts.updated(hSec, counts.getOrElse(hSec, 0L) + 1)
            }
          }
          if (!flush) {
            state.update(SpikeState(counts)); Iterator.empty
          } else {
            state.remove()
            // constants come from the batch audit — the two forms must
            // never drift (EventStreamsSpec pins parity)
            val win = graft.queries.QualityQueries.SpikeWin.toLong * 3600
            val minHist = graft.queries.QualityQueries.SpikeMinHist
            val thresh = graft.queries.QualityQueries.SpikeRatioPpm
            val hours = counts.toSeq.sortBy(_._1)
            hours.iterator.flatMap { case (h, n) =>
              // trailing CALENDAR window: observed hours in (h-24h, h)
              val trail = hours
                .filter(x => x._1 >= h - win && x._1 < h).map(_._2)
              if (trail.length >= minHist) {
                val ratio = 1000000L * n * trail.length / trail.sum
                Some(SpikeRow(typ, new java.sql.Timestamp(h * 1000L), n,
                  trail.sum, trail.length.toLong, ratio,
                  if (ratio >= thresh) 1 else 0))
              } else None
            }
          }
      }.toDF()
  }

  final case class FunnelBuf(t1: Long, clicks: Seq[Long],
      purchases: Seq[Long])
  final case class FunnelUserRow(user_id: Long, stage: Int,
      lag12_us: Long, lag23_us: Long)

  /** st12: streaming ORDERED funnel — the keyed multi-stage state
    * machine (qe10's batch semantics): per user, earliest signup,
    * earliest click AFTER it, earliest purchase after that. State
    * keeps the min signup plus the click/purchase time buffers (the
    * min-after chain can't prune them until the signup min is final —
    * same O(user's events) state contract as sessionization), and the
    * per-user flush sentinel (event_id -1) resolves the chain and
    * emits the user's final stage row. Batch-order-insensitive: every
    * buffered quantity is a set/min, so micro-batch splits can't
    * change the answer. */
  def funnelStages(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelUserRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[FunnelBuf]) =>
          var st = state.getOption
            .getOrElse(FunnelBuf(Long.MaxValue, Nil, Nil))
          var flush = false
          batch.foreach { e =>
            if (e.event_id == -1L) flush = true
            else {
              val us = e.ts.getTime * 1000L +
                (e.ts.getNanos / 1000) % 1000
              e.event_type match {
                case "signup" =>
                  if (us < st.t1) st = st.copy(t1 = us)
                case "click" => st = st.copy(clicks = us +: st.clicks)
                case "purchase" =>
                  st = st.copy(purchases = us +: st.purchases)
                case _ => ()
              }
            }
          }
          if (!flush) { state.update(st); Iterator.empty }
          else {
            state.remove()
            if (st.t1 == Long.MaxValue) Iterator.empty
            else {
              val t2 = st.clicks.filter(_ > st.t1)
                .minOption.getOrElse(Long.MaxValue)
              val t3 =
                if (t2 == Long.MaxValue) Long.MaxValue
                else st.purchases.filter(_ > t2)
                  .minOption.getOrElse(Long.MaxValue)
              val stage =
                if (t3 != Long.MaxValue) 3
                else if (t2 != Long.MaxValue) 2 else 1
              Iterator.single(FunnelUserRow(user, stage,
                if (t2 != Long.MaxValue) t2 - st.t1 else 0L,
                if (t3 != Long.MaxValue) t3 - t2 else 0L))
            }
          }
      }.toDF()
  }

  /** File-source streaming read over a parquet directory (the batch
    * tables replayed as a stream for tests/demo). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema).parquet(dir)

  /** Run a streaming DataFrame to completion against a bounded source
    * (memory sink) and return the result table.
    *
    * `statePartitions` pins the stateful-operator partition count for
    * this query (the shuffle-partition conf at FIRST start is baked
    * into the checkpoint): every stateful op instantiates and
    * checkpoints one state store per partition — a stream-stream join
    * keeps FOUR — so a bounded replay wants few large partitions
    * (measured: st03 7.4 s @32 → 2.9 s @8 → ~1.8 s @4 at sf0.1; below
    * 4 the return vanishes), while an
    * unbounded high-throughput job sizes it to the cluster. */
  def runToMemory(
      spark: SparkSession,
      stream: DataFrame,
      name: String,
      mode: OutputMode = OutputMode.Append,
      statePartitions: Option[Int] = None): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      val q: StreamingQuery = stream.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally statePartitions.foreach(_ => spark.conf.set(key, prev))
    spark.table(name)
  }
}

package graft.queries

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit tier (Deequ-shaped): the checks a 100 TB pipeline
  * runs before admitting a batch into the lake.
  *
  *  - qa01 column profile: per-column null/distinct/min/max in ONE scan
  *    (single agg row → stack) — a 100 TB profile must not re-scan per
  *    column. Multi-distinct plans via Expand stay one pass, at the
  *    cost of a (k+1)× row expansion feeding the exchange; at true
  *    100 TB scale swap the exact count_distinct for the native
  *    `kmv_sketch` aggregate (bounded k-long state per group, qd13) —
  *    exact is kept here because the DuckDB oracle hash-checks it.
  *  - qa02 constraint validation: declarative rule → violation count +
  *    rate, one scan for row-local rules plus one aggregation for the
  *    uniqueness rule (the only rule that inherently needs a shuffle).
  *  - qa03 distribution drift: categorical share comparison between two
  *    time periods (the train/serve skew monitor), L1 contribution per
  *    category.
  */
object QualityQueries extends QueryRegistry {

  private val NumCols = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax")
  private val StrCols = Seq("l_returnflag", "l_linestatus")

  private def profile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    // One branch per column: a column-PRUNED scan + a groupBy over that
    // column's distinct values (map-side partial agg collapses dups
    // before the shuffle), then a 1-row rollup. On columnar storage the
    // branches together read the same bytes as one full-width scan.
    // The obvious alternative — one aggregate with N count_distincts —
    // plans an Expand that multiplies EVERY ROW by N before shuffling:
    // 6× the corpus in flight at 100 TB, and 8.9s vs ~1s at sf0.1.
    def branch(c: String, isNum: Boolean): DataFrame =
      li.select(col(c)).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L))
            .as("n_nulls"),
          count(col(c)).as("n_distinct"),
          (if (isNum) min(col(c)).cast("double")
           else lit(null).cast("double")).as("min_num"),
          (if (isNum) max(col(c)).cast("double")
           else lit(null).cast("double")).as("max_num"),
          (if (isNum) lit(null).cast("string")
           else min(col(c)).cast("string")).as("min_str"),
          (if (isNum) lit(null).cast("string")
           else max(col(c)).cast("string")).as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    (NumCols.map(branch(_, isNum = true)) ++
      StrCols.map(branch(_, isNum = false)))
      .reduce(_ unionAll _)
      .orderBy("col_name")
  }

  private val profileSql = {
    val aggs =
      (NumCols ++ StrCols).map(c =>
        s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS ${c}__nulls, " +
        s"count(DISTINCT $c) AS ${c}__nd, min($c) AS ${c}__min, " +
        s"max($c) AS ${c}__max").mkString(",\n    ")
    val rows =
      (NumCols.map(c =>
        s"SELECT '$c' AS col_name, n_rows, ${c}__nulls AS n_nulls, " +
        s"${c}__nd AS n_distinct, ${c}__min::DOUBLE AS min_num, " +
        s"${c}__max::DOUBLE AS max_num, NULL::VARCHAR AS min_str, " +
        "NULL::VARCHAR AS max_str FROM a") ++
      StrCols.map(c =>
        s"SELECT '$c', n_rows, ${c}__nulls, ${c}__nd, NULL::DOUBLE, " +
        s"NULL::DOUBLE, ${c}__min, ${c}__max FROM a"))
        .mkString("\n  UNION ALL ")
    s"""WITH a AS (
       |  SELECT count(*) AS n_rows,
       |    $aggs
       |  FROM lineitem)
       |$rows
       |ORDER BY col_name""".stripMargin
  }

  /** Row-local rules as (name, violation predicate); violated also when
    * the input is NULL (a null quantity is not a positive quantity). */
  private val Rules: Seq[(String, Column)] = Seq(
    "quantity_positive" -> !(col("l_quantity") > 0),
    "discount_unit_range" ->
      !(col("l_discount") >= 0 && col("l_discount") <= 1),
    "tax_unit_range" -> !(col("l_tax") >= 0 && col("l_tax") <= 1),
    "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
    "linestatus_domain" -> !col("l_linestatus").isin("O", "F"),
    "price_positive" -> !(col("l_extendedprice") > 0),
  ).map { case (n, viol) => (n, coalesce(viol, lit(true))) }

  private def constraints(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    val aggs = count(lit(1)).as("n_rows") +:
      Rules.map { case (n, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(s"${n}__v")
      }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val branches = Rules.map { case (n, _) => s"'$n', ${n}__v" }
    val rowLocal = one.select(expr(
      s"stack(${Rules.size}, ${branches.mkString(", ")}) AS " +
        "(rule, n_violations)"), col("n_rows"))
    // uniqueness rule: the one check that needs a shuffle — rows beyond
    // the first of each (orderkey, linenumber) key are violations
    val dups = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"),
        coalesce(sum(col("cnt")), lit(0L)).as("n_rows"))
      .select(lit("orderline_unique").as("rule"), col("n_violations"),
        col("n_rows"))
    rowLocal.unionByName(dups)
      .select(col("rule"), col("n_violations"),
        round(col("n_violations") * 100.0 / col("n_rows"), 4)
          .as("violation_pct"))
      .orderBy("rule")
  }

  private val SqlViols = Seq(
    "quantity_positive" -> "NOT (l_quantity > 0)",
    "discount_unit_range" -> "NOT (l_discount >= 0 AND l_discount <= 1)",
    "tax_unit_range" -> "NOT (l_tax >= 0 AND l_tax <= 1)",
    "returnflag_domain" -> "l_returnflag NOT IN ('A', 'N', 'R')",
    "linestatus_domain" -> "l_linestatus NOT IN ('O', 'F')",
    "price_positive" -> "NOT (l_extendedprice > 0)",
  )

  private def sqlViolAggs: String = SqlViols.map { case (n, p) =>
    s"sum(CASE WHEN coalesce($p, TRUE) THEN 1 ELSE 0 END)::BIGINT AS ${n}__v"
  }.mkString(",\n    ")

  private def sqlViolRows: String = SqlViols.map { case (n, _) =>
    s"SELECT '$n' AS rule, ${n}__v AS n_violations, n_rows FROM a"
  }.mkString("\n  UNION ALL ")

  /** Oracle for the streaming monitor: the row-local subset of qa02. */
  private val streamConstraintsSql =
    s"""WITH a AS (
       |  SELECT count(*) AS n_rows,
       |    $sqlViolAggs
       |  FROM lineitem)
       |SELECT rule, n_violations,
       |  round(n_violations * 100.0 / n_rows, 4) AS violation_pct
       |FROM ($sqlViolRows)
       |ORDER BY rule""".stripMargin

  private val constraintsSql = {
    val aggs = sqlViolAggs
    val rows = sqlViolRows
    s"""WITH a AS (
       |  SELECT count(*) AS n_rows,
       |    $aggs
       |  FROM lineitem),
       |u AS (
       |  SELECT 'orderline_unique' AS rule,
       |    (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT
       |      AS n_violations,
       |    count(*) AS n_rows
       |  FROM lineitem)
       |SELECT rule, n_violations,
       |  round(n_violations * 100.0 / n_rows, 4) AS violation_pct
       |FROM ($rows UNION ALL SELECT * FROM u)
       |ORDER BY rule""".stripMargin
  }

  /** st08: the qa02 row-local rules as a STREAMING monitor — the
    * validate-as-you-ingest shape (violation counters over an unbounded
    * source, Complete mode). Only the row-local rules stream (the
    * uniqueness rule needs unbounded keyed state by design — that one
    * stays a batch audit); totals must equal the batch audit's, so the
    * oracle is the 6-rule subset of qa02's. The global agg is a 1-row
    * partial-aggregated stream — no keyed state, no watermark needed. */
  private def streamConstraints(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    val stage = WdsQueries.scratchDir("graft_qa_stage")
    li.write.mode("overwrite").parquet(stage)
    val stream = s.readStream.schema(li.schema).parquet(stage)
    val aggs = count(lit(1)).as("n_rows") +:
      Rules.map { case (n, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(s"${n}__v")
      }
    val name = "stream_qa_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val one = graft.streaming.EventStreams.runToMemory(s,
      stream.agg(aggs.head, aggs.tail: _*), name,
      org.apache.spark.sql.streaming.OutputMode.Complete(),
      statePartitions = Some(1))
    val branches = Rules.map { case (n, _) => s"'$n', ${n}__v" }
    one.select(expr(
      s"stack(${Rules.size}, ${branches.mkString(", ")}) AS " +
        "(rule, n_violations)"), col("n_rows"))
      .select(col("rule"), col("n_violations"),
        round(col("n_violations") * 100.0 / col("n_rows"), 4)
          .as("violation_pct"))
      .orderBy("rule")
  }

  /** Spike detector: trailing CALENDAR window width (hours), minimum
    * observed history before a ratio is meaningful, and the flag
    * threshold in ppm. private[graft]: the streaming twin
    * (EventStreams.spikeMonitor) replays the same recurrence and must
    * never drift from these. */
  private[graft] val SpikeWin = 24
  private[graft] val SpikeMinHist = 12
  private[graft] val SpikeRatioPpm = 2000000L

  /** qa05: ingest-rate anomaly detection — each (event_type, hour)
    * count against the mean of the observed hours in the trailing 24
    * CALENDAR hours (a RANGE window over hour epochs, not a row
    * window: on sparse streams a row window would reach back days and
    * compare a burst against week-old baselines). ratio_ppm =
    * 1e6·n·|trail|/Σtrail, spike when ≥2× with ≥[[SpikeMinHist]]
    * observed hours of history. The volume monitor a pipeline runs on
    * every ingest stream. All arithmetic stays in non-negative
    * integers — floor-vs-truncation division divergence between
    * engines only exists below zero.
    *
    * Scale shape: one corpus pass to hourly counts (tiny), then a
    * per-type ordered range window — partitioned by event_type, never
    * global. */
  private def spikes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables(s, dir).events
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hsec", unix_timestamp($"h"))
    val w = Window.partitionBy($"event_type").orderBy($"hsec")
      .rangeBetween(-SpikeWin.toLong * 3600, -3600)
    hourly
      .withColumn("trail_sum", sum($"n").over(w))
      .withColumn("trail_n", count($"n").over(w))
      .filter($"trail_n" >= SpikeMinHist)
      .select($"event_type", $"h", $"n", $"trail_sum", $"trail_n",
        expr("(1000000 * n * trail_n) div trail_sum").as("ratio_ppm"))
      .withColumn("spike", ($"ratio_ppm" >= SpikeRatioPpm).cast("int"))
      .orderBy($"event_type", $"h")
  }

  private val spikesSql =
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h,
       |    count(*)::BIGINT AS n
       |  FROM events GROUP BY event_type, h),
       |hs AS (SELECT *, epoch(h)::BIGINT AS hsec FROM hourly),
       |trail AS (
       |  SELECT event_type, h, n,
       |    sum(n) OVER w AS trail_sum, count(n) OVER w AS trail_n
       |  FROM hs
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hsec
       |    RANGE BETWEEN ${SpikeWin * 3600} PRECEDING
       |          AND 3600 PRECEDING))
       |SELECT event_type, h, n, trail_sum::BIGINT AS trail_sum,
       |  trail_n::BIGINT AS trail_n,
       |  ((1000000 * n * trail_n) // trail_sum)::BIGINT AS ratio_ppm,
       |  (((1000000 * n * trail_n) // trail_sum) >= $SpikeRatioPpm)::INT
       |    AS spike
       |FROM trail WHERE trail_n >= $SpikeMinHist
       |ORDER BY event_type, h""".stripMargin

  /** qa06: dataset snapshot diff — the version-to-version audit a
    * pipeline runs before promoting a new corpus build: per source,
    * how many docs were added, removed, changed (same id, different
    * content hash) or untouched. FULL OUTER join on doc_id; change
    * detection on md5(text) so the comparison never ships document
    * bodies. The "previous" snapshot is simulated deterministically
    * from the fixture (every 7th doc is new in current; every 11th id
    * has a retired ghost row; every 5th surviving doc had its last
    * char edited) — a production run would read two real snapshot
    * paths through the identical plan.
    *
    * Scale shape: two narrow (id, hash, source) scans, one id-keyed
    * shuffle each side, per-source rollup — content never joins. */
  private def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
    val curr = docs.select($"doc_id", $"source",
      md5(to_binary($"text", lit("utf-8"))).as("h"))
    val prevLive = docs.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", $"source",
        md5(to_binary(
          when($"doc_id" % 5 === 0 && length($"text") > 0,
            $"text".substr(lit(1), length($"text") - 1))
            .otherwise($"text"), lit("utf-8"))).as("h"))
    // Ghost ids live in the negative namespace (-id-1): disjoint from
    // real non-negative doc_ids at ANY corpus size, unlike an additive
    // offset which collides once the corpus outgrows it.
    val prevGhosts = docs.filter($"doc_id" % 11 === 0)
      .select((-$"doc_id" - 1L).as("doc_id"), $"source",
        md5(to_binary($"text", lit("utf-8"))).as("h"))
    val prev = prevLive.unionByName(prevGhosts)
    val joined = curr.as("c").join(prev.as("p"),
      col("c.doc_id") === col("p.doc_id"), "full_outer")
    joined.select(
        coalesce(col("c.source"), col("p.source")).as("source"),
        when(col("p.doc_id").isNull, "added")
          .when(col("c.doc_id").isNull, "removed")
          .when(col("c.h") =!= col("p.h"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy($"source")
      .agg(
        sum(when($"status" === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when($"status" === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when($"status" === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when($"status" === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
      .orderBy($"source")
  }

  private val snapshotDiffSql =
    """WITH curr AS (
      |  SELECT doc_id, source, md5(text) AS h FROM documents),
      |prev AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 5 = 0 AND length(text) > 0
      |             THEN substr(text, 1, length(text)::INT - 1)
      |             ELSE text END) AS h
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1, source, md5(text)
      |  FROM documents WHERE doc_id % 11 = 0),
      |j AS (
      |  SELECT coalesce(c.source, p.source) AS source,
      |    CASE WHEN p.doc_id IS NULL THEN 'added'
      |         WHEN c.doc_id IS NULL THEN 'removed'
      |         WHEN c.h <> p.h THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM curr c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id)
      |SELECT source,
      |  sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT
      |    AS n_added,
      |  sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT
      |    AS n_removed,
      |  sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT
      |    AS n_changed,
      |  sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT
      |    AS n_unchanged
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** st11: qa05's spike detector over an unbounded ingest — keyed
    * state per event_type (EventStreams.spikeMonitor), flush-sentinel
    * bounded replay (st04's pattern), result equals the batch audit so
    * it shares qa05's oracle. */
  private def streamSpikes(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    val stage = WdsQueries.scratchDir("graft_spike_stage")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)
    val sentinels = ev.select(col("event_type")).distinct()
      .select(lit(-1L).as("event_id"), lit(flushTs).as("ts"),
        lit(-1L).as("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    ev.unionByName(sentinels).write.mode("overwrite").parquet(stage)
    val name = "stream_spike_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    graft.streaming.EventStreams.runToMemory(s,
      graft.streaming.EventStreams.spikeMonitor(
        graft.streaming.EventStreams.readEventStream(s, stage)),
      name, org.apache.spark.sql.streaming.OutputMode.Append(),
      statePartitions = Some(4))
      .orderBy(col("event_type"), col("h"))
  }

  /** qa04: cross-table referential-integrity audit — per foreign key:
    * child rows, orphan children (no parent), parent rows, referenced
    * parents, and coverage (referenced/total parents in ppm). The
    * lake-admission check qa02's row-local rules can't express.
    *
    * Scale shape: orphan counts are LEFT ANTI joins (the parent key set
    * is the build side — dimension-sized for cust/part/supp, and for the
    * one fact-fact edge (lineitem→orders) AQE picks the shuffle join);
    * referenced-parent counts aggregate the child's distinct keys before
    * joining, so the join input is |distinct keys|, not |child rows|. */
  private def refIntegrity(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    case class Fk(rule: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String)
    val fks = Seq(
      Fk("lineitem_orderkey", t.lineitem, "l_orderkey",
        t.orders, "o_orderkey"),
      Fk("lineitem_partkey", t.lineitem, "l_partkey", t.part, "p_partkey"),
      Fk("lineitem_suppkey", t.lineitem, "l_suppkey",
        t.supplier, "s_suppkey"),
      Fk("orders_custkey", t.orders, "o_custkey",
        t.customer, "c_custkey"))
    fks.map { fk =>
      val child = fk.child.select(col(fk.ck).as("k"))
      val parent = fk.parent.select(col(fk.pk).as("k"))
      val nChild = child.agg(count(lit(1)).as("n_child"))
      val orphans = child.join(parent, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val nParent = parent.agg(count(lit(1)).as("n_parents"))
      val referenced = child.distinct().join(parent, Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n_referenced"))
      nChild.crossJoin(orphans).crossJoin(nParent).crossJoin(referenced)
        .select(lit(fk.rule).as("rule"), col("n_child"), col("n_orphans"),
          col("n_parents"), col("n_referenced"),
          expr("(1000000 * n_referenced) div n_parents")
            .as("coverage_ppm"))
    }.reduce(_ unionAll _).orderBy("rule")
  }

  private val refIntegritySql = {
    val fks = Seq(
      ("lineitem_orderkey", "lineitem", "l_orderkey", "orders",
        "o_orderkey"),
      ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier",
        "s_suppkey"),
      ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"))
    // EXISTS / NOT EXISTS, never IN: a NULL child key is an orphan to
    // Spark's anti join but UNKNOWN to NOT IN, and one NULL parent key
    // collapses a NOT IN orphan count to 0 — EXISTS matches anti/semi
    // join semantics exactly under NULLs
    fks.map { case (rule, c, ck, p, pk) =>
      s"""SELECT '$rule' AS rule,
         |  (SELECT count(*) FROM $c)::BIGINT AS n_child,
         |  (SELECT count(*) FROM $c ch WHERE NOT EXISTS
         |     (SELECT 1 FROM $p WHERE $pk = ch.$ck))::BIGINT AS n_orphans,
         |  (SELECT count(*) FROM $p)::BIGINT AS n_parents,
         |  (SELECT count(DISTINCT $ck) FROM $c ch WHERE EXISTS
         |     (SELECT 1 FROM $p WHERE $pk = ch.$ck))::BIGINT AS n_referenced,
         |  ((1000000 * (SELECT count(DISTINCT $ck) FROM $c ch WHERE EXISTS
         |     (SELECT 1 FROM $p WHERE $pk = ch.$ck)))
         |   // (SELECT count(*) FROM $p))::BIGINT AS coverage_ppm"""
        .stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY rule"
  }

  /** st10: qa03's drift monitor as a STREAMING query — the train/serve
    * skew sentinel running over an unbounded ingest instead of a batch
    * audit. The streaming part is the per-(category, period) counter
    * (Complete-mode global agg, tiny keyed state: |categories|×2 rows);
    * the share/L1 arithmetic happens on the emitted snapshot exactly as
    * qa03 does it, so the result — and the oracle — are qa03's. */
  private def streamDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, dir).orders
    val stage = WdsQueries.scratchDir("graft_qa3_stage")
    o.write.mode("overwrite").parquet(stage)
    val stream = s.readStream.schema(o.schema).parquet(stage)
      .withColumn("period",
        when(year($"o_orderdate") < 1998, "a").otherwise("b"))
      .groupBy($"o_orderpriority", $"period")
      .agg(count(lit(1)).as("n"))
    val name = "stream_qa3_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val counts = graft.streaming.EventStreams.runToMemory(s, stream, name,
      org.apache.spark.sql.streaming.OutputMode.Complete(),
      statePartitions = Some(4))
    val pivoted = counts.groupBy($"o_orderpriority")
      .agg(
        coalesce(sum(when($"period" === "a", $"n")), lit(0L)).as("n_a"),
        coalesce(sum(when($"period" === "b", $"n")), lit(0L)).as("n_b"))
    val totals = pivoted.agg(sum($"n_a").as("tot_a"), sum($"n_b").as("tot_b"))
    pivoted.crossJoin(broadcast(totals))
      .select($"o_orderpriority", $"n_a", $"n_b",
        round($"n_a" * 1.0 / $"tot_a", 6).as("share_a"),
        round($"n_b" * 1.0 / $"tot_b", 6).as("share_b"),
        round(abs($"n_a" * 1.0 / $"tot_a" - $"n_b" * 1.0 / $"tot_b"), 6)
          .as("drift"))
      .orderBy($"o_orderpriority")
  }

  /** qa03: categorical distribution drift between order periods (pre /
    * post 1998) — per-category share in each period and its L1
    * contribution. Shares are exact integer ratios rounded identically
    * in both engines. */
  private def drift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, dir).orders
      .withColumn("period",
        when(year($"o_orderdate") < 1998, "a").otherwise("b"))
    val counts = o.groupBy($"o_orderpriority", $"period")
      .agg(count(lit(1)).as("n"))
    val pivoted = counts.groupBy($"o_orderpriority")
      .agg(
        coalesce(sum(when($"period" === "a", $"n")), lit(0L)).as("n_a"),
        coalesce(sum(when($"period" === "b", $"n")), lit(0L)).as("n_b"))
    val totals = pivoted.agg(sum($"n_a").as("tot_a"), sum($"n_b").as("tot_b"))
    pivoted.crossJoin(broadcast(totals))
      .select($"o_orderpriority", $"n_a", $"n_b",
        round($"n_a" * 1.0 / $"tot_a", 6).as("share_a"),
        round($"n_b" * 1.0 / $"tot_b", 6).as("share_b"),
        round(abs($"n_a" * 1.0 / $"tot_a" - $"n_b" * 1.0 / $"tot_b"), 6)
          .as("drift"))
      .orderBy($"o_orderpriority")
  }

  private val driftSql =
    """WITH p AS (
      |  SELECT o_orderpriority,
      |    CASE WHEN year(o_orderdate) < 1998 THEN 'a' ELSE 'b' END AS period
      |  FROM orders),
      |c AS (
      |  SELECT o_orderpriority,
      |    sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END)::BIGINT AS n_a,
      |    sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END)::BIGINT AS n_b
      |  FROM p GROUP BY o_orderpriority),
      |t AS (SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM c)
      |SELECT o_orderpriority, n_a, n_b,
      |  round(n_a * 1.0 / tot_a, 6) AS share_a,
      |  round(n_b * 1.0 / tot_b, 6) AS share_b,
      |  round(abs(n_a * 1.0 / tot_a - n_b * 1.0 / tot_b), 6) AS drift
      |FROM c, t ORDER BY o_orderpriority""".stripMargin

  /** qa08: numeric length-profile drift — the per-source two-sample
    * Kolmogorov–Smirnov audit over document length: for each source,
    * compare its `n_chars` CDF against the REST of the corpus (self
    * excluded, so a large source can't mask its own shift) at every
    * occupied 50-char bin and report the per-bin CDF gap plus the
    * per-source max (the KS statistic), all in integer ppm — log-free
    * and hash-stable like qa03/qa07. A source whose length profile
    * drifts from the corpus is the classic symptom of a scraper change
    * or boilerplate leak.
    *
    * Scale: ONE corpus scan reduced to (source, bin) counts — the only
    * shuffle that sees data volume; everything after (grids, cumsums,
    * the KS max) runs on an audit-table-sized frame bounded by
    * |sources| × 12 bins, with the cumulative sums as tiny theta
    * self-joins instead of unpartitioned windows. */
  private def lengthDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = Tables(s, dir).documents
      .select($"source",
        least(floor($"n_chars" / 50), lit(11)).cast("int").as("bin"))
    ksDriftFrom(s, b.groupBy($"source", $"bin").agg(count(lit(1)).as("n")))
  }

  /** CDF/KS arithmetic over a (source, bin, n) counts frame — shared
    * by the batch gate (qa08) and its streaming twin (st14), which
    * differ only in how the counts accumulate. */
  private[graft] def ksDriftFrom(s: SparkSession, c0: DataFrame): DataFrame = {
    import s.implicits._
    val c = c0
    val occ = c.groupBy($"bin").agg(sum($"n").as("n_all"))
    val totS = c.groupBy($"source").agg(sum($"n").as("tot_s"))
    val grand = occ.agg(sum($"n_all").as("grand"))
    val grid = totS.crossJoin(occ.select($"bin"))
    val cumS = grid.as("g").join(c.as("c"),
        $"g.source" === $"c.source" && $"c.bin" <= $"g.bin", "left")
      .groupBy($"g.source", $"g.bin", $"g.tot_s")
      .agg(coalesce(sum($"c.n"), lit(0L)).as("cum_s"))
      .select($"source", $"bin", $"tot_s", $"cum_s")
    val cumAll = occ.as("o1").join(occ.as("o2"), $"o2.bin" <= $"o1.bin")
      .groupBy($"o1.bin").agg(sum($"o2.n_all").as("cum_all"))
      .select($"bin", $"cum_all")
    // single-source corpora have no "rest of corpus" to drift against:
    // grand == tot_s would divide by zero — Spark's non-ANSI division
    // would null silently while the DuckDB twin errors; make BOTH
    // total with an explicit null (the audit row still surfaces)
    val d = cumS.join(cumAll, "bin").crossJoin(broadcast(grand))
      .select($"source", $"bin", $"cum_s",
        ($"cum_all" - $"cum_s").as("cum_ref"),
        when($"grand" =!= $"tot_s",
          // integral division (`div`), not double-then-cast: above 2^53
          // a double divide loses integer precision and could diverge
          // from the oracle's `//` at lake scale. The ×1e6 product is
          // widened to decimal(38,0) first: Long arithmetic would wrap
          // silently past ~9.2e12 cumulative counts (non-ANSI Spark)
          // while DuckDB's `//` computes in wider integers.
          abs(expr("cast(cum_s as decimal(38,0)) * 1000000 div tot_s")
            - expr("cast(cum_all - cum_s as decimal(38,0)) * 1000000" +
              " div (grand - tot_s)")))
          .as("d_ppm"))
    val ks = d.groupBy($"source").agg(max($"d_ppm").as("ks_ppm"))
    d.join(ks, "source")
      .select($"source", $"bin", $"cum_s", $"cum_ref", $"d_ppm", $"ks_ppm")
      .orderBy($"source", $"bin")
  }

  /** st14: qa08's length-profile KS drift over an unbounded ingest —
    * the streaming part is the (source, bin) counter (Complete-mode
    * global agg; keyed state bounded at |sources| × 12 bins regardless
    * of corpus size); the CDF/KS arithmetic runs on the emitted
    * snapshot exactly as qa08 does it, so the result — and the
    * oracle — are qa08's. */
  private def streamLengthDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents.select($"source", $"n_chars")
    val stage = WdsQueries.scratchDir("graft_qa8_stage")
    docs.write.mode("overwrite").parquet(stage)
    val stream = s.readStream.schema(docs.schema).parquet(stage)
      .select($"source",
        least(floor($"n_chars" / 50), lit(11)).cast("int").as("bin"))
      .groupBy($"source", $"bin").agg(count(lit(1)).as("n"))
    val name = "stream_qa8_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val counts = graft.streaming.EventStreams.runToMemory(s, stream, name,
      org.apache.spark.sql.streaming.OutputMode.Complete(),
      statePartitions = Some(4))
    // freeze the snapshot into a LocalRelation: the KS arithmetic
    // self-joins its input (grid/cumsum), and Spark cannot deduplicate
    // self-joins THROUGH a memory-sink view; the snapshot is bounded
    // at |sources| × 12 rows, so the collect is audit-sized
    val frozen = s.createDataFrame(counts.collectAsList(), counts.schema)
    ksDriftFrom(s, frozen)
  }

  private val lengthDriftSql =
    """WITH b AS (
      |  SELECT source, least(n_chars // 50, 11)::INT AS bin FROM documents),
      |c AS (SELECT source, bin, count(*) AS n FROM b GROUP BY source, bin),
      |occ AS (SELECT bin, sum(n) AS n_all FROM c GROUP BY bin),
      |ts AS (SELECT source, sum(n) AS tot_s FROM c GROUP BY source),
      |g AS (SELECT count(*) AS grand FROM b),
      |grid AS (SELECT ts.source, ts.tot_s, occ.bin FROM ts, occ),
      |cs AS (SELECT grid.source, grid.bin, grid.tot_s,
      |    coalesce(sum(c.n), 0) AS cum_s
      |  FROM grid LEFT JOIN c
      |    ON c.source = grid.source AND c.bin <= grid.bin
      |  GROUP BY grid.source, grid.bin, grid.tot_s),
      |ca AS (SELECT o1.bin, sum(o2.n_all) AS cum_all
      |  FROM occ o1 JOIN occ o2 ON o2.bin <= o1.bin GROUP BY o1.bin),
      |d AS (SELECT cs.source, cs.bin, cum_s,
      |    cum_all - cum_s AS cum_ref,
      |    CASE WHEN grand <> tot_s THEN
      |      abs(cum_s * 1000000 // tot_s
      |        - (cum_all - cum_s) * 1000000 // (grand - tot_s))
      |    END AS d_ppm
      |  FROM cs JOIN ca ON cs.bin = ca.bin, g),
      |k AS (SELECT source, max(d_ppm) AS ks_ppm FROM d GROUP BY source)
      |SELECT d.source, d.bin, cum_s::BIGINT AS cum_s,
      |  cum_ref::BIGINT AS cum_ref, d_ppm::BIGINT AS d_ppm,
      |  k.ks_ppm::BIGINT AS ks_ppm
      |FROM d JOIN k USING (source) ORDER BY d.source, d.bin""".stripMargin

  /** qa07: vocabulary-profile audit — the corpus-health metrics every
    * training-data report carries per source: token volume, distinct
    * vocabulary (types), hapax legomena (once-only words — the
    * data-entry-noise / contamination tell), and the type-token ratio
    * in ppm. One explode + two aggregations; only (source, word)
    * pairs shuffle, never documents. */
  private def vocabProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables(s, dir).documents
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
    val perWord = words.groupBy($"source", $"w")
      .agg(count(lit(1)).as("n"))
    perWord.groupBy($"source")
      .agg(sum($"n").as("n_tokens"),
        count(lit(1)).cast("int").as("n_types"),
        count(when($"n" === 1, 1)).cast("int").as("n_hapax"))
      .select($"source", $"n_tokens",
        $"n_types", $"n_hapax",
        (($"n_types" * 1000000L) / $"n_tokens").cast("long").as("ttr_ppm"))
      .orderBy($"source")
  }

  private val vocabProfileSql =
    """WITH w AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |pw AS (
      |  SELECT source, w, count(*) AS n FROM w WHERE w <> ''
      |  GROUP BY source, w)
      |SELECT source, sum(n)::BIGINT AS n_tokens,
      |  count(*)::INT AS n_types,
      |  count(*) FILTER (WHERE n = 1)::INT AS n_hapax,
      |  ((count(*) * 1000000) // sum(n))::BIGINT AS ttr_ppm
      |FROM pw GROUP BY source ORDER BY source""".stripMargin

  /** qa09: cross-source OVERLAP matrix from KMV sketch intersections —
    * "how much of source A's content is also in source B", for every
    * source pair, without ever joining the corpora. The estimator is
    * the θ-sketch rule over qd13's bottom-k machinery (Beyer et al.
    * 2007): per source keep the k smallest 60-bit bigram hashes; for a
    * pair, the k smallest of the two sketches' union are exactly the
    * union's k smallest, θ = the k-th, and the union-sketch members
    * present in BOTH sketches are a uniform sample of the
    * intersection — so r/k estimates Jaccard and (k-1)·2^60/θ
    * estimates |union| (identical double arithmetic to qd13, so the
    * hash gate holds). When the combined pool has under k elements
    * both sketches were exhaustive and every figure is EXACT — the
    * spec pins that degeneracy.
    *
    * Scale: the per-source sketch is one corpus scan collapsing to
    * k·|sources| longs (mergeable partial agg — the 1000-executor tree
    * works for free); the pair expansion is |sources|²·k sketch rows,
    * driver-scale no matter how big the lake is. The contamination
    * questions this answers (is src17 a re-crawl of src3?) otherwise
    * need a cross-corpus join that shuffles every token. */
  private def sourceOverlap(s: SparkSession, dir: String): DataFrame =
    sourceOverlapOf(Tables(s, dir).documents)

  /** Query-path body over any (source, text) frame — the spec drives
    * it with sub-k synthetic corpora where the estimator degenerates
    * to exact set arithmetic. */
  private[graft] def sourceOverlapOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = DedupQueries.KmvK
    val hashed = DedupQueries.bigramHashes(docs)
      .distinct()
    val bySrc = Window.partitionBy($"source").orderBy($"h")
    val sk = hashed.withColumn("rnk", row_number().over(bySrc))
      .where($"rnk" <= k).select($"source", $"h")
    val srcs = sk.select($"source").distinct()
    val pairs = srcs.select($"source".as("src_a"))
      .crossJoin(broadcast(srcs.select($"source".as("src_b"))))
      .where($"src_a" < $"src_b")
    val ra = pairs.join(sk.withColumnRenamed("source", "src_a"), "src_a")
      .select($"src_a", $"src_b", $"h",
        lit(1).as("in_a"), lit(0).as("in_b"))
    val rb = pairs.join(sk.withColumnRenamed("source", "src_b"), "src_b")
      .select($"src_a", $"src_b", $"h",
        lit(0).as("in_a"), lit(1).as("in_b"))
    val merged = ra.unionByName(rb)
      .groupBy($"src_a", $"src_b", $"h")
      .agg(max($"in_a").as("in_a"), max($"in_b").as("in_b"))
    val byPair = Window.partitionBy($"src_a", $"src_b").orderBy($"h")
    val pool = merged
      .withColumn("rnk", row_number().over(byPair))
      .withColumn("n_pool",
        count(lit(1)).over(Window.partitionBy($"src_a", $"src_b")))
      .where($"rnk" <= least(lit(k), $"n_pool"))
    pool.groupBy($"src_a", $"src_b")
      .agg(least(lit(k), max($"n_pool")).as("kk"),
        max($"n_pool").as("n_pool"), max($"h").as("theta"),
        sum($"in_a" * $"in_b").as("r"))
      .select($"src_a", $"src_b", $"r",
        when($"n_pool" < k, $"n_pool")
          .otherwise(floor(lit((k - 1).toDouble) *
            lit(DedupQueries.KmvSpace) / $"theta")).cast("long")
          .as("est_union"),
        expr("CAST(1000000 AS BIGINT) * r div kk").as("est_jaccard_ppm"))
      .withColumn("est_common",
        expr("est_jaccard_ppm * est_union div 1000000"))
      .orderBy($"src_a", $"src_b")
  }

  private val sourceOverlapSql = {
    val k = DedupQueries.KmvK
    s"""WITH base AS (
       |  SELECT source, string_split(lower(text), ' ') AS ws
       |  FROM documents),
       |bg AS (
       |  SELECT source, ws[i] || ' ' || ws[i + 1] AS bg
       |  FROM (SELECT source, ws,
       |          unnest(generate_series(1, len(ws) - 1)) AS i FROM base)),
       |hashed AS (
       |  SELECT DISTINCT source,
       |    ('0x' || substr(md5(bg), 1, 15))::BIGINT AS h
       |  FROM bg),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      row_number() OVER (PARTITION BY source ORDER BY h) AS rnk
       |    FROM hashed) WHERE rnk <= $k),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM srcs a, srcs b WHERE a.source < b.source),
       |merged AS (
       |  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b
       |  FROM (
       |    SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN sk s ON s.source = p.src_a
       |    UNION ALL
       |    SELECT p.src_a, p.src_b, s.h, 0, 1
       |    FROM pairs p JOIN sk s ON s.source = p.src_b)
       |  GROUP BY src_a, src_b, h),
       |pool AS (
       |  SELECT * FROM (
       |    SELECT *,
       |      row_number() OVER (PARTITION BY src_a, src_b ORDER BY h)
       |        AS rnk,
       |      count(*) OVER (PARTITION BY src_a, src_b) AS n_pool
       |    FROM merged) WHERE rnk <= least($k, n_pool)),
       |est AS (
       |  SELECT src_a, src_b, sum(in_a * in_b)::BIGINT AS r,
       |    CASE WHEN max(n_pool) < $k THEN max(n_pool)::BIGINT
       |         ELSE floor(${k - 1}.0 * ${DedupQueries.KmvSpace}
       |                    / max(h))::BIGINT END AS est_union,
       |    ((1000000 * sum(in_a * in_b))
       |      // least($k, max(n_pool)))::BIGINT AS est_jaccard_ppm
       |  FROM pool GROUP BY src_a, src_b)
       |SELECT src_a, src_b, r, est_union, est_jaccard_ppm,
       |  (est_jaccard_ppm * est_union) // 1000000 AS est_common
       |FROM est ORDER BY src_a, src_b""".stripMargin
  }

  /** qa10: EMBEDDING-space drift audit — the vector-side sibling of
    * qa03 (categorical drift) and qa08 (numeric KS drift): per label,
    * compare the mean embedding of two ingest periods (here the
    * deterministic vec_id-parity split; production passes two batch
    * tags) by cosine of the mean vectors plus the L1 gap in ppm — the
    * "did the encoder or the corpus move under me" monitor every
    * embedding pipeline runs after a model bump or a crawl refresh.
    *
    * Determinism: coordinates quantize to ppm BIGINTs at the scan
    * (round(x·1e6) — half away from zero on both engines), so the
    * distributed per-dimension sums are order-free integer sums and
    * the mean is integer division (both engines truncate toward
    * zero); only the final cosine touches doubles, from identical
    * integer inputs. Scale: one corpus scan reduces to
    * |labels|·2·dim sum cells (mergeable partial aggs); everything
    * after is label-count-sized. */
  private def embeddingDrift(s: SparkSession, dir: String): DataFrame =
    embeddingDriftOf(Tables(s, dir).embeddings)

  /** Query-path body over any (vec_id, embedding, label) frame — the
    * spec drives it with single-period labels the fixture lacks. */
  private[graft] def embeddingDriftOf(embs: DataFrame): DataFrame = {
    import embs.sparkSession.implicits._
    val sums = quantizedDims(embs)
      .groupBy($"label", $"period", $"dim")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    embDriftFrom(sums)
  }

  /** ppm-quantized (label, period, dim, v) rows — the one corpus-scale
    * pass, shared by the batch gate (qa10) and its streaming twin
    * (st15). */
  private def quantizedDims(embs: DataFrame): DataFrame = {
    import embs.sparkSession.implicits._
    embs
      .select($"label", ($"vec_id" % 2).cast("int").as("period"),
        posexplode($"embedding"))
      .withColumnRenamed("pos", "dim")
      .select($"label", $"period", $"dim",
        round($"col" * 1e6).cast("long").as("v"))
  }

  /** Mean-vector comparison over a (label, period, dim, sv, n) sums
    * frame — shared by qa10 and st15, which differ only in how the
    * sums accumulate. */
  private def embDriftFrom(sums0: DataFrame): DataFrame = {
    import sums0.sparkSession.implicits._
    val sums = sums0.withColumn("mean_ppm", expr("sv div n"))
    val a = sums.filter($"period" === 0)
      .select($"label", $"dim", $"mean_ppm".as("ma"), $"n".as("na"))
    val b = sums.filter($"period" === 1)
      .select($"label", $"dim", $"mean_ppm".as("mb"), $"n".as("nb"))
    // FULL outer on (label, dim): a label present in only one period
    // is the most drastic drift event (appeared/disappeared) and must
    // surface as a row — n = 0 for the missing period, null metrics —
    // not silently vanish through an inner join
    a.join(b, Seq("label", "dim"), "full_outer")
      .groupBy($"label")
      .agg(coalesce(max($"na"), lit(0L)).as("n_a"),
        coalesce(max($"nb"), lit(0L)).as("n_b"),
        sum($"ma" * $"mb").as("dot"),
        sum($"ma" * $"ma").as("na2"), sum($"mb" * $"mb").as("nb2"),
        sum(abs($"ma" - $"mb")).as("l1"))
      .select($"label", $"n_a", $"n_b",
        when($"n_a" > 0 && $"n_b" > 0,
          round($"dot" / (sqrt($"na2") * sqrt($"nb2")), 6))
          .as("cos_shift"),
        when($"n_a" > 0 && $"n_b" > 0, $"l1").as("l1_ppm"))
      .orderBy($"label")
  }

  /** st15: qa10's embedding drift over an unbounded ingest — the
    * streaming part is the (label, period, dim) integer-sum counter
    * (Complete-mode global agg; keyed state bounded at
    * |labels|·2·dim cells regardless of corpus size — the ppm
    * quantization that makes the batch sums order-free is exactly
    * what makes the streaming state mergeable); the mean/cosine
    * arithmetic runs on the emitted snapshot exactly as qa10 does it,
    * so the result — and the oracle — are qa10's. */
  private def streamEmbeddingDrift(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val embs = Tables(s, dir).embeddings
      .select($"vec_id", $"embedding", $"label")
    val stage = WdsQueries.scratchDir("graft_qa10_stage")
    embs.write.mode("overwrite").parquet(stage)
    val stream = quantizedDims(
      s.readStream.schema(embs.schema).parquet(stage))
      .groupBy($"label", $"period", $"dim")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    val name = "stream_qa10_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val sums = graft.streaming.EventStreams.runToMemory(s, stream, name,
      org.apache.spark.sql.streaming.OutputMode.Complete(),
      statePartitions = Some(4))
    // freeze the snapshot (the drift arithmetic self-joins its input;
    // |labels|·2·dim rows — audit-sized), the st14 pattern
    val frozen = s.createDataFrame(sums.collectAsList(), sums.schema)
    embDriftFrom(frozen)
  }

  private val embeddingDriftSql =
    """WITH src AS (
      |  SELECT label, vec_id, embedding::DOUBLE[] AS emb
      |  FROM embeddings),
      |ex AS (
      |  SELECT label, (vec_id % 2)::INT AS period, i - 1 AS dim,
      |    round(emb[i] * 1e6)::BIGINT AS v
      |  FROM (SELECT label, vec_id, emb,
      |          unnest(generate_series(1, len(emb))) AS i FROM src)),
      |sums AS (
      |  SELECT label, period, dim, sum(v)::BIGINT AS sv,
      |    count(*)::BIGINT AS n
      |  FROM ex GROUP BY 1, 2, 3),
      |m AS (SELECT label, period, dim, sv // n AS mean_ppm, n FROM sums),
      |j AS (
      |  SELECT coalesce(a.label, b.label) AS label,
      |    a.mean_ppm AS ma, b.mean_ppm AS mb, a.n AS na, b.n AS nb
      |  FROM (SELECT * FROM m WHERE period = 0) a
      |  FULL JOIN (SELECT * FROM m WHERE period = 1) b
      |    ON a.label = b.label AND a.dim = b.dim)
      |SELECT label, coalesce(max(na), 0)::BIGINT AS n_a,
      |  coalesce(max(nb), 0)::BIGINT AS n_b,
      |  CASE WHEN coalesce(max(na), 0) > 0 AND coalesce(max(nb), 0) > 0
      |    THEN round(sum(ma * mb)::BIGINT /
      |      (sqrt(sum(ma * ma)::BIGINT) * sqrt(sum(mb * mb)::BIGINT)), 6)
      |  END AS cos_shift,
      |  CASE WHEN coalesce(max(na), 0) > 0 AND coalesce(max(nb), 0) > 0
      |    THEN sum(abs(ma - mb))::BIGINT
      |  END AS l1_ppm
      |FROM j GROUP BY label ORDER BY label""".stripMargin

  override val defs: Map[String, QueryDef] = Map(
    "qa10_embedding_drift" -> QueryDef(embeddingDrift,
      Some(embeddingDriftSql)),
    "st15_stream_embedding_drift" -> QueryDef(streamEmbeddingDrift,
      Some(embeddingDriftSql)),
    "qa09_source_overlap" -> QueryDef(sourceOverlap,
      Some(sourceOverlapSql)),
    "qa07_vocab_profile" -> QueryDef(vocabProfile, Some(vocabProfileSql),
      bench = true),
    "qa08_length_drift" -> QueryDef(lengthDrift, Some(lengthDriftSql)),
    "st14_stream_length_drift" -> QueryDef(streamLengthDrift,
      Some(lengthDriftSql)),
    "qa01_profile" -> QueryDef(profile, Some(profileSql), bench = true),
    "qa02_constraints" -> QueryDef(constraints, Some(constraintsSql),
      bench = true),
    "qa03_drift" -> QueryDef(drift, Some(driftSql), bench = true),
    "st10_stream_drift" -> QueryDef(streamDrift, Some(driftSql)),
    "qa04_ref_integrity" -> QueryDef(refIntegrity, Some(refIntegritySql)),
    "qa05_spike_detect" -> QueryDef(spikes, Some(spikesSql)),
    "st11_stream_spikes" -> QueryDef(streamSpikes, Some(spikesSql)),
    "qa06_snapshot_diff" -> QueryDef(snapshotDiff, Some(snapshotDiffSql)),
    "st08_stream_constraints" -> QueryDef(streamConstraints,
      Some(streamConstraintsSql), bench = true),
  )
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components — the final stage of a production dedup
  * pipeline: near-dup PAIRS (LSH→verify output) become duplicate
  * CLUSTERS, and each cluster keeps its minimum id. Pairwise
  * keep-lists (drop the larger id of each pair) over-delete on
  * transitive chains a–b, b–c; components give the correct
  * one-survivor-per-cluster answer.
  *
  * Hybrid algorithm:
  *  - Phase 1, min-label propagation: every vertex starts labeled with
  *    itself; each round propagates labels across (symmetrized) edges
  *    and keeps the min. Rounds needed = graph diameter — for near-dup
  *    clusters (dense, tiny diameter) a handful, and each round is one
  *    join + one groupBy, cheaper than a star round. Bounded at
  *    `StarFallbackAfter` rounds.
  *  - Phase 2, alternating large-star / small-star (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC 2014): if
  *    phase 1 does not converge — a high-diameter dup CHAIN, real in
  *    scraped corpora where doc k shares a span with doc k+1 — rewrite
  *    the edge set itself. large-star hangs every larger neighbor off
  *    the neighborhood min; small-star stars every smaller neighbor
  *    onto it. Converges in O(log n) alternations regardless of
  *    diameter, so a chain that would need 10,000 propagation rounds
  *    finishes in ~15 star rounds. Phase 1's partial labels are fed in
  *    as extra (id, label) edges so its path compression is not wasted.
  *
  * Scale notes (100 TB):
  *  - Lineage is truncated every round with a RELIABLE snapshot when
  *    `sparkContext.setCheckpointDir` has been called (alternating
  *    parquet slots bound retained storage at O(1) snapshots); sessions
  *    without a checkpoint dir — unit tests, local runs — fall back to
  *    `localCheckpoint`.
  *  - Phase-1 convergence detection is FUSED into the propagation
  *    aggregation: the previous label rides through the same
  *    `groupBy(id)` (messages contribute null, `min` ignores nulls), so
  *    "did anything change" is a filter-count over the already-
  *    materialized checkpoint — no extra join or shuffle per round.
  *  - Phase-2 convergence is a (count, xxhash64-sum) checksum over the
  *    rewritten edge set — at the fixpoint small-star emits the exact
  *    star graph (every non-root → its component min) and the set stops
  *    changing. A checksum match is confirmed EXACTLY (one set
  *    difference against the previous round's snapshot) before
  *    convergence is declared — a hash collision can cost one extra
  *    confirm, never a wrong answer.
  *  - `maxIters` bounds the TOTAL rounds across both phases; exhausting
  *    it unconverged THROWS: silently returning partial labels would
  *    emit wrong clusters with no signal. With the default budget the
  *    star phase covers components of diameter ~2^40 — no realistic
  *    corpus aborts.
  */
object ConnectedComponents {

  /** Min-label rounds before falling back to star rounds. Dense
    * near-dup clusters (the overwhelmingly common case) converge well
    * inside this; only pathological chains pay for the switch. */
  val StarFallbackAfter = 6

  /** Per-run round counts, for tests and post-hoc scale audits. */
  final case class CcStats(
      propagationRounds: Int, starRounds: Int, usedStarFallback: Boolean)

  /** @param edges    (a_id, b_id) undirected edge list
    * @param vertices one column `id`; isolated vertices label themselves
    * @return (id, label) where label = min id of the component */
  def run(edges: DataFrame, vertices: DataFrame, maxIters: Int = 50):
      DataFrame = runWithStats(edges, vertices, maxIters)._1

  /** As `run`, also returning how many rounds each phase took.
    * `propagationBudget` overrides the min-label phase length — 0
    * forces the star phase from round one (the spec's random-graph
    * star-vs-propagation equivalence law drives it; production
    * callers keep the default). */
  def runWithStats(edges: DataFrame, vertices: DataFrame,
      maxIters: Int = 50,
      propagationBudget: Int = StarFallbackAfter): (DataFrame, CcStats) = {
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    // Reliable path: snapshot each round to ALTERNATING parquet dirs
    // under the checkpoint dir. df.checkpoint() would also be reliable
    // but leaves every superseded round's snapshot on the FS for the
    // application's lifetime (cleanCheckpoints defaults to false) — a
    // long job would hold one full vertex-label copy PER ROUND. Two
    // slots bound retained storage at O(1) snapshots; the final slot
    // stays readable for the returned DataFrame.
    val runDir = sc.getCheckpointDir.map(b =>
      s"$b/cc-${java.util.UUID.randomUUID()}")
    var slot = 0
    def ckpt(df: DataFrame): DataFrame = runDir match {
      case Some(d) =>
        val path = s"$d/s$slot"
        slot = (slot + 1) % 2
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint()
    }
    // sym + the initial labels get their own slots (written once)
    def ckptOnce(df: DataFrame, name: String): DataFrame = runDir match {
      case Some(d) =>
        df.write.mode("overwrite").parquet(s"$d/$name")
        spark.read.parquet(s"$d/$name")
      case None => df.localCheckpoint()
    }
    val sym = ckptOnce(edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst"))),
      "sym")
    var labels = ckptOnce(
      vertices.select(col("id"), col("id").as("label")), "init")
    // `old` keeps the label's OWN type: casting to a fixed numeric type
    // would null out non-numeric ids and make the convergence check
    // silently pass after one round
    val labelType = labels.schema("label").dataType
    var iter = 0
    var changed = 1L
    val phase1Budget = math.min(propagationBudget, maxIters)
    while (changed > 0 && iter < phase1Budget) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"),
          lit(null).cast(labelType).as("old"))
      // one pass: min over {old label} ∪ {incoming labels}; the previous
      // label rides along as min("old") (unique per id, nulls ignored)
      val next = ckpt(labels
        .select(col("id"), col("label"), col("label").as("old"))
        .union(msgs)
        .groupBy("id").agg(min("label").as("label"), min("old").as("old")))
      changed = next.filter(!(col("label") <=> col("old"))).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    if (changed == 0)
      return (labels, CcStats(iter, 0, usedStarFallback = false))

    // ---- star fallback: the component diameter exceeds the phase-1
    // budget; switch to edge-set rewriting, O(log n) alternations.
    val starBudget = maxIters - iter
    if (starBudget <= 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          s"($changed labels still changing) — raise maxIters")
    // Seed with the original edges PLUS phase 1's partial labels as
    // (id → label) shortcut edges: label is provably in id's component,
    // so components are unchanged and phase-1 compression carries over.
    var e = ckpt(edges
      .select(col("a_id").as("a"), col("b_id").as("b"))
      .union(labels.select(col("id").as("a"), col("label").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct())
    var starRounds = 0
    var prevSum: (Long, Option[java.math.BigDecimal]) = (-1L, None)
    var converged = false
    while (!converged && starRounds < starBudget) {
      // large-star: for each u over the symmetrized neighborhood, hang
      // every STRICTLY LARGER neighbor off m = min(Γ(u) ∪ {u}).
      // Every union branch re-aliases its outputs: branches of a
      // self-union sharing attribute exprIds trips Union's
      // constraint-rewrite (`key not found` in the analyzer).
      val symE = e.select(col("a").as("a"), col("b").as("b"))
        .union(e.select(col("b").as("a"), col("a").as("b")))
      val lsMin = symE.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val ls = symE.join(lsMin, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      // small-star: orient every edge large→small, then star each
      // node's smaller neighbors (and itself) onto the neighborhood min
      val dir = ls.select(
          greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
      val ssMin = dir.groupBy("a").agg(min("b").as("m"))
      val ss = dir.join(ssMin, "a")
        .select(col("b").as("v"), col("m").as("m"))
        .union(ssMin.select(col("a").as("v"), col("m").as("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
        .distinct()
      val prev = e
      e = ckpt(ss)
      starRounds += 1
      // fixpoint check: the rewritten edge set stopped changing.
      // (count, sum of xxhash64 row hashes) — order-insensitive, one
      // aggregate over the just-materialized checkpoint. A signature
      // match is only a CANDIDATE fixpoint: sum-of-hashes can collide
      // between different edge sets, and declaring convergence on a
      // collision would silently emit wrong cluster labels — so the
      // first match is confirmed EXACTLY, once, with a set difference
      // (both sides are distinct sets of equal count, so an empty
      // `except` proves equality). `prev` reads the other alternating
      // slot, still intact until the next ckpt overwrites it.
      // decimal(38,0) sum: full-range 64-bit terms overflow a Long
      // sum under ANSI mode
      val row = e.agg(count(lit(1)).as("c"),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")).as("h"))
        .head()
      val sig = (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getDecimal(1)))
      converged = sig == prevSum && e.except(prev).isEmpty
      prevSum = sig
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          s"(star phase still rewriting after $starRounds) — raise " +
          "maxIters")
    // At the fixpoint e is the star graph: every non-root vertex has
    // exactly one edge to its component min. groupBy guards against a
    // (theoretically impossible) duplicate without changing the answer.
    val roots = e.groupBy("a").agg(min("b").as("lbl"))
    val out = vertices.join(roots, vertices("id") === roots("a"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
    (out, CcStats(iter, starRounds, usedStarFallback = true))
  }
}

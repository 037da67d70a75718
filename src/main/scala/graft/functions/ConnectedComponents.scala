package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the final
  * stage of a production dedup pipeline: near-dup PAIRS (LSH→verify
  * output) become duplicate CLUSTERS, and each cluster keeps its
  * minimum id. Pairwise keep-lists (drop the larger id of each pair)
  * over-delete on transitive chains a–b, b–c; components give the
  * correct one-survivor-per-cluster answer.
  *
  * Algorithm: every vertex starts labeled with itself; each round
  * propagates labels across (symmetrized) edges and keeps the min;
  * converged when no label changes. Rounds needed = graph diameter —
  * for near-dup clusters (dense, tiny diameter) a handful.
  *
  * Scale notes (100 TB):
  *  - Lineage is truncated every round with a RELIABLE `checkpoint`
  *    when `sparkContext.setCheckpointDir` has been called (blocks go
  *    to the fault-tolerant FS, so one lost executor mid-loop does not
  *    abort a multi-hour job); sessions without a checkpoint dir — unit
  *    tests, local runs — fall back to `localCheckpoint`.
  *  - Convergence detection is FUSED into the propagation aggregation:
  *    each round carries the previous label through the same
  *    `groupBy(id)` (messages contribute null, `min` ignores nulls), so
  *    "did anything change" is a filter-count over the already-
  *    materialized checkpoint — no extra join or shuffle per round.
  *  - Hitting `maxIters` unconverged THROWS: silently returning partial
  *    labels would emit wrong clusters with no signal. (The large-star/
  *    small-star optimization drops in here if 100 TB components ever
  *    have large diameters — same loop shape.)
  */
object ConnectedComponents {

  /** @param edges    (a_id, b_id) undirected edge list
    * @param vertices one column `id`; isolated vertices label themselves
    * @return (id, label) where label = min id of the component */
  def run(edges: DataFrame, vertices: DataFrame, maxIters: Int = 50):
      DataFrame = {
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
    while (changed > 0 && iter < maxIters) {
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
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          s"($changed labels still changing) — raise maxIters")
    labels
  }
}

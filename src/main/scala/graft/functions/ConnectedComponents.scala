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
  * for near-dup clusters (dense, tiny diameter) a handful. Each round
  * is one shuffle on vertex id; `localCheckpoint` truncates lineage so
  * the loop stays O(1) plan depth at any scale. (The large-star/
  * small-star optimization drops in here if 100 TB components ever have
  * large diameters — same loop shape.)
  */
object ConnectedComponents {

  /** @param edges    (a_id, b_id) undirected edge list
    * @param vertices one column `id`; isolated vertices label themselves
    * @return (id, label) where label = min id of the component */
  def run(edges: DataFrame, vertices: DataFrame, maxIters: Int = 50):
      DataFrame = {
    val sym = edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      labels = next
      iter += 1
    }
    labels
  }
}

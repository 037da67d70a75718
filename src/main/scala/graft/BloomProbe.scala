package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 measurement for qd28's broadcast-Bloom runtime filter — the
  * "Measure, don't guess" number behind the scaladoc's claim that the
  * bloom prunes the lake side of the incremental-ingest join to
  * |matches| + fpp·|lake| rows.
  *
  * Shape: the sf1 `documents` table split 90/10 — doc_id % 10 == 7 is
  * the daily increment (~5k docs), the rest the standing lake (~45k) —
  * the realistic ingest ratio, unlike the gate fixture's 50/50 parity
  * split (correctness there, scale shape here). Three runs:
  *
  *   1. PRUNED: qd28's pipeline as shipped (bloom built over the batch,
  *      lake filtered before the exact equi-join);
  *   2. UNPRUNED: identical plan with the bloom stage disabled — every
  *      lake row enters the join;
  *   3. PRUNED again (warm page cache parity with run 2).
  *
  * Prints lake rows entering the join, result row count + dup count
  * (MUST be identical across runs — the bloom is invisible to
  * results), and wall. The SCALE.md ring row records them. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("bloom-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val isNew = col("doc_id") % 10 === 7

    def run(label: String, prune: Boolean): (Long, Long, Long) = {
      var joinInput = -1L
      val survivors: DataFrame => DataFrame =
        if (prune) { df => joinInput = df.count(); df }
        else { _ =>
          // disable the bloom: re-derive the unfiltered lake with the
          // same columns the shipped stage filters
          val all = docs.filter(!isNew)
            .select(col("doc_id"), lit(false).as("__is_new"),
              queries.DedupQueries.prefixFingerprint(col("text"), 5)
                .as("ch"))
          joinInput = all.count()
          all
        }
      val t0 = System.nanoTime()
      val out = queries.DedupQueries
        .bloomIncrementalFrom(docs, isNew, onLakeSurvivors = survivors)
        .agg(count(lit(1)), sum(col("is_dup"))).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[bloom-probe] $label%-8s lake-rows-into-join=$joinInput%,d " +
        f"batch=${out.getLong(0)}%,d dups=${out.getLong(1)}%,d " +
        f"wall=$wall%.2f s")
      (joinInput, out.getLong(0), out.getLong(1))
    }

    val p1 = run("pruned", prune = true)
    val u = run("unpruned", prune = false)
    val p2 = run("pruned2", prune = true)
    require(p1._2 == u._2 && p1._3 == u._3 && p2._3 == u._3,
      "bloom changed the result — it must be invisible")
    println(f"[bloom-probe] prune ratio: ${u._1.toDouble / p1._1}%.1f× " +
      s"fewer lake rows into the join")
    spark.stop()
  }
}

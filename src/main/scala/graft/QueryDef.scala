package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability exposed to the driver's correctness gate.
  *
  * @param fn     builds the result for a scale-factor directory; must be a
  *               pure function of the input tables (deterministic — ordered
  *               output, seeded randomness only).
  * @param oracle equivalent DuckDB SQL over the same parquet tables (column
  *               names/aliases must match `fn`'s output exactly). `None` for
  *               operators not expressible in SQL → the driver records a
  *               weaker rows-only check.
  * @param bench  include in the headline Bench run.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false)

trait QueryRegistry {
  def defs: Map[String, QueryDef]
}

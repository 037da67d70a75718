package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationQueries, DedupQueries, EventQueries,
  GraphQueries, MediaQueries, QualityQueries, RelationalQueries,
  SimilarityQueries, TextQueries, WdsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capability registries are merged here; each registry is one
  * functional area of the engine (relational core, text analysis, dedup,
  * similarity search, events/sessionization, WebDataset surface).
  */
object SparkEntry {

  private def registries: Seq[QueryRegistry] = Seq(
    RelationalQueries,
    EventQueries,
    TextQueries,
    CurationQueries,
    DedupQueries,
    SimilarityQueries,
    GraphQueries,
    MediaQueries,
    QualityQueries,
    WdsQueries,
  )

  private lazy val allDefs: Map[String, QueryDef] =
    registries.flatMap(_.defs).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }

  /** Headline subset for Bench. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.collect { case (k, d) if d.bench => k -> d.fn }
}

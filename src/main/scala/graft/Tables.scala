package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central accessor for the driver-generated parquet fixtures
  * (`TESTDATA.md`): TPC-H-ish star schema + `events` stream table +
  * `documents`/`embeddings` north-star tables.
  *
  * Every query receives the scale-factor directory at call time, so the
  * same code runs at sf0.001 (smoke), sf0.01 (duckdb oracle) and sf0.1
  * (bench) — and, unchanged, against a 100 TB lake: `spark.read.parquet`
  * prunes columns and pushes filters down to the scan, and partition
  * count follows `spark.sql.files.maxPartitionBytes`, not file count.
  */
final class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet's `ts` physical type varies by fixture generation:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    * the physical int64 as nanos and truncate to micros, exactly what
    * DuckDB does natively) or native micros TIMESTAMP/TIMESTAMP_NTZ.
    * Both normalize to the same session-TZ TimestampType column (the
    * sessions pin UTC, so NTZ→LTZ is value-preserving and oracle
    * values match either way). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables =
    new Tables(spark, sfDir)
}

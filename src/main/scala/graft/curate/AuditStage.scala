package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic data-quality audit over ANY parquet input (the CLI face of
  * the qa-tier queries, schema-driven instead of fixture-specific):
  *
  *  - [[profile]]: per-column rows/nulls/distinct/min/max in ONE scan
  *    (single agg row → stack); numeric columns report double min/max,
  *    everything else string min/max.
  *  - [[constraints]]: named boolean SQL rules → violation counts and
  *    rates, one scan for all rules. A row violates a rule when the
  *    expression is false OR null (a null quantity is not a positive
  *    quantity).
  *
  * Both are single-pass by construction — a 100 TB audit must not
  * re-scan per column or per rule.
  */
object AuditStage {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Column names that survive Spark SQL identifier quoting. */
  private def q(name: String): String = s"`${name.replace("`", "``")}`"

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "profile of empty schema")
    // per-field INDEX keys the internal aliases — sanitizing the name
    // alone can collide ("a b" vs "a_b"); the index cannot
    def safe(i: Int) = s"c$i"
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++ fields.zipWithIndex.flatMap {
        case (f, i) =>
          val c = col(q(f.name))
          // MapType is not comparable/groupable — distinct would fail
          // at analysis; report null rather than crash the audit
          val nd = f.dataType match {
            case _: MapType => lit(null).cast(LongType).as(s"${safe(i)}__nd")
            case _ => count_distinct(c).as(s"${safe(i)}__nd")
          }
          val base = Seq(
            sum(when(c.isNull, 1L).otherwise(0L)).as(s"${safe(i)}__nulls"),
            nd)
          // array/map/struct columns have no total order — min/max skipped
          val ordered = f.dataType match {
            case _: ArrayType | _: MapType | _: StructType => Seq(
              lit(null).cast(StringType).as(s"${safe(i)}__min"),
              lit(null).cast(StringType).as(s"${safe(i)}__max"))
            case _ => Seq(
              min(c).cast(StringType).as(s"${safe(i)}__min"),
              max(c).cast(StringType).as(s"${safe(i)}__max"))
          }
          base ++ ordered
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val branches = fields.zipWithIndex.map { case (f, i) =>
      val s = safe(i)
      val label = f.name.replace("'", "''")
      val (minN, maxN) =
        if (isNumeric(f.dataType))
          (s"CAST(${s}__min AS DOUBLE)", s"CAST(${s}__max AS DOUBLE)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      val (minS, maxS) =
        if (isNumeric(f.dataType))
          ("CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
        else (s"${s}__min", s"${s}__max")
      s"'$label', n_rows, ${s}__nulls, ${s}__nd, $minN, $maxN, $minS, $maxS"
    }
    one.select(expr(
      s"stack(${branches.size}, ${branches.mkString(", ")}) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, " +
        "min_str, max_str)"))
      .orderBy("col_name")
  }

  /** @param rules (name, boolean SQL expression) pairs. */
  def constraints(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case ((_, sql), i) =>
        sum(when(coalesce(expr(sql), lit(false)), 0L).otherwise(1L))
          .as(s"r${i}__v")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val branches = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', r${i}__v"
    }
    one.select(expr(
      s"stack(${rules.size}, ${branches.mkString(", ")}) AS " +
        "(rule, n_violations)"), col("n_rows"))
      .select(col("rule"), col("n_violations"),
        round(col("n_violations") * 100.0 / col("n_rows"), 4)
          .as("violation_pct"))
      .orderBy("rule")
  }

  /** `name=expr;name=expr` CLI syntax (`;` so exprs may contain `,`). */
  def parseRules(s: String): Seq[(String, String)] =
    s.split(';').toSeq.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(n, e) if e.nonEmpty => (n.trim, e.trim)
        case _ => throw new IllegalArgumentException(
          s"--rules entry '$kv' is not name=expr")
      }
    }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Training corpora arrive with mixed Unicode forms (decomposed accents
  * from OCR/mac filesystems, fullwidth compatibility characters), and
  * dedup/fingerprint hashes treat `é` and `e`+U+0301 as different
  * documents unless the corpus is canonicalized first — so a cleanup
  * pass belongs in the engine, not in user UDFs. Spark has no builtin
  * normalizer (DuckDB ships `nfc_normalize`, the oracle side); a Scala
  * UDF would deserialize to String anyway, so the expression costs
  * nothing extra while staying inside whole-stage codegen for the
  * surrounding plan.
  *
  * The common case — already-NFC ASCII/text — is detected with
  * `Normalizer.isNormalized` (a cheap quick-check scan) and returns the
  * input UTF8String without copying.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires a string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      NfcNormalize(org.apache.spark.sql.GraftShim.expression(c)))

  /** SQL registration: `SELECT nfc_normalize(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
}

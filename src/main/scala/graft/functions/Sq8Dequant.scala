package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd SQ8 quantize→dequantize for the scalar-quantized
  * ANN scan (qs11).
  *
  * The composable form — a 64-element `transform` whose lambda does
  * `element_at` against two literal arrays plus when/floor/least/
  * greatest per element — is semantically right but evaluates
  * interpreted: Catalyst lambda functions sit outside whole-stage
  * codegen and box per element. A first r18 attempt as a
  * `mapPartitions` kernel measured WORSE at sf0.1 (the encoder
  * boundary — deserialize row, box 64 doubles, re-encode — costs more
  * than the interpreted lambda saved), so this is an `Expression` with
  * `doGenCode` instead, the CosineSimilarity pattern: the loop stays
  * inside generated Java, reads the unsafe array in place, and the
  * scan never leaves whole-stage codegen.
  *
  * Bit-parity with the declarative spelling is structural — per
  * element the identical IEEE double chain `sc == 0 ? mn : mn +
  * min(max(floor((v - mn) / sc + 0.5), 0), 255) * sc` in the same
  * operation order — so every downstream cosine, rank and oracle hash
  * is unchanged (Sq8DequantSpec pins it row-for-row; the qs11 DuckDB
  * oracle replays the chain independently). The codebook rides the
  * expression as plain JVM arrays (2·dim doubles), the same
  * broadcast-as-literals story as the qs03 planes.
  */
case class Sq8Dequant(child: Expression, mins: Array[Double],
    scales: Array[Double]) extends UnaryExpression {

  require(mins.length == scales.length,
    s"codebook mismatch: ${mins.length} mins vs ${scales.length} scales")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_dequant requires an array<double> input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val av = input.asInstanceOf[ArrayData]
    val n = av.numElements()
    if (n != mins.length)
      throw new IllegalArgumentException(
        s"sq8_dequant dimension mismatch: vector $n vs codebook " +
          s"${mins.length}")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = av.getDouble(i)
      val mn = mins(i)
      val sc = scales(i)
      out(i) =
        if (sc == 0.0) mn
        else mn + math.min(math.max(
          math.floor((v - mn) / sc + 0.5), 0.0), 255.0) * sc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val mn = ctx.freshName("mn")
      val sc = ctx.freshName("sc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $minsRef.length)
         |  throw new IllegalArgumentException(
         |    "sq8_dequant dimension mismatch: vector " + $n +
         |    " vs codebook " + $minsRef.length);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  double $mn = $minsRef[$i];
         |  double $sc = $scalesRef[$i];
         |  $out[$i] = $sc == 0.0 ? $mn
         |    : $mn + java.lang.Math.min(java.lang.Math.max(
         |        java.lang.Math.floor(($v - $mn) / $sc + 0.5), 0.0),
         |        255.0) * $sc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Sq8Dequant = copy(child = newChild)
}

object Sq8Dequant {
  /** Column-API entry point: dequantized reconstruction of `emb`. */
  def dequant(emb: Column, mins: Array[Double],
      scales: Array[Double]): Column =
    org.apache.spark.sql.GraftShim.column(
      Sq8Dequant(org.apache.spark.sql.GraftShim.expression(emb),
        mins, scales))
}

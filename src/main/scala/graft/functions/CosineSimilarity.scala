package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric arrays.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_) / …` —
  * is semantically right but evaluates interpreted: Catalyst lambda
  * functions sit outside whole-stage codegen and allocate per element.
  * For the ANN/near-dup hot path (O(n²·dim) evaluations in a pair scan) a
  * `BinaryExpression` with `doGenCode` keeps the loop inside generated
  * Java — no boxing, no closure dispatch (SURVEY.md §2.11: native
  * `Expression` as the post-v1 optimization tier).
  *
  * Accumulation order matches the HOF form and the DuckDB oracle exactly:
  * one sequential fold over the elements in double precision, dot and
  * norms in the same pass.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other =>
      throw new IllegalArgumentException(s"cosine_sim needs arrays, got $other")
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires float/double arrays, " +
            s"got ${left.dataType} and ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    // mismatched dims = corrupt embedding: fail at the source rather
    // than return a plausible truncated cosine the gate/job can't trace
    if (av.numElements() != bv.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim dimension mismatch: ${av.numElements()} vs " +
          s"${bv.numElements()}")
    val n = av.numElements()
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (bFloat) bv.getFloat(i).toDouble else bv.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet =
      if (elemType(left) == FloatType) "(double) %s.getFloat(%s)"
      else "%s.getDouble(%s)"
    val bGet =
      if (elemType(right) == FloatType) "(double) %s.getFloat(%s)"
      else "%s.getDouble(%s)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements())
         |  throw new IllegalArgumentException(
         |    "cosine_sim dimension mismatch: " + $a.numElements() +
         |    " vs " + $b.numElements());
         |int $n = $a.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${aGet.format(a, i)};
         |  double $y = ${bGet.format(b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      CosineSimilarity(
        org.apache.spark.sql.GraftShim.expression(a),
        org.apache.spark.sql.GraftShim.expression(b)))

  /** SQL registration: `SELECT cosine_sim(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
}

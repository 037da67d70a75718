package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native expression tier (SURVEY §2.11): registers
  * `cosine_sim(a, b)` so pure-SQL users get the codegen'd kernel.
  *
  * Two wiring paths:
  *  - cluster: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (injected at session build, the SparkSessionExtensions contract)
  *  - existing session / tests: `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
}

object GraftExtensions {

  private def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "cosine_sim(a, b) takes two arrays")
    functions.CosineSimilarity(children.head, children(1))
  }

  private[graft] val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[functions.CosineSimilarity].getName, "cosine_sim"),
      builder)

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit = {
    val (id, info, fb) = cosineSimDescriptor
    spark.sessionState.functionRegistry
      .registerFunction(id, info, fb)
  }
}

package graft.functions

import graft.SparkSpec
import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  private def hofCos(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("native expression equals HOF fold bit-for-bit on float arrays") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .limit(20)
      .crossJoin(e.select(col("vec_id").as("b_id"),
        col("embedding").as("eb")).limit(20))
    val got = pairs.select(cosineSim(col("ea"), col("eb")).as("c")).collect()
    val want = pairs.select(hofCos(col("ea"), col("eb")).as("c")).collect()
    got.zip(want).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(w.getDouble(0)))
    }
  }

  test("double arrays, SQL registration, and codegen path") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b")
    val viaSql = df.selectExpr("cosine_sim(a, b) as c").collect().head.getDouble(0)
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(viaSql - expected) < 1e-15)
    // whole-stage codegen actually engages on a real scan (a literal
    // frame would constant-fold to LocalTableScan)
    val plan = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
      .selectExpr("cosine_sim(embedding, embedding) as c")
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage containing the
    // projection with our expression
    assert(plan.contains("*(1) Project"), plan)
  }

  test("identical vectors have similarity 1.0") {
    import spark.implicits._
    val df = Seq((Array(0.5f, -0.25f), Array(0.5f, -0.25f))).toDF("a", "b")
    val c = df.select(cosineSim($"a", $"b")).collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}

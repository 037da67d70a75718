package graft

/** The SQL registration path for the native expression tier: after
  * registration, `cosine_sim` is a plain SQL function backed by the
  * codegen'd Catalyst expression. */
class GraftExtensionsSpec extends SparkSpec {

  test("cosine_sim is callable from SQL and matches the Column form") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 0.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sql = spark.sql(
      "SELECT round(cosine_sim(a, b), 6) AS c FROM vecs ORDER BY c")
      .collect().map(_.getDouble(0)).toSeq
    assert(sql == Seq(0.5, 1.0))
    // arity and type errors surface at analysis
    assertThrows[Exception](spark.sql("SELECT cosine_sim(1)").collect())
  }
}

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

  test("kmv_sketch and freq_sketch are SQL aggregates after register") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (1L to 100L).map(i => (i % 3, i % 40)).toDF("g", "h")
      .createOrReplaceTempView("hashes")
    val kmv = spark.sql(
      """SELECT g, size(kmv_sketch(h, 8)) AS sz,
        |  element_at(kmv_sketch(h, 8), 1) AS smallest
        |FROM hashes GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(kmv.length == 3)
    kmv.foreach { r => assert(r.getInt(1) == 8) } // ≥8 distinct per group
    assert(kmv.map(_.getLong(2)).min >= 0L)
    val freq = spark.sql(
      """SELECT map_keys(freq_sketch(h, 50)) AS ks,
        |  freq_sketch(h, 50)[0] AS c0 FROM hashes""".stripMargin).head()
    assert(freq.getSeq[Long](0).length == 40) // exact: 40 distinct ≤ 50
    assert(freq.getLong(1) == (1L to 100L).count(_ % 40 == 0))
    // k must be a literal, and wrong input types fail at analysis
    assertThrows[Exception](
      spark.sql("SELECT kmv_sketch(h, g) FROM hashes").collect())
    assertThrows[Exception](
      spark.sql("SELECT freq_sketch('a', 4) FROM hashes").collect())
  }
}

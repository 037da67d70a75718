package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r18 k-means assignment kernel vs the declarative HOF spelling
  * it replaced — quantization chain, integer distances, and the
  * first-minimum tie rule must be value-identical; the qs07/qs08
  * DuckDB oracles pin the full operators. */
class KMeansAssignSpec extends SparkSpec {

  private val shift = 2.0

  /** The pre-r18 declarative assignment over the same centroids. */
  private def declarative(emb: org.apache.spark.sql.DataFrame,
      cents: IndexedSeq[Array[Long]]) = {
    import spark.implicits._
    val e = emb.select($"vec_id", transform($"embedding", x =>
      floor((x.cast("double") + lit(shift)) * lit(1e6)).cast("long"))
      .as("v"))
    def distTo(c: Array[Long]) =
      aggregate(zip_with($"v", typedLit(c.toSeq),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
    e.withColumn("dists", array(cents.map(distTo): _*))
      .withColumn("cluster",
        (array_position($"dists", array_min($"dists")) - 1).cast("int"))
      .withColumn("dist", array_min($"dists"))
      .select($"vec_id", $"v", $"cluster", $"dist")
  }

  test("kernel equals the declarative HOF spelling row for row, " +
      "float and double inputs, including ties to the first minimum") {
    import spark.implicits._
    val dim = 4
    // two identical centroids force a tie; values straddle zero and
    // exercise the floor-of-negative path
    val vecs = Seq(
      (0L, Seq(-0.5f, 0.25f, 0.1f, -0.01f)),
      (1L, Seq(0.5f, -0.25f, -0.1f, 0.01f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-0.58f, 0.52f, -0.33f, 0.17f)))
    val embF = vecs.toDF("vec_id", "embedding")
    val embD = vecs.map { case (i, v) => (i, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
    def quant(x: Double): Long = math.floor((x + shift) * 1e6).toLong
    val c0 = vecs(2)._2.map(f => quant(f.toDouble)).toArray
    val cents = IndexedSeq(c0, vecs(0)._2.map(f => quant(f.toDouble))
      .toArray, c0.clone()) // cents(2) duplicates cents(0): tie
    for (emb <- Seq(embF, embD)) {
      val got = KMeansAssign(emb, cents, shift)
        .orderBy("vec_id").collect().toSeq
      val want = declarative(emb, cents)
        .orderBy("vec_id").collect().toSeq
      assert(got == want)
      // the duplicated centroid can never win a tie: first min rule
      got.foreach(r => assert(r.getInt(2) != 2))
    }
  }

  test("a non-array or wrongly-typed embedding column fails at " +
      "analysis, not mid-job") {
    import spark.implicits._
    val bad = Seq((1L, "oops")).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      KMeansAssign(bad, IndexedSeq(Array(0L)), shift)
    }
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the native KMV aggregate: sketch == brute k-smallest
  * distinct, merge associativity across partitionings, and agreement
  * with qd13's exact-window gate path. */
class KmvSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sketch equals brute k-smallest distinct, any partitioning") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => (i % 7, (i.toLong * 2654435761L)
      % 1000000007L)) // collisions included via the mod
    val want = vals.groupBy(_._1).view.mapValues(
      _.map(_._2).distinct.sorted.take(64)).toMap
    Seq(1, 3, 32).foreach { parts =>
      val got = vals.toDF("g", "h").repartition(parts)
        .groupBy($"g").agg(KmvSketch.kmvSketch($"h", 64).as("sk"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(got.view.mapValues(_.toSeq).toMap == want,
        s"parts=$parts")
    }
  }

  test("empty and under-filled groups yield exact-size sketches") {
    import spark.implicits._
    val df = Seq((1, 10L), (1, 10L), (1, 11L), (2, 5L)).toDF("g", "h")
      .groupBy($"g")
      .agg(KmvSketch.kmvSketch($"h", 64).as("sk"))
      .select($"g", size($"sk").as("n"),
        KmvSketch.estimate($"sk", 64).as("est"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(df == Set((1, 2, 2L), (2, 1, 1L)))
  }

  test("duplicated delivery never changes the sketch (replay safety)") {
    import spark.implicits._
    val vals = (1 to 2000).map(i => (i % 5, (i.toLong * 31L) % 997L))
    val once = vals.toDF("g", "h")
    val twice = once.union(once)
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"g").agg(KmvSketch.kmvSketch($"h", 64).as("sk"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(sk(once) == sk(twice))
  }

  test("sketch agrees with qd13's exact-window path on the fixture") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf).documents
    val viaSketch = graft.queries.DedupQueries.bigramHashes(docs)
      .groupBy($"source")
      .agg(KmvSketch.kmvSketch($"h", 64).as("sk"))
      .select($"source", size($"sk").as("sz"),
        element_at($"sk", least(lit(64), size($"sk"))).as("kth"),
        KmvSketch.estimate($"sk", 64).as("est"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val viaGate = graft.SparkEntry.queries("qd13_kmv_distinct")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(viaSketch == viaGate)
  }
}

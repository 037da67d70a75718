package graft.functions

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  test("min-label propagation: chains, separate components, isolates") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val got = ConnectedComponents.run(edges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("long chain converges (diameter > 1 round)") {
    import spark.implicits._
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a_id", "b_id")
    val verts = (1 to n).map(_.toLong).toDF("id")
    val got = ConnectedComponents.run(edges, verts).collect()
    assert(got.forall(_.getLong(1) == 1L))
  }

  test("non-numeric (string) ids propagate correctly, no silent converge") {
    import spark.implicits._
    // chain d-c-b-a needs >1 round; a long-cast convergence check would
    // null out and stop after round 1 with wrong labels
    val edges = Seq(("d", "c"), ("c", "b"), ("b", "a"), ("x", "y"))
      .toDF("a_id", "b_id")
    val verts = Seq("a", "b", "c", "d", "x", "y", "z").toDF("id")
    val got = ConnectedComponents.run(edges, verts)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "z"))
  }

  test("unconverged at maxIters throws instead of returning bad labels") {
    import spark.implicits._
    val n = 12 // diameter ~11 > 3 rounds
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a_id", "b_id")
    val verts = (1 to n).map(_.toLong).toDF("id")
    assertThrows[IllegalStateException](
      ConnectedComponents.run(edges, verts, maxIters = 3))
  }

  test("reliable checkpoint path (checkpoint dir set) gives same answer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
      val verts = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
      val got = ConnectedComponents.run(edges, verts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
        11L -> 10L))
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}

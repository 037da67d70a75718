package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Order-free Misra-Gries laws (the counter VALUES legitimately vary
  * with arrival order, so the spec asserts the guarantees, not sets):
  *  - exactness when distinct keys ≤ k
  *  - every estimate is a lower bound, undercounting ≤ n/(k+1)
  *  - any key with true count > n/(k+1) survives — under every tested
  *    partitioning (the property the merge tree must preserve)
  */
class FreqSketchSpec extends SparkSpec {

  private def sketchOf(rows: Seq[Long], k: Int, parts: Int) = {
    import spark.implicits._
    rows.toDF("v").repartition(parts)
      .agg(FreqSketch.freqSketch($"v", k).as("sk"))
      .head().getMap[Long, Long](0)
  }

  test("exact when distinct keys fit in k counters") {
    val rows = Seq.fill(100)(1L) ++ Seq.fill(50)(2L) ++ Seq.fill(7)(3L)
    Seq(1, 4, 16).foreach { parts =>
      val m = sketchOf(scala.util.Random.shuffle(rows), 8, parts)
      assert(m == Map(1L -> 100L, 2L -> 50L, 3L -> 7L), s"parts=$parts")
    }
  }

  test("lower bounds within n/(k+1); heavy hitters always survive") {
    // zipf-ish: key i gets ~n/i occurrences, plus a uniform tail that
    // forces constant counter eviction
    val head = (1 to 10).flatMap(i => Seq.fill(2000 / i)(i.toLong))
    val tail = (0 until 4000).map(i => 1000L + (i % 997))
    val rows = scala.util.Random.shuffle(head ++ tail)
    val n = rows.length.toLong
    val k = 32
    val slack = n / (k + 1)
    val truth = rows.groupBy(identity).view.mapValues(_.length.toLong)
    Seq(1, 3, 32).foreach { parts =>
      val m = sketchOf(rows, k, parts)
      assert(m.size <= k)
      m.foreach { case (key, est) =>
        val t = truth(key)
        assert(est <= t, s"parts=$parts: $key overcounted $est > $t")
        assert(t - est <= slack,
          s"parts=$parts: $key est=$est true=$t slack=$slack")
      }
      truth.filter(_._2 > slack).keys.foreach { hh =>
        assert(m.contains(hh), s"parts=$parts: heavy hitter $hh evicted")
      }
    }
  }

  test("grouped sketches: per-group guarantees hold independently") {
    import spark.implicits._
    val rows = (0 until 20000).map { i =>
      val g = i % 2
      // group 0 is heavily skewed to key 7; group 1 is uniform
      val v = if (g == 0 && i % 3 != 0) 7L else (i % 523).toLong
      (g, v)
    }
    val ms = rows.toDF("g", "v").repartition(16)
      .groupBy($"g").agg(FreqSketch.freqSketch($"v", 16).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getMap[Long, Long](1)).toMap
    val g0 = rows.filter(_._1 == 0)
    val hot = g0.count(_._2 == 7L).toLong
    assert(hot > g0.size / 17)
    assert(ms(0).contains(7L) && ms(0)(7L) <= hot)
  }
}

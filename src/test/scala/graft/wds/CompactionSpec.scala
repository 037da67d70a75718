package graft.wds

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import org.apache.spark.sql.Encoders

/** wds19 compaction laws: the greedy plan respects the target (a group
  * only exceeds it when a single shard does), groups are contiguous in
  * shard order, and EXECUTING the plan — grouped read → merged write —
  * preserves every sample and the global key order. */
class CompactionSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("plan: target respected, groups contiguous, oversized shard " +
    "gets its own group") {
    val plan = graft.queries.WdsQueries.planCompaction(
      Seq((0, 7L), (1, 7L), (2, 30L), (3, 7L), (4, 4L), (5, 7L)), 20L)
    // contiguity + monotone group ids
    assert(plan.map(_._1) === Seq(0, 1, 2, 3, 4, 5))
    assert(plan.map(_._3) === plan.map(_._3).sorted)
    assert(plan.map(_._3).distinct ===
      (0 to plan.map(_._3).max).toSeq)
    // per-group totals: only a single-shard group may exceed target
    plan.groupBy(_._3).values.foreach { g =>
      val tot = g.map(_._2).sum
      assert(tot <= 20L || g.size == 1, s"group $g")
    }
    // the oversized 30-sample shard is alone
    assert(plan.groupBy(_._3).values
      .exists(g => g.size == 1 && g.head._2 == 30L))
  }

  test("property: plan invariants hold for arbitrary size/target mixes") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val shards = (0 until (1 + rnd.nextInt(40)))
        .map(i => (i, 1L + rnd.nextInt(50)))
      val target = 1L + rnd.nextInt(120)
      val plan = graft.queries.WdsQueries.planCompaction(shards, target)
      // shard order and sizes pass through untouched
      assert(plan.map(p => (p._1, p._2)) === shards)
      // group ids: start at 0, never skip, never decrease
      assert(plan.head._3 === 0)
      plan.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 - a._3 == 0 || b._3 - a._3 == 1)
        case _ => ()
      }
      val groups = plan.groupBy(_._3)
      groups.values.foreach { g =>
        val tot = g.map(_._2).sum
        // a multi-shard group never exceeds target...
        assert(tot <= target || g.size == 1, s"$g target=$target")
        // ...and is maximal: its successor shard would not have fit
        val nextShard = g.map(_._1).max + 1
        plan.find(_._1 == nextShard).foreach { n =>
          if (n._3 != g.head._3)
            assert(tot + n._2 > target,
              s"group closed early: $g + $n fits $target")
        }
      }
    }
  }

  test("execute: merged shards preserve the sample multiset and order") {
    implicit val enc = Encoders.product[Sample]
    val src = Files.createTempDirectory("compact_src").toString
    val dst = Files.createTempDirectory("compact_dst").toString
    val samples = (0 until 60).map { i =>
      Sample(f"$i%09d", "", Map("txt" -> bytes(s"text $i")))
    }
    val info = WdsWriter.write(
      spark.createDataset(samples).repartition(1), src,
      WdsWriter.WriterOptions(maxCount = 7,
        pattern = (_, i) => f"part-$i%03d.tar")).collect()
      .sortBy(_.getAs[String]("url"))
    val shards = info.zipWithIndex.map { case (r, i) =>
      (i, r.getAs[Long]("nsamples"))
    }.toSeq
    val urls = info.map(_.getAs[String]("url"))
    val plan = graft.queries.WdsQueries.planCompaction(shards, 20L)
    // expected per-group key sequences: the plan is order-preserving,
    // so group g must hold EXACTLY the next contiguous run of global
    // keys — asserted UNSORTED (the invariant that motivates the
    // sequential greedy design)
    val groupSizes = plan.groupBy(_._3).view
      .mapValues(_.map(_._2).sum).toMap
    val expectedRuns = plan.map(_._3).distinct.sorted
      .foldLeft((0L, Map.empty[Int, Seq[String]])) {
        case ((off, acc), grp) =>
          val n = groupSizes(grp)
          (off + n, acc + (grp ->
            samples.map(_.key).slice(off.toInt, (off + n).toInt)))
      }._2
    val mergedKeys = plan.groupBy(_._3).toSeq.sortBy(_._1).flatMap {
      case (grp, members) =>
        val groupUrls = members.sortBy(_._1).map(m => urls(m._1))
        val ds = spark.read.format("wds").load(groupUrls: _*).as[Sample]
        val out = WdsWriter.write(ds.coalesce(1), s"$dst/g$grp",
          WdsWriter.WriterOptions(maxCount = Int.MaxValue,
            pattern = (_, i) => f"merged-$i%03d.tar")).collect()
        assert(out.length == 1, s"group $grp not merged to one shard")
        val keys = spark.read.format("wds")
          .load(s"$dst/g$grp/merged-000.tar")
          .select("key").collect().map(_.getString(0)).toSeq
        assert(keys === expectedRuns(grp),
          s"group $grp order not preserved")
        keys
    }
    // and globally: every sample exactly once, in the original order
    assert(mergedKeys === samples.map(_.key))
  }

  test("executor partitioning: RDD-level union keeps one partition per " +
    "merge group (SQL Union zips same-count children partition-wise)") {
    import spark.implicits._
    val a = Seq(("a", 1)).toDF("k", "v").coalesce(1)
    val b = Seq(("b", 2)).toDF("k", "v").coalesce(1)
    // the trap the wds20 executor must avoid: logical union collapses
    // two single-partition children into ONE partition...
    assert(a.union(b).rdd.getNumPartitions == 1)
    // ...while sparkContext.union concatenates them, making the DSv2
    // writer's part-<partitionId>- naming the group_id shard map
    val u = spark.sparkContext.union(Seq(a.rdd, b.rdd))
    assert(u.getNumPartitions == 2)
    assert(u.mapPartitionsWithIndex((i, it) =>
      it.map(r => (i, r.getString(0)))).collect().toSeq ===
      Seq((0, "a"), (1, "b")))
  }
}

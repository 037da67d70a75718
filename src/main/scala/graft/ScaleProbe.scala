package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: replicates `documents` N× (distinct doc_ids) and times
  * the dedup chain (signatures → LSH pairs → verified keep-list shape)
  * at each multiple, to observe scaling behavior beyond the fixtures.
  * Usage: sbt "runMain graft.ScaleProbe [sfDir] [multiples...]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 5, 20)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, sfDir).documents.select("doc_id", "text")
    val baseN = base.count()
    multiples.foreach { m =>
      // m distinct copies; texts perturbed per copy so near-dup structure
      // scales instead of becoming m-way exact duplicates
      val big = (0 until m).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" copytag$i")).as("text"))
      }.reduce(_ union _).repartition(spark.sparkContext.defaultParallelism)
        .cache()
      val n = big.count() // materialize cache
      val t0 = System.nanoTime()
      val sigs = functions.MinHash.signatures(big, 8).cache()
      sigs.count()
      val tSig = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val bands = sigs.select(col("doc_id"), explode(array(
        (0 until 4).map(b => md5(to_binary(concat_ws("|",
          lit(b.toString), col(s"h${2 * b}"), col(s"h${2 * b + 1}")),
          lit("utf-8")))): _*)).as("band"))
      val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
      val nPairs = pairs.count()
      val tLsh = (System.nanoTime() - t1) / 1e9
      // 64-bit simhash + Manku C(6,3) combo-table join (qd07 shape):
      // candidate count must stay near-linear in docs, not quadratic
      val t2 = System.nanoTime()
      val sim = functions.SimHash.signatures(big)
      val nSimPairs = functions.SimHash.candidatePairs(sim)
        .select(col("a_id"), col("b_id")).count()
      val tSim = (System.nanoTime() - t2) / 1e9
      println(f"[scale] docs=$n%8d sig=$tSig%6.2fs lsh=$tLsh%6.2fs " +
        f"pairs=$nPairs%d simhash=$tSim%6.2fs simPairs=$nSimPairs%d")
      sigs.unpersist(); big.unpersist()
    }

    // embedding LSH bucket balance (qd06 shape): distinct synthetic
    // vectors — measures ACCIDENTAL bucket collisions when there are no
    // true near-dups at all. Signature width follows the documented
    // scale rule (bits ~ log2(n/bucketTarget)): fixed-width buckets
    // would go quadratic as n grows past 2^bits
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    Seq(10000, 100000, 1000000).foreach { nv =>
      val bits = math.max(8,
        math.ceil(math.log(nv / 16.0) / math.log(2)).toInt)
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val vecs = spark.createDataFrame(
        spark.sparkContext.parallelize(0L until nv.toLong,
          spark.sparkContext.defaultParallelism).map { id =>
          // deterministic pseudo-random coords from a splitmix-style mix
          val arr = Array.tabulate(64) { i =>
            var z = id * 64 + i + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            (((z ^ (z >>> 31)) & 0xffff) / 32768.0f) - 1.0f
          }
          Row(id, arr)
        }, schema)
      val t0 = System.nanoTime()
      val sigs = functions.PlaneLSH
        .signatures(vecs, "vec_id", "embedding", tables = 12, bits, 64)
      val buckets = sigs.select(col("vec_id"), explode(array(
        (0 until 12).map(t => col(s"sig$t") + lit(t.toLong << bits)): _*))
        .as("bkt"))
      val cands = buckets.as("x").join(buckets.as("y"),
        col("x.bkt") === col("y.bkt") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id"), col("y.vec_id")).distinct().count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scale] vecs=$nv%8d bits=$bits%2d embLsh=$t%6.2fs " +
        f"candPairs=$cands%d")
    }
    spark.stop()
  }
}

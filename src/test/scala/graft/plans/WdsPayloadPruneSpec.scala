package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WdsPayloadPrune: element_at-only wds reads get payload_select
  * injected (and so seek past every other entry's bytes); anything
  * that could observe other payloads blocks the rewrite. */
class WdsPayloadPruneSpec extends SparkSpec {

  // register() is idempotent; the rule rides extraOptimizations
  graft.GraftExtensions.register(spark)

  private lazy val tar: String = {
    val dir = java.nio.file.Files.createTempDirectory("wpp").toString
    val out = new java.io.FileOutputStream(s"$dir/shard.tar")
    val w = new graft.wds.TarIO.TarWriter(out)
    val fat = Array.fill[Byte](1 << 20)(7)
    (0 until 6).foreach { i =>
      val entries: Map[String, Array[Byte]] =
        if (i == 5) Map("bin" -> fat) // no txt: row must STILL appear
        else Map("txt" -> s"text $i".getBytes("UTF-8"), "bin" -> fat)
      w.write(graft.wds.Sample(f"$i%06d", "", entries)): Unit
    }
    w.close()
    s"$dir/shard.tar"
  }

  private def planStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def fileBytesRead: Long = {
    val s = org.apache.hadoop.fs.FileSystem
      .getGlobalStorageStatistics.get("file")
    if (s == null) 0L else s.getLong("bytesRead").longValue()
  }

  test("element_at-only read: payload_select injected, values exact, " +
      "row count preserved, bytes-read drops") {
    val df = spark.read.format("wds").load(tar)
      .select(col("key"),
        element_at(col("entries"), "txt").cast("string").as("t"))
      .orderBy(col("key"))
    assert(planStr(df).contains("payload_select=[*.txt]"), planStr(df))
    val b0 = fileBytesRead
    val got = df.collect().map(r => r.getString(0) -> r.getString(1))
    val pruned = fileBytesRead - b0
    // all 6 samples present — including the one WITHOUT a txt entry
    assert(got.length == 6)
    assert(got.take(5).forall { case (k, t) => t == s"text ${k.toInt}" })
    assert(got.last._2 == null)
    // vs the unpruned read of the same projection (select=* matches
    // every entry AND blocks the rewrite). The pruned scan's true need
    // is headers+txt (~7 KB — verified at the channel layer in
    // TarIOSpec); Hadoop's buffered local stream refills ~64 KB at
    // every seek point and the FS stat counts that readahead, so the
    // assertion is a ratio, not an absolute.
    val full = spark.read.format("wds").option("select", "*")
      .load(tar)
      .select(col("key"),
        element_at(col("entries"), "txt").cast("string").as("t"))
      .orderBy(col("key"))
    assert(!planStr(full).contains("payload_select"))
    val b1 = fileBytesRead
    assert(full.collect().length == 6)
    val fullBytes = fileBytesRead - b1
    assert(pruned * 3 < fullBytes,
      s"pruned read moved $pruned of $fullBytes unpruned bytes")
  }

  test("whole-map and map_keys reads are NOT rewritten") {
    val whole = spark.read.format("wds").load(tar)
      .select(col("key"), col("entries"))
    assert(!planStr(whole).contains("payload_select"), planStr(whole))
    assert(whole.collect().forall(
      _.getMap[String, Array[Byte]](1).nonEmpty))
    val keysQ = spark.read.format("wds").load(tar)
      .select(col("key"), map_keys(col("entries")).as("ks"))
    assert(!planStr(keysQ).contains("payload_select"), planStr(keysQ))
    // a bin-observing projection keeps the real bytes
    val sizes = spark.read.format("wds").load(tar)
      .select(length(element_at(col("entries"), "bin")).as("n"))
    assert(planStr(sizes).contains("payload_select=[*.bin]"))
    assert(sizes.collect().forall(_.getInt(0) == (1 << 20)))
  }

  test("a cached raw read stays unpruned: later consumers get real " +
      "bytes") {
    // df.cache() materializes the RAW read's plan — its root output
    // carries `entries` bare, so the rule must not fire there; a
    // narrow consumer then reads the (full) cache, and a later wide
    // consumer still sees every payload
    val df = spark.read.format("wds").load(tar)
    df.cache()
    try {
      val narrow = df
        .select(element_at(col("entries"), "txt").cast("string").as("t"))
      assert(narrow.collect().count(_.getString(0) != null) == 5)
      val wide = df.select(
        length(element_at(col("entries"), "bin")).as("n"))
      assert(wide.collect().forall(_.getInt(0) == (1 << 20)),
        "cached read lost payload bytes")
    } finally { df.unpersist(): Unit }
  }

  test("an explicit user select option blocks the rewrite") {
    val df = spark.read.format("wds").option("select", "*.txt").load(tar)
      .select(element_at(col("entries"), "txt").as("t"))
    val p = planStr(df)
    assert(p.contains("select=[*.txt]") && !p.contains("payload_select"), p)
  }

  test("multi-key and filter uses collect all keys; dotted keys bail") {
    val df = spark.read.format("wds").load(tar)
      .filter(element_at(col("entries"), "txt").isNotNull)
      .select(length(element_at(col("entries"), "bin")).as("n"),
        element_at(col("entries"), "txt").cast("string").as("t"))
    val p = planStr(df)
    assert(p.contains("payload_select=[*.bin,*.txt]"), p)
    assert(df.count() == 5) // the txt-less sample filtered out
    val dotted = spark.read.format("wds").load(tar)
      .select(element_at(col("entries"), "0.jpg").as("f"))
    assert(!planStr(dotted).contains("payload_select"), planStr(dotted))
  }
}

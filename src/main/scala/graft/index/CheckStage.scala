package graft.index

import graft.wds.Sample
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E3 — the index/check stage (`index/check_pair.py`): scan tokenized
  * shards, assert structural invariants, emit the `{url, nsamples}` shard
  * index and a human-inspection sample.
  *
  * The invariants are expressed as DataFrame predicates over the parsed
  * json column — fully declarative, so at 100 TB this is a single
  * codegen'd scan + one tiny groupBy(url) hash aggregation (A1/A2).
  */
object CheckStage {

  /** Tokenized-shard json schema (FIXTURES.md A3). */
  val PackedJsonSchema: StructType = StructType(Seq(
    StructField("image", ArrayType(StringType)),
    StructField("input_ids", ArrayType(IntegerType)),
    StructField("loss_mask", ArrayType(IntegerType)),
    StructField("text", ArrayType(StringType))))

  val ImPatchId = 32000
  val ImStartId = 32001
  val ImEndId = 32002
  val PatchesPerImage = 256
  val MaxTokens = 8000

  /** entries → parsed json frame, shared by the gate and the
    * inspection dump so the two can never parse differently. */
  private def parsed(shards: Dataset[Sample]): DataFrame =
    shards.toDF()
      .withColumn("j", from_json(
        decode(col("entries").getItem("json"), "UTF-8"), PackedJsonSchema))

  /** Parse + flag each sample with its invariant violations
    * (`check_pair.py:37-40`). A missing or unparseable json entry is
    * its own violation (bad_parse): null flags would otherwise slip
    * corrupt samples past the strict filter's three-valued OR. */
  def checked(shards: Dataset[Sample]): DataFrame = {
    val df = parsed(shards)
    // size(a) - size(array_remove(a, id)) stays inside codegen; the
    // filter() HOF evaluates an interpreted lambda per element over
    // up-to-8k-token arrays on the gate's hot path
    def countId(id: Int) =
      size(col("j.input_ids")) -
        size(array_remove(col("j.input_ids"), id))
    val bad = (c: org.apache.spark.sql.Column) => coalesce(c, lit(true))
    df.select(
      col("key"), col("url"),
      size(col("j.input_ids")).as("n_tokens"),
      size(col("j.image")).as("n_images"),
      (col("j").isNull || col("j.input_ids").isNull).as("bad_parse"),
      bad(size(col("j.input_ids")) =!= size(col("j.loss_mask")))
        .as("bad_mask_len"),
      bad(size(col("j.input_ids")) >= MaxTokens).as("bad_token_len"),
      bad(countId(ImStartId) =!= countId(ImEndId)).as("bad_start_end"),
      bad(countId(ImPatchId) =!= size(col("j.image")) * PatchesPerImage)
        .as("bad_patch_count"))
  }

  /** Shard index `{url, nsamples}` (`check_pair.py:46`); throws if any
    * invariant fails — the stage IS the correctness gate. */
  def index(shards: Dataset[Sample], strict: Boolean = true): DataFrame = {
    val c = checked(shards).cache()
    try {
      if (strict) {
        val bad = c.filter(
          col("bad_parse") || col("bad_mask_len") || col("bad_token_len") ||
            col("bad_start_end") || col("bad_patch_count"))
        val n = bad.count()
        require(n == 0, s"$n samples violate tokenized-shard invariants")
      }
      // the index is one row per tar — driver-sized by construction
      // (the reference collects and pickles it, `check_pair.py:59-66`).
      // Collect into a LocalRelation so no cached block outlives this
      // call: a session running many gate/bench invocations must not
      // accumulate storage for the JVM lifetime.
      val agg = c.groupBy(col("url")).agg(count(lit(1)).as("nsamples"))
        .orderBy(col("url"))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      agg.collect().foreach(r => { rows.add(r); () })
      shards.sparkSession.createDataFrame(rows, agg.schema)
    } finally { c.unpersist(); () }
  }

  /** Write the index in the REFERENCE's artifact format: one pickle of
    * `list[dict(url=str, nsamples=int)]` (`check_pair.py:59-66`:
    * `pickle.dump(outputs, open(....pkl, "wb"))`), loadable by the
    * fleet's CPython consumers — the migration seam for users whose
    * downstream tooling reads the .pkl index. `idx` is driver-sized
    * by construction (one row per tar). */
  def writePickleIndex(idx: DataFrame, path: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val rows: Any = idx.select(col("url"), col("nsamples")).collect()
      .toVector
      .map(r => graft.wds.Pickle.Dict(Vector(
        "url" -> r.getString(0), "nsamples" -> r.getLong(1))))
    val bytes = graft.wds.Pickle.encode(rows)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Driver-side buffering ceiling for [[readPickleIndex]]: an index is
    * `{url, nsamples}` per tar (~100 bytes/shard → 256 MiB covers
    * ~2.5M shards, far past any real fleet), while a WRONG path — a
    * shard, a parquet file — would otherwise buffer wholesale on the
    * driver before the decoder rejects it. */
  val MaxPickleIndexBytes: Long = 256L << 20

  /** Read a reference-produced (or [[writePickleIndex]]-produced)
    * `.pkl` shard index back as a DataFrame — the reverse migration
    * seam: a user bringing the fleet's existing pickled indexes can
    * join them against engine output without CPython in the loop. */
  def readPickleIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    if (len > MaxPickleIndexBytes)
      throw new IllegalArgumentException(
        s"readPickleIndex($path): $len bytes exceeds the " +
          s"$MaxPickleIndexBytes-byte index ceiling — a .pkl shard " +
          "index is {url, nsamples} per tar; this looks like a shard " +
          "or data file, not an index")
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val rows = graft.wds.Pickle.decode(bytes) match {
      case items: Vector[_] => items.map { d =>
        val m = graft.wds.Pickle.toMap(d)
        (m("url").asInstanceOf[String], m("nsamples") match {
          case l: Long => l
          case b: BigInt => b.toLong
          case other => throw new IllegalArgumentException(
            s"nsamples: $other")
        })
      }
      case other => throw new IllegalArgumentException(
        s"not a pickled index list: ${other.getClass.getName}")
    }
    import spark.implicits._
    rows.toDF("url", "nsamples")
  }

  /** 1 % human-inspection dump (`check_pair.py:16-26,41-42`): ground
    * truth text next to the loss-masked token stream. */
  def inspectionSample(shards: Dataset[Sample], frac: Double = 0.01,
      seed: Long = 42L): DataFrame = {
    val df = parsed(shards)
    df.sample(withReplacement = false, frac, seed)
      .select(col("key"), col("url"),
        concat_ws(" ", col("j.text")).as("gt_text"),
        col("j.input_ids").as("input_ids"),
        filter(arrays_zip(col("j.input_ids"), col("j.loss_mask")),
          s => s.getField("loss_mask") === 1)
          .getField("input_ids").as("loss_tokens"))
  }
}

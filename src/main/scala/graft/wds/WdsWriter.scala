package graft.wds

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Spark write path: Dataset[Sample] → rolling tar shards.
  *
  * ShardWriter semantics (`webdataset-private/webdataset/writer.py:362-449`):
  * a shard rolls when it reaches `maxCount` samples or `maxSize` bytes.
  * Naming follows the pack stage's worker-addressed convention
  * (`pack/pack.py:59-63`: `shard-{machine}-{start}-{end}-{tarIdx}.tar`) with
  * Spark's partition id as the worker address — filenames are
  * deterministic per (partition, roll index), so re-running a failed task
  * overwrites rather than duplicates (idempotent retries).
  *
  * Each partition writes independently through Hadoop FS — no driver
  * funnel, no shuffle; output parallelism = input partitioning, which the
  * caller controls with repartition (e.g. 500-sample tars ⇒ repartition so
  * each partition holds ~500·k samples).
  */
object WdsWriter {

  final case class ShardInfo(
      url: String,
      nsamples: Long,
      nbytes: Long,
      partition: Int)

  final case class WriterOptions(
      /** roll after this many samples (reference default 1e5; the pack
        * stage uses 500/tar). */
      maxCount: Long = 100000L,
      /** roll after this many payload bytes (reference default 3e9). */
      maxSize: Long = 3000000000L,
      /** filename pattern: (partition, shardIdx) => name. */
      pattern: (Int, Int) => String =
        (p, i) => f"shard-$p%05d-$i%06d.tar",
      tar: TarIO.WriteOptions = TarIO.WriteOptions(),
      /** physical records per logical sample (e.g. the pack layout's
        * `<key>.json` + sibling `<key>-<i>.jpg` entries). Rolling
        * happens only at logical-sample boundaries so a sample's
        * records never straddle shards. */
      explode: Sample => Seq[Sample] = s => Seq(s))

  /** Write samples; returns one ShardInfo row per tar written (the
    * "index" the reference's check stage derives — A3 write metrics). */
  def write(
      ds: Dataset[Sample],
      outDir: String,
      opts: WriterOptions = WriterOptions()): DataFrame = {
    val spark = ds.sparkSession
    implicit val enc = Encoders.product[ShardInfo]
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(conf)
    ds.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      // attempt-scoped temp names + rename-on-roll: a speculative or
      // retried attempt of this task never interleaves bytes with the
      // original attempt's file (both write their own .tmp-<attempt>,
      // last rename wins atomically-enough per shard); stray temps are
      // removed by the completion listener on failure
      val attempt = Option(TaskContext.get()).map(_.taskAttemptId())
        .getOrElse(0L)
      val dir = new Path(outDir)
      val fs = dir.getFileSystem(bc.value.value)
      fs.mkdirs(dir)
      val out = Seq.newBuilder[ShardInfo]
      var shardIdx = 0
      var writer: TarIO.TarWriter = null
      var path: Path = null
      var tmpPath: Path = null
      var count = 0L
      var bytes = 0L

      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
        _ =>
          if (writer != null) {
            try writer.close() catch { case _: Exception => () }
            try { fs.delete(tmpPath, false); () }
            catch { case _: Exception => () }
          }
      })

      def roll(): Unit = {
        if (writer != null) {
          writer.close()
          // Prefer atomic overwrite-rename: no exists/delete window in
          // which the shard path is absent, and no spurious failure when
          // racing a speculative attempt. FSes without FileContext
          // support fall back to delete+rename; a lost race there is
          // tolerated iff the destination exists (both attempts write
          // identical deterministic content).
          val renamed =
            try {
              org.apache.hadoop.fs.FileContext
                .getFileContext(path.toUri, bc.value.value)
                .rename(tmpPath, path,
                  org.apache.hadoop.fs.Options.Rename.OVERWRITE)
              true
            } catch {
              // no AbstractFileSystem binding for this scheme (S3A by
              // default) or no overwrite-rename support: legacy path
              case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
                  _: UnsupportedOperationException =>
                if (fs.exists(path)) fs.delete(path, false)
                fs.rename(tmpPath, path)
            }
          if (!renamed) {
            if (!fs.exists(path))
              throw new java.io.IOException(
                s"rename $tmpPath -> $path failed")
            try { fs.delete(tmpPath, false); () }
            catch { case _: Exception => () }
          }
          out += ShardInfo(path.toString, count, bytes, pid)
        }
        writer = null; count = 0L; bytes = 0L
      }
      def ensure(): Unit = if (writer == null) {
        val name = opts.pattern(pid, shardIdx)
        path = new Path(dir, name)
        tmpPath = new Path(dir, s".$name.tmp-$attempt")
        shardIdx += 1
        writer = new TarIO.TarWriter(fs.create(tmpPath, true), opts.tar)
      }

      it.foreach { s =>
        ensure()
        opts.explode(s).foreach(rec => bytes += writer.write(rec))
        count += 1
        if (count >= opts.maxCount || bytes >= opts.maxSize) roll()
      }
      roll()
      out.result().iterator
    }.toDF()
  }
}

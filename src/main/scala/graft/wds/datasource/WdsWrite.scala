package graft.wds.datasource

import java.util

import graft.wds.{Sample, SerializableHadoopConf, TarIO}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DataSource V2 write path for `format("wds")`:
  *
  * {{{
  *   samples.write.format("wds")
  *     .option("maxcount", "500")        // ShardWriter roll (records)
  *     .option("maxsize", "3000000000")  // ShardWriter roll (bytes)
  *     .mode("overwrite")                // truncate = clear directory
  *     .save("/data/out")
  * }}}
  *
  * Input schema must be the wds sample shape (key, url, entries). Each
  * partition writes independent rolling shards named
  * `part-<partition>-<task>-<shard>.tar` — the attempt (task) id is part
  * of the name, so speculative/retried tasks never collide; committed
  * files are reported through WriterCommitMessages and uncommitted
  * attempts are removed in abort.
  */
final class WdsWriteBuilder(
    options: util.Map[String, String],
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    private def prepared = {
      val dir = Option(options.get("path"))
        .getOrElse(throw new IllegalArgumentException("wds write: no path"))
      val conf = new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf())
      val maxCount = Option(options.get("maxcount"))
        .map(_.toLong).getOrElse(100000L)
      val maxSize = Option(options.get("maxsize"))
        .map(_.toLong).getOrElse(3000000000L)
      (dir, conf, maxCount, maxSize)
    }
    override def toBatch: BatchWrite = {
      val (dir, conf, maxCount, maxSize) = prepared
      if (doTruncate) {
        val p = new Path(dir)
        val fs = p.getFileSystem(conf.value)
        if (fs.exists(p)) fs.delete(p, true): Unit
      }
      new WdsBatchWrite(dir, conf, info.schema(), maxCount, maxSize)
    }
    /** Streaming sink: `transformed.writeStream.format("wds")…`.
      * Tasks stage shards under `.staging/`; epoch commit renames them
      * into place in ASCENDING name order with epoch-primary names
      * (`part-e<epoch>-<p>-<task>-<n>.tar`), so a chained
      * `readStream.format("wds")`'s url-max watermark can never pass a
      * shard that hasn't appeared yet. Complete mode (truncate) drops
      * shards older than the newest `retainepochs` epochs (default 1 =
      * current only) after the new epoch lands — a Complete-mode sink
      * with the default MUST NOT be chained into a wds readStream: a
      * downstream restart re-plans checkpointed offset ranges by
      * re-listing the directory, and deleted epochs silently vanish
      * from the replayed batch. Set retainepochs high enough to cover
      * the downstream's restart window if you must chain. A stream
      * RESTART never wipes the directory (truncate is batch-only):
      * the prior snapshot stays readable until the first new epoch
      * commits, then retention applies. Semantics are
      * at-least-once on epoch REPLAY after a failure (no idempotent
      * commit log); aborted attempts are deleted like the batch path,
      * and stale `.staging/` orphans from dead attempts are swept at
      * stream start and at each epoch commit. */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      val (dir, conf, maxCount, maxSize) = prepared
      val retain = Option(options.get("retainepochs"))
        .map(_.toInt).getOrElse(1)
      require(retain >= 1, s"retainepochs must be >= 1, got $retain")
      new WdsStreamingWrite(dir, conf, info.schema(), maxCount, maxSize,
        truncatePerEpoch = doTruncate, retainEpochs = retain)
    }
  }
}

final class WdsStreamingWrite(
    dir: String,
    conf: SerializableHadoopConf,
    schema: StructType,
    maxCount: Long,
    maxSize: Long,
    truncatePerEpoch: Boolean,
    retainEpochs: Int = 1)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  // Stream (re)start: anything still under .staging/ is an orphan — a
  // dead attempt from a prior run whose commit message never reached
  // the driver (abort only deletes files NAMED in messages). Without
  // this sweep .staging accumulates garbage for the life of the sink.
  // SINGLE WRITER PER DIRECTORY is assumed (as with Spark's own file
  // sink and its commit log): a second concurrent stream on the same
  // path would lose its in-flight staged shards to this sweep — run
  // concurrent producers against distinct sink directories.
  {
    val base = new Path(dir)
    val fs = base.getFileSystem(conf.value)
    val staging = new Path(base, ".staging")
    if (fs.exists(staging)) fs.delete(staging, true): Unit
  }

  /** Epoch embedded in a final/staged shard name, or -1. */
  private def epochOf(name: String): Long =
    if (name.startsWith("part-e"))
      name.drop(6).takeWhile(_.isDigit) match {
        case "" => -1L
        case d  => d.toLong
      }
    else -1L

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    WdsStreamingWriterFactory(
      WdsWriterFactory(dir, conf, schema, maxCount, maxSize))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(conf.value)
    val pairs = messages.toSeq.collect {
      case WdsCommitMessage(staged, finals) => staged.zip(finals)
    }.flatten.sortBy(_._2) // ascending final name: watermark-safe
    pairs.foreach { case (staged, finalName) =>
      val target = new Path(base, finalName)
      if (!fs.rename(new Path(staged), target))
        throw new java.io.IOException(s"rename $staged -> $target failed")
    }
    // sweep staged orphans from dead attempts of this or earlier
    // epochs — those epochs just committed (or were replayed), so
    // nothing staged for them can ever be renamed into place
    Option(fs.globStatus(
      new Path(new Path(base, ".staging"), "part-e*.tar"))).toSeq.flatten
      .filter(f => epochOf(f.getPath.getName) <= epochId)
      .foreach(f => fs.delete(f.getPath, false))
    if (truncatePerEpoch) {
      // Complete mode: the new epoch REPLACES the output — drop
      // committed shards older than the newest retainEpochs epochs
      // (readers of a Complete sink read a snapshot, not an append
      // log; retention > 1 is the chained-readStream grace window)
      val floor = epochId - (retainEpochs - 1)
      Option(fs.globStatus(new Path(base, "part-e*.tar"))).toSeq.flatten
        .filter(f => epochOf(f.getPath.getName) < floor)
        .foreach(f => fs.delete(f.getPath, false))
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf.value)
    messages.collect { case WdsCommitMessage(files, _) =>
      files.foreach(f => fs.delete(new Path(f), false))
    }: Unit
  }
}

/** @param files  committed (batch) or staged (streaming) file paths
  * @param finals streaming only: the final shard name for each staged
  *               file, renamed into place at epoch commit */
final case class WdsCommitMessage(
    files: Seq[String],
    finals: Seq[String] = Seq.empty) extends WriterCommitMessage

final class WdsBatchWrite(
    dir: String,
    conf: SerializableHadoopConf,
    schema: StructType,
    maxCount: Long,
    maxSize: Long) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    WdsWriterFactory(dir, conf, schema, maxCount, maxSize)

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf.value)
    messages.collect { case WdsCommitMessage(files, _) =>
      files.foreach(f => fs.delete(new Path(f), false))
    }: Unit
  }
}

/** Serializable streaming wrapper: only the batch factory ships to
  * executors (the StreamingWrite itself stays on the driver). */
final case class WdsStreamingWriterFactory(batch: WdsWriterFactory)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    batch.createWriter(partitionId, taskId, Some(epochId))
}

final case class WdsWriterFactory(
    dir: String,
    conf: SerializableHadoopConf,
    schema: StructType,
    maxCount: Long,
    maxSize: Long) extends DataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, None)

  def createWriter(partitionId: Int, taskId: Long,
      epochId: Option[Long]): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val base = new Path(dir)
      private val fs = base.getFileSystem(conf.value)
      fs.mkdirs(base): Unit
      private val keyIdx = schema.fieldIndex("key")
      private val entriesIdx = schema.fieldIndex("entries")

      private var writer: TarIO.TarWriter = _
      private var current: Path = _
      private var shardIdx = 0
      private var count = 0L
      private var bytes = 0L
      private val files = Seq.newBuilder[String]

      private def roll(): Unit = {
        if (writer != null) {
          writer.close()
          files += current.toString
        }
        writer = null; count = 0L; bytes = 0L
      }
      // Streaming shards stage under .staging/ and are renamed into
      // place at epoch COMMIT in ascending name order, so a chained
      // readStream's url-max watermark can never observe a name above
      // a not-yet-visible one. Final names are epoch-primary with
      // padded task ids — lexicographic order == (epoch, partition,
      // task, shard) order, monotone across epochs.
      private val finals = Seq.newBuilder[String]
      private def ensure(): Unit = if (writer == null) {
        current = epochId match {
          case Some(e) =>
            val name =
              f"part-e$e%09d-$partitionId%05d-$taskId%09d-$shardIdx%06d.tar"
            finals += name
            new Path(new Path(base, ".staging"), name)
          case None =>
            new Path(base,
              f"part-$partitionId%05d-$taskId%d-$shardIdx%06d.tar")
        }
        shardIdx += 1
        writer = new TarIO.TarWriter(fs.create(current, true))
      }

      override def write(row: InternalRow): Unit = {
        ensure()
        val key = row.getUTF8String(keyIdx).toString
        val m = row.getMap(entriesIdx)
        val ks = m.keyArray()
        val vs = m.valueArray()
        val entries = (0 until m.numElements()).map { i =>
          ks.getUTF8String(i).toString -> vs.getBinary(i)
        }.toMap
        bytes += writer.write(key, entries)
        count += 1
        if (count >= maxCount || bytes >= maxSize) roll()
      }

      override def commit(): WriterCommitMessage = {
        roll()
        WdsCommitMessage(files.result(), finals.result())
      }

      override def abort(): Unit = {
        if (writer != null) writer.close()
        files.result().foreach(f => fs.delete(new Path(f), false))
        if (current != null) fs.delete(current, false): Unit
      }

      override def close(): Unit = if (writer != null) roll()
    }
}

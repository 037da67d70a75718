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
      if (doTruncate) {
        val p = new Path(dir)
        val fs = p.getFileSystem(conf.value)
        if (fs.exists(p)) fs.delete(p, true): Unit
      }
      (dir, conf, maxCount, maxSize)
    }
    override def toBatch: BatchWrite = {
      val (dir, conf, maxCount, maxSize) = prepared
      new WdsBatchWrite(dir, conf, info.schema(), maxCount, maxSize)
    }
    /** Streaming sink: `transformed.writeStream.format("wds")…` — each
      * epoch's shards carry the epoch in their name
      * (`part-<p>-<task>-e<epoch>-<n>.tar`), so shard names stay
      * monotone per partition and a downstream `readStream.format
      * ("wds")` can chain on the output. Semantics are at-least-once
      * on epoch REPLAY after a failure (no idempotent commit log);
      * aborted attempts are deleted like the batch path. */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      val (dir, conf, maxCount, maxSize) = prepared
      new WdsStreamingWrite(dir, conf, info.schema(), maxCount, maxSize)
    }
  }
}

final class WdsStreamingWrite(
    dir: String,
    conf: SerializableHadoopConf,
    schema: StructType,
    maxCount: Long,
    maxSize: Long)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    WdsStreamingWriterFactory(
      WdsWriterFactory(dir, conf, schema, maxCount, maxSize))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf.value)
    messages.collect { case WdsCommitMessage(files) =>
      files.foreach(f => fs.delete(new Path(f), false))
    }: Unit
  }
}

final case class WdsCommitMessage(files: Seq[String]) extends WriterCommitMessage

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
    messages.collect { case WdsCommitMessage(files) =>
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
      private def ensure(): Unit = if (writer == null) {
        val epoch = epochId.map(e => f"e$e%06d-").getOrElse("")
        current = new Path(base,
          f"part-$partitionId%05d-$taskId%d-$epoch$shardIdx%06d.tar")
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
        WdsCommitMessage(files.result())
      }

      override def abort(): Unit = {
        if (writer != null) writer.close()
        files.result().foreach(f => fs.delete(new Path(f), false))
        if (current != null) fs.delete(current, false): Unit
      }

      override def close(): Unit = if (writer != null) roll()
    }
}

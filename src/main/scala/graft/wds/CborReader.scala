package graft.wds

import java.io.BufferedInputStream

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** CBOR shard source (S13; reference
  * `webdataset-private/webdataset/cborsiterators.py:6-51`): each URL is
  * a stream of consecutive CBOR items read until EOF, exactly the
  * reference's `cbor.load` loop. Same execution model as the tar
  * reader — one shard per partition, URLs opened through [[Gopen]]
  * (file:/hdfs:/s3a:/pipe:), open errors routed through the handler
  * policy.
  *
  * Sample mapping (the webdataset sample convention): a top-level map
  * with a `__key__` text entry becomes a [[Sample]] keyed by it; all
  * other entries become sample entries — text values as UTF-8 bytes,
  * byte strings as-is, anything else re-encoded as CBOR bytes under its
  * own suffix. Items without `__key__` get ordinal keys `<shard idx>`.
  */
object CborReader {

  def read(
      spark: SparkSession,
      spec: String,
      handler: Handler = Handler.Reraise): Dataset[Sample] =
    readUrls(spark, ShardList.expand(spec), handler)

  def readUrls(
      spark: SparkSession,
      urls: Seq[String],
      handler: Handler = Handler.Reraise): Dataset[Sample] = {
    implicit val enc = Encoders.product[Sample]
    require(urls.nonEmpty, "empty shard list")
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(conf)
    spark.createDataset(
      spark.sparkContext.parallelize(urls, urls.size).mapPartitions { it =>
        var stopped = false
        it.flatMap { url =>
          if (stopped) Iterator.empty
          else
            try {
              val in = new BufferedInputStream(
                Gopen.open(url, bc.value.value), 1 << 16)
              Option(org.apache.spark.TaskContext.get()).foreach(
                _.addTaskCompletionListener[Unit](_ =>
                  try in.close() catch { case _: Exception => () }))
              guardedItems(in, url, handler, () => stopped = true)
                .zipWithIndex.map { case (item, i) => toSample(item, i, url) }
            } catch {
              case e: Exception =>
                if (!Handler.handle(handler, s"open $url", e))
                  stopped = true
                Iterator.empty
            }
        }
      })
  }

  /** Item iteration under the shard error policy: a MID-STREAM decode
    * or read failure (truncated item, reserved byte, pipe producer
    * death) routes through [[Handler.handle]] — continue quarantines
    * the remainder of this shard, stop also truncates the task's
    * stream via `onStop`, reraise throws. Lazy decode means these
    * surface while Spark consumes the iterator, after the open-time
    * try has exited — without this guard they would escape the policy
    * entirely. */
  private[wds] def guardedItems(
      in: java.io.InputStream,
      url: String,
      handler: Handler,
      onStop: () => Unit): Iterator[Any] = new Iterator[Any] {
    private var done = false
    private var nextItem: Option[Any] = advance()
    private def advance(): Option[Any] =
      if (done) None
      else
        try Some(Cbor.decode(in))
        catch {
          case _: Cbor.EndOfStream => done = true; None
          case e: Exception =>
            if (!Handler.handle(handler, s"cbor scan $url", e)) onStop()
            done = true
            None
        }
    def hasNext: Boolean = nextItem.isDefined
    def next(): Any = {
      val v = nextItem.getOrElse(throw new NoSuchElementException)
      nextItem = advance()
      v
    }
  }

  /** webdataset sample convention → [[Sample]]. */
  private[wds] def toSample(item: Any, idx: Int, url: String): Sample =
    item match {
      case m: Cbor.CborMap =>
        val pairs = m.pairs.map { case (k, v) => (String.valueOf(k), v) }
        val key = pairs.collectFirst {
          case ("__key__", k: String) => k
        }.getOrElse(f"$idx%09d")
        val entries = pairs.filterNot(_._1 == "__key__").map {
          case (k, v: Array[Byte]) => k -> v
          case (k, v: String) => k -> v.getBytes("UTF-8")
          case (k, v) => k -> Cbor.encode(v)
        }
        Sample(key, url, entries.toMap)
      case other =>
        // bare (non-map) item: single `cbor` entry, ordinal key
        Sample(f"$idx%09d", url, Map("cbor" -> Cbor.encode(other)))
    }
}

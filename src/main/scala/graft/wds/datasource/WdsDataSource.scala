package graft.wds.datasource

import java.util

import graft.wds.{Gopen, Handler, Sample, SerializableHadoopConf, ShardList, TarIO}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `wds` format (SURVEY.md §4.2.1):
  *
  * {{{
  *   spark.read.format("wds")
  *     .option("select", "*.json,*.jpg")   // entry-name pushdown
  *     .option("interleave", "true")
  *     .option("handler", "warn_continue")
  *     .load("file:/data/shard-{000..123}.tar")
  * }}}
  *
  * Planning: brace/env/`::` expansion on the driver, then ONE input
  * partition per shard — tars are non-splittable sequential reads, so the
  * shard is the scheduling unit (the reference's process-per-tar model,
  * `pack/pack.py:293`). Entry-level `select` pushdown skips tar entries
  * during the scan — the tar analog of parquet column pruning
  * (reference hook: `tariterators.py:101,130`). Column pruning is
  * supported: a `key`/`url`-only query never materializes entry bytes.
  */
class WdsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wds"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WdsDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WdsTable(new CaseInsensitiveStringMap(properties))
}

object WdsDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("entries", MapType(StringType, BinaryType), nullable = false)))

  def parseHandler(s: String): Handler = s match {
    case "reraise" => Handler.Reraise
    case "ignore_continue" => Handler.IgnoreContinue
    case "warn_continue" => Handler.WarnContinue
    case "ignore_stop" => Handler.IgnoreStop
    case "warn_stop" => Handler.WarnStop
    case other => throw new IllegalArgumentException(s"handler $other")
  }

  def readOptions(options: CaseInsensitiveStringMap): TarIO.ReadOptions = {
    val select = Option(options.get("select")).map { globs =>
      val regexes = globs.split(",").toSeq
        .map(g => graft.wds.SampleOps.globToRegex(g.trim).r)
      (name: String) => regexes.exists(_.matches(name))
    }
    // payload_select: names always flow (row counts / group boundaries
    // are the unpruned read's), non-matching payloads blank + skip —
    // the WdsPayloadPrune optimizer rule's injection point. Matching
    // is case-insensitive via lowercased names+globs (ReadOptions
    // scaladoc: a wrongly-pruned payload is a wrong answer).
    val payload = Option(options.get("payload_select")).map { globs =>
      val regexes = globs.split(",").toSeq.map(g =>
        graft.wds.SampleOps.globToRegex(
          g.trim.toLowerCase(java.util.Locale.ROOT)).r)
      (name: String) => regexes.exists(_.matches(name))
    }
    TarIO.ReadOptions(
      interleave = options.getBoolean("interleave", true),
      lowercaseSuffix = options.getBoolean("lowercase", true),
      suffixes = Option(options.get("suffixes"))
        .map(_.split(",").map(_.trim).toSet),
      selectFiles = select,
      payloadFiles = payload,
      handler = parseHandler(
        Option(options.get("handler")).getOrElse("reraise")))
  }
}

final class WdsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  /** user-set entry pruning at table level — makes the WdsPayloadPrune
    * rewrite ineligible regardless of where the option landed */
  private[graft] def hasEntryPruning: Boolean =
    options.get("select") != null || options.get("payload_select") != null
  override def name(): String = "wds"
  override def schema(): StructType = WdsDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table properties (from load(path)) with read options
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new WdsScanBuilder(new CaseInsensitiveStringMap(merged))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(info.options())
    new WdsWriteBuilder(merged, info)
  }
}

final class WdsScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = WdsDataSource.Schema
  private var urlFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** `url` predicates prune the shard list at PLANNING time — the tar
    * analog of parquet partition pruning: a filtered read schedules
    * only matching shards instead of scanning all of them. Filters are
    * also left for Spark to re-evaluate (pruning is an optimization,
    * not an evaluation contract). */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    urlFilters = filters.filter(WdsScan.urlPredicate(_).isDefined)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    urlFilters
  override def build(): Scan = new WdsScan(options, required, urlFilters)
}

object WdsScan {
  import org.apache.spark.sql.sources._
  /** url-column filters we can prune shards with at planning. */
  def urlPredicate(f: Filter): Option[String => Boolean] = f match {
    case EqualTo("url", v: String) => Some(_ == v)
    case In("url", vs) =>
      val set = vs.collect { case s: String => s }.toSet
      Some(set.contains)
    case StringStartsWith("url", p) => Some(_.startsWith(p))
    case StringEndsWith("url", p) => Some(_.endsWith(p))
    case StringContains("url", p) => Some(_.contains(p))
    case _ => None
  }

  /** Shared path→shard-list resolution for the shard-stream formats
    * (wds, cbors): handles DataFrameReader.load(paths*)'s JSON-encoded
    * "paths" array, single "path", hand-set comma lists, brace/env/`::`
    * expansion, and planning-time url-predicate pruning. */
  def resolveUrls(
      options: CaseInsensitiveStringMap,
      urlFilters: Array[Filter],
      format: String): Seq[String] = {
    def parsePaths(raw: String): Seq[String] =
      if (raw.trim.startsWith("[")) {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        import scala.jdk.CollectionConverters._
        mapper.readValue(raw, classOf[java.util.List[String]])
          .asScala.toSeq
      } else raw.split(",").map(_.trim).toSeq
    val specs =
      Option(options.get("paths")).map(parsePaths)
        .orElse(Option(options.get("path")).map(Seq(_)))
        .getOrElse(
          throw new IllegalArgumentException(s"$format: no path given"))
    val expanded = specs.flatMap(ShardList.expand(_))
    val preds = urlFilters.flatMap(urlPredicate)
    if (preds.isEmpty) expanded
    else expanded.filter(u => preds.forall(_(u)))
  }
}

final class WdsScan(
    options: CaseInsensitiveStringMap,
    required: StructType,
    urlFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Surfaces the two custom pushdowns in `.explain()` so a plan audit
    * can PIN them: `select=[globs]` (tar-entry pruning — the tar analog
    * of parquet column pruning) and `PushedUrlFilters` (planning-time
    * shard pruning — the partition-pruning analog). Without this
    * override a pruned and an unpruned scan explain identically. */
  override def description(): String = {
    val sel = Option(options.get("select"))
      .map(s => s" select=[$s]").getOrElse("")
    val pay = Option(options.get("payload_select"))
      .map(s => s" payload_select=[$s]").getOrElse("")
    val pushed =
      if (urlFilters.isEmpty) ""
      else urlFilters.mkString(" PushedUrlFilters: [", ", ", "]")
    s"wds$sel$pay$pushed"
  }

  private[graft] def hasEntryPruning: Boolean =
    options.get("select") != null || options.get("payload_select") != null

  /** Same scan with `payload_select` injected — the WdsPayloadPrune
    * rewrite (the rule runs post-V2-pushdown, so the scan object is
    * what must change). */
  private[graft] def withPayloadSelect(globs: String): WdsScan = {
    val m = new util.HashMap[String, String](options)
    m.put("payload_select", globs)
    new WdsScan(new CaseInsensitiveStringMap(m), required, urlFilters)
  }

  private def urls: Seq[String] =
    WdsScan.resolveUrls(options, urlFilters, "wds")

  override def planInputPartitions(): Array[InputPartition] =
    urls.map(u => WdsInputPartition(u): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    WdsReaderFactory(conf, WdsDataSource.readOptions(options),
      required.fieldNames)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WdsMicroBatchStream(options, required, urlFilters)
}

/** Continuous shard ingest: `spark.readStream.format("wds").load(dir)`.
  *
  * Discovery model: each `latestOffset()` re-lists the path spec
  * (Hadoop glob for directories/wildcards, brace expansion otherwise)
  * and an offset is the NATURALLY largest shard url admitted so far
  * ([[NaturalOrder]]: digit runs compare as numbers, so unpadded
  * `shard-10` sorts after `shard-9`) — a batch is "every shard with
  * url in (start, end]". Monotone shard NUMBERS (every engine writer,
  * and the reference's ShardWriter) therefore satisfy the contract
  * with or without zero padding, the url itself is the watermark, no
  * per-file seen-log is needed, and restarts resume from the
  * checkpointed url. The corollary limitation is explicit: a shard
  * that lands with a name naturally BELOW the current watermark is
  * outside the contract and will not be picked up.
  *
  * One shard = one input partition per batch, same as the batch scan —
  * the streaming unit of work equals the scheduling unit. */
final class WdsMicroBatchStream(
    options: CaseInsensitiveStringMap,
    required: StructType,
    urlFilters: Array[org.apache.spark.sql.sources.Filter])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())

  // Trigger.AvailableNow contract: pin the end offset at query start so
  // the run drains exactly the shards present then terminates, even if
  // more land mid-run
  @volatile private var availableNowTarget: Option[Offset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestDiscovered())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowTarget.getOrElse(latestDiscovered())

  override def reportLatestOffset(): Offset = latestDiscovered()

  private def discover(): Seq[String] = {
    val specs =
      Option(options.get("paths")).orElse(Option(options.get("path")))
        .map(Seq(_))
        .getOrElse(throw new IllegalArgumentException("wds: no path given"))
    val urls = specs.flatMap { spec =>
      val expanded = ShardList.expand(spec)
      if (expanded.length == 1 && !spec.contains("{")) {
        // directory or glob: list via Hadoop FS
        val p = new org.apache.hadoop.fs.Path(expanded.head)
        val fs = p.getFileSystem(conf.value)
        val pattern =
          if (fs.isDirectory(p)) new org.apache.hadoop.fs.Path(p, "*.tar")
          else p
        Option(fs.globStatus(pattern)).toSeq.flatten
          .filter(_.isFile).map(_.getPath.toString)
      } else expanded
    }
    val preds = urlFilters.flatMap(WdsScan.urlPredicate)
    val pruned =
      if (preds.isEmpty) urls else urls.filter(u => preds.forall(_(u)))
    pruned.sorted(NaturalOrder)
  }

  private def latestDiscovered(): Offset = {
    val seen = discover()
    if (seen.isEmpty) WdsStreamOffset("")
    else WdsStreamOffset(seen.max(NaturalOrder))
  }

  override def initialOffset(): Offset = WdsStreamOffset("")

  /** Legacy single-arg form (SupportsAdmissionControl sources get the
    * two-arg call; this stays for direct MicroBatchStream use). */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def deserializeOffset(json: String): Offset =
    WdsStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[WdsStreamOffset].lastUrl
    val hi = end.asInstanceOf[WdsStreamOffset].lastUrl
    discover().filter(u =>
        (lo.isEmpty || NaturalOrder.compare(u, lo) > 0) &&
          NaturalOrder.compare(u, hi) <= 0)
      .map(u => WdsInputPartition(u): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WdsReaderFactory(conf, WdsDataSource.readOptions(options),
      required.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** NATURAL (digit-run-aware) url order for the streaming watermark:
  * digit runs compare as numbers, so `shard-10-...` sorts AFTER
  * `shard-9-...` — producers with unpadded monotone shard numbers
  * (PackStage's reference-parity names, the reference's own
  * ShardWriter) satisfy the monotone-name contract without renaming.
  * Ties between equal-valued different-padding runs ("01" vs "1")
  * fall back to full lexicographic compare so the order stays total
  * (a natural tie must not make two distinct files "equal" — the
  * watermark filter would drop one). */
private[wds] object NaturalOrder extends Ordering[String] {
  override def compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.charAt(i)
      val cb = b.charAt(j)
      if (ca.isDigit && cb.isDigit) {
        var i2 = i
        while (i2 < a.length && a.charAt(i2).isDigit) i2 += 1
        var j2 = j
        while (j2 < b.length && b.charAt(j2).isDigit) j2 += 1
        val sa = a.substring(i, i2).dropWhile(_ == '0')
        val sb = b.substring(j, j2).dropWhile(_ == '0')
        val c = if (sa.length != sb.length) sa.length - sb.length
          else sa.compareTo(sb)
        if (c != 0) return c
        i = i2
        j = j2
      } else {
        if (ca != cb) return ca - cb
        i += 1
        j += 1
      }
    }
    val c = (a.length - i) - (b.length - j)
    if (c != 0) c else a.compareTo(b) // padding tie-break: total order
  }
}

/** Offset = largest admitted shard url ("" before any shard). */
final case class WdsStreamOffset(lastUrl: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val esc = lastUrl.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"lastUrl":"$esc"}"""
  }
}

object WdsStreamOffset {
  def fromJson(json: String): WdsStreamOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    WdsStreamOffset(node.get("lastUrl").asText())
  }
}

final case class WdsInputPartition(url: String) extends InputPartition

final case class WdsReaderFactory(
    conf: SerializableHadoopConf,
    opts: TarIO.ReadOptions,
    fields: Array[String]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val url = p.asInstanceOf[WdsInputPartition].url
    new PartitionReader[InternalRow] {
      // entry bytes are skipped entirely when `entries` is pruned away
      private val needEntries = fields.contains("entries")
      private val effOpts =
        if (needEntries) opts
        // pruned read: keep the (empty) sample shells so row counts
        // survive without materializing entry bytes
        else opts.copy(suffixes = Some(Set.empty), keepEmpty = true)
      // One shard per partition, so "stop" and "continue" both reduce
      // to an exhausted reader here — but the handler must still run
      // (Reraise throws; Warn* logs the quarantined shard). Pruned
      // reads of seekable shards take the TarFile path: dropped
      // payloads are sought past, never read.
      private val opened =
        try Some(graft.wds.WdsReader.openSamples(url, conf.value, effOpts))
        catch {
          case e: Exception =>
            Handler.handle(opts.handler, s"open $url", e)
            None
        }
      private val it: Iterator[Sample] =
        opened.map(_._1).getOrElse(Iterator.empty)
      private var current: Sample = _

      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false

      override def get(): InternalRow = {
        val values = fields.map {
          case "key" => UTF8String.fromString(current.key)
          case "url" => UTF8String.fromString(current.url)
          case "entries" =>
            val ks = current.entries.keys.toArray
              .map(k => UTF8String.fromString(k): Any)
            val vs = current.entries.values.toArray.map(v => v: Any)
            ArrayBasedMapData(ks, vs)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = opened.foreach(_._2())
    }
  }
}

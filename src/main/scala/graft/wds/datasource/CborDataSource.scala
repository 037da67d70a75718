package graft.wds.datasource

import java.util

import graft.wds.{CborReader, Gopen, Handler, Sample, SerializableHadoopConf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `cbors` format — the S13 source as a first-class
  * relational table, sharing the wds source's shape:
  *
  * {{{
  *   spark.read.format("cbors")
  *     .option("handler", "warn_continue")
  *     .load("file:/data/part-{000..123}.cbors")
  * }}}
  *
  * Same schema and execution model as `format("wds")`: (key, url,
  * entries) rows, brace/env/`::` expansion on the driver, ONE input
  * partition per shard (a cbors stream is a sequential
  * decode-until-EOF, the reference's `cbor.load` loop), `url`
  * predicates prune shards at planning, `pipe:` URLs compose via
  * [[Gopen]]. Read-only: the writer story is [[Cbor.encode]] +
  * `foreachPartition` (see wds15) until a use case demands more.
  */
class CborDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cbors"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WdsDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CborTable(new CaseInsensitiveStringMap(properties))
}

final class CborTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "cbors"
  override def schema(): StructType = WdsDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new CborScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class CborScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WdsDataSource.Schema
  private var urlFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    urlFilters = filters.filter(WdsScan.urlPredicate(_).isDefined)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    urlFilters
  override def build(): Scan = new CborScan(options, required, urlFilters)
}

final class CborScan(
    options: CaseInsensitiveStringMap,
    required: StructType,
    urlFilters: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def urls: Seq[String] =
    WdsScan.resolveUrls(options, urlFilters, "cbors")

  override def planInputPartitions(): Array[InputPartition] =
    urls.map(u => WdsInputPartition(u): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    val handler = WdsDataSource.parseHandler(
      Option(options.get("handler")).getOrElse("reraise"))
    CborReaderFactory(conf, handler, required.fieldNames)
  }
}

final case class CborReaderFactory(
    conf: SerializableHadoopConf,
    handler: Handler,
    fields: Array[String]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val url = p.asInstanceOf[WdsInputPartition].url
    new PartitionReader[InternalRow] {
      private val stream =
        try Some(new java.io.BufferedInputStream(
          Gopen.open(url, conf.value), 1 << 16))
        catch {
          case e: Exception =>
            Handler.handle(handler, s"open $url", e)
            None
        }
      // mid-stream decode errors route through the handler policy too
      // (one shard per partition: stop == continue == end this reader)
      private val it: Iterator[Sample] = stream
        .map(in => CborReader.guardedItems(in, url, handler, () => ())
          .zipWithIndex.map {
            case (item, i) => CborReader.toSample(item, i, url)
          })
        .getOrElse(Iterator.empty)
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

      override def close(): Unit = stream.foreach(_.close())
    }
  }
}

package graft.wds

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** S3 `MultiShardSample` (`shardlists.py:192-271`): a YAML/dict spec
  * declaring multiple weighted shard sources; per-source `choose` picks n
  * shards without replacement (seeded), `resample` picks n with
  * replacement; the combined list is globally shuffled.
  *
  * Spec shape (reference's schema):
  * {{{
  * datasets:
  *   - name: corpusA
  *     buckets: [ /data/a ]           # optional prefix (single bucket)
  *     shards: shard-{000..099}.tar
  *     choose: 10                     # OR resample: 10
  *   - name: corpusB
  *     shards: /data/b/part-{00..49}.tar
  * }}}
  */
object MultiShardSample {

  /** `dataset`/`prefix` are engine-side optional keys (absent from the
    * reference's schema, ignored by shard-level reads): when the spec
    * feeds the PACK stage (`Pipeline --stage pack --mix-spec`), each
    * source's files are METADATA files, `dataset` names the loader
    * normalizer and `prefix` the per-source media prefix. */
  final case class SourceSpec(
      name: String,
      shards: Seq[String],
      choose: Option[Int] = None,
      resample: Option[Int] = None,
      dataset: Option[String] = None,
      prefix: String = "")

  final case class Spec(sources: Seq[SourceSpec])

  def parseYaml(yaml: String): Spec = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readValue(yaml, classOf[java.util.Map[String, Object]])
    val ds = root.get("datasets").asInstanceOf[java.util.List[Object]]
    require(ds != null, "spec needs a 'datasets' list")
    Spec(ds.asScala.toSeq.map { o =>
      val m = o.asInstanceOf[java.util.Map[String, Object]].asScala
      val bucket = m.get("buckets") match {
        case Some(l: java.util.List[_]) =>
          require(l.size == 1, "only a single bucket is supported")
          l.get(0).toString.stripSuffix("/") + "/"
        case _ => ""
      }
      val shardSpec = m("shards").toString
      val urls = ShardList.expand(shardSpec).map(bucket + _)
      SourceSpec(
        name = m.get("name").map(_.toString).getOrElse(shardSpec),
        shards = urls,
        choose = m.get("choose").map(_.toString.toInt),
        resample = m.get("resample").map(_.toString.toInt),
        dataset = m.get("dataset").map(_.toString),
        prefix = m.get("prefix").map(_.toString).getOrElse(""))
    })
  }

  /** Resolve the spec into a final shard list: per-source choose (without
    * replacement) / resample (with replacement), then global seeded
    * shuffle (`shardlists.py:255-271`). */
  def resolve(spec: Spec, seed: Long = 17L): Seq[String] =
    resolveTagged(spec, seed).map(_._2)

  /** [[resolve]] with each selected url tagged by its source spec —
    * the pack-stage mix needs the (loader, prefix) association that a
    * bare url list loses. Identical RNG consumption to [[resolve]]
    * (per-source selection, then one global shuffle), so both produce
    * the same selection and order for a given seed. */
  def resolveTagged(spec: Spec, seed: Long = 17L): Seq[(SourceSpec, String)] = {
    val rng = new scala.util.Random(seed)
    val all = spec.sources.flatMap { s =>
      require(s.choose.isEmpty || s.resample.isEmpty,
        s"${s.name}: choose and resample are mutually exclusive")
      val picked = s.choose match {
        case Some(n) =>
          require(n <= s.shards.size,
            s"${s.name}: choose $n > ${s.shards.size} shards")
          rng.shuffle(s.shards).take(n)
        case None => s.resample match {
          case Some(n) => Seq.fill(n)(s.shards(rng.nextInt(s.shards.size)))
          case None => s.shards
        }
      }
      picked.map(s -> _)
    }
    rng.shuffle(all)
  }

  /** One-call read: YAML spec → Dataset[Sample]. */
  def read(
      spark: org.apache.spark.sql.SparkSession,
      yaml: String,
      seed: Long = 17L,
      opts: TarIO.ReadOptions = TarIO.ReadOptions())
      : org.apache.spark.sql.Dataset[Sample] =
    WdsReader.readUrls(spark, resolve(parseYaml(yaml), seed), opts)
}

package graft.wds

/** The WebDataset sample: one logical record grouped from adjacent tar
  * entries sharing a basename prefix.
  *
  * Mirrors the reference's dynamic dict-of-extensions shape
  * (`webdataset-private/webdataset/tariterators.py:184-246`): `key` is the
  * shared basename prefix (`__key__`), `url` the originating shard
  * (`__url__`), `entries` maps extension → raw bytes. Decoding to typed
  * values is a separate, pluggable step (see [[Codecs]]), exactly like the
  * reference's autodecode stage.
  *
  * As a Spark row this is `(key STRING, url STRING,
  * entries MAP<STRING, BINARY>)` — `MapType` captures the schema-less tar
  * sample without forcing a fixed column set per dataset.
  */
final case class Sample(
    key: String,
    url: String,
    entries: Map[String, Array[Byte]]) {

  /** First-present alternative lookup: `getFirst("jpg;png")` — the `;`
    * alternation of `to_tuple`/`getfirst`
    * (`webdataset-private/webdataset/filters.py:105-118`). */
  def getFirst(spec: String): Option[Array[Byte]] =
    spec.split(";").iterator.flatMap(entries.get).nextOption()

  def utf8(ext: String): Option[String] =
    entries.get(ext).map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
}

object Sample {
  /** Split a tar entry path into (basename-prefix, extension-suffix) —
    * the reference's `base_plus_ext` regex (`tariterators.py:24-38`):
    * prefix = dirs + first dot-free name component, suffix = everything
    * after the first dot. Returns None for entries with no extension
    * (ignored, as in the reference). */
  private val BasePlusExt = "^((?:.*/|)[^.]+)[.]([^/]*)$".r

  def basePlusExt(path: String): Option[(String, String)] = path match {
    case BasePlusExt(base, ext) => Some((base, ext))
    case _ => None
  }
}

package graft.wds

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** The WebDataset operator vocabulary (SURVEY.md §2.2, §2.6, §2.9) as a
  * fluent layer over Dataset[Sample] — the Spark restatement of the
  * reference's FluidInterface (`webdataset-private/webdataset/compat.py`,
  * `filters.py`).
  *
  * Column-shaped ops (tuple/dict projection, entry predicates) go through
  * the relational API so Catalyst sees them; whole-sample transforms stay
  * typed `map`/`flatMap`. Ordering-semantics note: `shuffled` is an exact
  * seeded permutation — a strict superset of the reference's
  * bounded-buffer approximate shuffle (B1, documented deviation).
  */
object SampleOps {

  private val sampleEnc = Encoders.product[Sample]

  /** glob (`*`/`?`) → anchored regex, as used by rename_keys/extract_keys
    * (`filters.py:567-617`). */
  def globToRegex(glob: String): String =
    "^" + glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  implicit final class RichSampleDS(private val ds: Dataset[Sample]) {

    /** P1 `select(predicate)`. */
    def where(p: Sample => Boolean): Dataset[Sample] =
      ds.filter(p)

    /** P2 `map(f)` with None-drop semantics (`filters.py:305-322`); the
      * reference preserves `__key__` unless f overrides — here f returns
      * the full Sample so the policy is explicit at the call site. */
    def mapSamples(f: Sample => Option[Sample]): Dataset[Sample] =
      ds.flatMap(s => f(s))(sampleEnc)

    /** P3 `map_dict`: per-entry value transform. */
    def mapEntries(f: (String, Array[Byte]) => Array[Byte]): Dataset[Sample] =
      ds.map(s => s.copy(entries = s.entries.map { case (k, v) =>
        k -> f(k, v) }))(sampleEnc)

    /** P5 `to_tuple("jpg;png", "json")`: project to columns; `;` picks
      * the first present alternative; a missing field raises, like
      * `getfirst(..., missing_is_error=True)`. Column name = first alt. */
    def toTuple(specs: String*): DataFrame = {
      val cols = specs.map { spec =>
        val alts = spec.split(";").toIndexedSeq
        val c = coalesce(alts.map(a => col("entries").getItem(a)): _*)
        val named = alts.head.replace('.', '_')
        when(c.isNull, raise_error(
          concat(lit(s"missing field $spec in sample "), col("key"))))
          .otherwise(c).as(named)
      }
      ds.toDF().select(col("key") +: cols: _*)
    }

    /** P6 `to_dict(...)`: keep entries whose suffix matches any
      * alternative; stays in the map column (relational, codegen'd). */
    def toDict(specs: String*): Dataset[Sample] = {
      val keep = specs.flatMap(_.split(";")).toSet
      val kept = map_filter(col("entries"), (k, _) =>
        k.isInCollection(keep))
      ds.toDF()
        .withColumn("entries", kept)
        .as[Sample](sampleEnc)
    }

    /** P7 `rename(new = "old;alt")`: first-present alternative renamed,
      * others dropped unless keepRest. */
    def renameFields(
        renames: Seq[(String, String)],
        keepRest: Boolean = false): Dataset[Sample] =
      ds.map { s =>
        val renamed = renames.flatMap { case (nw, spec) =>
          s.getFirst(spec).map(nw -> _)
        }.toMap
        val rest =
          if (keepRest) {
            val consumed = renames.flatMap(_._2.split(";")).toSet
            s.entries.view.filterKeys(k => !consumed(k)).toMap
          } else Map.empty[String, Array[Byte]]
        s.copy(entries = rest ++ renamed)
      }(sampleEnc)

    /** P8 `rename_keys(("new","*.glob"),…)` with must_match /
      * keep_unselected / duplicate detection (`filters.py:588-617`). */
    def renameKeys(
        patterns: Seq[(String, String)],
        mustMatch: Boolean = true,
        keepUnselected: Boolean = false): Dataset[Sample] = {
      val compiled = patterns.map { case (nw, g) => nw -> globToRegex(g).r }
      ds.map { s =>
        val hits = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
        val matched = scala.collection.mutable.Set[String]()
        s.entries.foreach { case (k, v) =>
          compiled.find(_._2.matches(k)) match {
            case Some((nw, _)) =>
              if (hits.contains(nw))
                throw new IllegalArgumentException(
                  s"renameKeys: duplicate target $nw in sample ${s.key}")
              hits += nw -> v
              matched += k
            case None =>
              if (keepUnselected) hits += k -> v
          }
        }
        if (mustMatch) {
          val missing = compiled.collect {
            case (nw, _) if !hits.contains(nw) => nw }
          if (missing.nonEmpty)
            throw new IllegalArgumentException(
              s"renameKeys: unmatched patterns $missing in sample ${s.key}")
        }
        s.copy(entries = hits.toMap)
      }(sampleEnc)
    }

    /** P9 `extract_keys("*.jpg")`: glob projection, duplicate-is-error. */
    def extractKeys(globs: String*): DataFrame = {
      val compiled = globs.map(g => g -> globToRegex(g).r)
      val extract = udf { (entries: Map[String, Array[Byte]], key: String) =>
        compiled.map { case (g, r) =>
          val hits = entries.keys.filter(r.matches).toSeq
          if (hits.size > 1)
            throw new IllegalArgumentException(
              s"extractKeys: $g matched ${hits.size} entries in sample $key")
          hits.headOption.map(entries).orNull
        }
      }
      val arr = extract(col("entries"), col("key"))
      val cols = globs.zipWithIndex.map { case (g, i) =>
        arr.getItem(i).as(g.replaceAll("[^A-Za-z0-9]+", "_").stripSuffix("_")
          .stripPrefix("_"))
      }
      ds.toDF().select(col("key") +: cols: _*)
    }

    /** P10 `associate`: broadcast lookup join by key (the engine's only
      * join in the reference, `filters.py:350-361`). */
    def associate(lookup: DataFrame, how: String = "left_outer"): DataFrame =
      ds.toDF().join(broadcast(lookup), Seq("key"), how)

    /** P15 `valid_sample` guard. */
    def validSamples: Dataset[Sample] =
      ds.filter((s: Sample) => s.entries.nonEmpty)

    /** B1/B2 seeded exact shuffle (superset of the reference's
      * bounded-buffer approximation; deterministic under seed). */
    def shuffled(seed: Long): Dataset[Sample] =
      ds.orderBy(rand(seed), col("key")).as[Sample](sampleEnc)

    /** B3 `rsample(p)`. */
    def rsample(p: Double, seed: Long = 17L): Dataset[Sample] =
      ds.sample(withReplacement = false, p, seed)

    /** M1 `RandomMix`: weighted probabilistic interleave of sources →
      * weighted union + seeded shuffle (relational restatement). */
    def mixWith(
        others: Seq[(Dataset[Sample], Double)],
        seed: Long = 17L): Dataset[Sample] = {
      // RandomMix draws from source i with probability w_i/Σw PER DRAW,
      // independent of source size; the relational restatement must
      // therefore equalize w_i per ROW — fraction_i = (w_i/n_i) scaled
      // so the highest-rate source keeps everything. A bare w/wMax
      // would skew the mix by the (arbitrary) source sizes. Costs one
      // count() per source, paid once at plan time.
      val all = (ds, 1.0) +: others
      val sized = all.map { case (d, w) => (d, w, d.count().max(1L)) }
      val rMax = sized.map { case (_, w, n) => w / n.toDouble }.max
      sized.map { case (d, w, n) =>
        val f = (w / n.toDouble) / rMax
        if (f >= 1.0) d else d.sample(withReplacement = false, f, seed)
      }.reduce(_ unionByName _).shuffled(seed)
    }

    /** M2 `RoundRobin`: deterministic 1-by-1 interleave via per-source
      * row_number then global (rank, source) ordering. */
    def roundRobinWith(others: Dataset[Sample]*): Dataset[Sample] = {
      import org.apache.spark.sql.expressions.Window
      val tagged = (ds +: others).zipWithIndex.map { case (d, i) =>
        d.toDF().withColumn("_src", lit(i))
      }.reduce(_ unionByName _)
      val w = Window.partitionBy(col("_src")).orderBy(col("key"))
      tagged.withColumn("_rn", row_number().over(w))
        .orderBy(col("_rn"), col("_src"))
        .drop("_rn", "_src")
        .as[Sample](sampleEnc)
    }

    /** W6 `slice`. */
    def slice(n: Int): Dataset[Sample] = ds.limit(n)

    /** B4 `batched(n)`: group consecutive samples into fixed-size
      * batches within each partition (collation = array of samples;
      * columnar collation is Spark's own Arrow layer). Partial final
      * batches kept/dropped per flag, like the reference. */
    def batched(n: Int, partial: Boolean = true): Dataset[BatchOfSamples] = {
      implicit val enc = Encoders.product[BatchOfSamples]
      ds.mapPartitions { it =>
        it.grouped(n).collect {
          case g if partial || g.size == n => BatchOfSamples(g.toSeq)
        }
      }
    }

    /** B5 `unbatched`/`unlisted`. */
    def unbatchedFrom(batches: Dataset[BatchOfSamples]): Dataset[Sample] =
      batches.flatMap(_.samples)(sampleEnc)

    /** W7 `repeat(n)` / `with_epoch(n)`: bounded repetition — the
      * training-loader epoch surface as a relational union + limit. */
    def repeated(times: Int): Dataset[Sample] =
      Seq.fill(times)(ds).reduce(_ unionByName _)
    def withEpoch(nSamples: Int): Dataset[Sample] = {
      val one = ds.count()
      require(one > 0, "with_epoch on empty dataset")
      val reps = ((nSamples + one - 1) / one).toInt
      repeated(reps).limit(nSamples)
    }

    /** B8 `info`/`log_keys` debug taps via `observe` — metrics arrive on
      * the QueryExecutionListener without disturbing the plan. */
    def observed(name: String): Dataset[Sample] =
      ds.observe(name, count(lit(1)).as("n_samples"),
        sum(length(col("key"))).as("key_bytes"))
        .as[Sample](sampleEnc)

    /** B6/B7 caches. */
    def cached: Dataset[Sample] = ds.cache()
    def diskCached: Dataset[Sample] =
      ds.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    /** S12 worked recipe — repeated-EPOCH reads over remote shards
      * (the reference's download-through LRU shard cache,
      * `webdataset-private/webdataset/cache.py:113-195`, re-expressed
      * in Spark's storage layer): fetch + untar + group ONCE, spill the
      * decoded samples to executor-local disk, then every epoch is a
      * deterministic per-epoch reshuffle of the cached blocks — no
      * second trip to the object store. DISK_ONLY, not MEMORY_*: epoch
      * readers stream the whole corpus, so memory caching would evict
      * under pressure and silently re-fetch. Callers unpersist via the
      * returned handle when training ends. */
    def epochs(n: Int, seed: Long = 0L)
        : (Dataset[Sample], IndexedSeq[Dataset[Sample]]) = {
      val c = diskCached
      (c, (0 until n).map(e => c.shuffled(seed + e)))
    }

    /** B9 transform-with-quarantine: the principled Spark mapping of the
      * reference's per-stage `handler` for row transforms — failures
      * become data, not lost rows or dead jobs. Returns (clean results,
      * quarantine of (key, url, error)); both views share one cached
      * evaluation pass, so `f` runs once per sample. */
    def mapSamplesQuarantined(f: Sample => Sample)
        : (Dataset[Sample], DataFrame) = {
      implicit val qEnc = Encoders.product[QuarantinedSample]
      val tried = ds.map { s =>
        try QuarantinedSample(Some(f(s)), None)
        catch {
          case e: Exception => QuarantinedSample(None,
            Some(QuarantineRecord(s.key, s.url,
              s"${e.getClass.getSimpleName}: ${e.getMessage}")))
        }
      }.cache()
      val good = tried.flatMap(_.sample)(sampleEnc)
      val bad = tried.flatMap(_.error)(Encoders.product[QuarantineRecord])
        .toDF()
      (good, bad)
    }
  }

  final case class BatchOfSamples(samples: Seq[Sample])
  final case class QuarantineRecord(key: String, url: String, error: String)
  final case class QuarantinedSample(
      sample: Option[Sample], error: Option[QuarantineRecord])
}

package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-facing curation stage: one pass over a raw document table
  * producing the curated training slice plus a per-filter audit frame —
  * the pipeline step a training-data team runs between crawl ingest and
  * packing (`Pipeline --stage curate`). Chains the engine's curation
  * operators in their production order:
  *
  *  1. quality  — C4/MassiveText heuristics on the RAW text (word count,
  *     mean word length band, boilerplate markers); no synthetic
  *     augmentation here, unlike the fixture-bound qt09 gate query
  *  2. mix      — deterministic stratified sampling by language
  *     (md5-bucket vs dialed rates; CurationQueries.mixProjection)
  *  3. exact    — content-hash dedup, min doc_id survives
  *  4. spans    — duplicated-span fraction (Lee et al. 2022 signal at
  *     n-gram grain); docs above the threshold drop
  *  5. decontam — optional n-gram overlap scrub against a held-out eval
  *     table (broadcast: eval sets are MBs against TB corpora)
  *
  * Every filter emits its own keep flag; the curated output is the
  * conjunction, and the audit frame reports the per-filter and funnel
  * counts. All decisions are deterministic (hash-derived, engine-order
  * independent), so a re-run over the same inputs reproduces the same
  * slice — the property that makes a 100 TB curation job resumable and
  * its output diffable.
  */
object CurateStage {

  final case class CurateOptions(
      minWords: Int = 30,
      maxDupFrac: Double = 0.5,
      rates: Seq[(String, Int)] = Seq.empty,
      defaultRate: Int = 100,
      gramK: Int = 5,
      evalPath: Option[String] = None)

  /** Raw-text C4 keep flag (the qt09 heuristics minus the fixture's
    * synthetic punctuation axes, which real corpora carry natively). */
  private def qualityKeep(minWords: Int): Column = {
    val nWords = size(split(col("text"), " "))
    val meanLen = (length(col("text")) - (nWords - 1)).cast("double") / nWords
    val hasBad = lower(col("text")).contains("lorem ipsum") ||
      col("text").contains("{") || lower(col("text")).contains("javascript")
    when(nWords >= minWords && meanLen >= 3.0 && meanLen <= 10.0 && !hasBad,
      1).otherwise(0)
  }

  /** (curated docs, audit stats). Input needs (doc_id, text, lang);
    * extra columns pass through to the curated output. */
  def run(docs: DataFrame, opts: CurateOptions): (DataFrame, DataFrame) = {
    val mix = graft.queries.CurationQueries
      .mixProjection(docs, opts.rates, opts.defaultRate)
      .select(col("doc_id"), col("kept").as("mix_keep"))
    val exact = docs
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1).as("exact_keep"))
    val sh = graft.functions.ShingleHash.exploded(
      docs.select(col("doc_id"), col("text")), opts.gramK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = graft.queries.CurationQueries.dupSpansFrom(sh)
      .select(col("doc_id"),
        when(col("dup_frac") <= opts.maxDupFrac, 1).otherwise(0)
          .as("span_keep"))
    val decontam = opts.evalPath.map { path =>
      val eval = docs.sparkSession.read.parquet(path)
      val evalGrams = graft.functions.ShingleHash.exploded(
        eval.select(col("doc_id"), col("text")), opts.gramK)
        .select(col("sh")).distinct()
      sh.join(broadcast(evalGrams.withColumn("hit", lit(1))),
          Seq("sh"), "left")
        .groupBy(col("doc_id"))
        .agg(max(coalesce(col("hit"), lit(0))).as("contaminated"))
        .select(col("doc_id"),
          (lit(1) - col("contaminated")).as("decontam_keep"))
    }
    val flagged0 = docs
      .withColumn("quality_keep", qualityKeep(opts.minWords))
      .join(mix, "doc_id")
      .join(exact, Seq("doc_id"), "left")
      .withColumn("exact_keep", coalesce(col("exact_keep"), lit(0)))
      .join(spans, "doc_id")
    val flagged = decontam.fold(
      flagged0.withColumn("decontam_keep", lit(1)))(d =>
      flagged0.join(d, "doc_id"))
    val keeps = Seq("quality_keep", "mix_keep", "exact_keep",
      "span_keep", "decontam_keep")
    val curatedFlag = keeps.map(col).reduce(_ * _)
    val all = flagged.withColumn("curated", curatedFlag)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val curated = all.filter(col("curated") === 1)
      .drop(keeps :+ "curated": _*)
    val stats = all.agg(
      count(lit(1)).as("n_docs"),
      keeps.map(k => sum(col(k)).as(k)) :+
        sum(col("curated")).as("n_curated"): _*)
    (curated, stats)
  }
}

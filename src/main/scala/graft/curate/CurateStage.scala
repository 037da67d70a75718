package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The user-facing curation stage: one pass over a raw document table
  * producing the curated training slice plus a per-stage audit frame —
  * the pipeline step a training-data team runs between crawl ingest and
  * packing (`Pipeline --stage curate`). The filters apply SEQUENTIALLY,
  * each over the previous stage's survivors (the production order, and
  * the semantics that make the stages compose):
  *
  *  1. quality  — C4/MassiveText heuristics on the RAW text (word count,
  *     mean word length band, boilerplate markers); null text drops
  *     here, so later stages never see it
  *  2. mix      — deterministic stratified sampling by language
  *     (md5-bucket vs dialed rates; CurationQueries.mixProjection)
  *  3. exact    — content-hash dedup among mix survivors, min doc_id
  *     survives (deduping after mix means a duplicate group keeps its
  *     lowest SURVIVING copy — flag-parallel dedup would silently lose
  *     groups whose canonical copy was mix-dropped)
  *  3b. near-dup (opt-in, `nearDupJaccard`) — MinHash/LSH candidates →
  *     exact n-gram Jaccard verify → connected components; one survivor
  *     (min doc_id) per near-dup cluster among exact-dedup survivors.
  *     With `softDedup` the cluster members are KEPT instead and the
  *     curated output gains `weight_ppm` = 1e6 div |cluster| — the
  *     SoftDeDup/D4 re-weighting posture (qd23): hard dedup discards
  *     paraphrase-adjacent coverage, soft dedup keeps it but makes
  *     each cluster contribute ~one document per sampling epoch
  *  3c. containment (opt-in, `containmentTau`) — the qd24 policy:
  *     near-dup survivors that are near-CONTAINED in a larger survivor
  *     (excerpts/quotes) drop; maximal documents keep
  *  4. spans    — duplicated-span fraction (Lee et al. 2022 signal at
  *     n-gram grain) over the exact-deduped survivors — computed after
  *     exact dedup so a verbatim duplicate pair reads as ONE document
  *     (flag-parallel span counting marks both copies 100% duplicated
  *     and deletes the content entirely)
  *  4b. span scrub (opt-in, `spanScrub`) — rewrite survivors' text by
  *     CUTTING every token covered by a cross-document duplicated gram
  *     (the qd21 operator): the filter above drops catastrophically
  *     duplicated docs, the scrub cleans the duplicated spans out of
  *     the rest; original casing is preserved, matching is case-folded
  *  5. decontam — optional n-gram overlap scrub against a held-out eval
  *     table (broadcast: eval sets are MBs against TB corpora); the
  *     eval parquet only needs a `text` column
  *
  * The audit frame reports the funnel: input count and survivors after
  * each stage. All decisions are deterministic (hash-derived,
  * engine-order independent), so a re-run over the same inputs
  * reproduces the same slice — the property that makes a 100 TB
  * curation job resumable and its output diffable.
  *
  * Precondition: `doc_id` must be unique (it is the join/dedup key);
  * duplicate ids should be resolved upstream (they usually indicate an
  * ingest bug worth failing loudly on, not masking).
  *
  * `run` materializes the flag frame eagerly (the stats ARE an
  * aggregate of it) and releases every internal cache before returning;
  * the returned frames are plain projections of the persisted flags —
  * call [[CurateResult.close]] when done with them.
  */
object CurateStage {

  final case class CurateOptions(
      minWords: Int = 30,
      maxDupFrac: Double = 0.5,
      rates: Seq[(String, Int)] = Seq.empty,
      defaultRate: Int = 100,
      gramK: Int = 5,
      evalPath: Option[String] = None,
      nearDupJaccard: Option[Double] = None,
      // qd27: opt-in LSH bucket-size ceiling for the near-dup stage —
      // a corpus-hot candidate bucket (boilerplate family) is
      // quadratic in the corpus; past the cap it is dropped whole
      // (members still pair via their selective bands)
      lshBucketCap: Option[Int] = None,
      spanScrub: Boolean = false,
      // ExactSubstr fidelity (Lee et al. 2022): scrub only maximal
      // duplicated runs ≥ scrubMinRun tokens (1 = cut every covered
      // token, the historical qd21 posture), and ignore grams in more
      // than scrubDfCeil documents (corpus-common idioms can't
      // evidence duplication — also the positional fan-out bound)
      scrubMinRun: Int = 1,
      scrubDfCeil: Option[Int] = None,
      softDedup: Boolean = false,
      containmentTau: Option[Double] = None,
      // qd26: sketch-side df ceiling for the containment stage (a
      // shingle in more documents than this cannot evidence subset
      // duplication — and bounds the candidate fan-out at corpus scale)
      containmentDfCeil: Option[Int] = None,
      // qc08: final token-budget selection — B = (survivor tokens) div
      // this, per-source quota floor(B·√mass/Σ√mass), filled by the
      // greedy md5-ordered prefix. Input then needs a `source` column;
      // token counts read the FINAL text (post-scrub when --span-scrub
      // is on), the mass a training run would actually ingest
      tokenBudgetDiv: Option[Int] = None)

  final case class CurateResult(curated: DataFrame, stats: DataFrame,
      private[curate] val cached: DataFrame) {
    // blocking: a caller that immediately re-runs the funnel (bench
    // reps, retry loops) must not race its fresh persists against the
    // previous run's async block eviction
    def close(): Unit = { cached.unpersist(blocking = true): Unit }
  }

  /** Raw-text C4 keep flag (the qt09 heuristics minus the fixture's
    * synthetic punctuation axes, which real corpora carry natively).
    * Null text yields null comparisons → otherwise(0): dropped. */
  private def qualityKeep(minWords: Int): Column = {
    val nWords = size(split(col("text"), " "))
    val meanLen = (length(col("text")) - (nWords - 1)).cast("double") / nWords
    val hasBad = lower(col("text")).contains("lorem ipsum") ||
      col("text").contains("{") || lower(col("text")).contains("javascript")
    when(nWords >= minWords && meanLen >= 3.0 && meanLen <= 10.0 && !hasBad,
      1).otherwise(0)
  }

  /** Sequential funnel; input needs (doc_id, text, lang), extra columns
    * pass through to the curated output. */
  def run(docs: DataFrame, opts: CurateOptions): CurateResult = {
    val spark = docs.sparkSession
    val withQ = docs.withColumn("quality_keep", qualityKeep(opts.minWords))

    // mix is a row-local decision (md5-bucket vs dialed rate) — the
    // flag is computed inline; the historical projection-plus-join
    // spelling paid one whole exchange to re-attach a value derivable
    // from the row itself (guide §2.4: remove shuffles outright). The
    // predicate is shared with CurationQueries.mixProjection, so the
    // batch gate (qc01), the streaming gate (st05) and this stage can
    // never drift.
    val withM = withQ.withColumn("mix_keep",
      when(col("quality_keep") === 1 &&
        graft.queries.CurationQueries
          .mixKeptExpr(opts.rates, opts.defaultRate), 1).otherwise(0))
    val s2 = withM.filter(col("mix_keep") === 1)

    val exactK = s2
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1).as("exact_keep"))
    val withE = withM.join(exactK, Seq("doc_id"), "left")
      .withColumn("exact_keep", coalesce(col("exact_keep"), lit(0)))
    // 3b. near-dup (opt-in): MinHash/LSH candidates → exact Jaccard
    // verify → connected components; one survivor (min doc_id) per
    // near-dup CLUSTER — the transitive qd09 rule, not the pairwise
    // qd08 one, so chains (A~B~C with A≁C) keep exactly one doc.
    // Runs over exact-dedup survivors: verbatim copies are already
    // gone, so LSH candidates here are genuine near-dups. The
    // survivors frame is persisted only on this opt-in path (the
    // signature + verify + CC chain scans it repeatedly).
    val s3Opt = opts.nearDupJaccard.map { _ =>
      withE.filter(col("exact_keep") === 1)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    require(!opts.softDedup || opts.nearDupJaccard.nonEmpty,
      "softDedup re-weights near-dup clusters — it needs nearDupJaccard")
    val clustersOpt = opts.nearDupJaccard.map { tau =>
      val s3 = s3Opt.get
      val pairs = graft.queries.DedupQueries
        .jaccardFrom(s3.select(col("doc_id"), col("text")), tau,
          opts.lshBucketCap)
        .select(col("a_id"), col("b_id"))
      val verts = s3.select(col("doc_id").as("id"))
      graft.functions.ConnectedComponents.run(pairs, verts)
    }
    // soft mode (qd23's posture): every cluster member KEEPS, and the
    // curated output carries weight_ppm = 1e6 div |cluster| so one
    // epoch samples each cluster ~once — hard mode keeps min doc_id
    val nearK = clustersOpt.map { cc =>
      if (opts.softDedup)
        cc.select(col("id").as("doc_id"), lit(1).as("near_keep"))
      else
        cc.select(col("id").as("doc_id"),
          when(col("id") === col("label"), 1).otherwise(0)
            .as("near_keep"))
    }
    val weightsOpt =
      if (!opts.softDedup) None
      else clustersOpt.map { cc =>
        val sized = cc.groupBy(col("label")).agg(count(lit(1)).as("csize"))
        cc.join(sized, "label")
          .select(col("id").as("doc_id"),
            expr("CAST(1000000 AS BIGINT) div csize").as("weight_ppm"))
      }
    val withN = nearK.fold(
      withE.withColumn("near_keep", col("exact_keep")))(nk =>
      withE.join(nk, Seq("doc_id"), "left")
        .withColumn("near_keep", coalesce(col("near_keep"), lit(0))))
    // 3c. containment (opt-in, `containmentTau`) — the qd24 policy
    // over near-dup survivors: a document near-CONTAINED in a larger
    // survivor (excerpt/quote) drops; maximal documents keep. Runs
    // after near-dup so cluster-resemblance is already resolved; the
    // soft-dedup combination is rejected (a weighted member could be
    // the container of its own representative — the interaction needs
    // its own design, not a silent guess).
    require(!(opts.softDedup && opts.containmentTau.nonEmpty),
      "softDedup + containmentTau is unsupported: containment would " +
        "drop into clusters soft dedup re-weighted")
    val s3pre = withN.filter(col("near_keep") === 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val contK = opts.containmentTau.map { tau =>
      graft.queries.DedupQueries.containmentDropped(
        s3pre.select(col("doc_id"), col("text")), tau,
        opts.containmentDfCeil)
        .select(col("doc_id"), lit(0).as("cont_keep"))
    }
    val withC = contK.fold(
      withN.withColumn("cont_keep", col("near_keep")))(ck =>
      withN.join(ck, Seq("doc_id"), "left")
        .withColumn("cont_keep",
          when(col("near_keep") === 1, coalesce(col("cont_keep"), lit(1)))
            .otherwise(0)))
    val s3n =
      if (contK.isEmpty) s3pre
      else withC.filter(col("cont_keep") === 1)
        .persist(StorageLevel.MEMORY_AND_DISK)

    // Span-statistics basis: in SOFT mode a kept near-dup cluster must
    // read as ONE document — exactly the rationale for running spans
    // after exact dedup — so the gram frame is built over one
    // REPRESENTATIVE per cluster (min doc_id) and members inherit its
    // verdict. Without this, the members soft dedup deliberately kept
    // would count each other's grams as cross-document duplicates and
    // the span stage would delete (or scrub to pieces) the whole
    // cluster, making soft mode strictly more destructive than hard.
    val repIds = clustersOpt.filter(_ => opts.softDedup).map(cc =>
      cc.filter(col("id") === col("label")).select(col("id").as("doc_id")))
    val spanDocs = repIds.fold(s3n.select(col("doc_id"), col("text")))(
      r => s3n.select(col("doc_id"), col("text")).join(r, Seq("doc_id")))
    val sh = graft.functions.ShingleHash.exploded(spanDocs, opts.gramK)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // gram document frequency: computed ONCE — the span filter and the
    // span scrub both consume it, and recomputing it would run the
    // corpus-sized gram aggregation twice per job. Persisted only when
    // the scrub actually reuses it (it is distinct-gram-sized).
    val gramDf0 = graft.queries.CurationQueries.gramDfFrom(sh)
    val gramDfPersisted =
      if (opts.spanScrub) Some(gramDf0.persist(StorageLevel.MEMORY_AND_DISK))
      else None
    val gramDf = gramDfPersisted.getOrElse(gramDf0)
    val spanKRep = graft.queries.CurationQueries
      .dupSpansFrom(sh, Some(gramDf))
      .select(col("doc_id"),
        when(col("dup_frac") <= opts.maxDupFrac, 1).otherwise(0)
          .as("span_keep"))
    val spanK = clustersOpt match {
      case Some(cc) if opts.softDedup =>
        cc.select(col("id").as("doc_id"), col("label"))
          .join(spanKRep.withColumnRenamed("doc_id", "label"),
            Seq("label"))
          .select(col("doc_id"), col("span_keep"))
      case _ => spanKRep
    }
    val decontamK = opts.evalPath.map { path =>
      // the eval table needs only `text`; ids are synthesized because
      // only the distinct gram set is used
      val eval = spark.read.parquet(path)
        .filter(col("text").isNotNull)
        .select(monotonically_increasing_id().as("doc_id"), col("text"))
      val evalGrams = graft.functions.ShingleHash.exploded(eval, opts.gramK)
        .select(col("sh")).distinct()
      // decontamination tests each member's OWN text even in soft mode
      // (a member can carry eval grams its representative lacks)
      val memberGrams =
        if (opts.softDedup) graft.functions.ShingleHash.exploded(
          s3n.select(col("doc_id"), col("text")), opts.gramK)
        else sh
      memberGrams.join(broadcast(evalGrams.withColumn("hit", lit(1))),
          Seq("sh"), "left")
        .groupBy(col("doc_id"))
        .agg(max(coalesce(col("hit"), lit(0))).as("contaminated"))
        .select(col("doc_id"),
          (lit(1) - col("contaminated")).as("decontam_keep"))
    }
    // 4b. span scrub (opt-in): REWRITE surviving text by cutting every
    // token covered by a cross-document duplicated gram (Lee et al.'s
    // removal posture, the operator behind qd21) — runs over the SAME
    // post-dedup survivors and the same shingle grain as the span
    // filter, so the filter drops the catastrophically-duplicated docs
    // and the scrub cleans the rest. Case is preserved; matching is
    // case-folded like every shingle decision in the funnel.
    val scrubbed = if (opts.spanScrub) {
      val dup = gramDf.filter(col("df") >= 2 &&
          opts.scrubDfCeil.map(c => col("df") <= c)
            .getOrElse(lit(true)))
        .select(col("sh"))
      val posF = graft.functions.ShingleHash.positional(
        s3n.select(col("doc_id"), col("text")), opts.gramK)
      Some(graft.queries.CurationQueries.spanScrubRunsFrom(
        s3n.select(col("doc_id"), col("text")), posF, dup,
        minRun = opts.scrubMinRun,
        preserveCase = true, gramK = opts.gramK)
        .select(col("doc_id"), col("scrubbed")))
    } else None

    val flagged0 = withC.join(spanK, Seq("doc_id"), "left")
      .withColumn("span_keep", coalesce(col("span_keep"), lit(0)))
    val flagged = decontamK.fold(
      flagged0.withColumn("decontam_keep", col("span_keep")))(d =>
      flagged0.join(d, Seq("doc_id"), "left")
        .withColumn("decontam_keep",
          when(col("span_keep") === 1, coalesce(col("decontam_keep"),
            lit(0))).otherwise(0)))

    val keeps = Seq("quality_keep", "mix_keep", "exact_keep",
      "near_keep", "cont_keep", "span_keep", "decontam_keep",
      "budget_keep")
    val flaggedS = scrubbed.fold(flagged)(sc =>
      flagged.join(sc, Seq("doc_id"), "left")
        .withColumn("text", coalesce(col("scrubbed"), col("text")))
        .drop("scrubbed"))
    // 6. token budget (opt-in, `tokenBudgetDiv`) — the qc08 mixture
    // as the FINAL selection: per-source α=1/2 token quotas over the
    // funnel's survivors, filled greedily in stable md5(doc_id) order.
    // Runs over post-scrub text — the token mass a run would ingest.
    val flaggedB = opts.tokenBudgetDiv.fold(
      flaggedS.withColumn("budget_keep", col("decontam_keep"))) { div =>
      require(flaggedS.columns.contains("source"),
        "tokenBudgetDiv needs a `source` column on the input")
      val surv = flaggedS.filter(col("decontam_keep") === 1)
        .select(col("doc_id"), col("source"), col("text"))
      // a NULL source would silently vanish in the quota joins (Spark
      // joins never match NULL keys) — fail loudly instead (one extra
      // action over the survivor frame, per run, mostly cache-served)
      require(surv.filter(col("source").isNull).isEmpty,
        "tokenBudgetDiv: input has survivors with NULL source")
      val picks = graft.queries.CurationQueries
        .tokenBudgetFrom(surv, div)
        .select(col("doc_id"), lit(1).as("bk"))
      flaggedS.join(picks, Seq("doc_id"), "left")
        .withColumn("budget_keep",
          when(col("decontam_keep") === 1, coalesce(col("bk"), lit(0)))
            .otherwise(0))
        .drop("bk")
    }
    val all = flaggedB.withColumn("curated", col("budget_keep"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize, with the audit-funnel aggregate observed on the SAME
    // job (r17 optimization: the stats frame used to be a second
    // action over the cache — one extra job per run locally, one extra
    // pass over the flag table at scale). Then release the
    // stage-internals (blocking for the same reason as
    // CurateResult.close).
    val statsObs = org.apache.spark.sql.Observation()
    all.observe(statsObs,
      count(lit(1)).as("n_docs"),
      (keeps.map(k => sum(col(k)).as(k)) :+
        sum(col("curated")).as("n_curated")): _*)
      .count(): Unit
    sh.unpersist(blocking = true)
    gramDfPersisted.foreach(_.unpersist(blocking = true): Unit)
    s3n.unpersist(blocking = true)
    if (!(s3n eq s3pre)) s3pre.unpersist(blocking = true): Unit
    s3Opt.foreach(_.unpersist(blocking = true))

    val curatedBase = all.filter(col("curated") === 1)
      .drop(keeps :+ "curated": _*)
    // soft-dedup mode: attach the per-doc sampling weight (1e6 for
    // singletons; every curated doc passed the near-dup stage, so the
    // left join always hits — coalesce guards regardless)
    val curated = weightsOpt.fold(curatedBase)(wf =>
      curatedBase.join(wf, Seq("doc_id"), "left")
        .withColumn("weight_ppm",
          coalesce(col("weight_ppm"), lit(1000000L))))
    // the observed metrics ARE the stats aggregate — surface them as
    // the same one-row frame the `all.agg(...)` spelling produced
    // (schema and null-on-empty behavior identical)
    val statNames = "n_docs" +: keeps :+ "n_curated"
    val got = statsObs.get
    val stats = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row
        .fromSeq(statNames.map(got(_)))),
      org.apache.spark.sql.types.StructType(statNames.map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType))))
    CurateResult(curated, stats, all)
  }
}

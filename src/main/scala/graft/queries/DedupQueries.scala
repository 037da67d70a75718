package graft.queries

import graft.{QueryDef, QueryRegistry, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` / `embeddings` — the north-star
  * operators of a 100 TB training-data pipeline:
  *
  *  - exact dedup: content-hash groupBy (one shuffle on a 32-byte key)
  *  - MinHash signatures: per-row HOFs only — ZERO shuffle; signature
  *    cost is O(words) per doc and the scan stays in codegen
  *  - LSH banding: candidate pairs via equi-join on (band, hash) — the
  *    join key is the band hash, so at scale the shuffle moves only
  *    (doc_id, band_hash) pairs, never documents
  *  - n-gram Jaccard: exact verification ONLY on LSH candidates (the
  *    classic two-phase near-dup pipeline; no O(n²) pass anywhere)
  *  - embedding cosine near-dup: threshold self-join (brute-force at
  *    test scale; see SimilarityQueries for the bucketed scale path)
  *
  * Cross-engine determinism: every hash is md5-over-UTF-8 (identical in
  * Spark and DuckDB), minhash = lexicographic min over md5 strings.
  */
object DedupQueries extends QueryRegistry {

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands × 2 rows
  private val NumBands = NumHashes / BandSize

  // ---- shared shingle / signature builders (Spark side) ----

  private def words(c: Column): Column = split(lower(c), " ")

  /** 3-word shingles via 1-based element_at; guarded for short docs. */
  private def shingles(ws: Column): Column =
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2))))
      .otherwise(array(concat_ws(" ", ws)))

  private def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, x => md5(to_binary(
      concat(lit(s"$seed|"), x), lit("utf-8")))))

  /** doc_id + h0..h7 signature frame — the shared prefix of the
    * minhash/LSH/jaccard queries. Computed by the single-pass JVM kernel
    * ([[graft.functions.MinHash]]); the declarative HOF form (kept above
    * as [[minhash]] for reference/tests) produces identical values but
    * runs interpreted outside codegen. */
  private def signatures(s: SparkSession, dir: String): DataFrame =
    graft.functions.MinHash.signatures(
      Tables(s, dir).documents.select(col("doc_id"), col("text")),
      NumHashes)

  /** Band hash = md5 over the band's minhashes, namespaced by band idx. */
  private def bandCols: Seq[Column] = (0 until NumBands).map { b =>
    val parts = (0 until BandSize).map(i => col(s"h${b * BandSize + i}"))
    md5(to_binary(concat_ws("|", lit(b.toString) +: parts: _*),
      lit("utf-8"))).as(s"band$b")
  }

  // ---- DuckDB side (same constructions, generated in lockstep) ----

  private val wsSqlCte =
    "SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents"

  private val shinglesSql =
    """SELECT doc_id, CASE WHEN len(ws) >= 3
      |  THEN list_transform(generate_series(1, len(ws) - 2),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |  ELSE [array_to_string(ws, ' ')] END AS shs
      |FROM w""".stripMargin

  private def minhashSql(k: Int): String =
    s"list_min(list_transform(shs, x -> md5('$k|' || x))) AS h$k"

  private val sigSqlCte = {
    val hs = (0 until NumHashes).map(minhashSql).mkString(",\n    ")
    s"""WITH w AS ($wsSqlCte),
       |s AS ($shinglesSql),
       |sig AS (
       |  SELECT doc_id,
       |    $hs
       |  FROM s)""".stripMargin
  }

  private def bandSql(b: Int): String = {
    val parts = (0 until BandSize).map(i => s"h${b * BandSize + i}")
      .mkString(" || '|' || ")
    s"md5('$b' || '|' || $parts) AS band$b"
  }

  // ---- queries ----

  /** Exact dedup: group by content hash, keep min doc_id. */
  private def exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).documents
      .groupBy(md5(to_binary($"text", lit("utf-8"))).as("content_hash"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"content_hash")
  }

  private val exactSql =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      | count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  /** MinHash signature table (pure per-row compute, no shuffle). */
  private def minhashSig(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    signatures(s, dir).orderBy($"doc_id")
  }

  private val minhashSigSql =
    s"""$sigSqlCte
       |SELECT * FROM sig ORDER BY doc_id""".stripMargin

  /** LSH candidate pairs: docs sharing ≥1 band. */
  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = signatures(s, dir).select($"doc_id" +: bandCols: _*)
    val bands = sig.select($"doc_id", explode(array(
      (0 until NumBands).map(b => col(s"band$b")): _*)).as("band"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
      .orderBy($"a_id", $"b_id")
  }

  private val lshPairsSql = {
    val bandExprs = (0 until NumBands).map(bandSql).mkString(",\n    ")
    s"""$sigSqlCte,
       |bands AS (
       |  SELECT doc_id,
       |    $bandExprs
       |  FROM sig),
       |eb AS (
       |  SELECT doc_id, unnest([${(0 until NumBands)
        .map(b => s"band$b").mkString(", ")}]) AS band
       |  FROM bands)
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |FROM eb a JOIN eb b ON a.band = b.band AND a.doc_id < b.doc_id
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Exact n-gram Jaccard verification over the LSH candidates:
    * distinct-shingle explode → equi-join on shingle → shared counts →
    * jaccard = |∩| / |∪|; report pairs ≥ 0.5. */
  private def jaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cand = lshPairs(s, dir)
    val sh = Tables(s, dir).documents
      .select($"doc_id",
        explode(array_distinct(shingles(words($"text")))).as("sh"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = cand
      .join(sh.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b_id") === col("sb.doc_id") &&
        col("sa.sh") === col("sb.sh"))
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("na"), col("a_id") === col("na.doc_id"))
      .join(sizes.as("nb"), col("b_id") === col("nb.doc_id"))
      .select($"a_id", $"b_id", $"shared",
        round($"shared".cast("double") /
          (col("na.n_sh") + col("nb.n_sh") - $"shared"), 6).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .orderBy($"a_id", $"b_id")
  }

  private val jaccardSql = {
    val bandExprs = (0 until NumBands).map(bandSql).mkString(",\n    ")
    s"""$sigSqlCte,
       |bands AS (
       |  SELECT doc_id,
       |    $bandExprs
       |  FROM sig),
       |eb AS (
       |  SELECT doc_id, unnest([${(0 until NumBands)
        .map(b => s"band$b").mkString(", ")}]) AS band
       |  FROM bands),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM eb a JOIN eb b ON a.band = b.band AND a.doc_id < b.doc_id),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(shs)) AS sh FROM s),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |shared AS (
       |  SELECT a_id, b_id, count(*) AS shared
       |  FROM cand
       |  JOIN sh sa ON a_id = sa.doc_id
       |  JOIN sh sb ON b_id = sb.doc_id AND sa.sh = sb.sh
       |  GROUP BY a_id, b_id)
       |SELECT a_id, b_id, shared,
       |  round(shared::DOUBLE / (na.n_sh + nb.n_sh - shared), 6) AS jaccard
       |FROM shared
       |JOIN sizes na ON a_id = na.doc_id
       |JOIN sizes nb ON b_id = nb.doc_id
       |WHERE round(shared::DOUBLE / (na.n_sh + nb.n_sh - shared), 6) >= 0.5
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** 16-bit SimHash over word hashes (first 4 md5 hex digits → int;
    * per-bit ±1 vote; sign → bit). Single-pass JVM kernel
    * ([[graft.functions.SimHash]]) — the 16-aggregate HOF form runs
    * interpreted; equality of the two forms is asserted in spec. */
  private def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.SimHash.signatures(
      Tables(s, dir).documents.select($"doc_id", $"text"))
      .orderBy($"doc_id")
  }

  private val simhashSql = {
    val bits = (0 until 16).map { b =>
      s"""CASE WHEN list_sum(list_transform(hv,
         |   x -> CASE WHEN (x >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         | THEN ${1 << b} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""SELECT doc_id, ($bits)::INT AS simhash
       |FROM (
       |  SELECT doc_id, list_transform(string_split(lower(text), ' '),
       |    w -> (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096
       |       + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256
       |       + (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1)) AS hv
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Embedding cosine near-dup pairs (threshold 0.4; double-precision
    * sequential dot product — bit-identical across engines). */
  private def embedDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val e = t.embeddings.select($"vec_id", $"embedding")
    val a = e.select($"vec_id".as("a_id"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("b_id"), $"embedding".as("eb"))
    a.join(broadcast(b), $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        round(graft.functions.CosineSimilarity.cosineSim($"ea", $"eb"), 6)
          .as("cos"))
      .filter($"cos" > 0.4)
      .orderBy($"a_id", $"b_id")
  }

  private val embedDupSql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |    round(list_sum(list_transform(generate_series(1, len(a.emb)),
      |            i -> a.emb[i] * b.emb[i]))
      |      / (sqrt(list_sum(list_transform(generate_series(1, len(a.emb)),
      |            i -> a.emb[i] * a.emb[i])))
      |       * sqrt(list_sum(list_transform(generate_series(1, len(b.emb)),
      |            i -> b.emb[i] * b.emb[i])))), 6) AS cos
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT a_id, b_id, cos FROM p WHERE cos > 0.4
      |ORDER BY a_id, b_id""".stripMargin

  /** SimHash near-dup pairs: band on the high byte (8/16 bits shared ⇒
    * candidate), verify by Hamming distance ≤ 3. The banded equi-join is
    * the scale path — the shuffle key is one byte of signature, never
    * text. */
  private def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = simhash(s, dir) // (doc_id, simhash)
    val a = sig.select($"doc_id".as("a_id"), $"simhash".as("sa"))
    val b = sig.select($"doc_id".as("b_id"), $"simhash".as("sb"))
    a.join(b, shiftright($"sa", 8) === shiftright($"sb", 8) &&
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        expr("bit_count(sa ^ sb)").as("hamming"))
      .filter($"hamming" <= 3)
      .orderBy($"a_id", $"b_id")
  }

  private val simhashPairsSql = {
    val sigSql = simhashSql.replace("\nORDER BY doc_id", "")
    s"""WITH sig AS ($sigSql)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
       |FROM sig a JOIN sig b
       |  ON (a.simhash >> 8) = (b.simhash >> 8) AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** End-to-end dedup keep-list: drop the higher doc_id of every
    * Jaccard-verified near-dup pair (threshold 0.5) — the pipeline's
    * final output shape (LSH candidates → exact verify → prune). */
  private def keepList(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dupIds = jaccard(s, dir).select($"b_id").distinct()
    Tables(s, dir).documents
      .join(dupIds, $"doc_id" === $"b_id", "left_anti")
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  private val keepListSql = {
    // reuse the verified-pairs query as a CTE body
    val pairs = jaccardSql
      .replace("ORDER BY a_id, b_id", "")
    s"""SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT b_id FROM ($pairs) p)
       |ORDER BY doc_id""".stripMargin
  }

  override val defs: Map[String, QueryDef] = Map(
    "qd08_keep_list" -> QueryDef(keepList, Some(keepListSql)),
    "qd01_exact_dedup" -> QueryDef(exact, Some(exactSql)),
    "qd02_minhash_sig" -> QueryDef(minhashSig, Some(minhashSigSql), bench = true),
    "qd03_lsh_pairs" -> QueryDef(lshPairs, Some(lshPairsSql), bench = true),
    "qd04_ngram_jaccard" -> QueryDef(jaccard, Some(jaccardSql)),
    "qd05_simhash" -> QueryDef(simhash, Some(simhashSql)),
    "qd07_simhash_pairs" -> QueryDef(simhashPairs, Some(simhashPairsSql)),
    "qd06_embed_near_dup" -> QueryDef(embedDup, Some(embedDupSql)),
  )
}

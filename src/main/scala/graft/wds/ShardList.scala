package graft.wds

import scala.util.matching.Regex

/** Shard-list expansion: the reference's URL mini-language
  * (`webdataset-private/webdataset/shardlists.py:57-112`):
  *
  *  - brace ranges `prefix-{000..123}.tar` (zero-padded, inclusive)
  *  - brace alternation `{a,b,c}` (bash-style)
  *  - `::` concatenation of multiple specs
  *  - `${VAR}` / `$VAR` environment substitution
  *
  * Expansion happens on the driver — the result is just a file list that
  * Spark parallelizes over (1 tar = 1 task; shard-granular parallelism,
  * exactly the reference's unit of work, `pack/pack.py:293`).
  */
object ShardList {

  private val RangePat: Regex = """\{(\d+)\.\.(\d+)\}""".r
  private val AltPat: Regex = """\{([^{}]*,[^{}]*)\}""".r
  // paired alternatives: a sloppy \$\{?(\w+)\}? would let an unbraced
  // $VAR swallow a following literal '}' and destroy brace-alternation
  // specs like "{train,$SPLIT}.tar"
  private val EnvPat: Regex = """\$\{(\w+)\}|\$(\w+)""".r

  def envSubst(s: String, env: Map[String, String] = sys.env): String =
    EnvPat.replaceAllIn(s, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      Regex.quoteReplacement(env.getOrElse(name, m.matched))
    })

  /** Expand one spec (no `::`), leftmost brace first (bash order). */
  def expandBraces(spec: String): Seq[String] = {
    val range = RangePat.findFirstMatchIn(spec)
    val alt = AltPat.findFirstMatchIn(spec)
    (range, alt) match {
      case (Some(m), a) if a.forall(m.start <= _.start) =>
        val (lo, hi) = (m.group(1), m.group(2))
        val width = lo.length
        (lo.toLong to hi.toLong).flatMap { i =>
          expandBraces(spec.take(m.start) +
            s"%0${width}d".format(i) + spec.drop(m.end))
        }
      case (_, Some(m)) =>
        m.group(1).split(",", -1).toSeq.flatMap { a =>
          expandBraces(spec.take(m.start) + a + spec.drop(m.end))
        }
      case _ => Seq(spec)
    }
  }

  /** Full expansion: env substitution, `::` concatenation, braces. */
  def expand(spec: String, env: Map[String, String] = sys.env): Seq[String] =
    spec.split("::").toSeq.flatMap(part => expandBraces(envSubst(part, env)))

  /** Deterministic seeded shuffle of a shard list
    * (`SimpleShardList(urls, seed)`). */
  def shuffled(urls: Seq[String], seed: Long): Seq[String] = {
    val rng = new scala.util.Random(seed)
    rng.shuffle(urls)
  }

  /** Sample shards with replacement (`ResampledShards`,
    * `shardlists.py:281-324`): per-epoch deterministic when seeded. */
  def resampled(urls: Seq[String], n: Int, seed: Long): Seq[String] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(urls(rng.nextInt(urls.size)))
  }
}

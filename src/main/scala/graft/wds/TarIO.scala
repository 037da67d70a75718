package graft.wds

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.commons.compress.archivers.tar.{
  TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}

import scala.collection.immutable.ListMap

/** Pure-JVM tar shard scan/grouping/write — the kernel of the `wds`
  * format. No Spark types here: one tar maps to one task's sequential
  * read (tars are non-splittable), so everything is Iterator-shaped and
  * order-preserving; Spark integration lives in [[WdsReader]]/[[WdsWriter]].
  *
  * Semantics mirror the reference:
  *  - entry scan: `webdataset-private/webdataset/tariterators.py:95-143`
  *    (skip non-regular files, `__meta__`-style names, `skip_meta` regex;
  *    rename/select hooks — select runs AFTER rename, as there)
  *  - adjacency grouping + interleave rule: `tariterators.py:184-246`
  *  - tar write: `webdataset-private/webdataset/writer.py:236-359`
  *    (sorted keys, `_`-meta skipped, fixed uname/gname/mode, optional
  *    fixed mtime for reproducible bytes)
  */
object TarIO {

  /** `skip_meta` default from the reference: `__[^/]*__($|/)` (prefix
    * match). */
  private val SkipMeta = "__[^/]*__($|/)".r

  final case class ReadOptions(
      /** fold `P-<i>.ext` entries following `P.json` into P's sample as
        * key `"<i>.ext"` (the fork's interleave convention; on by
        * default for parity — `tariterators.py:213-219`). */
      interleave: Boolean = true,
      lowercaseSuffix: Boolean = true,
      /** keep only these suffixes (post-rename); None = all. */
      suffixes: Option[Set[String]] = None,
      /** entry-name predicate (pushdown analog of `select_files`).
        * Non-matching entries are dropped ENTIRELY (name + bytes), so
        * samples whose every entry is filtered disappear — row-count
        * changing, the reference's semantics. */
      selectFiles: Option[String => Boolean] = None,
      /** entry-name predicate for PAYLOAD pruning: non-matching
        * entries keep their NAME (group boundaries, row counts and
        * map keys are exactly the unpruned read's) but their bytes
        * are replaced by an empty array and never read off the
        * source — safe whenever the consumer provably never observes
        * those values (the `WdsPayloadPrune` optimizer rule's
        * contract). Matching is over the LOWERCASED entry name
        * (map keys are lowercased by default, and a pruned payload
        * that should have been kept is a wrong answer, so matching
        * errs wide). */
      payloadFiles: Option[String => Boolean] = None,
      renameFiles: Option[String => String] = None,
      handler: Handler = Handler.Reraise,
      /** keep samples whose entries were ALL filtered away (group
        * boundaries under a `suffixes` filter). The reference's
        * group_by_keys yields only valid samples, so the default drops
        * them; the DSv2 pruned-columns read sets this to count rows
        * without materializing entry bytes. */
      keepEmpty: Boolean = false)

  private val EmptyBytes = Array.emptyByteArray

  /** Shared entry-name admission: meta-skip → rename → select, the
    * order the reference applies them (`tariterators.py:95-143`).
    * Returns the post-rename name when the entry is kept. Single-
    * sourced so the streaming and seekable scans cannot drift. */
  private def keptName(name0: String, opts: ReadOptions): Option[String] = {
    val isMeta = (!name0.contains("/") && name0.startsWith("__") &&
      name0.endsWith("__")) ||
      SkipMeta.findPrefixOf(name0).isDefined
    if (isMeta) None
    else {
      val name = opts.renameFiles.fold(name0)(f => f(name0))
      if (opts.selectFiles.exists(p => !p(name))) None else Some(name)
    }
  }

  /** `suffixes = Some(Set.empty)` is the DSv2 pruned-columns read: NO
    * suffix can match, so every payload would be dropped post-read —
    * emit (name, empty) instead of materializing bytes. Entry NAMES
    * still flow: group boundaries need them. */
  private def skipPayloads(opts: ReadOptions): Boolean =
    opts.suffixes.exists(_.isEmpty)

  /** payload-prune admission: keep names, blank non-matching bytes
    * (lowercased-name matching — see [[ReadOptions.payloadFiles]]). */
  private def prunedPayload(name: String, opts: ReadOptions): Boolean =
    opts.payloadFiles.exists(p =>
      !p(name.toLowerCase(java.util.Locale.ROOT)))

  /** Scan raw tar entries: (name, bytes), order-preserving. Transparently
    * gunzips `.tar.gz`/`.tgz` streams when `gzipped`. */
  def entries(
      in: InputStream,
      url: String,
      opts: ReadOptions = ReadOptions(),
      gzipped: Boolean = false): Iterator[(String, Array[Byte])] = {
    val base = new BufferedInputStream(in, 1 << 16)
    val stream = new TarArchiveInputStream(
      if (gzipped) new GZIPInputStream(base) else base)
    val namesOnly = skipPayloads(opts)

    new Iterator[(String, Array[Byte])] {
      private var nextEntry: (String, Array[Byte]) = _
      private var done = false

      @annotation.tailrec
      private def advance(): Unit = {
        val e =
          try stream.getNextEntry
          catch {
            case ex: Exception =>
              // a corrupt header is not survivable mid-stream: treat as
              // end-of-shard unless the policy says reraise
              if (Handler.handle(opts.handler, s"tar scan $url", ex)) ()
              null
          }
        if (e == null) { done = true; nextEntry = null }
        else if (!e.isFile) advance()
        else {
          val name0 = e.getName
          if (name0 == null) { skip(e); advance() }
          else {
            keptName(name0, opts) match {
              case None => skip(e); advance()
              case Some(name) =>
              if (namesOnly || prunedPayload(name, opts))
                nextEntry = (name, EmptyBytes)
              else {
                // payload read under the handler policy: oversized or
                // truncated entries are per-entry failures, not task death
                val read =
                  try {
                    if (e.getSize > Int.MaxValue - 8)
                      throw new IllegalArgumentException(
                        s"entry $name0 is ${e.getSize} bytes; " +
                          "in-memory samples cap at 2 GiB")
                    val buf = new Array[Byte](e.getSize.toInt)
                    var off = 0
                    while (off < buf.length) {
                      val n = stream.read(buf, off, buf.length - off)
                      if (n < 0) throw new java.io.EOFException(
                        s"truncated entry $name0 in $url")
                      off += n
                    }
                    Some(buf)
                  } catch {
                    case ex: Exception =>
                      if (Handler.handle(opts.handler, s"read $name0 @ $url", ex))
                        None
                      else { done = true; None }
                  }
                read match {
                  case Some(buf) => nextEntry = (name, buf)
                  case None => if (!done) advance()
                }
              }
            }
          }
        }
      }

      private def skip(e: TarArchiveEntry): Unit = ()

      override def hasNext: Boolean = {
        if (nextEntry == null && !done) advance()
        nextEntry != null
      }
      override def next(): (String, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextEntry; nextEntry = null; r
      }
    }
  }

  /** True when a pruned read over this shard should take the
    * RANDOM-ACCESS path: only when pruning was actually requested
    * (`selectFiles` or the names-only read) — seeking saves the pruned
    * payloads' I/O then, while an unpruned scan stays a single
    * sequential read, the cheapest access pattern on every FS.
    * Gzipped shards are inherently sequential. */
  def shouldSeek(url: String, opts: ReadOptions): Boolean =
    (opts.selectFiles.isDefined || opts.payloadFiles.isDefined ||
      skipPayloads(opts)) &&
      !url.endsWith(".gz") && !url.endsWith(".tgz")

  /** Below this shard size the sequential stream always wins: the
    * absolute waste of reading a small tar through is bounded by its
    * size, while the seek path pays per-entry positioning (and, on
    * buffered FS streams, a refill per discontinuity). Pruning only
    * pays on shards whose PRUNED payloads are big — which implies a
    * big shard. */
  val MinSeekBytes: Long = 4L << 20

  /** Random-access entry scan over a seekable channel — same admission
    * and ordering semantics as [[entries]], but unselected payloads are
    * SOUGHT PAST, not read through: the streaming tar reader bottoms
    * out in commons-io's `IOUtils.skip`, which deliberately reads every
    * skipped byte, so entry pruning on the stream path saves decode but
    * not I/O. Here commons-compress's `TarFile` walks headers by
    * seeking and payload bytes move only for entries we keep — a
    * names-only scan of a shard full of 1 MiB payloads reads ~0.1% of
    * its bytes.
    *
    * Channel ownership: closed when the iterator is exhausted (or the
    * handler stops the scan), AND — inside a Spark task — at task
    * completion, so early-terminating consumers (`take(n)`, a pushed
    * limit) cannot leak it. OUTSIDE a task (direct library use of
    * [[readSamplesSeekable]] on the driver) there is no completion
    * hook: the closer returned by `WdsReader.openSamples` (or
    * `PartitionReader.close`) is the required owner on early stop. */
  def entriesSeekable(
      ch: java.nio.channels.SeekableByteChannel,
      url: String,
      opts: ReadOptions = ReadOptions()): Iterator[(String, Array[Byte])] = {
    import org.apache.commons.compress.archivers.tar.TarFile
    // construction walks every header (seeking); failure here THROWS
    // so [[WdsReader.openSamples]] can fall back to the sequential
    // stream — the handler policy judges errors there, exactly once
    val tarFile = new TarFile(ch)
    val namesOnly = skipPayloads(opts)
    var stopped = false
    import scala.jdk.CollectionConverters._
    val base = tarFile.getEntries.asScala.iterator
      .takeWhile(_ => !stopped)
      .filter(_.isFile)
      .flatMap { e =>
        Option(e.getName).flatMap(keptName(_, opts)) match {
          case None => None
          case Some(name) if namesOnly || prunedPayload(name, opts) =>
            Some((name, EmptyBytes))
          case Some(name) =>
            try {
              val sz = e.getRealSize
              if (sz > Int.MaxValue - 8)
                throw new IllegalArgumentException(
                  s"entry ${e.getName} is $sz bytes; " +
                    "in-memory samples cap at 2 GiB")
              val buf = new Array[Byte](sz.toInt)
              val in = tarFile.getInputStream(e)
              try {
                var off = 0
                while (off < buf.length) {
                  val n = in.read(buf, off, buf.length - off)
                  if (n < 0) throw new java.io.EOFException(
                    s"truncated entry ${e.getName} in $url")
                  off += n
                }
              } finally in.close()
              Some((name, buf))
            } catch {
              case ex: Exception =>
                if (!Handler.handle(opts.handler,
                  s"read ${e.getName} @ $url", ex)) stopped = true
                None
            }
        }
      }
    var closed = false
    val closer: AutoCloseable = () =>
      try tarFile.close() catch { case _: Exception => () }
    def closeOnce(): Unit =
      if (!closed) {
        closed = true
        TaskCloseRegistry.deregister(closer)
        closer.close()
      }
    // task-completion safety net for consumers that stop pulling
    // before exhaustion inside a Spark task. Registered through the
    // per-task registry, NOT a per-shard listener: a task that walks
    // thousands of shards (coalesced repack) would otherwise pin every
    // exhausted TarFile (entry-metadata list included) in the
    // TaskContext listener chain until task end.
    TaskCloseRegistry.register(closer)
    new Iterator[(String, Array[Byte])] {
      override def hasNext: Boolean = {
        val h = base.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): (String, Array[Byte]) = base.next()
    }
  }

  /** One TaskCompletionListener per task over a deregistering set:
    * resources closed in-band (iterator exhaustion, reader close)
    * drop out immediately and stay GC-able; whatever is still open at
    * task end gets closed by the single listener. Outside a task this
    * is a no-op (the openSamples closer owns the channel there). */
  private[wds] object TaskCloseRegistry {
    private val perTask = new java.util.concurrent.ConcurrentHashMap[
      java.lang.Long, java.util.Set[AutoCloseable]]()
    def register(c: AutoCloseable): Unit = {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) {
        val id = java.lang.Long.valueOf(tc.taskAttemptId())
        val set = perTask.computeIfAbsent(id, _ => {
          tc.addTaskCompletionListener[Unit] { _ =>
            val s = perTask.remove(id)
            if (s != null) s.forEach { c2 =>
              try c2.close() catch { case _: Exception => () }
            }
          }
          java.util.concurrent.ConcurrentHashMap.newKeySet[AutoCloseable]()
        })
        set.add(c): Unit
      }
    }
    def deregister(c: AutoCloseable): Unit = {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) {
        val s = perTask.get(java.lang.Long.valueOf(tc.taskAttemptId()))
        if (s != null) s.remove(c): Unit
      }
    }
    /** open-resource count for the current task (tests). */
    private[wds] def openCount: Int = {
      val tc = org.apache.spark.TaskContext.get()
      if (tc == null) 0
      else {
        val s = perTask.get(java.lang.Long.valueOf(tc.taskAttemptId()))
        if (s == null) 0 else s.size()
      }
    }
  }

  /** One-call random-access read: channel → grouped samples. */
  def readSamplesSeekable(
      ch: java.nio.channels.SeekableByteChannel,
      url: String,
      opts: ReadOptions = ReadOptions()): Iterator[Sample] =
    groupByKeys(entriesSeekable(ch, url, opts), url, opts)

  /** Adjacency-grouping of a tar's entry stream into samples — order
    * sensitive by design; never reimplement with groupBy (`SURVEY.md`
    * §7.4.1). Duplicate suffix within a sample is an error routed to the
    * handler (continue ⇒ skip that entry). */
  def groupByKeys(
      data: Iterator[(String, Array[Byte])],
      url: String,
      opts: ReadOptions = ReadOptions()): Iterator[Sample] = {
    var currentKey: String = null
    var currentEntries = ListMap.empty[String, Array[Byte]]
    var interleaveId: String = null
    var stopped = false

    val grouped = new Iterator[Option[Sample]] {
      override def hasNext: Boolean = !stopped && data.hasNext
      override def next(): Option[Sample] = {
        val (fname, value) = data.next()
        try {
          Sample.basePlusExt(fname) match {
            case None => None // no-extension entry: ignored, as in reference
            case Some((prefix0, suffix0)) =>
              var prefix = prefix0
              var suffix = suffix0
              if (opts.interleave) {
                // case-sensitive "json" check BEFORE lowercasing — the
                // reference does exactly this (`tariterators.py:215`
                // runs before the lcase step at `:226`), so an
                // uppercase `.JSON` entry intentionally does not start
                // an interleave group
                if (suffix == "json") interleaveId = prefix
                else if (interleaveId != null &&
                  prefix.startsWith(interleaveId + "-")) {
                  suffix = prefix.substring(interleaveId.length + 1) + "." + suffix
                  prefix = interleaveId
                }
              }
              if (opts.lowercaseSuffix)
                suffix = suffix.toLowerCase(java.util.Locale.ROOT)
              val emitted =
                if (currentKey == null || prefix != currentKey) {
                  val out =
                    if (currentKey != null)
                      Some(Sample(currentKey, url, currentEntries))
                    else None
                  currentKey = prefix
                  currentEntries = ListMap.empty
                  out
                } else None
              if (currentEntries.contains(suffix))
                throw new IllegalArgumentException(
                  s"$fname: duplicate file name in tar file $suffix")
              if (opts.suffixes.forall(_.contains(suffix)))
                currentEntries = currentEntries.updated(suffix, value)
              emitted
          }
        } catch {
          case e: Exception =>
            if (!Handler.handle(opts.handler, s"group $url", e)) stopped = true
            None
        }
      }
    }

    val tail = new Iterator[Option[Sample]] {
      private var emitted = false
      override def hasNext: Boolean = !emitted && currentKey != null
      override def next(): Option[Sample] = {
        emitted = true
        Some(Sample(currentKey, url, currentEntries))
      }
    }

    val all = (grouped ++ tail).flatten
    if (opts.keepEmpty) all else all.filter(_.entries.nonEmpty)
  }

  /** One-call read: tar stream → grouped samples. */
  def readSamples(
      in: InputStream,
      url: String,
      opts: ReadOptions = ReadOptions()): Iterator[Sample] = {
    val gz = url.endsWith(".gz") || url.endsWith(".tgz")
    groupByKeys(entries(in, url, opts, gzipped = gz), url, opts)
  }

  // ---------------------------------------------------------------- write

  final case class WriteOptions(
      user: String = "bigdata",
      group: String = "bigdata",
      mode: Int = 0x124, // 0o444
      /** fixed mtime (seconds) for byte-reproducible shards; None = now. */
      mtime: Option[Long] = Some(0L),
      keepMeta: Boolean = false,
      gzip: Boolean = false)

  /** Streaming tar writer with the reference TarWriter's layout: entry
    * name = `<key>.<suffix>`, suffixes written in sorted order, `_`-meta
    * keys skipped. Returns bytes written per sample via the callback. */
  final class TarWriter(
      out: OutputStream,
      opts: WriteOptions = WriteOptions()) extends AutoCloseable {
    private val raw = new BufferedOutputStream(out, 1 << 16)
    private val stream = new TarArchiveOutputStream(
      if (opts.gzip) new GZIPOutputStream(raw) else raw)
    stream.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)

    private var bytes = 0L
    private var count = 0L
    def bytesWritten: Long = bytes
    def samplesWritten: Long = count

    def write(key: String, entriesMap: Map[String, Array[Byte]]): Long = {
      require(key != null && key.nonEmpty, "sample must have a key")
      var total = 0L
      entriesMap.keys.toSeq.sorted.foreach { suffix =>
        if (opts.keepMeta || !suffix.startsWith("_")) {
          val data = entriesMap(suffix)
          val e = new TarArchiveEntry(s"$key.$suffix")
          e.setSize(data.length.toLong)
          e.setMode(opts.mode)
          e.setUserName(opts.user)
          e.setGroupName(opts.group)
          e.setModTime(opts.mtime.getOrElse(System.currentTimeMillis() / 1000) * 1000)
          stream.putArchiveEntry(e)
          stream.write(data)
          stream.closeArchiveEntry()
          total += data.length
        }
      }
      bytes += total
      count += 1
      total
    }

    def write(s: Sample): Long = write(s.key, s.entries)

    override def close(): Unit = stream.close()
  }

  /** Encode a string entry as UTF-8 bytes (writer convenience). */
  def utf8(s: String): Array[Byte] = s.getBytes(UTF_8)
}

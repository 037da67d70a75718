package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO BMFF sample-table access — the REAL frame-extraction
  * path for video codecs whose samples are self-contained encoded
  * images (MJPEG `jpeg`, PNG `png `): parses `stbl` (stsd codec,
  * stsz sizes, stsc sample→chunk runs, stco/co64 chunk offsets, stss
  * sync samples, mdhd timing), reconstructs every sample's byte range,
  * and slices frames straight out of `mdat`. This is the decode walk
  * decord/ffmpeg do for the reference (`pack/dataset.py:102-122`,
  * `pack/tools.py:101-140`) minus inter-frame codecs (H.264 needs a
  * native decoder and stays at the [[graft.pack.FrameSource]] seam).
  *
  * Sibling of [[Mp4Probe]] (movie-level metadata); this walks the same
  * box tree one level deeper into the track. Tolerates truncated tails
  * and unknown boxes — a 100 TB crawl contains corrupt shards.
  */
object Mp4Samples {

  /** One media track's sample table, fully resolved to byte ranges.
    * @param sync 1-based sync-sample numbers, ascending; empty = all sync
    * @param avcc the avcC decoder-config payload from the stsd sample
    *             entry (avc1 tracks only)
    * @param cts  per-sample COMPOSITION time (stts decode time + ctts
    *             offset) — display order for B-frame streams; empty =
    *             decode order IS display order */
  final case class Track(
      codec: String,
      timescale: Long,
      duration: Long,
      sizes: Array[Int],
      offsets: Array[Long],
      sync: Array[Int],
      avcc: Option[Array[Byte]] = None,
      cts: Array[Long] = Array.emptyLongArray) {
    def frameCount: Int = sizes.length
    def fps: Double =
      if (duration > 0 && timescale > 0)
        frameCount.toDouble * timescale / duration
      else 0.0
    def durationSec: Double =
      if (timescale > 0) duration.toDouble / timescale else 0.0
    def isSync(sampleIdx: Int): Boolean =
      sync.isEmpty || java.util.Arrays.binarySearch(sync, sampleIdx + 1) >= 0

    /** display-position -> decode-order sample index (identity without
      * ctts). Stable on CT ties (decode order breaks them, the ISO
      * convention). B-frame streams NEED this mapping: the sampler's
      * "frame i" is display order, the sample table is decode order. */
    lazy val displayToDecode: Array[Int] =
      if (cts.isEmpty) Array.tabulate(frameCount)(identity)
      else cts.zipWithIndex.sortBy { case (t, j) => (t, j) }.map(_._2)

    /** decode-order sample index -> display position */
    lazy val decodeToDisplay: Array[Int] = {
      val inv = new Array[Int](displayToDecode.length)
      var i = 0
      while (i < inv.length) { inv(displayToDecode(i)) = i; i += 1 }
      inv
    }
    /** slice sample `i`'s encoded bytes out of the container */
    def sample(container: Array[Byte], i: Int): Array[Byte] = {
      val off = offsets(i)
      val len = sizes(i)
      // a corrupt co64 can carry negative or near-Long.MAX offsets; the
      // bound must reject them BEFORE off.toInt truncates, so corrupt
      // samples surface as the contract's IllegalArgumentException
      require(off >= 0 && len >= 0 && off <= container.length.toLong - len,
        s"sample $i [$off,+$len) beyond container ${container.length}")
      java.util.Arrays.copyOfRange(container, off.toInt, off.toInt + len)
    }
  }

  /** First track with a complete sample table, or None for containers
    * without one (e.g. [[Mp4Probe.encodeMinimal]]'s metadata-only moov). */
  def parse(bytes: Array[Byte]): Option[Track] = {
    var found: Option[Track] = None

    // per-trak accumulator, reset at each trak
    var codec = ""
    var timescale = 0L
    var duration = 0L
    var sizes: Array[Int] = null
    var chunkOffsets: Array[Long] = null
    var stsc: Array[(Long, Long)] = null // (firstChunk, samplesPerChunk)
    var sync: Array[Int] = Array.empty
    var avcc: Option[Array[Byte]] = None
    var sttsRuns: Array[(Long, Long)] = null // (sampleCount, delta)
    var cttsRuns: Array[(Long, Long)] = null // (sampleCount, offset)

    // fragmented-movie (moof/traf/trun) accumulators: streaming-origin
    // corpora carry fMP4, whose moov holds an EMPTY stbl and every
    // sample lives in movie fragments
    val fragSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val fragOffsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    val fragSync = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val fragCts = scala.collection.mutable.ArrayBuffer.empty[Long]
    var fragAnyCtsOffset = false
    var fragDt = 0L // decode time accumulated over fragments
    var trexDuration = 0L
    var trexSize = 0L
    var trexFlags = 0L

    def be(pos: Int, end: Int): ByteBuffer =
      ByteBuffer.wrap(bytes, pos, end - pos).order(ByteOrder.BIG_ENDIAN)

    /** one traf: tfhd defaults then trun sample runs (common layout:
      * default-base-is-moof or explicit base-data-offset) */
    def walkTraf(start: Int, end: Int, moofStart: Long): Unit = {
      var base = moofStart
      var defDur = trexDuration
      var defSize = trexSize
      var defFlags = trexFlags
      var pos = start
      while (pos + 8 <= end) {
        val buf = be(pos, end)
        var size = (buf.getInt().toLong) & 0xffffffffL
        val nm = new Array[Byte](4)
        buf.get(nm)
        val name = new String(nm, "US-ASCII")
        var header = 8
        if (size == 1 && buf.remaining() >= 8) {
          size = buf.getLong(); header = 16
        } else if (size == 0) size = (end - pos).toLong
        if (size < header) return
        val boxEnd = math.min(end.toLong, pos + size).toInt
        name match {
          case "tfhd" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            val flags = b.getInt() & 0xffffff
            b.getInt() // track id
            if ((flags & 0x1) != 0 && b.remaining() >= 8)
              base = b.getLong() // base-data-offset
            if ((flags & 0x2) != 0 && b.remaining() >= 4) b.getInt()
            if ((flags & 0x8) != 0 && b.remaining() >= 4)
              defDur = (b.getInt().toLong) & 0xffffffffL
            if ((flags & 0x10) != 0 && b.remaining() >= 4)
              defSize = (b.getInt().toLong) & 0xffffffffL
            if ((flags & 0x20) != 0 && b.remaining() >= 4)
              defFlags = (b.getInt().toLong) & 0xffffffffL
            // 0x20000 default-base-is-moof: base stays moofStart
          case "trun" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            val vf = b.getInt()
            val version = (vf >>> 24) & 0xff
            val flags = vf & 0xffffff
            val n = b.getInt()
            // sanity bound for corrupt shards: a container cannot
            // carry more samples than bytes, and a flipped
            // sample_count must not drive the accumulator to OOM
            if (n < 0 || n.toLong + fragSizes.length > bytes.length)
              return
            var dataOff = 0L
            if ((flags & 0x1) != 0 && b.remaining() >= 4)
              dataOff = b.getInt().toLong
            var firstFlags = -1L
            if ((flags & 0x4) != 0 && b.remaining() >= 4)
              firstFlags = (b.getInt().toLong) & 0xffffffffL
            var off = base + dataOff
            var i = 0
            while (i < n && b.remaining() >= 0) {
              val dur =
                if ((flags & 0x100) != 0 && b.remaining() >= 4)
                  (b.getInt().toLong) & 0xffffffffL
                else defDur
              val sz =
                if ((flags & 0x200) != 0 && b.remaining() >= 4)
                  (b.getInt().toLong) & 0xffffffffL
                else defSize
              val sfl =
                if ((flags & 0x400) != 0 && b.remaining() >= 4)
                  (b.getInt().toLong) & 0xffffffffL
                else if (i == 0 && firstFlags >= 0) firstFlags
                else defFlags
              val ctsOff =
                if ((flags & 0x800) != 0 && b.remaining() >= 4) {
                  val raw = b.getInt()
                  if (version >= 1) raw.toLong else raw.toLong & 0xffffffffL
                } else 0L
              fragSizes += sz.toInt
              fragOffsets += off
              // sample_is_non_sync_sample is bit 16 of sample_flags
              fragSync += ((sfl & 0x10000L) == 0L)
              fragCts += fragDt + ctsOff
              if (ctsOff != 0) fragAnyCtsOffset = true
              off += sz
              fragDt += dur
              i += 1
            }
          case _ => ()
        }
        pos = boxEnd
      }
    }

    def finishTrak(): Unit =
      if (found.isEmpty && sizes != null && sizes.length > 0 &&
        chunkOffsets != null && stsc != null && codec.nonEmpty) {
        val offsets = new Array[Long](sizes.length)
        var sampleIdx = 0
        var chunk = 0
        while (chunk < chunkOffsets.length && sampleIdx < sizes.length) {
          // samples-per-chunk for this chunk = last run with firstChunk <= chunk+1
          var spc = 1L
          var r = 0
          while (r < stsc.length && stsc(r)._1 <= chunk + 1) {
            spc = stsc(r)._2; r += 1
          }
          var off = chunkOffsets(chunk)
          var s = 0L
          while (s < spc && sampleIdx < sizes.length) {
            offsets(sampleIdx) = off
            off += sizes(sampleIdx)
            sampleIdx += 1
            s += 1
          }
          chunk += 1
        }
        if (sampleIdx == sizes.length) {
          // composition times: cumulative stts decode times + ctts
          // offsets (only materialized when a ctts box reorders)
          val cts =
            if (cttsRuns == null) Array.emptyLongArray
            else {
              val out = new Array[Long](sizes.length)
              var dt = 0L
              var i = 0
              var run = 0
              var left = 0L
              var delta = 0L
              var cRun = 0
              var cLeft = 0L
              var cOff = 0L
              while (i < sizes.length) {
                while (left == 0 && sttsRuns != null && run < sttsRuns.length) {
                  left = sttsRuns(run)._1; delta = sttsRuns(run)._2; run += 1
                }
                while (cLeft == 0 && cRun < cttsRuns.length) {
                  cLeft = cttsRuns(cRun)._1; cOff = cttsRuns(cRun)._2
                  cRun += 1
                }
                out(i) = dt + cOff
                dt += delta
                if (left > 0) left -= 1
                if (cLeft > 0) cLeft -= 1
                i += 1
              }
              out
            }
          found = Some(Track(codec, timescale, duration, sizes, offsets,
            sync, avcc, cts))
        }
      }

    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end && found.isEmpty) {
        val buf = be(pos, end)
        var size = (buf.getInt().toLong) & 0xffffffffL
        val nameBytes = new Array[Byte](4)
        buf.get(nameBytes)
        val name = new String(nameBytes, "US-ASCII")
        var header = 8
        if (size == 1 && buf.remaining() >= 8) {
          size = buf.getLong(); header = 16
        } else if (size == 0) size = (end - pos).toLong
        if (size < header) return
        val boxEnd = math.min(end.toLong, pos + size).toInt
        name match {
          case "moov" | "mdia" | "minf" | "stbl" | "mvex" =>
            walk(pos + header, boxEnd)
          case "trex" if boxEnd - pos >= header + 24 =>
            val b = be(pos + header, boxEnd)
            b.getInt() // version+flags
            b.getInt() // track id
            b.getInt() // default sample description index
            trexDuration = (b.getInt().toLong) & 0xffffffffL
            trexSize = (b.getInt().toLong) & 0xffffffffL
            trexFlags = (b.getInt().toLong) & 0xffffffffL
          case "moof" =>
            // fragments: one level down are mfhd + traf boxes; sample
            // offsets default-base to THIS moof box's first byte
            var fpos = pos + header
            while (fpos + 8 <= boxEnd) {
              val fb = be(fpos, boxEnd)
              var fsize = (fb.getInt().toLong) & 0xffffffffL
              val fn = new Array[Byte](4)
              fb.get(fn)
              var fheader = 8
              if (fsize == 1 && fb.remaining() >= 8) {
                fsize = fb.getLong(); fheader = 16
              } else if (fsize == 0) fsize = (boxEnd - fpos).toLong
              if (fsize < fheader) { fpos = boxEnd }
              else {
                val fEnd = math.min(boxEnd.toLong, fpos + fsize).toInt
                if (new String(fn, "US-ASCII") == "traf")
                  walkTraf(fpos + fheader, fEnd, pos.toLong)
                fpos = fEnd
              }
            }
          case "trak" =>
            codec = ""; timescale = 0L; duration = 0L
            sizes = null; chunkOffsets = null; stsc = null
            sync = Array.empty; avcc = None
            sttsRuns = null; cttsRuns = null
            walk(pos + header, boxEnd)
            finishTrak()
          case "mdhd" if boxEnd - pos >= header + 20 =>
            val b = be(pos + header, boxEnd)
            val version = b.get(); b.position(b.position() + 3)
            // v1 needs 28 payload bytes after version+flags (8+8+4+8);
            // a truncated v1 box is skipped, not a BufferUnderflow out
            // of parse() — the probe must survive corrupt shards
            if (version == 1 && b.remaining() >= 28) {
              b.getLong(); b.getLong()
              timescale = (b.getInt().toLong) & 0xffffffffL
              duration = b.getLong()
            } else if (version == 0) {
              b.getInt(); b.getInt()
              timescale = (b.getInt().toLong) & 0xffffffffL
              duration = (b.getInt().toLong) & 0xffffffffL
            }
          case "stsd" if boxEnd - pos >= header + 16 =>
            val b = be(pos + header, boxEnd)
            b.getInt() // version+flags
            val n = b.getInt()
            if (n >= 1 && b.remaining() >= 8) {
              val entryStart = pos + header + 8
              val entrySize = b.getInt()
              val fmt = new Array[Byte](4)
              b.get(fmt)
              codec = new String(fmt, "US-ASCII").trim
              // child boxes after the 78-byte VisualSampleEntry body
              // (avcC carries the H.264 decoder config)
              var cpos = entryStart + 86
              val centEnd = math.min(boxEnd.toLong,
                entryStart.toLong + entrySize).toInt
              while (cpos + 8 <= centEnd && avcc.isEmpty) {
                val cb = be(cpos, centEnd)
                val csize = cb.getInt()
                val cname = new Array[Byte](4)
                cb.get(cname)
                if (csize >= 8 && cpos + csize <= centEnd) {
                  if (new String(cname, "US-ASCII") == "avcC")
                    avcc = Some(java.util.Arrays.copyOfRange(
                      bytes, cpos + 8, cpos + csize))
                  cpos += csize
                } else cpos = centEnd
              }
            }
          case "stsz" if boxEnd - pos >= header + 12 =>
            val b = be(pos + header, boxEnd)
            b.getInt()
            val fixed = b.getInt()
            val n = b.getInt()
            sizes =
              // fixed-size path: the header-claimed count must be
              // plausible against the container (n samples of `fixed`
              // bytes can't exceed the file) or a crafted stsz could
              // demand a multi-GB allocation
              if (fixed > 0 && n >= 0 && n.toLong * fixed <= bytes.length)
                Array.fill(n)(fixed)
              else if (fixed == 0 && b.remaining() >= 4L * n)
                Array.fill(n)(b.getInt())
              else null
          case "stsc" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            b.getInt()
            val n = b.getInt()
            if (b.remaining() >= 12L * n)
              stsc = Array.fill(n) {
                val first = (b.getInt().toLong) & 0xffffffffL
                val spc = (b.getInt().toLong) & 0xffffffffL
                b.getInt() // sample description index
                (first, spc)
              }
          case "stco" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            b.getInt()
            val n = b.getInt()
            if (b.remaining() >= 4L * n)
              chunkOffsets = Array.fill(n)((b.getInt().toLong) & 0xffffffffL)
          case "co64" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            b.getInt()
            val n = b.getInt()
            if (b.remaining() >= 8L * n)
              chunkOffsets = Array.fill(n)(b.getLong())
          case "stss" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            b.getInt()
            val n = b.getInt()
            if (b.remaining() >= 4L * n) sync = Array.fill(n)(b.getInt())
          case "stts" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            b.getInt()
            val n = b.getInt()
            if (n >= 0 && b.remaining() >= 8L * n)
              sttsRuns = Array.fill(n) {
                val cnt = (b.getInt().toLong) & 0xffffffffL
                val delta = (b.getInt().toLong) & 0xffffffffL
                (cnt, delta)
              }
          case "ctts" if boxEnd - pos >= header + 8 =>
            val b = be(pos + header, boxEnd)
            val version = b.get(); b.position(b.position() + 3)
            val n = b.getInt()
            if (n >= 0 && b.remaining() >= 8L * n)
              cttsRuns = Array.fill(n) {
                val cnt = (b.getInt().toLong) & 0xffffffffL
                // v0 offsets are unsigned; v1 are signed (QuickTime /
                // ISO 14496-12:2012 negative-offset form)
                val raw = b.getInt()
                val off =
                  if (version == 1) raw.toLong else raw.toLong & 0xffffffffL
                (cnt, off)
              }
          case _ => ()
        }
        pos = boxEnd
      }
    }

    walk(0, bytes.length)
    if (found.isEmpty && fragSizes.nonEmpty && codec.nonEmpty) {
      // fragmented movie: moov carried codec/timescale/avcc with an
      // empty stbl; samples accumulated from the moof/trun walk.
      // Duration for fps comes from the summed sample durations (the
      // fragmented mvhd/mdhd durations are commonly 0).
      val dur = if (duration > 0) duration else fragDt
      val sync1 = fragSync.zipWithIndex.collect {
        case (true, i) => i + 1
      }.toArray
      // all-sync collapses to "empty = all sync" (the Track contract)
      val syncArr =
        if (sync1.length == fragSizes.length) Array.empty[Int] else sync1
      found = Some(Track(codec, timescale, dur, fragSizes.toArray,
        fragOffsets.toArray, syncArr, avcc,
        if (fragAnyCtsOffset) fragCts.toArray else Array.emptyLongArray))
    }
    found
  }

  /** Build a REAL playable still-image-codec MP4: `ftyp` + `mdat`
    * (concatenated encoded frames) + trailing `moov` with a complete
    * sample table (one chunk per sample; stss every `syncEvery`-th).
    * `codec` is the stsd fourcc — "jpeg" for MJPEG, "png " for PNG
    * samples. mdat-before-moov keeps chunk offsets independent of the
    * moov size. */
  def encodeFrames(
      frames: Seq[Array[Byte]],
      codec: String,
      fps: Int,
      width: Int,
      height: Int,
      syncEvery: Int = 1,
      sampleEntryExtension: Array[Byte] = Array.emptyByteArray,
      compositionOffsets: Seq[Long] = Nil): Array[Byte] = {
    require(codec.length == 4, s"fourcc must be 4 chars: '$codec'")
    require(frames.nonEmpty && fps > 0)
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length)
      b.put(name.getBytes("US-ASCII"))
      b.put(payload)
      b.array()
    }
    def full(name: String, body: ByteBuffer): Array[Byte] = {
      val payload = new Array[Byte](body.position())
      body.rewind(); body.get(payload)
      box(name, payload)
    }
    val n = frames.length
    val timescale = fps * 1000
    val duration = n.toLong * 1000

    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 1) ++
        "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
    val mdatPayload = frames.toArray.flatten
    val mdat = box("mdat", mdatPayload)
    val firstOffset = ftyp.length + 8 // into mdat payload

    val mvhd = {
      val b = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0) // version+flags
      b.putInt(0); b.putInt(0)
      b.putInt(timescale)
      b.putInt(duration.toInt)
      b.putInt(0x00010000)
      b.put(new Array[Byte](100 - b.position()))
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(7) // version 0, flags: enabled|in-movie|in-preview
      b.putInt(0); b.putInt(0)
      b.putInt(1) // track id
      b.putInt(0)
      b.putInt(duration.toInt)
      b.put(new Array[Byte](8 + 2 + 2 + 2 + 2 + 36))
      b.putInt(width << 16)
      b.putInt(height << 16)
      box("tkhd", b.array())
    }
    val mdhd = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(0); b.putInt(0)
      b.putInt(timescale)
      b.putInt(duration.toInt)
      b.putShort(0x55c4.toShort) // language 'und'
      b.putShort(0)
      full("mdhd", b)
    }
    val hdlr = {
      val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(0)
      b.put("vide".getBytes("US-ASCII"))
      b.put(new Array[Byte](12))
      b.put(0.toByte) // empty name
      full("hdlr", b)
    }
    val stsd = {
      // VisualSampleEntry: 8 (size+fourcc) + 78 bytes of fields
      // + optional child boxes (avcC for avc1)
      val entrySize = 86 + sampleEntryExtension.length
      val entry = ByteBuffer.allocate(entrySize).order(ByteOrder.BIG_ENDIAN)
      entry.putInt(entrySize)
      entry.put(codec.getBytes("US-ASCII"))
      entry.put(new Array[Byte](6)) // reserved
      entry.putShort(1) // data reference index
      entry.put(new Array[Byte](16)) // predefined/reserved
      entry.putShort(width.toShort)
      entry.putShort(height.toShort)
      entry.putInt(0x00480000); entry.putInt(0x00480000) // 72 dpi
      entry.putInt(0)
      entry.putShort(1) // frame count per sample
      entry.put(new Array[Byte](32)) // compressor name
      entry.putShort(24) // depth
      entry.putShort(-1) // predefined
      entry.put(sampleEntryExtension)
      val b = ByteBuffer.allocate(8 + entrySize).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(1) // entry count
      b.put(entry.array())
      full("stsd", b)
    }
    val stts = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(1)
      b.putInt(n)
      b.putInt(1000) // constant per-sample delta
      full("stts", b)
    }
    val stsc = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(1)
      b.putInt(1); b.putInt(1); b.putInt(1) // 1 sample per chunk
      full("stsc", b)
    }
    val stsz = {
      val b = ByteBuffer.allocate(12 + 4 * n).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(0) // variable sizes
      b.putInt(n)
      frames.foreach(f => b.putInt(f.length))
      full("stsz", b)
    }
    val stco = {
      val b = ByteBuffer.allocate(8 + 4 * n).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(n)
      var off = firstOffset.toLong
      frames.foreach { f => b.putInt(off.toInt); off += f.length }
      full("stco", b)
    }
    val syncIdx = (1 to n).filter(i => (i - 1) % syncEvery == 0)
    val stss =
      if (syncEvery <= 1) Array.emptyByteArray
      else {
        val b = ByteBuffer.allocate(8 + 4 * syncIdx.length)
          .order(ByteOrder.BIG_ENDIAN)
        b.putInt(0)
        b.putInt(syncIdx.length)
        syncIdx.foreach(i => { b.putInt(i); () })
        full("stss", b)
      }
    // ctts: per-sample composition offsets (decode order), the B-frame
    // reorder signal; v0 when all offsets are non-negative, v1 (signed)
    // otherwise. One run per sample — fixtures are small.
    val ctts =
      if (compositionOffsets.isEmpty) Array.emptyByteArray
      else {
        require(compositionOffsets.length == n,
          "one composition offset per sample")
        val v: Byte = if (compositionOffsets.forall(_ >= 0)) 0 else 1
        val b = ByteBuffer.allocate(8 + 8 * n).order(ByteOrder.BIG_ENDIAN)
        b.put(v); b.put(0.toByte); b.putShort(0)
        b.putInt(n)
        compositionOffsets.foreach { o => b.putInt(1); b.putInt(o.toInt) }
        full("ctts", b)
      }
    val stbl = box("stbl",
      stsd ++ stts ++ ctts ++ stsc ++ stsz ++ stco ++ stss)
    val vmhd = {
      val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      b.putInt(1) // version 0, flags 1
      b.put(new Array[Byte](8))
      full("vmhd", b)
    }
    val dinf = box("dinf", box("dref", {
      val b = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(1)
      b.putInt(12)
      b.put("url ".getBytes("US-ASCII"))
      b.putInt(1) // self-contained
      b.array()
    }))
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  /** Build a FRAGMENTED MP4 (fMP4, the streaming-origin layout): ftyp
    * + moov with an EMPTY stbl + mvex/trex defaults, then one
    * moof+mdat pair per `samplesPerFragment` samples. Sample geometry
    * lives entirely in trun runs (default-base-is-moof, explicit data
    * offset, per-sample sizes/flags, optional signed composition
    * offsets); sync samples carry clear sample_is_non_sync_sample
    * bits. Same frame bytes as [[encodeFrames]] — a parse-then-slice
    * round trip must be byte-identical between the two layouts. */
  def encodeFramesFragmented(
      frames: Seq[Array[Byte]],
      codec: String,
      fps: Int,
      width: Int,
      height: Int,
      syncEvery: Int = 1,
      sampleEntryExtension: Array[Byte] = Array.emptyByteArray,
      compositionOffsets: Seq[Long] = Nil,
      samplesPerFragment: Int = 4): Array[Byte] = {
    require(codec.length == 4, s"fourcc must be 4 chars: '$codec'")
    require(frames.nonEmpty && fps > 0 && samplesPerFragment >= 1)
    require(compositionOffsets.isEmpty ||
      compositionOffsets.length == frames.length,
      "one composition offset per sample")
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length)
      b.put(name.getBytes("US-ASCII"))
      b.put(payload)
      b.array()
    }
    def full(name: String, body: ByteBuffer): Array[Byte] = {
      val payload = new Array[Byte](body.position())
      body.rewind(); body.get(payload)
      box(name, payload)
    }
    val n = frames.length
    val timescale = fps * 1000
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 1) ++
        "isom".getBytes("US-ASCII") ++ "iso6".getBytes("US-ASCII"))
    val mvhd = {
      val b = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(0); b.putInt(0)
      b.putInt(timescale)
      b.putInt(0) // fragmented: duration unknown in moov
      b.putInt(0x00010000)
      b.put(new Array[Byte](100 - b.position()))
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(7)
      b.putInt(0); b.putInt(0)
      b.putInt(1)
      b.putInt(0)
      b.putInt(0)
      b.put(new Array[Byte](8 + 2 + 2 + 2 + 2 + 36))
      b.putInt(width << 16)
      b.putInt(height << 16)
      box("tkhd", b.array())
    }
    val mdhd = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(0); b.putInt(0)
      b.putInt(timescale)
      b.putInt(0)
      b.putShort(0x55c4.toShort)
      b.putShort(0)
      full("mdhd", b)
    }
    val hdlr = {
      val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(0)
      b.put("vide".getBytes("US-ASCII"))
      b.put(new Array[Byte](12))
      b.put(0.toByte)
      full("hdlr", b)
    }
    val stsd = {
      val entrySize = 86 + sampleEntryExtension.length
      val entry = ByteBuffer.allocate(entrySize).order(ByteOrder.BIG_ENDIAN)
      entry.putInt(entrySize)
      entry.put(codec.getBytes("US-ASCII"))
      entry.put(new Array[Byte](6))
      entry.putShort(1)
      entry.put(new Array[Byte](16))
      entry.putShort(width.toShort)
      entry.putShort(height.toShort)
      entry.putInt(0x00480000); entry.putInt(0x00480000)
      entry.putInt(0)
      entry.putShort(1)
      entry.put(new Array[Byte](32))
      entry.putShort(24)
      entry.putShort(-1)
      entry.put(sampleEntryExtension)
      val b = ByteBuffer.allocate(8 + entrySize).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(1)
      b.put(entry.array())
      full("stsd", b)
    }
    def emptyFull(name: String, extra: Int = 0): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + extra).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0) // version+flags
      b.putInt(0) // entry count
      if (extra > 0) b.put(new Array[Byte](extra - 0))
      full(name, b)
    }
    // stsz has sample_size + count fields
    val stszEmpty = {
      val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0); b.putInt(0); b.putInt(0)
      full("stsz", b)
    }
    val stbl = box("stbl", stsd ++ emptyFull("stts") ++
      emptyFull("stsc") ++ stszEmpty ++ emptyFull("stco"))
    val vmhd = {
      val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      b.putInt(1)
      b.put(new Array[Byte](8))
      full("vmhd", b)
    }
    val dinf = box("dinf", box("dref", {
      val b = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(1)
      b.putInt(12)
      b.put("url ".getBytes("US-ASCII"))
      b.putInt(1)
      b.array()
    }))
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val trex = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)
      b.putInt(1) // track id
      b.putInt(1) // default sample description index
      b.putInt(1000) // default sample duration
      b.putInt(0) // default sample size
      b.putInt(0x10000) // default flags: non-sync
      full("trex", b)
    }
    val mvex = box("mvex", trex)
    val moov = box("moov", mvhd ++ trak ++ mvex)

    val hasCts = compositionOffsets.nonEmpty
    val ctsV: Byte =
      if (hasCts && compositionOffsets.exists(_ < 0)) 1 else 0
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    out.write(moov, 0, moov.length)
    var seq = 1
    var s0 = 0
    while (s0 < n) {
      val cnt = math.min(samplesPerFragment, n - s0)
      val group = (s0 until s0 + cnt).map(frames)
      val mfhd = {
        val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
        b.putInt(0)
        b.putInt(seq)
        full("mfhd", b)
      }
      val tfhd = {
        val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
        b.putInt(0x020000) // version 0, default-base-is-moof
        b.putInt(1) // track id
        full("tfhd", b)
      }
      // trun flags: data-offset | sample-size | sample-flags
      // (+ composition offsets when requested)
      val trunFlags = 0x1 | 0x200 | 0x400 | (if (hasCts) 0x800 else 0)
      val trunSize = 8 + 4 + 4 +
        cnt * (4 + 4 + (if (hasCts) 4 else 0))
      val trun = {
        val b = ByteBuffer.allocate(trunSize).order(ByteOrder.BIG_ENDIAN)
        b.putInt((ctsV.toInt << 24) | trunFlags)
        b.putInt(cnt)
        b.putInt(0) // data offset patched below (after moof size known)
        (0 until cnt).foreach { i =>
          b.putInt(group(i).length)
          val sampleIdx = s0 + i
          val nonSync = (sampleIdx % syncEvery) != 0
          b.putInt(if (nonSync) 0x10000 else 0)
          if (hasCts) b.putInt(compositionOffsets(sampleIdx).toInt)
        }
        full("trun", b)
      }
      val traf = box("traf", tfhd ++ trun)
      val moof = box("moof", mfhd ++ traf)
      // patch trun data_offset: moof start -> first mdat payload byte
      val dataOffset = moof.length + 8
      val trunOffInMoof = 8 + mfhd.length + 8 + tfhd.length + 8 + 8
      val patched = moof.clone()
      val bb = ByteBuffer.wrap(patched).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(trunOffInMoof, dataOffset)
      out.write(patched, 0, patched.length)
      val mdat = box("mdat", group.toArray.flatten)
      out.write(mdat, 0, mdat.length)
      seq += 1
      s0 += cnt
    }
    out.toByteArray
  }
}

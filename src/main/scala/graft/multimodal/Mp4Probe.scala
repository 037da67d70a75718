package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO BMFF (MP4) container probe — real metadata extraction
  * for video binary columns without a native decoder: walks the box
  * tree (big-endian length-prefixed), reads `mvhd` (timescale,
  * duration), `tkhd` (track dimensions), and counts `trak` boxes.
  * This is the metadata the reference pulls via ffprobe/decord
  * (`pack/dataset.py:10-122`) before any frame decode; actual frame
  * decode stays at the pluggable [[graft.pack.FrameSource]] seam.
  *
  * Handles version-0 (32-bit) and version-1 (64-bit) mvhd/tkhd times,
  * skips unknown boxes by size, and tolerates truncated tails — a probe
  * must survive the corrupt shards a 100 TB crawl contains.
  */
object Mp4Probe {

  final case class Mp4Meta(
      timescale: Long,
      duration: Long, // in timescale units
      width: Int,
      height: Int,
      nTracks: Int) {
    def durationSec: Double =
      if (timescale > 0) duration.toDouble / timescale else 0.0
  }

  def probe(bytes: Array[Byte]): Mp4Meta = {
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var nTracks = 0

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val buf = ByteBuffer.wrap(bytes, pos, end - pos)
          .order(ByteOrder.BIG_ENDIAN)
        var size = (buf.getInt().toLong) & 0xffffffffL
        val box = new Array[Byte](4)
        buf.get(box)
        val name = new String(box, "US-ASCII")
        var header = 8
        if (size == 1 && buf.remaining() >= 8) { // 64-bit largesize
          size = buf.getLong()
          header = 16
        } else if (size == 0) size = (end - pos).toLong // box runs to end
        val boxEnd = math.min(end.toLong, pos + size).toInt
        if (size < header) return // corrupt: stop walking this level
        name match {
          case "moov" => walk(pos + header, boxEnd, depth + 1)
          case "trak" =>
            nTracks += 1
            walk(pos + header, boxEnd, depth + 1)
          case "mvhd" if boxEnd - pos >= header + 20 =>
            val b = ByteBuffer.wrap(bytes, pos + header, boxEnd - pos - header)
              .order(ByteOrder.BIG_ENDIAN)
            val version = b.get()
            b.position(b.position() + 3) // flags
            // v1 reads 28 more bytes (8+8+4+8); a truncated v1 box is
            // skipped, not a BufferUnderflow out of probe()
            if (version == 1 && b.remaining() >= 28) {
              b.getLong(); b.getLong() // creation, modification
              timescale = (b.getInt().toLong) & 0xffffffffL
              duration = b.getLong()
            } else if (version == 0) {
              b.getInt(); b.getInt()
              timescale = (b.getInt().toLong) & 0xffffffffL
              duration = (b.getInt().toLong) & 0xffffffffL
            }
          case "tkhd" if boxEnd - pos >= header + 20 =>
            val b = ByteBuffer.wrap(bytes, pos + header, boxEnd - pos - header)
              .order(ByteOrder.BIG_ENDIAN)
            val version = b.get()
            b.position(b.position() + 3)
            // skip to the fixed-point width/height at the box tail:
            // v0: creation+modification+trackId+reserved+duration (20)
            //     + reserved (8) + layer/altgroup/volume/reserved (8)
            //     + matrix (36) = 72 bytes before w/h
            // v1: creation/modification/duration are 64-bit (+12)
            val skip = if (version == 1) 84 else 72
            if (b.remaining() >= skip + 8) {
              b.position(b.position() + skip)
              val w = b.getInt() >>> 16 // 16.16 fixed point
              val h = b.getInt() >>> 16
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case _ => () // skip leaf/unknown boxes
        }
        pos = boxEnd
      }
    }

    walk(0, bytes.length, 0)
    require(timescale > 0 || nTracks > 0, "no moov/mvhd found (not MP4?)")
    Mp4Meta(timescale, duration, width, height, nTracks)
  }

  /** Minimal MP4 writer for tests/fixtures: ftyp + moov(mvhd, trak(tkhd)). */
  def encodeMinimal(
      timescale: Int,
      duration: Long,
      width: Int,
      height: Int): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length)
      b.put(name.getBytes("US-ASCII"))
      b.put(payload)
      b.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 1) ++
        "isom".getBytes("US-ASCII"))
    val mvhd = {
      val b = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0) // version 0 + flags
      b.putInt(0); b.putInt(0) // creation, modification
      b.putInt(timescale)
      b.putInt(duration.toInt)
      b.putInt(0x00010000) // rate 1.0
      // volume + reserved + matrix + predefines + next track id
      b.put(new Array[Byte](100 - b.position()))
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0) // version 0 + flags
      b.putInt(0); b.putInt(0) // creation, modification
      b.putInt(1) // track id
      b.putInt(0) // reserved
      b.putInt(duration.toInt)
      b.put(new Array[Byte](8 + 2 + 2 + 2 + 2 + 36)) // reserved/layer/matrix
      b.putInt(width << 16)
      b.putInt(height << 16)
      box("tkhd", b.array())
    }
    val trak = box("trak", tkhd)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }
}

package graft.multimodal

/** Shared ID3v2 tag framing (ID3v2.3/2.4 header, informal spec):
  * "ID3", 2 version bytes, 1 flags byte, 4 syncsafe size bytes, then
  * `size` bytes of tag payload — plus a 10-byte footer when the flags
  * byte has bit 0x10 set (ID3v2.4 §3.1). Used by both audio walks
  * ([[Mp3Probe]], [[AacProbe]]): a tag is metadata, not corruption, so
  * it must be skipped whole — footer included — rather than scanned as
  * junk. */
object Id3 {

  /** Total leading-tag bytes to skip (0 = no tag). Clamped to the file
    * length so a lying size field can never index past the end. */
  def skipLength(bytes: Array[Byte]): Int = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return 0
    val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
    math.min(bytes.length.toLong, 10L + size + footer).toInt
  }
}

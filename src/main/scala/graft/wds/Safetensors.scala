package graft.wds

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.json4s.{JArray, JInt, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods

/** Pure-JVM `safetensors` codec — the checkpoint/embedding tensor
  * format modern training stacks ship alongside npy/npz (beyond the
  * reference's codec table, which reaches tensors through numpy/torch:
  * `autodecode.py:130-166`; torch `.pth` stays the adjudicated typed
  * error precisely BECAUSE it is an object pickle — safetensors is the
  * format designed to replace it, and it is pure structure).
  *
  * The format is a one-page public spec (huggingface safetensors):
  *
  *   - 8 bytes: little-endian u64 header length `n`;
  *   - `n` bytes: UTF-8 JSON object mapping tensor name →
  *     `{"dtype": "F32", "shape": [..], "data_offsets": [begin, end]}`
  *     plus an optional `"__metadata__"` string map; writers pad the
  *     JSON with trailing spaces (0x20) for 8-byte alignment;
  *   - the byte buffer; offsets are relative to its start. Tensors are
  *     little-endian, C-order, and must tile the buffer exactly
  *     (no gaps, no overlaps — validated on decode like the reference
  *     Rust implementation, so a truncated or doctored file is a typed
  *     error, never a silently misread tensor).
  *
  * No value tables anywhere — unlike mp3/CABAC this is entirely
  * derivable structure, so full decode+encode belongs IN the engine.
  * The encoder emits the canonical layout (metadata first, tensors in
  * buffer order, header space-padded to 8 bytes) and decode∘encode is
  * the identity on every field; SafetensorsSpec additionally pins
  * decode against a byte-literal fixture assembled independently from
  * the spec text, so encode and decode cannot share a self-consistent
  * misreading.
  */
object Safetensors {

  /** Published dtype table (bytes per element). */
  val DtypeSizes: Map[String, Int] = Map(
    "BOOL" -> 1, "U8" -> 1, "I8" -> 1, "F8_E5M2" -> 1, "F8_E4M3" -> 1,
    "I16" -> 2, "U16" -> 2, "F16" -> 2, "BF16" -> 2,
    "I32" -> 4, "U32" -> 4, "F32" -> 4,
    "I64" -> 8, "U64" -> 8, "F64" -> 8)

  /** Reference implementation's header-size ceiling (100 MB). */
  val MaxHeaderBytes: Long = 100L * 1000 * 1000

  final case class TensorInfo(
      dtype: String, shape: Vector[Int], begin: Long, end: Long) {
    def elements: Long = shape.foldLeft(1L)(_ * _)
    def byteLen: Int = (end - begin).toInt
  }

  /** One decoded file: tensors in buffer order + the raw buffer. */
  final case class SafeTensors(
      tensors: Vector[(String, TensorInfo)],
      metadata: Map[String, String],
      buffer: Array[Byte]) {

    def names: Vector[String] = tensors.map(_._1)

    def info(name: String): TensorInfo =
      tensors.collectFirst { case (`name`, i) => i }.getOrElse(
        throw new IllegalArgumentException(s"no tensor '$name'"))

    def data(name: String): Array[Byte] = {
      val i = info(name)
      java.util.Arrays.copyOfRange(buffer, i.begin.toInt, i.end.toInt)
    }

    /** Integer/bool view (I8..I64, U8..U32, BOOL). U64 values above
      * 2^63-1 wrap to negative raw bits — callers needing the full u64
      * range keep the raw buffer (same posture as Npy.toLongs). */
    def toLongs(name: String): Array[Long] = {
      val i = info(name)
      val bb = ByteBuffer.wrap(buffer, i.begin.toInt, i.byteLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      val n = i.elements.toInt
      val out = new Array[Long](n)
      var j = 0
      while (j < n) {
        out(j) = i.dtype match {
          case "BOOL" | "U8" => bb.get() & 0xffL
          case "I8" => bb.get().toLong
          case "I16" => bb.getShort().toLong
          case "U16" => bb.getShort() & 0xffffL
          case "I32" => bb.getInt().toLong
          case "U32" => bb.getInt() & 0xffffffffL
          case "I64" | "U64" => bb.getLong()
          case other => throw new IllegalArgumentException(
            s"not an integer dtype: $other")
        }
        j += 1
      }
      out
    }

    /** Floating view (F16/BF16/F32/F64 — the f8 variants stay raw:
      * their views would need a use case before an encoding choice). */
    def toDoubles(name: String): Array[Double] = {
      val i = info(name)
      val bb = ByteBuffer.wrap(buffer, i.begin.toInt, i.byteLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      val n = i.elements.toInt
      val out = new Array[Double](n)
      var j = 0
      while (j < n) {
        out(j) = i.dtype match {
          case "F64" => bb.getDouble()
          case "F32" => bb.getFloat().toDouble
          case "F16" => halfToFloat(bb.getShort() & 0xffff).toDouble
          // BF16 is the top 16 bits of an IEEE f32
          case "BF16" =>
            java.lang.Float.intBitsToFloat(
              (bb.getShort() & 0xffff) << 16).toDouble
          case other => throw new IllegalArgumentException(
            s"not a float dtype: $other")
        }
        j += 1
      }
      out
    }
  }

  /** IEEE 754 binary16 → binary32 (the published bit manipulation). */
  private[wds] def halfToFloat(h: Int): Float = {
    val sign = (h >> 15) & 0x1
    val exp = (h >> 10) & 0x1f
    val frac = h & 0x3ff
    val bits =
      if (exp == 0x1f) (sign << 31) | 0x7f800000 | (frac << 13)
      else if (exp != 0) (sign << 31) | ((exp + 112) << 23) | (frac << 13)
      else if (frac == 0) sign << 31
      else { // subnormal: normalize
        var e = -1
        var f = frac
        while ((f & 0x400) == 0) { f <<= 1; e += 1 }
        (sign << 31) | ((113 - e - 1) << 23) | ((f & 0x3ff) << 13)
      }
    java.lang.Float.intBitsToFloat(bits)
  }

  /** IEEE 754 binary32 → binary16, round-to-nearest-even (the inverse
    * published bit manipulation; mantissa carry propagates into the
    * exponent naturally, including subnormal → smallest normal). */
  private[wds] def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val exp = (bits >>> 23) & 0xff
    val man = bits & 0x7fffff
    val h =
      if (exp == 0xff) // inf/nan (keep a nan payload bit)
        sign | 0x7c00 | (if (man != 0) 0x200 | (man >>> 13) else 0)
      else {
        val e = exp - 127 + 15
        if (e >= 0x1f) sign | 0x7c00 // overflow → inf
        else if (e <= 0) {
          if (e < -10) sign // underflow → signed zero
          else { // subnormal: implicit 1, drop (14 - e) bits with RNE
            val m = man | 0x800000
            val shift = 14 - e
            val half = m >>> shift
            val rem = m & ((1 << shift) - 1)
            val mid = 1 << (shift - 1)
            sign | (if (rem > mid || (rem == mid && (half & 1) == 1))
              half + 1 else half)
          }
        } else { // normal: drop 13 mantissa bits with RNE
          val half = man >>> 13
          val rem = man & 0x1fff
          val base = sign | (e << 10) | half
          if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) base + 1
          else base
        }
      }
    h.toShort
  }

  /** Convenience builders for the numeric tensor shapes a pipeline
    * writes (always little-endian C-order, per the spec). */
  def fromLongs(vals: Array[Long], shape: Vector[Int]): Tensor = {
    val bb = ByteBuffer.allocate(8 * vals.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putLong)
    Tensor("I64", shape, bb.array())
  }

  def fromFloats(vals: Array[Float], shape: Vector[Int]): Tensor = {
    val bb = ByteBuffer.allocate(4 * vals.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putFloat)
    Tensor("F32", shape, bb.array())
  }

  def fromHalves(vals: Array[Float], shape: Vector[Int]): Tensor = {
    val bb = ByteBuffer.allocate(2 * vals.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(v => bb.putShort(floatToHalf(v)))
    Tensor("F16", shape, bb.array())
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"safetensors: $msg")

  // overflow-safe element-count × item-size product: dims ≤ 2^31, so a
  // pairwise product can reach 2^62 — cap the running product at the
  // buffer ceiling before it can wrap (shared by decode and encode so
  // a pathological 3+-dim shape can never wrap Long and coincidentally
  // match a data length)
  private def checkedByteSize(name: String, shape: Seq[Int],
      itemSize: Int): Long =
    shape.foldLeft(itemSize.toLong) { (acc, d) =>
      val p = acc * d
      if (d != 0 && (p / d != acc || p > Int.MaxValue.toLong * 8))
        fail(s"$name: shape ${shape.mkString("[", ",", "]")} overflows")
      p
    }

  def decode(bytes: Array[Byte]): SafeTensors = {
    if (bytes.length < 8) fail(s"file shorter than the 8-byte length")
    val n = ByteBuffer.wrap(bytes, 0, 8)
      .order(ByteOrder.LITTLE_ENDIAN).getLong()
    if (n < 2) fail(s"header length $n below the minimal '{}'")
    if (n > MaxHeaderBytes) fail(s"header length $n exceeds the " +
      s"$MaxHeaderBytes-byte reference ceiling")
    if (8 + n > bytes.length) fail(
      s"header length $n overruns the ${bytes.length}-byte file")
    val headerStr = new String(bytes, 8, n.toInt, UTF_8)
    val json = JsonMethods.parseOpt(headerStr).getOrElse(
      fail("header is not valid JSON"))
    val fields = json match {
      case JObject(fs) => fs
      case _ => fail("header is not a JSON object")
    }
    val bufStart = (8 + n).toInt
    val bufLen = bytes.length - bufStart
    var metadata = Map.empty[String, String]
    val infos = Vector.newBuilder[(String, TensorInfo)]
    fields.foreach {
      case ("__metadata__", JObject(ms)) =>
        metadata = ms.map {
          case (k, JString(v)) => k -> v
          case (k, other) => fail(s"__metadata__.$k is not a string: $other")
        }.toMap
      case ("__metadata__", other) =>
        fail(s"__metadata__ is not an object: $other")
      case (name, JObject(t)) =>
        val m = t.toMap
        def jint(v: JValue, what: String): Long = v match {
          case JInt(x) if x >= 0 && x <= Long.MaxValue => x.toLong
          case other => fail(s"$name.$what: bad value $other")
        }
        val dtype = m.getOrElse("dtype", fail(s"$name: missing dtype")) match {
          case JString(d) => d
          case other => fail(s"$name.dtype: $other")
        }
        val itemSize = DtypeSizes.getOrElse(dtype,
          fail(s"$name: unknown dtype '$dtype'"))
        val shape = m.getOrElse("shape", fail(s"$name: missing shape")) match {
          case JArray(ds) => ds.map { d =>
            val v = jint(d, "shape")
            // a dim past the 2 GiB byte ceiling can never tile a JVM
            // buffer — fail typed instead of truncating via toInt
            if (v > Int.MaxValue) fail(s"$name: shape dim $v too large")
            v.toInt
          }.toVector
          case other => fail(s"$name.shape: $other")
        }
        val (begin, end) =
          m.getOrElse("data_offsets", fail(s"$name: missing offsets")) match {
            case JArray(List(b, e)) =>
              (jint(b, "data_offsets"), jint(e, "data_offsets"))
            case other => fail(s"$name.data_offsets: $other")
          }
        if (begin > end || end > bufLen)
          fail(s"$name: offsets [$begin,$end) outside the $bufLen-byte buffer")
        val want = checkedByteSize(name, shape, itemSize)
        if (end - begin != want)
          fail(s"$name: ${end - begin} bytes for dtype $dtype shape " +
            s"${shape.mkString("[", ",", "]")} (want $want)")
        infos += name -> TensorInfo(dtype, shape, begin, end)
      case (name, other) => fail(s"$name is not an object: $other")
    }
    val built = infos.result()
    // duplicate JSON keys deserialize ambiguously (the reference Rust
    // loader's map keeps one and then fails tile validation) — reject
    val dup = built.groupBy(_._1).collectFirst { case (n, vs)
      if vs.size > 1 => n }
    dup.foreach(n => fail(s"duplicate tensor name '$n'"))
    val sorted = built.sortBy(_._2.begin)
    // the reference validation: tensors tile the buffer exactly
    var cursor = 0L
    sorted.foreach { case (name, i) =>
      if (i.begin != cursor)
        fail(s"$name: buffer gap/overlap at byte $cursor (begin ${i.begin})")
      cursor = i.end
    }
    if (cursor != bufLen)
      fail(s"buffer has $bufLen bytes but tensors cover $cursor")
    SafeTensors(sorted, metadata,
      java.util.Arrays.copyOfRange(bytes, bufStart, bytes.length))
  }

  /** Input tensor for [[encode]]: raw little-endian C-order bytes. */
  final case class Tensor(dtype: String, shape: Vector[Int],
      data: Array[Byte])

  def encode(tensors: Seq[(String, Tensor)],
      metadata: Map[String, String] = Map.empty): Array[Byte] = {
    val dupName = tensors.groupBy(_._1).collectFirst { case (n, vs)
      if vs.size > 1 => n }
    dupName.foreach(n => fail(s"duplicate tensor name '$n'"))
    var cursor = 0L
    val fields = List.newBuilder[(String, JValue)]
    if (metadata.nonEmpty)
      fields += "__metadata__" -> JObject(
        metadata.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) })
    tensors.foreach { case (name, t) =>
      if (name == "__metadata__") fail("'__metadata__' is a reserved name")
      val itemSize = DtypeSizes.getOrElse(t.dtype,
        fail(s"$name: unknown dtype '${t.dtype}'"))
      if (t.shape.exists(_ < 0)) fail(s"$name: negative shape")
      val want = checkedByteSize(name, t.shape, itemSize)
      if (t.data.length != want)
        fail(s"$name: ${t.data.length} bytes for dtype ${t.dtype} shape " +
          s"${t.shape.mkString("[", ",", "]")} (want $want)")
      fields += name -> JObject(List(
        "dtype" -> JString(t.dtype),
        "shape" -> JArray(t.shape.map(d => JInt(BigInt(d))).toList),
        "data_offsets" -> JArray(List(
          JInt(BigInt(cursor)), JInt(BigInt(cursor + t.data.length))))))
      cursor += t.data.length
    }
    val json = JsonMethods.compact(
      JsonMethods.render(JObject(fields.result()))).getBytes(UTF_8)
    // canonical writers space-pad the header to 8-byte alignment
    val pad = (8 - (json.length % 8)) % 8
    val total = 8L + json.length + pad + cursor
    if (total > Int.MaxValue) // Array[Byte] ceiling — typed, not a wrap
      fail(s"encoded size $total exceeds the 2 GiB single-file ceiling")
    val out = ByteBuffer.allocate(total.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(json.length.toLong + pad)
    out.put(json)
    var p = 0
    while (p < pad) { out.put(' '.toByte); p += 1 }
    tensors.foreach { case (_, t) => out.put(t.data) }
    out.array()
  }
}

package graft.wds

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Pure-JVM NumPy `.npy` / `.npz` codec — the reference's npy decode
  * rows (`webdataset-private/webdataset/autodecode.py:130-166`:
  * `numpy.lib.format.read_array` / `np.load`) and encode rows
  * (`writer.py:88-111`: `numpy.lib.format.write_array` /
  * `np.savez_compressed`). The format is a public pure-structure spec
  * (numpy NEP 1 / `numpy.lib.format`): magic `\x93NUMPY`, version,
  * little-endian header length, an ASCII Python-dict header
  * (`descr`/`fortran_order`/`shape`) padded to 64-byte alignment with
  * a trailing newline, then the raw element buffer. `.npz` is a zip of
  * `<name>.npy` members.
  *
  * Decoded arrays stay close to the wire — dtype string, shape, raw
  * buffer — with typed views ([[NpyArray.toLongs]]/[[NpyArray.toDoubles]])
  * for the numeric dtypes a sample stream carries (bool, i1–i8, u1–u8,
  * f4/f8, either endianness). The encoder writes version-1.0 headers
  * byte-identical to `numpy.lib.format.write_array` (spec-pinned
  * against numpy-generated fixtures in NpySpec), so packed shards are
  * bit-reproducible across engines.
  */
object Npy {

  /** One decoded array: `descr` is the numpy dtype string (`"<i8"`),
    * `data` the raw element buffer in storage order (`fortranOrder`
    * tells column-major). */
  final case class NpyArray(
      descr: String,
      fortranOrder: Boolean,
      shape: Vector[Int],
      data: Array[Byte]) {

    def elements: Long = shape.foldLeft(1L)(_ * _)

    def itemSize: Int = Npy.itemSize(descr)

    private def order: ByteOrder =
      if (descr.startsWith(">")) ByteOrder.BIG_ENDIAN
      else ByteOrder.LITTLE_ENDIAN

    private def kind: Char = descr.dropWhile("<>|=".contains(_)).head

    /** Integer/bool view in storage order. u8 values above 2^63-1 wrap
      * to negative raw bits (callers needing full u64 range keep the
      * raw buffer). */
    def toLongs: Array[Long] = {
      require("biu".contains(kind), s"not an integer dtype: $descr")
      val bb = ByteBuffer.wrap(data).order(order)
      val n = elements.toInt
      val out = new Array[Long](n)
      val sz = itemSize
      val unsigned = kind == 'u'
      var i = 0
      while (i < n) {
        out(i) = sz match {
          case 1 =>
            val v = bb.get(i).toLong
            if (unsigned || kind == 'b') v & 0xffL else v
          case 2 =>
            val v = bb.getShort(i * 2).toLong
            if (unsigned) v & 0xffffL else v
          case 4 =>
            val v = bb.getInt(i * 4).toLong
            if (unsigned) v & 0xffffffffL else v
          case 8 => bb.getLong(i * 8)
          case other =>
            throw new IllegalArgumentException(s"int width $other")
        }
        i += 1
      }
      out
    }

    /** Float view in storage order (f4 widened exactly to f8). */
    def toDoubles: Array[Double] = {
      require(kind == 'f', s"not a float dtype: $descr")
      val bb = ByteBuffer.wrap(data).order(order)
      val n = elements.toInt
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (itemSize == 4) bb.getFloat(i * 4).toDouble
          else bb.getDouble(i * 8)
        i += 1
      }
      out
    }
  }

  /** dtype width in bytes from the descr's trailing digits. */
  def itemSize(descr: String): Int = {
    val core = descr.dropWhile("<>|=".contains(_))
    require(core.nonEmpty && "biuf".contains(core.head),
      s"unsupported dtype $descr (numeric b/i/u/f only)")
    val sz = core.drop(1)
    require(sz.nonEmpty && sz.forall(_.isDigit), s"bad dtype $descr")
    sz.toInt
  }

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  def isNpy(b: Array[Byte]): Boolean =
    b.length >= 8 && Magic.indices.forall(i => b(i) == Magic(i))

  private val DescrRe = """'descr'\s*:\s*'([^']*)'""".r
  private val FortranRe = """'fortran_order'\s*:\s*(True|False)""".r
  private val ShapeRe = """'shape'\s*:\s*\(([^)]*)\)""".r

  def decode(bytes: Array[Byte]): NpyArray = {
    require(isNpy(bytes), "not an NPY stream (bad magic)")
    require(bytes.length >= 12, s"npy truncated at ${bytes.length} bytes")
    val major = bytes(6) & 0xff
    require(major >= 1 && major <= 3, s"npy version $major")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (headerLen, headerOff) =
      if (major == 1) ((bb.getShort(8) & 0xffff, 10))
      else (bb.getInt(8), 12)
    // Long arithmetic: a crafted v2/v3 headerLen near Int.MaxValue
    // would wrap `headerOff + headerLen` negative, pass an Int-typed
    // check, and escape as StringIndexOutOfBounds — outside the typed
    // failure class the wds handler policy routes
    require(headerLen >= 0 &&
      headerOff.toLong + headerLen.toLong <= bytes.length.toLong,
      s"npy header overruns ($headerLen)")
    val header =
      new String(bytes, headerOff, headerLen, US_ASCII)
    val descr = DescrRe.findFirstMatchIn(header)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing descr: $header"))
    val fortran = FortranRe.findFirstMatchIn(header)
      .exists(_.group(1) == "True")
    val shape = ShapeRe.findFirstMatchIn(header)
      .map(_.group(1).split(',').toVector.map(_.trim)
        .filter(_.nonEmpty).map(_.toInt))
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing shape: $header"))
    // a crafted shape like (-2, -4) has a POSITIVE element product and
    // would pass the buffer-length check below with nonsense dims
    require(shape.forall(_ >= 0),
      s"npy negative shape dim: ${shape.mkString("x")}")
    val dataOff = headerOff + headerLen
    val arr = NpyArray(descr, fortran, shape,
      java.util.Arrays.copyOfRange(bytes, dataOff, bytes.length))
    require(arr.elements * itemSize(descr) == arr.data.length,
      s"npy buffer ${arr.data.length} != ${arr.elements} x " +
        s"${itemSize(descr)} for shape ${shape.mkString("x")}")
    arr
  }

  /** Version-1.0 encode, byte-identical to numpy's `write_array`:
    * dict text with numpy's exact spacing and trailing comma, space
    * padding to 64-byte total alignment, terminating newline. */
  def encode(arr: NpyArray): Array[Byte] = {
    require(arr.elements * arr.itemSize == arr.data.length,
      s"buffer ${arr.data.length} != ${arr.elements} x ${arr.itemSize}")
    val shapeRepr = arr.shape match {
      case Vector() => "()"
      case Vector(n) => s"($n,)"
      case more => more.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '${arr.descr}', 'fortran_order': " +
      s"${if (arr.fortranOrder) "True" else "False"}, " +
      s"'shape': $shapeRepr, }"
    val unpadded = Magic.length + 2 + 2 + dict.length + 1
    val padded = ((unpadded + 63) / 64) * 64
    val headerLen = padded - Magic.length - 4
    require(headerLen <= 0xffff, "header too large for npy v1")
    val out = new ByteArrayOutputStream(padded + arr.data.length)
    out.write(Magic)
    out.write(1); out.write(0) // version 1.0
    out.write(headerLen & 0xff); out.write((headerLen >> 8) & 0xff)
    out.write(dict.getBytes(US_ASCII))
    var pad = padded - unpadded
    while (pad > 0) { out.write(' '); pad -= 1 }
    out.write('\n')
    out.write(arr.data)
    out.toByteArray
  }

  def fromLongs(values: Array[Long], shape: Vector[Int],
      descr: String = "<i8"): NpyArray = {
    val sz = itemSize(descr)
    require(descr.startsWith("<") || sz == 1,
      s"fromLongs writes little-endian ($descr)")
    val bb = ByteBuffer.allocate(values.length * sz)
      .order(ByteOrder.LITTLE_ENDIAN)
    values.foreach { v =>
      sz match {
        case 1 => bb.put(v.toByte)
        case 2 => bb.putShort(v.toShort)
        case 4 => bb.putInt(v.toInt)
        case 8 => bb.putLong(v)
      }
    }
    NpyArray(descr, fortranOrder = false, shape, bb.array())
  }

  def fromDoubles(values: Array[Double], shape: Vector[Int],
      descr: String = "<f8"): NpyArray = {
    val sz = itemSize(descr)
    val bb = ByteBuffer.allocate(values.length * sz)
      .order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(v =>
      if (sz == 4) bb.putFloat(v.toFloat) else bb.putDouble(v))
    NpyArray(descr, fortranOrder = false, shape, bb.array())
  }

  // -------------------------------------------------------------- npz

  /** Zip-of-npy decode (`np.load` over an npz): member order
    * preserved, `.npy` suffix stripped from names. Handles both
    * stored and deflated members (savez vs savez_compressed). */
  def decodeNpz(bytes: Array[Byte]): Vector[(String, NpyArray)] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[(String, NpyArray)]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val name = e.getName.stripSuffix(".npy")
          out += (name -> decode(zin.readAllBytes()))
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Zip-of-npy encode (the `np.savez` shape: one deflated
    * `<name>.npy` member per entry, member order = input order). */
  def encodeNpz(entries: Seq[(String, NpyArray)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    try entries.foreach { case (name, arr) =>
      zout.putNextEntry(new ZipEntry(s"$name.npy"))
      zout.write(encode(arr))
      zout.closeEntry()
    } finally zout.close()
    bos.toByteArray
  }
}

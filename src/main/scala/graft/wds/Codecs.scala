package graft.wds

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import javax.imageio.ImageIO

/** Extension-dispatch codec registry — the reference's autodecode /
  * encode tables (`webdataset-private/webdataset/autodecode.py:145-192`,
  * `writer.py:135-233`) as a pluggable `Map[ext, Codec]`:
  *
  *  - `txt`/`text`/`transcript` → UTF-8 String
  *  - `cls`/`cls2`/`index`/`inx`/`id`/`count` → Int (decimal text)
  *  - `json`/`jsn` → JSON string (structured parse happens at the
  *    DataFrame level with `from_json` + explicit schema — keeping schema
  *    declaration in Catalyst, not in the codec)
  *  - `png`/`jpg`/`jpeg`/`ppm` → [[ImageData]] via javax.imageio
  *  - `npy`/`npz` → [[graft.wds.Npy.NpyArray]] tensors
  *    (`autodecode.py:130-135,164-165`)
  *  - `mp`/`msg`/`msgpack`/`cbor` → structured values via the pure-JVM
  *    [[Msgpack]]/[[Cbor]] codecs (`autodecode.py:158-166`)
  *  - `*.gz` → transparent gunzip pre-pass then re-dispatch
  *    (`autodecode.py:135-142`)
  *
  * Remaining opaque rows, deliberately: `pyd`/`pickle`/`pth` execute
  * arbitrary Python/torch unpicklers (a JVM re-implementation would be
  * both unsafe and out of scope), and `tenbin`'s role (fast columnar
  * batches) is Spark's own Arrow/Tungsten layer here.
  */
object Codecs {

  // ImageIO's default stream cache is a TEMP FILE per encode/decode —
  // at tens of thousands of small frames per partition that is an fd +
  // disk-churn hot spot; all our streams are in-memory byte arrays, so
  // cache in heap instead (process-wide, set once)
  ImageIO.setUseCache(false)

  /** Decoded image sample, aligned with Spark's image schema fields. */
  final case class ImageData(
      height: Int,
      width: Int,
      nChannels: Int,
      mode: String,
      data: Array[Byte])

  sealed trait Decoded
  object Decoded {
    final case class Text(value: String) extends Decoded
    final case class Num(value: Long) extends Decoded
    final case class Json(value: String) extends Decoded
    final case class Image(value: ImageData) extends Decoded
    final case class Tensor(value: Npy.NpyArray) extends Decoded
    final case class TensorZip(value: Vector[(String, Npy.NpyArray)])
        extends Decoded
    /** structured msgpack/cbor value (the [[Cbor]]/[[Msgpack]] JVM
      * value model: Long/String/bytes/Vector/order-preserving map) */
    final case class Packed(value: Any) extends Decoded
    final case class SafeT(value: Safetensors.SafeTensors) extends Decoded
    final case class Raw(value: Array[Byte]) extends Decoded
  }
  import Decoded._

  def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  /** Cheap (height, width) probe from container headers — PNG IHDR and
    * JPEG SOFn — without a full pixel decode: the tokenize stage checks
    * every image against the 1280px cap, and the common case (no
    * resize) should cost a header read, not an ImageIO decode. None →
    * caller falls back to the full decode. */
  def imageDims(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') {
      val bb = java.nio.ByteBuffer.wrap(b, 16, 8)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val w = bb.getInt()
      val h = bb.getInt()
      if (w > 0 && h > 0) Some((h, w)) else None
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk JPEG segments to the first frame header (SOF0..15 minus
      // the non-frame C4/C8/CC)
      var i = 2
      var res: Option[(Int, Int)] = None
      var bad = false
      while (res.isEmpty && !bad && i + 9 < b.length) {
        if (u8(i) != 0xff) bad = true
        else {
          val marker = u8(i + 1)
          if (marker == 0xff) i += 1 // fill byte
          else if ((marker >= 0xd0 && marker <= 0xd9) || marker == 0x01)
            i += 2 // standalone markers
          else {
            val len = u16(i + 2)
            if (len < 2) bad = true
            else {
              if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc &&
                len >= 7)
                res = Some((u16(i + 5), u16(i + 7)))
              i += 2 + len
            }
          }
        }
      }
      res
    } else None
  }

  def decodeImage(b: Array[Byte]): ImageData = {
    // pure-JVM fast path for the common 8-bit non-interlaced PNGs —
    // ImageIO's per-call stream/plugin overhead dominates tiny-frame
    // pipelines; palette/16-bit/interlaced fall through to ImageIO
    if (Png.isPng(b)) Png.decode(b) match {
      case Some(img) => return img
      case None => ()
    }
    val decoded = ImageIO.read(new ByteArrayInputStream(b))
    require(decoded != null, "undecodable image")
    // palette/indexed images report 3 color components but carry only 1
    // raster band — getPixel would leave stale garbage in the remaining
    // channels; redraw into a standard layout first
    val img =
      if (decoded.getColorModel.getNumComponents ==
        decoded.getRaster.getNumBands) decoded
      else {
        val t = decoded.getColorModel.getNumComponents match {
          case 4 => java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
          case _ => java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        }
        val conv = new java.awt.image.BufferedImage(
          decoded.getWidth, decoded.getHeight, t)
        val g = conv.createGraphics()
        g.drawImage(decoded, 0, 0, null)
        g.dispose()
        conv
      }
    val h = img.getHeight
    val w = img.getWidth
    val ch = img.getColorModel.getNumComponents
    val mode = ch match {
      case 1 => "L"
      case 3 => "RGB"
      case 4 => "RGBA"
      case n => s"C$n"
    }
    // row-major interleaved bytes, matching the reference's numpy u8 layout
    val out = new Array[Byte](h * w * ch)
    val raster = img.getRaster
    val px = new Array[Int](ch)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.getPixel(x, y, px)
        var c = 0
        while (c < ch) { out(i) = px(c).toByte; i += 1; c += 1 }
        x += 1
      }
      y += 1
    }
    ImageData(h, w, ch, mode, out)
  }

  /** Nearest-neighbor resize with exact integer source mapping
    * (sx = ⌊x·srcW/dstW⌋ — truncating division over non-negatives, so
    * any engine's integer `//` replays it; mm07 content-checks every
    * output pixel against a DuckDB replay). Nearest is the
    * augmentation-grade kernel; bilinear/Lanczos live behind the same
    * signature when the training recipe wants them — the Spark-side
    * plumbing (binary column in, binary column out, per-partition
    * kernel) is identical. */
  def resizeNearest(img: ImageData, dstW: Int, dstH: Int): ImageData = {
    require(dstW > 0 && dstH > 0, s"bad target ${dstW}x$dstH")
    val out = new Array[Byte](dstW * dstH * img.nChannels)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * img.height / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * img.width / dstW).toInt
        var c = 0
        while (c < img.nChannels) {
          out((y * dstW + x) * img.nChannels + c) =
            img.data((sy * img.width + sx) * img.nChannels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    ImageData(dstH, dstW, img.nChannels, img.mode, out)
  }

  def encodeImage(img: ImageData, format: String = "png"): Array[Byte] = {
    if (format == "png" || format == "PNG") return Png.encode(img)
    import java.awt.image.BufferedImage
    val t = img.nChannels match {
      case 1 => BufferedImage.TYPE_BYTE_GRAY
      case 3 => BufferedImage.TYPE_3BYTE_BGR
      case 4 => BufferedImage.TYPE_4BYTE_ABGR
      case n => throw new IllegalArgumentException(s"channels $n")
    }
    val bi = new BufferedImage(img.width, img.height, t)
    val px = new Array[Int](img.nChannels)
    var i = 0
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        var c = 0
        while (c < img.nChannels) { px(c) = img.data(i) & 0xff; i += 1; c += 1 }
        bi.getRaster.setPixel(x, y, px)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(bi, format, bos)
    bos.toByteArray
  }

  /** F9 image-spec dispatch (`autodecode.py:238-363`): spec strings are
    * storage+dtype+mode, e.g. "rgb8", "l8", "pilrgb", "torchrgba". On
    * the JVM there is one storage (ImageData) — the meaningful axes are
    * mode (l/rgb/rgba) and dtype (8 = u8; absent = float, which is a
    * consumer-side u8/255 view). */
  final case class ImageSpec(storage: String, mode: String, u8: Boolean)

  def parseImageSpec(spec: String): ImageSpec = {
    val s0 = spec.toLowerCase(java.util.Locale.ROOT)
    val (storage, rest) = Seq("pil", "torch", "numpy").find(s0.startsWith)
      .map(p => (p, s0.stripPrefix(p))).getOrElse(("numpy", s0))
    val u8 = rest.endsWith("8")
    val mode = rest.stripSuffix("8") match {
      case "" => "RGB"
      case "l" => "L"
      case "rgb" => "RGB"
      case "rgba" => "RGBA"
      case other =>
        throw new IllegalArgumentException(s"image spec $spec ($other)")
    }
    ImageSpec(storage, mode, u8)
  }

  /** Convert a decoded image between L / RGB / RGBA (BT.601 luma for
    * →L; opaque alpha for →RGBA), as the reference's mode handlers do. */
  def convertMode(img: ImageData, mode: String): ImageData = {
    if (img.mode == mode) return img
    val n = img.height * img.width
    val inCh = img.nChannels
    val outCh = mode match {
      case "L" => 1
      case "RGB" => 3
      case "RGBA" => 4
      case other => throw new IllegalArgumentException(s"mode $other")
    }
    val out = new Array[Byte](n * outCh)
    var i = 0
    while (i < n) {
      val r = img.data(i * inCh) & 0xff
      val g = if (inCh >= 3) img.data(i * inCh + 1) & 0xff else r
      val b = if (inCh >= 3) img.data(i * inCh + 2) & 0xff else r
      val a = if (inCh == 4) img.data(i * inCh + 3) & 0xff else 255
      mode match {
        case "L" =>
          out(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
        case "RGB" =>
          out(i * 3) = r.toByte; out(i * 3 + 1) = g.toByte
          out(i * 3 + 2) = b.toByte
        case "RGBA" =>
          out(i * 4) = r.toByte; out(i * 4 + 1) = g.toByte
          out(i * 4 + 2) = b.toByte; out(i * 4 + 3) = a.toByte
      }
      i += 1
    }
    ImageData(img.height, img.width, outCh, mode, out)
  }

  /** Spec-driven decode: `decodeImageSpec("rgb8", bytes)` ≈ the
    * reference's `decode("pilrgb")` stage. */
  def decodeImageSpec(spec: String, bytes: Array[Byte]): ImageData =
    convertMode(decodeImage(bytes), parseImageSpec(spec).mode)

  /** Float image view — the dtype axis of the F9 spec table
    * (`autodecode.py:238-363`): specs WITHOUT the `8` suffix produce
    * float arrays scaled to [0,1] (`img.astype("f") / 255.0`). */
  final case class FloatImageData(
      height: Int, width: Int, nChannels: Int, mode: String,
      data: Array[Float])

  def toFloat(img: ImageData): FloatImageData =
    FloatImageData(img.height, img.width, img.nChannels, img.mode,
      img.data.map(b => (b & 0xff) / 255.0f))

  /** The COMPLETE spec-table decode: u8 specs (e.g. "rgb8", "torchl8")
    * land Left(u8 planes); float specs (e.g. "rgb", "pill") land
    * Right(/255 float planes) — both mode-converted first. */
  def decodeImageSpecAny(
      spec: String,
      bytes: Array[Byte]): Either[ImageData, FloatImageData] = {
    val parsed = parseImageSpec(spec)
    val img = convertMode(decodeImage(bytes), parsed.mode)
    if (parsed.u8) Left(img) else Right(toFloat(img))
  }

  private val textExts = Set("txt", "text", "transcript", "html")
  private val intExts = Set("cls", "cls2", "index", "inx", "id", "count")
  private val jsonExts = Set("json", "jsn")
  private val imageExts = Set("png", "jpg", "jpeg", "ppm", "pgm", "pbm", "bmp")
  private val msgpackExts = Set("mp", "msg", "msgpack")
  private val pickleExts = Set("pyd", "pickle")

  /** Decode one entry by its (possibly dotted) extension; the dispatch
    * key is the LAST dot-component, after a `.gz` pre-pass — matching the
    * reference's `Continue`-chaining gz handler. */
  def decode(ext: String, bytes: Array[Byte]): Decoded = {
    if (ext == "gz" || ext.endsWith(".gz")) {
      val inner = if (ext == "gz") "" else ext.stripSuffix(".gz")
      val last = inner.split("\\.").lastOption.getOrElse("")
      return decode(last, gunzip(bytes))
    }
    val last = ext.split("\\.").lastOption.getOrElse("")
    if (textExts(last)) Text(new String(bytes, UTF_8))
    else if (intExts(last)) Num(new String(bytes, UTF_8).trim.toLong)
    else if (jsonExts(last)) Json(new String(bytes, UTF_8))
    else if (imageExts(last)) Image(decodeImage(bytes))
    else if (last == "npy") Tensor(Npy.decode(bytes))
    else if (last == "npz") TensorZip(Npy.decodeNpz(bytes))
    else if (msgpackExts(last)) Packed(Msgpack.decode(bytes))
    else if (last == "cbor") Packed(Cbor.decode(bytes))
    // plain-data pickles (`autodecode.py:156-157`); object pickles
    // raise the typed pth-adjudication error inside Pickle.decode
    else if (pickleExts(last)) Packed(Pickle.decode(bytes))
    // the pure-structure checkpoint/tensor format that replaces the
    // adjudicated-out object-pickle `.pth` (see Safetensors scaladoc)
    else if (last == "safetensors") SafeT(Safetensors.decode(bytes))
    else Raw(bytes)
  }

  /** Encode mirror (`writer.py:135-233`): typed value → bytes by
    * extension convention. */
  def encode(ext: String, value: Any): Array[Byte] = {
    val last = ext.split("\\.").lastOption.getOrElse("")
    value match {
      // before the raw-bytes passthrough: the reference's pyd/pickle
      // handler pickles EVERY value, bytes included (writer.py:148)
      case v if pickleExts(last) => Pickle.encode(v)
      case b: Array[Byte] => b
      case arr: Npy.NpyArray if last == "npy" => Npy.encode(arr)
      case entries: Seq[_] if last == "npz" =>
        Npy.encodeNpz(entries.map {
          case (name: String, arr: Npy.NpyArray) => (name, arr)
          case other => throw new IllegalArgumentException(
            s"npz entry must be (String, NpyArray), got $other")
        })
      // the natural analog of np.savez(**data) and of toMap'd decode
      // output; sorted keys for a stable member order
      case m: Map[_, _] if last == "npz" =>
        Npy.encodeNpz(m.toSeq.map {
          case (name: String, arr: Npy.NpyArray) => (name, arr)
          case other => throw new IllegalArgumentException(
            s"npz entry must be (String, NpyArray), got $other")
        }.sortBy(_._1))
      case v if msgpackExts(last) => Msgpack.encode(v)
      case v if last == "cbor" => Cbor.encode(v)
      case entries: Seq[_] if last == "safetensors" =>
        Safetensors.encode(entries.map {
          case (name: String, t: Safetensors.Tensor) => (name, t)
          case other => throw new IllegalArgumentException(
            s"safetensors entry must be (String, Tensor), got $other")
        })
      case s: String => s.getBytes(UTF_8)
      case i: Int => i.toString.getBytes(UTF_8)
      case l: Long => l.toString.getBytes(UTF_8)
      case img: ImageData if imageExts(last) =>
        encodeImage(img, if (last == "jpg") "jpeg" else last)
      case other =>
        throw new IllegalArgumentException(
          s"no encoder for ${other.getClass} at extension $ext")
    }
  }
}

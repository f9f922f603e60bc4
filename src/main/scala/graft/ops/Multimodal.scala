package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque `binary`
  * columns plus typed metadata extracted by a partition-wise decode.
  *
  * Metadata decode is REAL for the containers a pure-JVM byte reader can
  * handle — PNG (IHDR chunk) and JPEG (SOF marker scan) in
  * [[parseImageHeader]] — and falls back to deterministic stub values for
  * everything else. PIXEL decode is real too wherever a no-native-dep
  * codec exists: 24-bit BMP bit-exact in [[decodeBmp]], and PNG/JPEG/GIF
  * through the JDK's own `javax.imageio` readers in [[decodeImageIO]]
  * (public Java SE API, every JRE ships them); stubs remain only for
  * codec-bound formats with no JDK reader (WebP, H.264…). Equally real
  * is the Spark plumbing a production decoder needs:
  *   - media travels as `binary`, never materialized driver-side;
  *   - the decoder runs `mapPartitions` over a typed Dataset, i.e. one
  *     JVM-side batch per partition (the Scala analogue of `mapInPandas`'s
  *     batch iterator), so a real codec would amortize init per partition;
  *   - output is a declared case-class schema, keeping Catalyst able to
  *     prune/push around the opaque stage.
  *
  * At 100 TB: partition count is driven by
  * `spark.sql.files.maxPartitionBytes` on the blob column; decode
  * parallelism equals partitions; nothing here shuffles.
  */
object Multimodal {

  /** Typed metadata a decoder would emit. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Long,
      height: Long,
      first_byte: Int
  )

  /** Attach a binary "media" column derived from text (the test corpus has
    * no real blobs; production would read them from the lake directly). */
  def asBinary(df: DataFrame, textCol: String, as: String = "media"): DataFrame =
    df.withColumn(as, col(textCol).cast("binary"))

  /** Pure-JVM image-container header parse: (format, width, height) from
    * raw bytes, no codecs. `None` for anything that is not a recognized
    * container, so text-shaped or truncated blobs never mis-parse.
    *
    *   - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
    *     chunk is mandated first — width and height are the two big-endian
    *     u32 at offsets 16 and 20 (PNG spec §11.2.2).
    *   - JPEG: `FF D8` SOI, then a marker scan (each segment `FF mm` +
    *     big-endian u16 length) to the first SOFn frame header
    *     (`C0`–`CF` minus `C4` DHT, `C8` JPG, `CC` DAC), which carries
    *     height then width as big-endian u16 after the precision byte
    *     (ITU T.81 §B.2.2). Standalone markers (RSTn/SOI/EOI/TEM) and
    *     fill bytes are skipped without a length read.
    *   - GIF: `GIF87a`/`GIF89a` signature, then the logical screen
    *     descriptor — width and height are little-endian u16 at offsets
    *     6 and 8 (GIF89a spec §18).
    *   - WebP: RIFF container (`RIFF` + u32le size + `WEBP`), first chunk
    *     at offset 12 decides the form (WebP Container Specification):
    *     `VP8X` carries 24-bit LE canvas-width-1 / height-1 at offsets
    *     24/27; `VP8 ` (lossy) carries 14-bit LE dimensions at 26/28
    *     after the `9D 01 2A` frame start code; `VP8L` (lossless) packs
    *     two 14-bit fields into the u32le after its `2F` signature byte.
    *
    * PNG and JPEG magics start with a non-ASCII byte, so no text blob can
    * alias into them; GIF/RIFF magics are ASCII, but aliasing needs the
    * exact 6-byte signature (plus `WEBP` + a valid chunk tag for RIFF) as
    * a text PREFIX — [[decodeMeta]]'s fallback arm tolerates that residual
    * risk, a real lake keys format on metadata anyway. */
  def parseImageHeader(bytes: Array[Byte]): Option[(String, Long, Long)] = {
    def u16(i: Int): Long = ((bytes(i) & 0xff) << 8 | (bytes(i + 1) & 0xff)).toLong
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def u16le(i: Int): Long = ((bytes(i + 1) & 0xff) << 8 | (bytes(i) & 0xff)).toLong
    def u24le(i: Int): Long =
      ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
    def u32le(i: Int): Long =
      ((bytes(i + 3) & 0xffL) << 24) | ((bytes(i + 2) & 0xffL) << 16) |
        ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
    def ascii(from: Int, until: Int): String =
      new String(bytes.slice(from, until), "US-ASCII")
    if (bytes == null) None
    else if (bytes.length >= 24 &&
      bytes.take(8).sameElements(
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)) &&
      new String(bytes.slice(12, 16), "US-ASCII") == "IHDR")
      Some(("png", u32(16), u32(20)))
    else if (bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None // desynced, not a JPEG
        // skip fill bytes (spec allows any number of FFs before the marker)
        while (i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
        if (i + 3 >= bytes.length) return None
        val marker = bytes(i + 1) & 0xff
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= bytes.length) return None
          return Some(("jpeg", u16(i + 7), u16(i + 5))) // width, height
        } else if (marker == 0xd9 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd8)) {
          i += 2 // standalone marker, no length field
        } else {
          i += 2 + u16(i + 2).toInt // segment length includes its own bytes
        }
      }
      None
    } else if (bytes.length >= 10 &&
      (ascii(0, 6) == "GIF87a" || ascii(0, 6) == "GIF89a"))
      Some(("gif", u16le(6), u16le(8)))
    else if (bytes.length >= 25 && ascii(0, 4) == "RIFF" && ascii(8, 12) == "WEBP") {
      ascii(12, 16) match {
        case "VP8X" if bytes.length >= 30 =>
          // extended form: 24-bit LE canvas dimensions, stored minus one
          Some(("webp", u24le(24) + 1, u24le(27) + 1))
        case "VP8 " if bytes.length >= 30 &&
          (bytes(23) & 0xff) == 0x9d && (bytes(24) & 0xff) == 0x01 &&
          (bytes(25) & 0xff) == 0x2a =>
          // lossy form: 14-bit LE dimensions after the frame start code
          Some(("webp", u16le(26) & 0x3fff, u16le(28) & 0x3fff))
        case "VP8L" if (bytes(20) & 0xff) == 0x2f =>
          // lossless form: two 14-bit fields packed into one u32le
          val bits = u32le(21)
          Some(("webp", (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1))
        case _ => None
      }
    } else if (bytes.length >= 8 &&
      ((bytes(0) == 'I' && bytes(1) == 'I' &&
        (bytes(2) & 0xff) == 0x2a && bytes(3) == 0) ||
       (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
        (bytes(3) & 0xff) == 0x2a))) {
      // TIFF: IFD0 walk for ImageWidth (256) / ImageLength (257), both
      // SHORT or LONG with the value inline; offsets stay in Long (the
      // parseExifOrientation discipline for untrusted u32s)
      val be = bytes(0) == 'M'
      def t16(i: Int): Long =
        if (be) u16(i) else u16le(i)
      def t32(i: Int): Long =
        if (be) u32(i) else u32le(i)
      val ifd = t32(4)
      if (ifd < 8 || ifd + 2 > bytes.length) None
      else {
        val p = ifd.toInt
        val n = t16(p)
        var w = -1L; var h = -1L
        var e = 0
        while (e < n && ifd + 2 + (e + 1) * 12 <= bytes.length) {
          val at = p + 2 + e * 12
          val tag = t16(at)
          val typ = t16(at + 2)
          if (tag == 256 || tag == 257) {
            val v =
              if (typ == 3) t16(at + 8) // SHORT sits in the low bytes
              else if (typ == 4) t32(at + 8)
              else -1L
            if (tag == 256) w = v else h = v
          }
          e += 1
        }
        if (w > 0 && h > 0) Some(("tiff", w, h)) else None
      }
    } else None
  }

  /** Partition-wise metadata decode. Real header parse for PNG/JPEG via
    * [[parseImageHeader]]; unrecognized containers fall back to
    * deterministic stub values derived from byte length (honest about the
    * missing codecs) so the operator stays total. A full pixel decoder
    * replaces ONLY the fallback arm — signature, batching, and schema are
    * production-shaped. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights…)
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          val first = if (bytes == null || bytes.isEmpty) 0 else bytes(0) & 0xff
          parseImageHeader(bytes) match {
            case Some((fmt, w, h)) => MediaMeta(id, n, fmt, w, h, first)
            case None =>
              val fmt = (n % 3) match {
                case 0 => "png"
                case 1 => "jpeg"
                case _ => "webp"
              }
              MediaMeta(id, n, fmt, n % 512 + 1, (n / 7) % 512 + 1, first)
          }
        }
      }
  }

  // ----------------------------------------------------------------- BMP
  // The one raster format a pure-JVM reader can decode COMPLETELY — 24-bit
  // uncompressed BI_RGB needs no codec, just the documented byte layout
  // (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to 4
  // bytes). That makes the image path genuinely end-to-end here: decode →
  // resize → features are REAL for BMP (q125 gates them against an
  // arithmetic oracle), and the compressed formats keep honest stubs.

  /** Decoded raster: row-major top-down RGB triples (3 bytes/pixel). */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

  /** Decode a 24-bit uncompressed (BI_RGB) BMP. `None` for any other
    * format, bit depth, compression, or malformed/truncated layout —
    * never throws on arbitrary bytes. Handles the standard bottom-up row
    * order (positive height) and top-down (negative height), and the
    * 4-byte row padding. */
  def decodeBmp(bytes: Array[Byte]): Option[DecodedImage] = {
    def u16le(i: Int): Int = (bytes(i + 1) & 0xff) << 8 | (bytes(i) & 0xff)
    def u32le(i: Int): Long =
      ((bytes(i + 3) & 0xffL) << 24) | ((bytes(i + 2) & 0xffL) << 16) |
        ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
    def s32le(i: Int): Int = u32le(i).toInt
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = u32le(10)
    val headerSize = u32le(14)
    if (headerSize < 40) return None // BITMAPCOREHEADER not supported
    val width = s32le(18)
    val rawHeight = s32le(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = u16le(28)
    val compression = u32le(30)
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
    if (width.toLong * height > 64L * 1024 * 1024) return None // 64 MPix cap
    val rowBytes = (width * 3 + 3) & ~3
    if (dataOffset + rowBytes.toLong * height > bytes.length) return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val src = dataOffset.toInt + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val d = (y * width + x) * 3
        rgb(d) = bytes(src + x * 3 + 2)     // R (BMP stores BGR)
        rgb(d + 1) = bytes(src + x * 3 + 1) // G
        rgb(d + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, height, rgb))
  }

  /** Encode row-major top-down RGB triples as a 24-bit BI_RGB BMP —
    * the inverse of [[decodeBmp]] (decode ∘ encode = identity, tested). */
  def encodeBmp(img: DecodedImage): Array[Byte] = {
    val rowBytes = (img.width * 3 + 3) & ~3
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    def putU16le(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def putU32le(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putU32le(2, 54L + dataSize); putU32le(10, 54L)
    putU32le(14, 40L); putU32le(18, img.width.toLong); putU32le(22, img.height.toLong)
    putU16le(26, 1); putU16le(28, 24); putU32le(30, 0L); putU32le(34, dataSize.toLong)
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        out(dstRow + x * 3) = img.rgb(s + 2)     // B
        out(dstRow + x * 3 + 1) = img.rgb(s + 1) // G
        out(dstRow + x * 3 + 2) = img.rgb(s)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- ImageIO
  // The compressed web formats (JPEG — the dominant web image format —
  // plus PNG and GIF) decode through the JDK's own `javax.imageio`
  // readers: public Java SE API, present in every JRE, no native deps.
  // PNG is lossless so its decode is oracle-gatable with the q125 trick
  // (arithmetic oracle that never sees bytes — q310); JPEG decode is not
  // bit-specified across libraries, so it is gated by property laws
  // instead (round-trip pixel tolerance, hash stability across quality
  // levels — MultimodalSpec). WebP has no JDK reader and stays refused.

  // ImageIO defaults to a disk-backed stream cache; blobs here are
  // in-memory byte arrays, so the temp-file indirection is pure overhead
  // (and a surprise /tmp dependency on an executor). One-time static
  // switch, idempotent, safe per-JVM.
  javax.imageio.ImageIO.setUseCache(false)

  /** Pixel decode via the JDK ImageIO readers (PNG/JPEG/GIF). The
    * container is sniffed FIRST with [[parseImageHeader]] — arbitrary
    * text/binary blobs are never probed — and the canvas dimensions are
    * read from the header and capped BEFORE any pixel allocation, so a
    * decompression bomb (tiny file, huge claimed canvas) is rejected
    * without decoding. Pixels land as row-major top-down RGB through
    * `BufferedImage.getRGB`'s sRGB conversion (palette GIFs, gray PNGs,
    * CMYK JPEGs all normalize through the JDK's ColorModel; alpha is
    * dropped). Returns `None` — never throws — on unsupported or
    * malformed bytes. GIF note: only the first frame of an animation. */
  def decodeImageIO(bytes: Array[Byte]): Option[DecodedImage] = {
    val supported = Set("png", "jpeg", "gif", "tiff")
    if (bytes == null) return None
    if (!parseImageHeader(bytes).exists(h => supported(h._1))) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024)
            return None // same 64 MPix cap as decodeBmp
          val img = reader.read(0)
          val rgb = new Array[Byte](w * h * 3)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              val d = (y * w + x) * 3
              rgb(d) = ((p >> 16) & 0xff).toByte
              rgb(d + 1) = ((p >> 8) & 0xff).toByte
              rgb(d + 2) = (p & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Some(DecodedImage(w, h, rgb))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }
  }

  /** Decode any supported raster container to RGB: the pure-JVM BMP
    * codec first (bit-exact, its arithmetic is stated in SQL oracles),
    * then the JDK ImageIO readers for PNG/JPEG/GIF/TIFF. This is the single
    * entry every pixel consumer ([[imageFeatures]], [[resizeImage]],
    * [[imageAHash]]/[[imageDHash]]/[[imageWHash]]) routes through. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    decodeBmp(bytes).orElse(decodeImageIO(bytes))

  private def toBuffered(img: DecodedImage): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](img.width)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        row(x) = ((img.rgb(s) & 0xff) << 16) |
          ((img.rgb(s + 1) & 0xff) << 8) | (img.rgb(s + 2) & 0xff)
        x += 1
      }
      bi.setRGB(0, y, img.width, 1, row, 0, img.width)
      y += 1
    }
    bi
  }

  /** Encode RGB as PNG via the JDK writer. PNG is lossless:
    * decodeImage ∘ encodePng = identity on pixels (MultimodalSpec law),
    * which is what lets q310 gate the ImageIO path with an arithmetic
    * oracle. */
  def encodePng(img: DecodedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBuffered(img), "png", out)
    out.toByteArray
  }

  /** Encode RGB as TIFF via the JDK writer (baseline RGB, lossless like
    * PNG: decodeImage ∘ encodeTiff = identity on pixels) — the fixture
    * generator for the TIFF arm of the codec family (q337). */
  def encodeTiff(img: DecodedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // fixture generator: a JRE with no registered TIFF writer returns
    // false — fail loudly instead of handing q337/q338 an empty blob
    require(javax.imageio.ImageIO.write(toBuffered(img), "tiff", out),
      "no registered TIFF ImageIO writer on this JRE")
    out.toByteArray
  }

  /** Encode RGB as baseline JPEG at the given quality via the JDK
    * writer — fixture generator for the lossy-path property laws and
    * the MJPEG frame payloads. */
  def encodeJpeg(img: DecodedImage, quality: Float = 0.9f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(toBuffered(img), null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Nearest-neighbor resample to (w, h): source pixel for output (x, y)
    * is (⌊x·W/w⌋, ⌊y·H/h⌋) — integer arithmetic only, so the oracle can
    * state the identical sampling in SQL. */
  def resampleNearest(img: DecodedImage, w: Int, h: Int): DecodedImage = {
    require(w > 0 && h > 0, s"bad target size ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * w + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, out)
  }

  /** Per-image channel statistics from REAL decoded pixels. */
  final case class ImageFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double
  )

  /** Decode ([[decodeImage]]: BMP bit-exact, PNG/JPEG/GIF via the JDK
    * readers) → nearest-neighbor resize → channel means, one row per
    * decodable image; undecodable blobs are dropped. Means are exact for
    * the lossless formats: integer pixel sums divided once —
    * bit-identical to the SQL oracle's CAST(SUM)/(w·h) (BMP: q125,
    * PNG: q310). Partition-wise flatMap: no shuffle, no driver data. */
  def imageFeatures(
      df: DataFrame, idCol: String, binCol: String,
      width: Int, height: Int
  ): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { img =>
            val r = resampleNearest(img, width, height)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var i = 0
            while (i < r.rgb.length) {
              sr += r.rgb(i) & 0xff; sg += r.rgb(i + 1) & 0xff
              sb += r.rgb(i + 2) & 0xff
              i += 3
            }
            val n = (width * height).toDouble
            ImageFeatures(id, width.toLong, height.toLong,
              sr / n, sg / n, sb / n)
          }
        }
      }
  }

  // -------------------------------------------------------------- EXIF
  // Camera JPEGs carry their true orientation in an EXIF APP1 segment
  // (a TIFF structure: byte-order mark, IFD walk, tag 0x0112) — a
  // pipeline that ignores it hashes/embeds sideways images. The walk is
  // pure byte arithmetic (no codec), so it is another genuinely
  // end-to-end path: write APP1 → parse it back → apply the transform
  // to real decoded pixels. Gated by q322 (construction-truth oracle)
  // and orientation-algebra laws in MultimodalSpec.

  /** A minimal big-endian EXIF APP1 segment carrying only the
    * orientation tag — spliced after SOI by [[jpegWithExif]]. */
  def exifApp1(orientation: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"EXIF orientation is 1-8, got $orientation")
    val b = java.nio.ByteBuffer.allocate(36) // marker(2) + len(2) + payload(32)
    b.put(0xff.toByte).put(0xe1.toByte).putShort(34) // len includes itself
    b.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    b.put('M'.toByte).put('M'.toByte).putShort(42) // big-endian TIFF
    b.putInt(8)                                     // IFD0 at offset 8
    b.putShort(1)                                   // one entry
    b.putShort(0x0112).putShort(3).putInt(1)        // Orientation, SHORT, x1
    b.putShort(orientation.toShort).putShort(0)     // value in first 2 bytes
    b.putInt(0)                                     // no next IFD
    b.array()
  }

  /** A real JPEG with an EXIF orientation: SOI + APP1 + the encoder's
    * stream minus its SOI — decodable by any JPEG reader. */
  def jpegWithExif(img: DecodedImage, orientation: Int,
      quality: Float = 0.9f): Array[Byte] = {
    val plain = encodeJpeg(img, quality)
    Array(0xff.toByte, 0xd8.toByte) ++ exifApp1(orientation) ++ plain.drop(2)
  }

  /** EXIF orientation (1–8) from a JPEG's APP1 segment: the marker scan
    * to APP1/`Exif\0\0`, then the TIFF walk — byte-order mark (`II`
    * little- or `MM` big-endian), magic 42, IFD0 entry scan for tag
    * 0x0112 (SHORT, value inlined in the entry). `None` when the blob
    * is not a JPEG, carries no EXIF, or the tag is absent/malformed —
    * never throws. */
  def parseExifOrientation(bytes: Array[Byte]): Option[Int] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    def u16be(i: Int): Int = (bytes(i) & 0xff) << 8 | (bytes(i + 1) & 0xff)
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      while (i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
      if (i + 3 >= bytes.length) return None
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xda || marker == 0xd9) return None // scan/EOI: no EXIF
      if (marker == 0xe1 && i + 10 < bytes.length &&
        new String(bytes, i + 4, 4, "US-ASCII") == "Exif" &&
        bytes(i + 8) == 0 && bytes(i + 9) == 0) {
        val t = i + 10 // TIFF header base
        if (t + 8 > bytes.length) return None
        val le = bytes(t) == 'I' && bytes(t + 1) == 'I'
        val be = bytes(t) == 'M' && bytes(t + 1) == 'M'
        if (!le && !be) return None
        def u16(p: Int): Int =
          if (be) (bytes(p) & 0xff) << 8 | (bytes(p + 1) & 0xff)
          else (bytes(p + 1) & 0xff) << 8 | (bytes(p) & 0xff)
        def u32(p: Int): Long =
          if (be) ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
            ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
          else ((bytes(p + 3) & 0xffL) << 24) | ((bytes(p + 2) & 0xffL) << 16) |
            ((bytes(p + 1) & 0xffL) << 8) | (bytes(p) & 0xffL)
        if (u16(t + 2) != 42) return None
        // keep the untrusted IFD0 offset in Long: a crafted offset
        // >= 2^31 would wrap negative via .toInt and slip past the
        // upper-bound guard (same Long discipline as parseWavHeader)
        val ifdL = t + u32(t + 4)
        if (ifdL < t || ifdL + 2 > bytes.length) return None
        val ifd = ifdL.toInt
        val n = u16(ifd)
        var e = 0
        while (e < n) {
          val at = ifd + 2 + e * 12
          if (at + 12 > bytes.length) return None
          if (u16(at) == 0x0112 && u16(at + 2) == 3) {
            val v = u16(at + 8)
            return if (v >= 1 && v <= 8) Some(v) else None
          }
          e += 1
        }
        return None
      }
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2
      else i += 2 + u16be(i + 2)
    }
    None
  }

  /** Apply an EXIF orientation (1–8) to decoded pixels — the 8-element
    * dihedral group on the raster: 1 identity, 2 mirror-H, 3 rotate
    * 180°, 4 mirror-V, 5 transpose, 6 rotate 90° CW, 7 anti-transpose,
    * 8 rotate 90° CCW. Pure integer array permutation (exact). */
  def orientImage(img: DecodedImage, orientation: Int): DecodedImage = {
    require(orientation >= 1 && orientation <= 8,
      s"EXIF orientation is 1-8, got $orientation")
    if (orientation == 1) return img
    val (w, h) = (img.width, img.height)
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (ox, oy) = orientation match {
          case 2 => (w - 1 - x, y)          // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y)  // rotate 180
          case 4 => (x, h - 1 - y)          // mirror vertical
          case 5 => (y, x)                  // transpose
          case 6 => (h - 1 - y, x)          // rotate 90 CW
          case 7 => (h - 1 - y, w - 1 - x)  // anti-transpose
          case _ => (y, w - 1 - x)          // 8: rotate 90 CCW
        }
        val s = (y * w + x) * 3
        val d = (oy * ow + ox) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1)
        out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(ow, oh, out)
  }

  /** Orientation-aware decode: [[decodeImage]] + [[parseExifOrientation]]
    * + [[orientImage]] — pixels land upright regardless of how the
    * camera held the sensor. Non-JPEG and EXIF-less blobs pass through
    * the plain decode (orientation 1). */
  def decodeImageOriented(bytes: Array[Byte]): Option[DecodedImage] =
    decodeImage(bytes).map(img =>
      orientImage(img, parseExifOrientation(bytes).getOrElse(1)))

  /** Per-image EXIF orientation row. */
  final case class ExifOrientation(doc_id: Long, orientation: Long)

  /** Partition-wise EXIF orientation extraction; rows only for blobs
    * that actually carry the tag (the honesty contract). */
  def exifOrientations(
      df: DataFrame, idCol: String, binCol: String): Dataset[ExifOrientation] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseExifOrientation(bytes).map(o => ExifOrientation(id, o.toLong))
      })
  }

  /** REAL image resize ([[decodeImage]]: BMP/PNG/JPEG/GIF → nearest-
    * neighbor [[resampleNearest]] → canonical 24-bit BMP re-encode) —
    * the normalization step in front of every fixed-input-size consumer
    * (embedding batches, fused hashing, thumbnailing). Undecodable
    * blobs are DROPPED, the same honesty contract as the rest of the
    * pixel family — there is no byte-arithmetic stand-in left on this
    * path. Gated by q332: content rendered at DIFFERENT source
    * resolutions must collapse to identical fused hashes after the
    * resize (scale-invariant near-dup). */
  def resizeImage(
      df: DataFrame, idCol: String, binCol: String,
      width: Int, height: Int
  ): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map(img =>
            Resized(id, width.toLong, height.toLong,
              encodeBmp(resampleNearest(img, width, height))))
        }
      }
  }

  /** Per-image perceptual hash row: the 64-bit average-hash as a bit
    * string (MSB-first row-major), from REAL decoded pixels. */
  final case class AHash(doc_id: Long, ahash: String)

  /** Average-hash (aHash) over real pixels — the standard image near-dup
    * fingerprint: resample to 8×8, grayscale each cell as ⌊(r+g+b)/3⌋,
    * threshold against the integer mean ⌊Σgray/64⌋; bit i is 1 iff
    * gray(i) > mean. All arithmetic is integer, so the oracle can restate
    * it exactly in SQL (q126). Identical images hash identically at ANY
    * source resolution that samples to the same grid; near-identical
    * images differ in few bits, so downstream near-dup is a Hamming
    * band-join — exactly [[graft.ops.Dedup.simhashPairs]]'s shape over
    * this column. Decodable rows only — BMP bit-exact plus PNG/JPEG/GIF
    * via [[decodeImage]] (JPEG hash stability is property-law-tested:
    * quality levels may flip only a few bits, never most). */
  def imageAHash(df: DataFrame, idCol: String, binCol: String): Dataset[AHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { img =>
            val r = resampleNearest(img, 8, 8)
            val gray = Array.tabulate(64) { i =>
              ((r.rgb(i * 3) & 0xff) + (r.rgb(i * 3 + 1) & 0xff) +
                (r.rgb(i * 3 + 2) & 0xff)) / 3
            }
            val mean = gray.sum / 64
            AHash(id, gray.map(g => if (g > mean) '1' else '0').mkString)
          }
        }
      }
  }

  /** Per-image spectral-hash row: the 64 sign bits of the 2-D
    * Walsh–Hadamard transform, row-major over the coefficient grid. */
  final case class WHash(doc_id: Long, whash: String)

  /** In-place 8-point Walsh–Hadamard butterfly (natural order): three
    * stages of paired sums/differences — every coefficient stays an
    * exact integer, |coef| ≤ 8·255·3 after both dimensions. */
  private def wht8(a: Array[Long], off: Int, stride: Int): Unit = {
    var bit = 1
    while (bit < 8) {
      var i = 0
      while (i < 8) {
        if ((i & bit) == 0) {
          val p = off + i * stride
          val q = off + (i | bit) * stride
          val u = a(p); val v = a(q)
          a(p) = u + v; a(q) = u - v
        }
        i += 1
      }
      bit <<= 1
    }
  }

  /** Walsh–Hadamard spectral hash (wHash) — the pHash idea with the DCT
    * swapped for the Hadamard transform, whose ±1 basis keeps every
    * coefficient an exact INTEGER (a DCT's cosines are transcendental and
    * would break the cross-engine hash gate; the Hadamard basis is the
    * standard integer-exact stand-in and a known fast pHash variant).
    * Third lens next to [[imageAHash]] (global mean) and [[imageDHash]]
    * (local gradient): the bit for coefficient (u,v) is the SIGN of a
    * whole-image correlation with the (u,v) rectangular wave, so each bit
    * summarizes global structure at one scale/orientation — robust to
    * per-cell noise that flips aHash bits, sensitive to layout changes
    * dHash's neighbor compare misses. Resample 8×8 → ⌊(r+g+b)/3⌋ gray →
    * row then column 8-point butterflies (O(n log n), 3+3 stages) → 64
    * sign bits, row-major. Integer-exact end to end; gated by q267
    * against the fully unrolled butterfly in SQL. Serving shape downstream
    * is the same Hamming band-join as the other two hashes. */
  def imageWHash(df: DataFrame, idCol: String, binCol: String): Dataset[WHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { img =>
            val r = resampleNearest(img, 8, 8)
            val c = Array.tabulate(64) { i =>
              (((r.rgb(i * 3) & 0xff) + (r.rgb(i * 3 + 1) & 0xff) +
                (r.rgb(i * 3 + 2) & 0xff)) / 3).toLong
            }
            var y = 0
            while (y < 8) { wht8(c, y * 8, 1); y += 1 }
            var x = 0
            while (x < 8) { wht8(c, x, 8); x += 1 }
            WHash(id, c.map(v => if (v > 0) '1' else '0').mkString)
          }
        }
      }
  }

  /** All three perceptual hashes of one image, from ONE decode. */
  final case class ImageHashes(
      doc_id: Long, ahash: String, dhash: String, whash: String)

  /** Production fingerprinting pass: aHash + dHash + wHash in ONE
    * decode — [[imageAHash]]/[[imageDHash]]/[[imageWHash]] run
    * separately decode the blob three times, and at lake scale the
    * decode IS the cost (the hash arithmetic is 64 cells). One decode,
    * two resamples (8×8 for aHash/wHash, 9×8 for dHash), three hash
    * folds; bit-identical to the three standalone operators (q325
    * gates all three columns against the single-hash oracles' combined
    * arithmetic; MultimodalSpec pins agreement with the standalone
    * ops). Dedup serving bands over ALL THREE (the hashes fail
    * differently — global mean vs local gradient vs spectral sign). */
  def imageHashes(
      df: DataFrame, idCol: String, binCol: String): Dataset[ImageHashes] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { img =>
            val r88 = resampleNearest(img, 8, 8)
            val r98 = resampleNearest(img, 9, 8)
            def grayAt(r: DecodedImage, i: Int): Int =
              ((r.rgb(i * 3) & 0xff) + (r.rgb(i * 3 + 1) & 0xff) +
                (r.rgb(i * 3 + 2) & 0xff)) / 3
            val g88 = Array.tabulate(64)(grayAt(r88, _))
            val mean = g88.sum / 64
            val a = g88.map(g => if (g > mean) '1' else '0').mkString
            val d = (for (y <- 0 until 8; x <- 0 until 8) yield
              if (grayAt(r98, y * 9 + x + 1) > grayAt(r98, y * 9 + x)) '1'
              else '0').mkString
            val c = g88.map(_.toLong)
            var y = 0
            while (y < 8) { wht8(c, y * 8, 1); y += 1 }
            var x = 0
            while (x < 8) { wht8(c, x, 8); x += 1 }
            val w = c.map(v => if (v > 0) '1' else '0').mkString
            ImageHashes(id, a, d, w)
          }
        }
      }
  }

  /** Per-image difference-hash row: the 64-bit gradient fingerprint as a
    * bit string (row-major, each row comparing 8 adjacent cell pairs). */
  final case class DHash(doc_id: Long, dhash: String)

  /** Difference-hash (dHash) over real pixels — the gradient twin of
    * [[imageAHash]]: resample to 9×8, grayscale each cell as ⌊(r+g+b)/3⌋,
    * bit (y, x) = 1 iff gray(y, x+1) > gray(y, x). The comparison is
    * LOCAL (adjacent cells), where aHash's is global (every cell vs one
    * mean): a smooth luminance ramp — vignetting, uneven scan lighting —
    * drags many cells across the global mean but changes each adjacent
    * difference by only the ramp's per-cell step, so the two hashes fail
    * differently; production image-dedup bands over BOTH (same Hamming
    * band-join serving shape, [[graft.ops.Dedup.simhashPairs]]).
    * Integer-exact end to end; gated by q230 against a full SQL
    * restatement of the sampling, grayscale, and neighbor compare. */
  def imageDHash(df: DataFrame, idCol: String, binCol: String): Dataset[DHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { img =>
            val r = resampleNearest(img, 9, 8)
            def gray(x: Int, y: Int): Int = {
              val i = (y * 9 + x) * 3
              ((r.rgb(i) & 0xff) + (r.rgb(i + 1) & 0xff) +
                (r.rgb(i + 2) & 0xff)) / 3
            }
            val bits = for (y <- 0 until 8; x <- 0 until 8)
              yield if (gray(x + 1, y) > gray(x, y)) '1' else '0'
            DHash(id, bits.mkString)
          }
        }
      }
  }

  /** Exact PCM sample statistics for one audio blob — every field integer
    * arithmetic (mean_sq is the integer-division mean of squares, not an
    * RMS float), so the row is engine-reproducible. */
  final case class PcmStats(
      doc_id: Long,
      n_samples: Long,
      peak: Long,
      sum_abs: Long,
      mean_sq: Long
  )

  /** 16-bit PCM mono WAV with a real payload: [[wavHeader]] + the samples
    * little-endian — the generator q127's fixture uses, and the inverse
    * of [[pcmStats]]' sample walk. */
  def pcm16Wav(sampleRate: Long, samples: Array[Short]): Array[Byte] = {
    val header = wavHeader(sampleRate, channels = 1, bitsPerSample = 16,
      nSamples = samples.length.toLong)
    val b = java.nio.ByteBuffer.allocate(header.length + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(header)
    samples.foreach(b.putShort)
    b.array()
  }

  /** REAL audio feature extraction for mono 16-bit PCM — WAV via the
    * chunk walk or FLAC via the real frame decode ([[decodePcm16Mono]])
    * — reduced to exact integer statistics (count, peak |s|,
    * Σ|s|, ⌊Σs²/n⌋). Only 16-bit mono PCM rows survive (the depth/layout
    * the walk decodes); compressed containers keep their header-only
    * parses — same honesty contract as the image arm. Partition-wise
    * flatMap, no shuffle. Gated by q127 against a sample-generating
    * oracle. */
  def pcmStats(df: DataFrame, idCol: String, binCol: String): Dataset[PcmStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          // WAV via the chunk walk or FLAC via the real frame decode —
          // one normalization point for the whole family
          decodePcm16Mono(bytes).flatMap { case (_, samples) =>
            if (samples.isEmpty) None
            else {
              var i = 0
              var peak = 0L; var sumAbs = 0L; var sumSq = 0L
              while (i < samples.length) {
                val s = samples(i).toLong
                val a = math.abs(s)
                if (a > peak) peak = a
                sumAbs += a; sumSq += s * s
                i += 1
              }
              Some(PcmStats(id, samples.length.toLong, peak, sumAbs,
                sumSq / samples.length))
            }
          }
        }
      }
  }

  /** Per-audio-blob fingerprint row: the `nFrames`-bit energy hash as a
    * bit string (frame order). */
  final case class AudioFp(doc_id: Long, afp: String)

  /** Audio fingerprint — the [[imageAHash]] idea on PCM energy: the
    * sample stream is cut into `nFrames` balanced frames (sample i →
    * frame ⌊i·nFrames/n⌋, the exact inverse of nearest-neighbor
    * resampling), each frame reduces to its integer mean |sample|, and
    * bit f is 1 iff frame f's mean exceeds the integer mean of the
    * frame means — a duration-invariant energy-envelope signature.
    * Identical recordings fingerprint identically at ANY length that
    * buckets to the same envelope; a local edit (a click, a dropped
    * beat) flips the few bits whose frames it touches, so near-dup
    * serving is the same Hamming band-join as the image hashes
    * ([[graft.ops.Dedup.simhashPairs]]). All arithmetic integer — the
    * oracle restates it exactly (q317). Mono 16-bit WAV or FLAC ([[decodePcm16Mono]]) with at least
    * `nFrames` samples; everything else is dropped. */
  def audioFingerprint(
      df: DataFrame, idCol: String, binCol: String, nFrames: Int = 64
  ): Dataset[AudioFp] = {
    require(nFrames >= 1, s"nFrames must be positive, got $nFrames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodePcm16Mono(bytes).flatMap { case (_, samples) =>
            val n = samples.length.toLong
            if (n < nFrames) None
            else {
              val sumAbs = new Array[Long](nFrames)
              val cnt = new Array[Long](nFrames)
              var i = 0L
              while (i < n) {
                val s = samples(i.toInt).toLong
                val f = ((i * nFrames) / n).toInt
                sumAbs(f) += math.abs(s); cnt(f) += 1
                i += 1
              }
              val means = Array.tabulate(nFrames)(f => sumAbs(f) / cnt(f))
              val thr = means.sum / nFrames
              Some(AudioFp(id,
                means.map(m => if (m > thr) '1' else '0').mkString))
            }
          }
        }
      }
  }

  /** Resampled audio: the new WAV bytes plus the output sample count. */
  final case class ResampledAudio(doc_id: Long, n_samples: Long, media: Array[Byte])

  /** Nearest-neighbor PCM resample to exactly `targetN` samples — the
    * audio twin of [[resampleNearest]]: output sample j is source sample
    * ⌊j·n/targetN⌋ (integer arithmetic only, so a SQL oracle can state
    * the identical index mapping — q318 gates the chain through
    * [[pcmStats]] over the REAL re-emitted WAV bytes). The length
    * normalization every audio-embedding batch needs (fixed-size model
    * inputs) — decimation for long clips, sample-repeat for short ones.
    * Sample rate is carried through unchanged; mono 16-bit WAV or FLAC
    * ([[decodePcm16Mono]]), everything else dropped. */
  def pcmResample(
      df: DataFrame, idCol: String, binCol: String, targetN: Int
  ): Dataset[ResampledAudio] = {
    require(targetN >= 1, s"targetN must be positive, got $targetN")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodePcm16Mono(bytes).flatMap { case (rate, samples) =>
            val n = samples.length.toLong
            if (n <= 0) None
            else {
              val out = Array.tabulate(targetN)(j =>
                samples((j.toLong * n / targetN).toInt))
              Some(ResampledAudio(id, targetN.toLong, pcm16Wav(rate, out)))
            }
          }
        }
      }
  }

  /** Interleaved 16-bit stereo WAV (L0 R0 L1 R1 …) with a real payload —
    * the fixture generator for the multichannel path. */
  def pcm16WavStereo(sampleRate: Long, left: Array[Short],
      right: Array[Short]): Array[Byte] = {
    require(left.length == right.length,
      s"channel length mismatch: ${left.length} vs ${right.length}")
    val header = wavHeader(sampleRate, channels = 2, bitsPerSample = 16,
      nSamples = left.length.toLong)
    val b = java.nio.ByteBuffer.allocate(header.length + left.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(header)
    var i = 0
    while (i < left.length) { b.putShort(left(i)); b.putShort(right(i)); i += 1 }
    b.array()
  }

  /** Stereo → mono downmix: each output sample is (L + R) / 2 with
    * division TRUNCATING toward zero — Java's `/` and DuckDB's `//`
    * agree on that convention for negatives (floorDiv would not) —
    * re-emitted as a real mono WAV — the normalization step in
    * front of every mono-only audio operator ([[pcmStats]],
    * [[audioFingerprint]], [[pcmResample]]…), which is exactly how the
    * honesty restriction on those operators is DISCHARGED rather than
    * worked around. 16-bit stereo WAV or FLAC ([[decodePcm16Stereo]] —
    * the FLAC arm decodes every stereo assignment exactly); mono and
    * junk are dropped (a mono file doesn't need downmixing — route on
    * the container's channel count). Gated by q323 (WAV) and q334
    * (FLAC, all four assignments) through [[pcmStats]] over the
    * re-encoded payload. */
  def pcmDownmix(
      df: DataFrame, idCol: String, binCol: String): Dataset[ResampledAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodePcm16Stereo(bytes).flatMap { case (rate, l, r) =>
            if (l.isEmpty) None
            else {
              val out = Array.tabulate(l.length) { i =>
                // Java / truncates toward zero, exactly like DuckDB //
                // (-3/2 = -1 in both); floorDiv would diverge on odd
                // negative sums
                ((l(i) + r(i)) / 2).toShort
              }
              Some(ResampledAudio(id, l.length.toLong, pcm16Wav(rate, out)))
            }
          }
        }
      }
  }

  /** Normalize any decodable STEREO 16-bit audio blob to
    * (sample_rate, left, right): interleaved RIFF/WAVE via the chunk
    * walk, FLAC via [[flacDecodeStereo]] (exact under every stereo
    * assignment). The stereo twin of [[decodePcm16Mono]] — mono and
    * junk return None (a mono file doesn't need downmixing; route on
    * channel count). */
  def decodePcm16Stereo(
      bytes: Array[Byte]): Option[(Long, Array[Short], Array[Short])] = {
    if (bytes == null || bytes.length < 4) None
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      parseWavHeader(bytes).flatMap { case (rate, channels, bits, n) =>
        if (channels != 2 || bits != 16 || n <= 0) None
        else {
          val dataOff = findDataChunk(bytes)
          if (dataOff < 0 || dataOff + n * 4 > bytes.length) None
          else {
            val l = new Array[Short](n.toInt)
            val r = new Array[Short](n.toInt)
            var i = 0
            while (i < n) {
              val o = (dataOff + i.toLong * 4).toInt
              l(i) = ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
              r(i) = ((bytes(o + 3) << 8) | (bytes(o + 2) & 0xff)).toShort
              i += 1
            }
            Some((rate, l, r))
          }
        }
      }
    else if (bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')
      flacDecodeStereo(bytes)
    else None
  }

  /** Silence-trimmed audio: head/tail counts plus the trimmed WAV. */
  final case class TrimmedAudio(
      doc_id: Long, n_samples: Long, n_trimmed_head: Long,
      n_trimmed_tail: Long, media: Array[Byte])

  /** Trim leading and trailing silence: drop every sample before the
    * first and after the last whose |amplitude| exceeds `threshold` —
    * the standard head/tail gate before fingerprinting or embedding
    * (dead air shifts every frame boundary and breaks envelope
    * alignment; [[audioFingerprint]] composed after this is
    * lead-in-invariant). All-integer, re-emits real WAV bytes (q319
    * gates counts AND the trimmed payload through [[pcmStats]]).
    * Fully-silent clips are DROPPED (nothing to keep); mono 16-bit
    * WAV only. */
  def pcmTrimSilence(
      df: DataFrame, idCol: String, binCol: String, threshold: Long
  ): Dataset[TrimmedAudio] = {
    require(threshold >= 0, s"threshold must be non-negative, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodePcm16Mono(bytes).flatMap { case (rate, samples) =>
            val n = samples.length.toLong
            if (n <= 0) None
            else {
              def sample(i: Long): Short = samples(i.toInt)
              var head = 0L
              while (head < n && math.abs(sample(head).toLong) <= threshold)
                head += 1
              if (head == n) None // fully silent
              else {
                var tail = n - 1
                while (tail > head && math.abs(sample(tail).toLong) <= threshold)
                  tail -= 1
                val kept = Array.tabulate((tail - head + 1).toInt)(j =>
                  sample(head + j))
                Some(TrimmedAudio(id, kept.length.toLong, head,
                  n - 1 - tail, pcm16Wav(rate, kept)))
              }
            }
          }
        }
      }
  }

  /** Offset of the first byte of the `data` chunk payload, or -1. */
  /** Exact per-frame PCM statistics: one row per fixed-size frame —
    * the voice-activity / silence-detection primitive (energy gating
    * works on frames, never whole files). Every field integer; the final
    * short frame is emitted with its true sample count. */
  final case class PcmFrame(
      doc_id: Long,
      frame_idx: Long,
      n_samples: Long,
      peak: Long,
      sum_abs: Long,
      energy: Long
  )

  /** Walk each WAV payload in `frameSize`-sample windows ([[pcmStats]]'
    * byte walk, framed): per frame, peak |s|, Σ|s| and Σs² as exact
    * longs. Gated by q231 against a generate_series restatement. */
  def pcmFrameStats(
      df: DataFrame, idCol: String, binCol: String,
      frameSize: Int): Dataset[PcmFrame] = {
    require(frameSize >= 1, s"frameSize must be >= 1: $frameSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodePcm16Mono(bytes).toSeq.flatMap { case (_, samples) =>
          if (samples.isEmpty) Seq.empty
          else {
            (0 until samples.length).grouped(frameSize).zipWithIndex.map {
              case (idxs, f) =>
                val vs = idxs.map(i => samples(i).toLong)
                PcmFrame(id, f.toLong, vs.size.toLong,
                  vs.map(math.abs).max, vs.map(math.abs).sum,
                  vs.map(v => v * v).sum)
            }.toSeq
          }
        }
      }
  }

  private def findDataChunk(bytes: Array[Byte]): Int = {
    def u32le(i: Int): Long =
      ((bytes(i + 3) & 0xffL) << 24) | ((bytes(i + 2) & 0xffL) << 16) |
        ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
    def tag(i: Int): String =
      new String(bytes.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return -1
    var p = 12
    while (p + 8 <= bytes.length) {
      val t = tag(p); val size = u32le(p + 4)
      if (t == "data") return p + 8
      p += 8 + size.toInt + (size.toInt & 1)
    }
    -1
  }

  // ----------------------------------------------------------------- Y4M
  // YUV4MPEG2 — the uncompressed video interchange format (mjpegtools,
  // ffmpeg -f yuv4mpeg): an ASCII stream header, then one "FRAME\n" +
  // raw planar YUV payload per frame. No codec involved, so the VIDEO
  // arm gets a genuinely end-to-end path too: header parse → frame walk
  // → per-frame statistics, gated by q128. Mono (Cmono: Y plane only)
  // keeps the fixture arithmetic 1:1 with the oracle.

  /** Generate a mono (Y-plane-only) YUV4MPEG2 stream. */
  def y4mMono(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == width * height),
      s"every frame must be exactly ${width}x$height luma bytes")
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 Cmono\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.map(marker.length + _.length).sum)
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  /** Parse a YUV4MPEG2 stream header: (width, height, colorspace tag,
    * offset of the first FRAME marker). `None` unless the signature and
    * the mandatory W/H parameters are present. */
  def parseY4mHeader(bytes: Array[Byte]): Option[(Int, Int, String, Int)] = {
    val sig = "YUV4MPEG2"
    if (bytes == null || bytes.length < sig.length + 1) return None
    if (!bytes.take(sig.length).sameElements(sig.getBytes("US-ASCII"))) return None
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    val header = new String(bytes, 0, nl, java.nio.charset.StandardCharsets.US_ASCII)
    val params = header.split(' ').drop(1)
    def param(prefix: Char): Option[String] =
      params.find(p => p.nonEmpty && p.head == prefix).map(_.tail)
    for {
      w <- param('W').flatMap(_.toIntOption) if w > 0
      h <- param('H').flatMap(_.toIntOption) if h > 0
    } yield (w, h, param('C').getOrElse("420"), nl + 1)
  }

  /** Per-sampled-frame luma statistics from a REAL frame walk. */
  final case class FrameStats(
      doc_id: Long, frame_idx: Long, mean_y: Long, peak_y: Long)

  /** Walk a mono Y4M stream frame-by-frame and emit exact integer luma
    * statistics for every `stride`-th frame — the real replacement for
    * [[frameSampleStub]] where the container is genuinely decodable:
    * frame boundaries come from the parsed geometry, not byte slicing.
    * Non-Y4M and non-mono streams are dropped (honesty contract: 4:2:0
    * chroma would decode too, but the gate keeps to the plane the
    * fixture exercises). 1:N fan-out inside the partition iterator — no
    * shuffle, output scales with frames KEPT. Gated by q128. */
  def y4mFrameStats(
      df: DataFrame, idCol: String, binCol: String, stride: Int = 1
  ): Dataset[FrameStats] = {
    require(stride >= 1, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parseY4mHeader(bytes).toSeq.flatMap {
            case (w, h, cs, dataOff) if cs == "mono" =>
              val frameBytes = w * h
              val step = marker.length + frameBytes
              val nFrames = (bytes.length - dataOff) / step
              (0 until nFrames by stride).iterator.flatMap { f =>
                val off = dataOff + f * step
                val ok = bytes.slice(off, off + marker.length)
                  .sameElements(marker)
                if (!ok) None
                else {
                  var sum = 0L; var peak = 0L
                  var i = off + marker.length
                  val end = i + frameBytes
                  while (i < end) {
                    val v = (bytes(i) & 0xff).toLong
                    sum += v; if (v > peak) peak = v
                    i += 1
                  }
                  Some(FrameStats(id, f.toLong, sum / frameBytes, peak))
                }
              }
            case _ => Iterator.empty
          }
        }
      }
  }

  // ----------------------------------------------------------------- AVI
  // MJPEG — JPEG frames in an AVI (RIFF) container — is the one video
  // codec this container can run END-TO-END with no native deps: the
  // RIFF walk is pure byte arithmetic (like TAR/ZIP/Y4M) and each frame
  // payload decodes through the same JDK ImageIO path as still JPEGs
  // ([[decodeImageIO]]). The demux layer is EXACT and oracle-gated with
  // the q132 trick (frame sizes + content md5 vs payloads the oracle
  // rebuilds in SQL — q311); the pixel layer is property-law-tested
  // (JPEG is not bit-specified). Codec-bound formats (H.264 in MP4…)
  // stay honestly refused: [[frameSampleStub]] remains their documented
  // stand-in.

  /** Serialize JPEG (or arbitrary) frame payloads as a minimal
    * spec-correct AVI: RIFF('AVI ') { LIST hdrl { avih, LIST strl
    * { strh 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST movi
    * { '00dc' frames, even-padded } } — the layout any AVI demuxer
    * reads (AVI RIFF form, Windows multimedia file formats). */
  def aviMjpeg(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32le(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def u16le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    // movi payload: '00dc' + size + bytes (+ 1 pad byte if odd)
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlBody = 4 + /*avih*/ 8 + 56 + /*LIST strl*/ 12 + /*strh*/ 8 + 56 + /*strf*/ 8 + 40
    val riffBody = 4 + /*LIST hdrl*/ 8 + hdrlBody + /*LIST movi*/ 8 + 4 + moviBody
    fourcc("RIFF"); u32le(riffBody.toLong); fourcc("AVI ")
    fourcc("LIST"); u32le(hdrlBody.toLong); fourcc("hdrl")
    fourcc("avih"); u32le(56L)
    u32le(40000L)                 // dwMicroSecPerFrame (25 fps)
    u32le(0L); u32le(0L); u32le(0L)
    u32le(frames.length.toLong)   // dwTotalFrames
    u32le(0L); u32le(1L)          // dwInitialFrames, dwStreams
    u32le(maxFrame.toLong)        // dwSuggestedBufferSize
    u32le(width.toLong); u32le(height.toLong)
    (0 until 4).foreach(_ => u32le(0L)) // dwReserved
    fourcc("LIST"); u32le((4 + 8 + 56 + 8 + 40).toLong); fourcc("strl")
    fourcc("strh"); u32le(56L)
    fourcc("vids"); fourcc("MJPG")
    u32le(0L); u16le(0); u16le(0) // dwFlags, wPriority, wLanguage
    u32le(0L)                     // dwInitialFrames
    u32le(1L); u32le(25L)         // dwScale, dwRate (25 fps)
    u32le(0L)                     // dwStart
    u32le(frames.length.toLong)   // dwLength (frames)
    u32le(maxFrame.toLong); u32le(10000L) // buffer, quality
    u32le(0L)                     // dwSampleSize (0: one sample per chunk)
    u16le(0); u16le(0); u16le(width); u16le(height) // rcFrame
    fourcc("strf"); u32le(40L)
    u32le(40L); u32le(width.toLong); u32le(height.toLong)
    u16le(1); u16le(24)           // biPlanes, biBitCount
    fourcc("MJPG")                // biCompression
    u32le(0L); u32le(0L); u32le(0L); u32le(0L); u32le(0L)
    fourcc("LIST"); u32le((4 + moviBody).toLong); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); u32le(f.length.toLong); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // RIFF chunks pad to even
    }
    out.toByteArray
  }

  /** Demux an AVI's video frames: the RIFF chunk walk to `LIST movi`,
    * collecting every `##dc`/`##db` payload in stream order. Returns
    * `(width, height, frames)` only when the header declares a `vids`
    * stream handled by MJPG (fccHandler or biCompression — encoders set
    * either) — anything else is refused, never mis-demuxed (the codec
    * honesty contract: we only claim frames we can also decode).
    * Never throws on arbitrary bytes; bounds-checked throughout. */
  def parseAviMjpegFrames(bytes: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (bytes == null || bytes.length < 24) return None
    def ascii(from: Int, until: Int): String =
      if (until <= bytes.length) new String(bytes, from, until - from, "US-ASCII")
      else ""
    def u32le(i: Int): Long =
      ((bytes(i + 3) & 0xffL) << 24) | ((bytes(i + 2) & 0xffL) << 16) |
        ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
    if (ascii(0, 4) != "RIFF" || ascii(8, 12) != "AVI ") return None
    var mjpg = false
    var w = 0; var h = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk(from, until): iterate sibling chunks, recursing into LISTs
    def walk(from: Int, until: Int): Unit = {
      var i = from
      while (i + 8 <= until) {
        val tag = ascii(i, i + 4)
        val size = u32le(i + 4)
        if (size < 0 || i + 8 + size > until) return // malformed: stop
        if (tag == "LIST" && size >= 4) {
          walk(i + 12, i + 8 + size.toInt) // skip the 4-byte list type
        } else if (tag == "strh" && size >= 56 &&
          ascii(i + 8, i + 12) == "vids") {
          if (ascii(i + 12, i + 16) == "MJPG") mjpg = true
        } else if (tag == "strf" && size >= 40) {
          if (ascii(i + 24, i + 28) == "MJPG") mjpg = true
          if (w == 0) { w = u32le(i + 12).toInt; h = u32le(i + 16).toInt }
        } else if (tag.length == 4 && (tag.endsWith("dc") || tag.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + size.toInt)
        }
        i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length)
    if (mjpg && w > 0 && h > 0) Some((w, h, frames.toSeq)) else None
  }

  /** Frame sampling with REAL demux where the container allows — the
    * production replacement for [[frameSampleStub]]'s byte slicing:
    *   - AVI-MJPEG → every `stride`-th `00dc` payload (the JPEG bytes,
    *     which [[decodeImage]] handles downstream);
    *   - mono Y4M → every `stride`-th raw luma plane;
    *   - anything else (H.264 etc. — codec-bound, no JDK decoder) falls
    *     through to the documented stub slicing, same schema.
    * 1:N fan-out inside the partition iterator: no shuffle, no driver
    * data, output scales with frames KEPT. Demux gated by q311 (exact
    * sizes + md5 vs SQL-rebuilt payloads); pixels by MultimodalSpec. */
  def frameSample(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 64, stride: Int = 4
  ): Dataset[Frame] = {
    require(stride >= 1, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          parseAviMjpegFrames(b) match {
            case Some((_, _, frames)) =>
              (0 until frames.length by stride).iterator
                .map(f => Frame(id, f.toLong, frames(f)))
            case None => parseY4mHeader(b) match {
              case Some((w, h, "mono", dataOff)) =>
                val planeBytes = w * h
                val step = marker.length + planeBytes
                val nFrames = (b.length - dataOff) / step
                (0 until nFrames by stride).iterator.flatMap { f =>
                  val off = dataOff + f * step
                  if (!b.slice(off, off + marker.length).sameElements(marker)) None
                  else Some(Frame(id, f.toLong,
                    java.util.Arrays.copyOfRange(
                      b, off + marker.length, off + step)))
                }
              case _ =>
                val nFrames = b.length / frameBytes
                (0 until nFrames by stride).iterator.map { f =>
                  Frame(id, f.toLong, b.slice(f * frameBytes, (f + 1) * frameBytes))
                }
            }
          }
        }
      }
  }

  /** Exact per-frame RGB statistics for one sampled video frame: integer
    * channel sums over the DECODED pixels, divided once. */
  final case class FrameRgbStats(
      doc_id: Long, frame_idx: Long, width: Long, height: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** End-to-end MJPEG video → pixels: demux the AVI
    * ([[parseAviMjpegFrames]]), decode every `stride`-th JPEG frame
    * through the JDK ImageIO path ([[decodeImage]]), and emit exact
    * channel means per frame — the video twin of [[imageFeatures]].
    * Non-AVI-MJPEG blobs and undecodable frames are dropped (honesty
    * contract). Partition-wise flatMap: no shuffle, no driver data. */
  def mjpegFrameStats(
      df: DataFrame, idCol: String, binCol: String, stride: Int = 1
  ): Dataset[FrameRgbStats] = {
    require(stride >= 1, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parseAviMjpegFrames(bytes).iterator.flatMap { case (_, _, frames) =>
            (0 until frames.length by stride).iterator.flatMap { f =>
              decodeImage(frames(f)).map { img =>
                var (sr, sg, sb) = (0L, 0L, 0L)
                var i = 0
                while (i < img.rgb.length) {
                  sr += img.rgb(i) & 0xff; sg += img.rgb(i + 1) & 0xff
                  sb += img.rgb(i + 2) & 0xff
                  i += 3
                }
                val n = (img.width.toLong * img.height).toDouble
                FrameRgbStats(id, f.toLong, img.width.toLong,
                  img.height.toLong, sr / n, sg / n, sb / n)
              }
            }
          }
        }
      }
  }

  // ----------------------------------------------------------------- TAR
  // WebDataset-shaped shard handling: training corpora commonly land as
  // tar archives of per-sample member files. POSIX ustar needs no codec —
  // 512-byte headers (name, octal size, checksum), content padded to 512
  // — so shard ingestion is another genuinely end-to-end path: write and
  // walk members with exact bytes, gated by q132.

  /** Serialize members as a POSIX ustar archive (name → bytes), with the
    * standard two-zero-block terminator — readable by any tar. Member
    * names must fit ustar's 100-byte field. */
  def tarArchive(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, content) =>
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      require(nameBytes.length <= 100, s"ustar name too long: $name")
      val h = new Array[Byte](512)
      System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
      def octal(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off, len - 1)
        h(off + len - 1) = 0
      }
      octal(420, 100, 8)            // mode 0644
      octal(0, 108, 8); octal(0, 116, 8) // uid/gid
      octal(content.length.toLong, 124, 12)
      octal(0, 136, 12)             // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
      h(156) = '0'                  // regular file
      System.arraycopy("ustar 00".getBytes("US-ASCII"), 0, h, 257, 8)
      val sum = h.map(_ & 0xff).sum
      val cs = java.lang.Long.toOctalString(sum.toLong)
      val csPadded = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPadded.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '.toByte
      out.write(h)
      out.write(content)
      val pad = (512 - content.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // terminator
    out.toByteArray
  }

  /** Walk a ustar archive: (member name, content bytes) for every regular
    * file, verifying each header's checksum; stops cleanly at the zero
    * terminator or on any malformed header (never throws on arbitrary
    * bytes, never reads past the blob). */
  def parseTarMembers(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    if (bytes == null) return Seq.empty // totality: null blob, no members
    val out = Seq.newBuilder[(String, Array[Byte])]
    var p = 0
    var ok = true
    while (ok && p + 512 <= bytes.length) {
      val block = bytes.slice(p, p + 512)
      if (block.forall(_ == 0)) ok = false // terminator
      else {
        val nameEnd = {
          val i = block.indexOf(0.toByte); if (i < 0 || i > 100) 100 else i
        }
        val name = new String(block, 0, nameEnd,
          java.nio.charset.StandardCharsets.US_ASCII)
        val sizeStr = new String(block, 124, 12, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        val declared = new String(block, 148, 8, "US-ASCII")
          .filter(c => c >= '0' && c <= '7')
        val computed = {
          val copy = block.clone()
          java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
          copy.map(_ & 0xff).sum.toLong
        }
        val size = try java.lang.Long.parseLong(sizeStr, 8) catch {
          case _: NumberFormatException => -1L
        }
        val checksumOk = declared.nonEmpty &&
          java.lang.Long.parseLong(declared, 8) == computed
        if (size < 0 || !checksumOk || p + 512 + size > bytes.length) ok = false
        else {
          if (block(156) == '0' || block(156) == 0) // regular file
            out += name -> bytes.slice(p + 512, p + 512 + size.toInt)
          val padded = ((size + 511) / 512) * 512
          p += 512 + padded.toInt
        }
      }
    }
    out.result()
  }

  /** Gzip-decompress (RFC 1952 magic 1f 8b) with a decompressed-size cap —
    * a REAL codec, unlike the image/audio ones: DEFLATE ships in the JVM.
    * `None` for non-gzip bytes or a corrupt/oversized stream. */
  def gunzip(bytes: Array[Byte], maxBytes: Int = 256 * 1024 * 1024): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 2 ||
      (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && out.size <= maxBytes) {
        out.write(buf, 0, n); n = in.read(buf)
      }
      if (out.size > maxBytes) None else Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** Serialize members as a ZIP archive (stored or deflated by the JVM's
    * ZipOutputStream — both real codecs). */
  def zipArchive(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    members.foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content)
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  /** Walk a ZIP archive: (entry name, content) for every file entry via
    * the JVM's ZipInputStream (real INFLATE). A per-entry and total
    * decompressed-size cap guards against zip bombs; a malformed stream
    * yields the valid prefix of entries, never throws. */
  def parseZipMembers(
      bytes: Array[Byte],
      maxBytes: Long = 256L * 1024 * 1024): Seq[(String, Array[Byte])] = {
    if (bytes == null || bytes.length < 4 ||
      bytes(0) != 'P' || bytes(1) != 'K') return Seq.empty
    val out = Seq.newBuilder[(String, Array[Byte])]
    var total = 0L
    try {
      val in = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var entry = in.getNextEntry
      while (entry != null && total <= maxBytes) {
        if (!entry.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](64 * 1024)
          var n = in.read(chunk)
          while (n >= 0 && total + buf.size <= maxBytes) {
            buf.write(chunk, 0, n); n = in.read(chunk)
          }
          total += buf.size
          if (total <= maxBytes) out += entry.getName -> buf.toByteArray
        }
        entry = if (total <= maxBytes) in.getNextEntry else null
      }
    } catch { case _: java.io.IOException => () }
    out.result()
  }

  /** One shard member with its exact content digest. */
  final case class TarMember(
      doc_id: Long, member_name: String, n_bytes: Long, content_md5: String)

  /** Partition-wise shard walk: every member of every archive as a typed
    * row with its exact size and content md5 — the ingestion shape for
    * WebDataset-style shards (1:N fan-out inside the partition iterator,
    * no shuffle, nothing driver-side). Gzipped archives (`.tar.gz`, the
    * common shard form) are decompressed transparently via the gzip
    * magic; malformed archives yield their valid prefix of members,
    * matching [[parseTarMembers]]. */
  def tarMembers(df: DataFrame, idCol: String, binCol: String): Dataset[TarMember] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val safe = if (bytes == null) Array.empty[Byte] else bytes
          val raw = gunzip(safe).getOrElse(safe)
          // container sniff: PK magic → ZIP entries; else ustar walk
          val members =
            if (raw.length >= 2 && raw(0) == 'P' && raw(1) == 'K')
              parseZipMembers(raw)
            else parseTarMembers(raw)
          members.iterator.map { case (name, content) =>
            val md = MessageDigest.getInstance("MD5")
            TarMember(id, name, content.length.toLong,
              md.digest(content).map("%02x".format(_)).mkString)
          }
        }
      }
  }

  /** One sampled frame of a video blob. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling: video binary → one row per sampled frame (every
    * `stride`-th chunk of `frameBytes`). The 1:N fan-out happens inside
    * the partition iterator (`flatMap`), so no shuffle and no driver
    * involvement — output size scales with frames kept, not source size.
    * The "frame" is a deterministic byte slice standing in for a decoded
    * frame. [[frameSample]] is the real demuxer for the containers this
    * JVM can walk (AVI-MJPEG, mono Y4M); this stub remains the documented
    * stand-in for codec-bound formats only (H.264 in MP4 etc.). */
  def frameSampleStub(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 64, stride: Int = 4
  ): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val nFrames = b.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Frame(id, f.toLong, b.slice(f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
  }

  /** Resized media. */
  final case class Resized(doc_id: Long, width: Long, height: Long, media: Array[Byte])

  /** Typed audio metadata a decoder would emit. */
  final case class AudioMeta(
      doc_id: Long,
      sample_rate: Long,
      channels: Long,
      bits_per_sample: Long,
      n_samples: Long,
      duration_ms: Long
  )

  /** Pure-JVM WAV (RIFF/WAVE) header parse: sample rate, channel count,
    * bit depth, and sample count from the canonical `fmt ` + `data`
    * chunks, no codec. `None` for anything that is not a RIFF/WAVE
    * container or whose chunks are malformed.
    *
    * Layout (RIFF spec / WAVE format): `RIFF` + u32le riff-size +
    * `WAVE`, then a chunk walk — each chunk is a 4-byte ASCII tag +
    * u32le payload size (payloads pad to even offsets). `fmt ` carries
    * u16le audio format, u16le channels, u32le sample rate, u32le byte
    * rate, u16le block align, u16le bits per sample; `data`'s size in
    * bytes over the block align gives the per-channel sample count. The
    * walk tolerates leading `LIST`/`INFO` metadata chunks the way real
    * encoders emit them. */
  def parseWavHeader(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    def u16le(i: Int): Long = ((bytes(i + 1) & 0xff) << 8 | (bytes(i) & 0xff)).toLong
    def u32le(i: Int): Long =
      ((bytes(i + 3) & 0xffL) << 24) | ((bytes(i + 2) & 0xffL) << 16) |
        ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
    def ascii(from: Int, until: Int): String =
      new String(bytes.slice(from, until), "US-ASCII")
    if (bytes == null || bytes.length < 44 ||
      ascii(0, 4) != "RIFF" || ascii(8, 12) != "WAVE") None
    else {
      // the cursor advances by declared chunk sizes, which are UNTRUSTED
      // u32 values up to 4 GiB — walk in Long so a corrupt size can
      // neither wrap negative (index crash) nor stall the loop; any
      // overshoot simply exits the while and returns None (malformed)
      var i = 12L
      var fmt: Option[(Long, Long, Long)] = None // (channels, rate, bits)
      var blockAlign = 0L
      while (i + 8 <= bytes.length) {
        val at = i.toInt // safe: i < bytes.length <= Int.MaxValue here
        val tag = ascii(at, at + 4)
        val size = u32le(at + 4)
        if (tag == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length) {
          fmt = Some((u16le(at + 10), u32le(at + 12), u16le(at + 22)))
          blockAlign = u16le(at + 20)
        } else if (tag == "data") {
          return fmt.collect {
            case (ch, rate, bits) if blockAlign > 0 && rate > 0 =>
              (rate, ch, bits, size / blockAlign)
          }
        }
        i += 8L + size + (size & 1L) // chunks pad to even offsets
      }
      None
    }
  }

  /** Build a real 44-byte canonical WAV header (PCM, no payload bytes —
    * the `data` size field declares them, which is all header-level
    * tooling reads). Exists so tests and the oracle query can round-trip
    * [[parseWavHeader]] through genuine container bytes. */
  def wavHeader(
      sampleRate: Long, channels: Long, bitsPerSample: Long, nSamples: Long
  ): Array[Byte] = {
    // blockAlign is an integer byte count: a non-byte-multiple depth
    // (e.g. 12-bit) would truncate and emit data-size/blockAlign fields
    // that disagree with the declared depth — corrupt but parseable,
    // the exact shape the u32 require below exists to prevent
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0 && channels >= 1,
      s"WAV header needs whole-byte samples and >=1 channel: " +
        s"bits=$bitsPerSample channels=$channels")
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = nSamples * blockAlign
    // the RIFF size fields are u32: past 4 GiB the format is RF64, and
    // silently wrapping .toInt would emit a corrupt-but-parseable header
    require(dataLen + 36 <= 0xFFFFFFFFL,
      s"WAV data $dataLen bytes exceeds the u32 RIFF limit (use RF64)")
    val byteRate = sampleRate * blockAlign
    val b = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataLen).toInt)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate.toInt)
      .putInt(byteRate.toInt).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
    b.array()
  }

  /** Partition-wise audio metadata decode — the audio face of
    * [[decodeMeta]]: real WAV and FLAC header parses, deterministic
    * stub values for other containers (same honesty contract as the
    * image arm). `duration_ms` is exact integer arithmetic
    * (samples·1000 / rate) so the result is engine-reproducible. */
  def decodeAudioMeta(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          parseWavHeader(bytes).orElse(parseFlacHeader(bytes)) match {
            case Some((rate, ch, bits, n)) =>
              AudioMeta(id, rate, ch, bits, n, n * 1000L / rate)
            case None =>
              val len = if (bytes == null) 0L else bytes.length.toLong
              AudioMeta(id, 8000L, 1L, 16L, len, len * 1000L / 8000L)
          }
        }
      }
  }

  /** Pure-JVM FLAC STREAMINFO parse: (sample rate, channels, bits per
    * sample, total samples) — the same tuple as [[parseWavHeader]], so
    * [[decodeAudioMeta]] treats both containers uniformly. `None` for
    * anything that is not a FLAC stream with a well-formed first block.
    *
    * Layout (FLAC format spec §METADATA_BLOCK_STREAMINFO): `fLaC`
    * magic, then metadata blocks each headed by 1 byte (bit 7 =
    * last-block flag, bits 0–6 = type; type 0 = STREAMINFO, mandated
    * first) + u24be length (34 for STREAMINFO). After min/max
    * blocksize (2×u16) and min/max framesize (2×u24), one big-endian
    * 64-bit word packs sample-rate (20 bits), channels−1 (3),
    * bits-per-sample−1 (5), and total samples (36). */
  def parseFlacHeader(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    def ascii(from: Int, until: Int): String =
      new String(bytes.slice(from, until), "US-ASCII")
    if (bytes == null || bytes.length < 42 || ascii(0, 4) != "fLaC") None
    else {
      val blockType = bytes(4) & 0x7f
      val blockLen = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
        (bytes(7) & 0xff)
      if (blockType != 0 || blockLen < 34) None // STREAMINFO must be first
      else {
        var v = 0L // the packed 64-bit word at offset 8 + 10
        var i = 0
        while (i < 8) { v = (v << 8) | (bytes(18 + i) & 0xffL); i += 1 }
        val rate = v >>> 44
        val channels = ((v >>> 41) & 0x7L) + 1
        val bits = ((v >>> 36) & 0x1fL) + 1
        val nSamples = v & 0xFFFFFFFFFL
        if (rate == 0) None else Some((rate, channels, bits, nSamples))
      }
    }
  }

  /** Build a real 42-byte FLAC header (magic + a last-flagged
    * STREAMINFO block, no frames — header-level tooling reads exactly
    * this). The round-trip twin of [[parseFlacHeader]], the
    * [[wavHeader]] convention. */
  def flacHeader(
      sampleRate: Long, channels: Long, bitsPerSample: Long, nSamples: Long
  ): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1L << 20) &&
      channels >= 1 && channels <= 8 &&
      bitsPerSample >= 1 && bitsPerSample <= 32 &&
      nSamples >= 0 && nSamples < (1L << 36),
      s"outside FLAC STREAMINFO field ranges: rate=$sampleRate " +
        s"channels=$channels bits=$bitsPerSample samples=$nSamples")
    val packed = (sampleRate << 44) | ((channels - 1) << 41) |
      ((bitsPerSample - 1) << 36) | nSamples
    val b = java.nio.ByteBuffer.allocate(42) // big-endian by default
    b.put("fLaC".getBytes("US-ASCII"))
      .put(0x80.toByte) // last-block flag + type 0 (STREAMINFO)
      .put(0.toByte).put(0.toByte).put(34.toByte) // u24be block length
      .putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
      .put(Array[Byte](0, 0, 0)).put(Array[Byte](0, 0, 0)) // framesizes
      .putLong(packed)
    // 16-byte unaudited-MD5 field stays zeroed (allocate() zero-fills)
    b.array()
  }

  // ------------------------------------------------------------------
  // FLAC frame codec (pure JVM): real lossless decode for mono 16-bit
  // streams, extending the whole PCM operator family past WAV.
  // ------------------------------------------------------------------

  /** MSB-first bit writer for [[flacEncode]]. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    /** FLAC unary: q zero bits then a one bit. */
    def putUnary(q: Long): Unit = { var i = 0L; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def align(): Unit = if (nb > 0) put(0, 8 - nb)
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  /** MSB-first bit reader with a sticky overrun flag — reads past the
    * end return 0 and set `!ok`, so the caller checks once at the end
    * instead of every read (the totality contract for untrusted lake
    * bytes). */
  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    var ok: Boolean = true
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val bp = pos + i
        val by = (bp >> 3).toInt
        if (by >= bytes.length) { ok = false; return 0L }
        v = (v << 1) | ((bytes(by) >> (7 - (bp & 7)).toInt) & 1).toLong
        i += 1
      }
      pos += n
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n)
    }
    /** FLAC unary: count zeros up to the terminating one. */
    def unary(maxQ: Long = 1L << 20): Long = {
      var q = 0L
      while (ok) {
        if (bits(1) == 1L) return q
        q += 1
        if (q > maxQ) { ok = false; return 0L } // adversarial zero run
      }
      0L
    }
    def alignToByte(): Unit = if ((pos & 7) != 0) pos = (pos | 7) + 1
    def bytePos: Int = (pos >> 3).toInt
  }

  /** CRC-8, polynomial 0x07, init 0 — the FLAC frame-header checksum. */
  private def flacCrc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; b += 1 }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — the FLAC whole-frame checksum. */
  private def flacCrc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff; b += 1 }
      i += 1
    }
    crc
  }

  /** The four FLAC fixed predictors' residual at position i (i ≥ order),
    * binomial-coefficient differences of the preceding samples. */
  private def fixedResidual(s: Array[Int], i: Int, order: Int): Long =
    order match {
      case 0 => s(i).toLong
      case 1 => s(i).toLong - s(i - 1)
      case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
      case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
      case _ => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) -
        4L * s(i - 3) + s(i - 4)
    }

  /** Write one FIXED-predictor subframe (order 0–2 chosen by total
    * |residual|, single-partition Rice with a size-minimizing parameter,
    * raw escape when cheaper) at an arbitrary bit depth — side channels
    * in stereo assignments carry bps+1. */
  private def writeFlacSubframe(
      sw: BitWriter, block: Array[Int], bps: Int): Unit = {
    val n = block.length
    val maxOrder = math.min(2, n - 1)
    val order = (0 to maxOrder).minBy { o =>
      var s = 0L; var i = o
      while (i < n) { s += math.abs(fixedResidual(block, i, o)); i += 1 }
      s
    }
    val res = Array.tabulate(n - order)(j =>
      fixedResidual(block, j + order, order))
    val folded = res.map(e => (e << 1) ^ (e >> 63)) // zigzag
    val (k, riceBits) = (0 to 14).map { k =>
      (k, folded.map(u => (u >>> k) + 1 + k).sum)
    }.minBy(_._2)
    // raw escape width: an order-o residual of bps-bit input spans at
    // most bps + o + 1 bits signed (Σ|binomial coefficients| = 2^o)
    val rawBits = bps + order + 1
    val escape = riceBits > (5L + rawBits.toLong * folded.length)
    sw.put(0, 1); sw.put(8 + order, 6); sw.put(0, 1)
    var i = 0
    while (i < order) {
      sw.put(block(i).toLong & ((1L << bps) - 1), bps); i += 1
    }
    sw.put(0, 2) // residual method: 4-bit rice
    sw.put(0, 4) // partition order 0
    if (escape) {
      sw.put(0xf, 4) // escape
      sw.put(rawBits.toLong, 5)
      res.foreach(e => sw.put(e & ((1L << rawBits) - 1), rawBits))
    } else {
      sw.put(k.toLong, 4)
      folded.foreach { u => sw.putUnary(u >>> k); sw.put(u & ((1L << k) - 1), k) }
    }
  }

  /** FLAC "UTF-8 style" coded number, full multi-byte form (FLAC format
    * spec §9.1.5): 7 bits in one byte, else a lead byte with c+1 leading
    * ones followed by c ∈ [1,6] continuation bytes of 6 payload bits each
    * (capacity 6+5c bits in the lead, 36 bits total at c=6) — the exact
    * mirror of [[flacDecodeFrames]]'s 6-continuation reader.
    *
    * `maxBits` is the CALLER's strategy cap (RFC 9639 §9.1.5): a
    * fixed-blocksize stream codes a FRAME number capped at 31 bits —
    * external decoders may reject more, even though the wire format (and
    * the in-repo reader) carries up to 36 — while a variable-blocksize
    * stream codes a 36-bit SAMPLE number. [[flacFrame]] writes the
    * fixed-blocksize strategy, so it passes the 31-bit default. Numbers
    * beyond the cap fail loudly rather than emit a stream other decoders
    * drop. */
  private def writeFlacCodedNumber(
      w: BitWriter, fn: Long, maxBits: Int = 31): Unit = {
    require(maxBits <= 36, s"FLAC coded numbers cap at 36 bits: $maxBits")
    require(fn >= 0 && fn < (1L << maxBits),
      s"FLAC coded number out of range for a $maxBits-bit strategy: $fn")
    if (fn < 0x80) w.put(fn, 8)
    else {
      var c = 1
      while (c < 6 && fn >= (1L << (6 + 5 * c))) c += 1
      val leadBits = 6 - c
      w.put(((0xfe << leadBits) & 0xff).toLong |
        ((fn >>> (6 * c)) & ((1L << leadBits) - 1)), 8)
      var i = c - 1
      while (i >= 0) { w.put(0x80L | ((fn >>> (6 * i)) & 0x3f), 8); i -= 1 }
    }
  }

  /** Test hook: the coded-number encoding of `fn` as raw bytes (the
    * byte-aligned output of [[writeFlacCodedNumber]]), so MultimodalSpec
    * can law-check the full 36-bit range without synthesizing a
    * 65536-frame stream. `maxBits` defaults to the full wire capacity
    * here (the law test covers the variable-blocksize sample-number
    * range); production frames go through [[flacFrame]]'s 31-bit cap. */
  private[graft] def flacCodedNumberBytes(
      fn: Long, maxBits: Int = 36): Array[Byte] = {
    val w = new BitWriter
    writeFlacCodedNumber(w, fn, maxBits)
    w.bytes
  }

  /** Build one complete FLAC frame — header (sync, fixed-blocksize
    * strategy, 16-bit blocksize-at-end, rate-from-STREAMINFO, the given
    * channel-assignment code, 16-bit sample size, UTF-8 frame number,
    * CRC-8), the channel subframes at their per-assignment bit depths,
    * byte alignment, CRC-16. */
  private def flacFrame(
      chanCode: Int, frameIdx: Long,
      channels: Seq[(Array[Int], Int)]): Array[Byte] = {
    val n = channels.head._1.length
    val w = new BitWriter
    w.put(0x3ffe, 14); w.put(0, 1); w.put(0, 1)
    w.put(0x7, 4) // blocksize: 16-bit value-1 at header end
    w.put(0x0, 4) // sample rate: from STREAMINFO
    w.put(chanCode.toLong, 4)
    w.put(0x4, 3) // sample size: 16 bit
    w.put(0, 1) // reserved
    writeFlacCodedNumber(w, frameIdx)
    w.put(n - 1L, 16)
    val headBytes = w.bytes // byte-aligned by construction
    val sw = new BitWriter
    channels.foreach { case (block, bps) => writeFlacSubframe(sw, block, bps) }
    val subBytes = sw.bytes // align() pads to a byte boundary
    val frame = headBytes ++
      Array(flacCrc8(headBytes, 0, headBytes.length).toByte) ++ subBytes
    val crc = flacCrc16(frame, 0, frame.length)
    frame ++ Array((crc >> 8).toByte, (crc & 0xff).toByte)
  }

  /** REAL FLAC encoder (FLAC format spec, mono 16-bit):
    * STREAMINFO ([[flacHeader]]) followed by fixed-blocksize frames,
    * each one FIXED-predictor subframe with Rice residuals — genuinely
    * compressed, spec-layout output with real CRC-8/CRC-16 checksums.
    * The round-trip twin of [[flacDecode]]; q330/q331 gate the pair
    * against arithmetic oracles and the WAV path. */
  def flacEncode(
      sampleRate: Long, samples: Array[Short], blockSize: Int = 4096
  ): Array[Byte] = {
    require(blockSize >= 16 && blockSize <= 65536,
      s"blockSize out of range: $blockSize")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= flacHeader(sampleRate, 1, 16, samples.length.toLong)
    var frameIdx = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val block = Array.tabulate(n)(j => samples(off + j).toInt)
      out ++= flacFrame(0x0, frameIdx, Seq((block, 16)))
      frameIdx += 1
      off += n
    }
    out.toArray
  }

  /** Stereo FLAC encoder covering ALL FOUR spec channel assignments:
    * `independent` (code 0001 — two plain subframes), `left-side`
    * (1000: left + the 17-bit side = L−R), `right-side` (1001: side +
    * right), `mid-side` (1010: mid = (L+R)>>1 carrying the side's low
    * bit, side 17-bit). The decorrelated modes are where FLAC's stereo
    * compression lives; [[flacDecodeStereo]] must reconstruct L/R
    * exactly under every mode (unit-pinned) and the downmix chain is
    * gated by q334. */
  def flacEncodeStereo(
      sampleRate: Long, left: Array[Short], right: Array[Short],
      blockSize: Int = 4096, mode: String = "mid-side"
  ): Array[Byte] = {
    require(left.length == right.length,
      s"channel length mismatch: ${left.length} vs ${right.length}")
    require(blockSize >= 16 && blockSize <= 65536,
      s"blockSize out of range: $blockSize")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= flacHeader(sampleRate, 2, 16, left.length.toLong)
    var frameIdx = 0L
    var off = 0
    while (off < left.length) {
      val n = math.min(blockSize, left.length - off)
      val l = Array.tabulate(n)(j => left(off + j).toInt)
      val r = Array.tabulate(n)(j => right(off + j).toInt)
      val (code, chans) = mode match {
        case "independent" => (0x1, Seq((l, 16), (r, 16)))
        case "left-side" =>
          (0x8, Seq((l, 16), (Array.tabulate(n)(j => l(j) - r(j)), 17)))
        case "right-side" =>
          (0x9, Seq((Array.tabulate(n)(j => l(j) - r(j)), 17), (r, 16)))
        case "mid-side" =>
          (0xa, Seq((Array.tabulate(n)(j => (l(j) + r(j)) >> 1), 16),
            (Array.tabulate(n)(j => l(j) - r(j)), 17)))
        case other =>
          throw new IllegalArgumentException(s"unknown stereo mode: $other")
      }
      out ++= flacFrame(code, frameIdx, chans)
      frameIdx += 1
      off += n
    }
    out.toArray
  }

  /** Decode ONE FLAC subframe (any spec type) at the given bit depth:
    * CONSTANT, VERBATIM, FIXED 0–4, LPC with signed quantized
    * coefficients and shift, wasted-bits unary, Rice residuals in both
    * 4- and 5-bit parameter forms plus the raw escape, partition
    * orders ≥ 0. Returns the reconstructed samples or None on any
    * malformed shape (reads ride the sticky-overrun [[BitReader]]). */
  private def decodeFlacSubframe(
      r: BitReader, n: Int, baseBps: Int): Option[Array[Int]] = {
    if (r.bits(1) != 0) return None // padding bit
    val sfType = r.bits(6).toInt
    val wasted = if (r.bits(1) == 1L) (r.unary() + 1).toInt else 0
    val effBps = baseBps - wasted
    if (effBps <= 0 || effBps > 32) return None
    val block = new Array[Int](n)
    def readResiduals(order: Int): Boolean = {
      val method = r.bits(2).toInt
      if (method > 1) return false
      val pBits = if (method == 0) 4 else 5
      val escParam = if (method == 0) 0xf else 0x1f
      val partOrder = r.bits(4).toInt
      val nPart = 1 << partOrder
      if ((n & (nPart - 1)) != 0 || n >> partOrder <= 0) return false
      var idx = order
      var p = 0
      while (p < nPart) {
        val cnt = (n >> partOrder) - (if (p == 0) order else 0)
        if (cnt < 0) return false
        val param = r.bits(pBits).toInt
        if (param == escParam) {
          val raw = r.bits(5).toInt
          var j = 0
          while (j < cnt) {
            block(idx) = r.signedBits(raw).toInt; idx += 1; j += 1
          }
        } else {
          var j = 0
          while (j < cnt) {
            val q = r.unary()
            val u = (q << param) | r.bits(param)
            block(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // unzigzag
            idx += 1; j += 1
          }
        }
        p += 1
      }
      r.ok
    }
    sfType match {
      case 0 => // CONSTANT
        val v = r.signedBits(effBps).toInt
        java.util.Arrays.fill(block, v)
      case 1 => // VERBATIM
        var j = 0
        while (j < n) { block(j) = r.signedBits(effBps).toInt; j += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        if (order > n) return None
        var j = 0
        while (j < order) { block(j) = r.signedBits(effBps).toInt; j += 1 }
        if (!readResiduals(order)) return None
        var k2 = order
        while (k2 < n) {
          val pred = order match {
            case 0 => 0L
            case 1 => block(k2 - 1).toLong
            case 2 => 2L * block(k2 - 1) - block(k2 - 2)
            case 3 => 3L * block(k2 - 1) - 3L * block(k2 - 2) + block(k2 - 3)
            case _ => 4L * block(k2 - 1) - 6L * block(k2 - 2) +
              4L * block(k2 - 3) - block(k2 - 4)
          }
          block(k2) = (block(k2) + pred).toInt
          k2 += 1
        }
      case t if t >= 32 => // LPC, order = low 5 bits + 1
        val order = (t & 0x1f) + 1
        if (order > n) return None
        var j = 0
        while (j < order) { block(j) = r.signedBits(effBps).toInt; j += 1 }
        val precision = r.bits(4).toInt + 1
        if (precision == 16) return None // 1111 is invalid per spec
        val shift = r.signedBits(5).toInt
        if (shift < 0) return None
        val coefs = Array.fill(order)(r.signedBits(precision))
        if (!readResiduals(order)) return None
        var k2 = order
        while (k2 < n) {
          var acc = 0L
          var c = 0
          while (c < order) { acc += coefs(c) * block(k2 - 1 - c); c += 1 }
          block(k2) = (block(k2) + (acc >> shift)).toInt
          k2 += 1
        }
      case _ => return None // reserved type
    }
    if (!r.ok) return None
    if (wasted > 0) {
      var j = 0
      while (j < n) { block(j) = block(j) << wasted; j += 1 }
    }
    Some(block)
  }

  /** REAL FLAC decoder (pure JVM, no codec library), mono and stereo:
    * metadata-block skip, then per frame — header bitfields (all
    * blocksize codes, the sample-rate codes including the 8/16-bit
    * trailing forms, UTF-8 frame numbers, CRC-8 verify), the channel
    * subframes ([[decodeFlacSubframe]] — every spec subframe type),
    * stereo decorrelation for ALL FOUR assignments (independent,
    * left/side, right/side, mid/side with the 17-bit side channel), and
    * the frame CRC-16 verify. Returns (sample_rate, one Array[Short]
    * per channel).
    *
    * Honesty scope: 16-bit streams with 1–2 channels — >2-channel
    * layouts return None rather than a wrong fold. Totality: every read
    * bounds-checked through the sticky-overrun [[BitReader]], unary
    * runs capped, CRC mismatches and reserved codes end the decode with
    * None — fuzz-pinned next to the other parsers. */
  def flacDecodeFrames(bytes: Array[Byte]): Option[(Long, Seq[Array[Short]])] = {
    parseFlacHeader(bytes) match {
      case Some((rate, channels, bits, nTotal))
          if (channels == 1 || channels == 2) && bits == 16 =>
        var i = 4
        var last = false
        while (!last) {
          if (i + 4 > bytes.length) return None
          last = (bytes(i) & 0x80) != 0
          val len = ((bytes(i + 1) & 0xff) << 16) |
            ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          i += 4 + len
          if (i > bytes.length) return None
        }
        val outs = Array.fill(channels.toInt)(
          scala.collection.mutable.ArrayBuffer.empty[Short])
        while ((nTotal == 0L || outs(0).length < nTotal) &&
            i + 5 <= bytes.length) {
          val frameStart = i
          val r = new BitReader(bytes, i)
          if (r.bits(14) != 0x3ffe) return None // lost sync
          r.bits(1) // reserved
          r.bits(1) // blocking strategy (both read the coded number)
          val bsCode = r.bits(4).toInt
          val srCode = r.bits(4).toInt
          val chan = r.bits(4).toInt
          val ssCode = r.bits(3).toInt
          r.bits(1) // reserved
          // per-channel base bit depths from the assignment: the side
          // channel of the decorrelated stereo modes carries bps+1
          val chanBps: Seq[Int] = chan match {
            case 0x0 => Seq(16)
            case 0x1 => Seq(16, 16)
            case 0x8 => Seq(16, 17) // left/side
            case 0x9 => Seq(17, 16) // side/right
            case 0xa => Seq(16, 17) // mid/side
            case _ => return None   // >2 channels or reserved
          }
          if (chanBps.length != channels.toInt) return None
          val bps = ssCode match {
            case 0 => 16L
            case 1 => 8L
            case 2 => 12L
            case 4 => 16L
            case 5 => 20L
            case 6 => 24L
            case 7 => 32L
            case _ => return None
          }
          if (bps != 16L) return None
          val b0 = r.bits(8).toInt
          val extra =
            if ((b0 & 0x80) == 0) 0
            else if ((b0 & 0xe0) == 0xc0) 1
            else if ((b0 & 0xf0) == 0xe0) 2
            else if ((b0 & 0xf8) == 0xf0) 3
            else if ((b0 & 0xfc) == 0xf8) 4
            else if ((b0 & 0xfe) == 0xfc) 5
            else if (b0 == 0xfe) 6
            else return None
          var e = 0
          while (e < extra) {
            if ((r.bits(8).toInt & 0xc0) != 0x80) return None
            e += 1
          }
          val blockSize = bsCode match {
            case 0 => return None // reserved
            case 1 => 192L
            case v if v >= 2 && v <= 5 => 576L << (v - 2)
            case 6 => r.bits(8) + 1
            case 7 => r.bits(16) + 1
            case v => 256L << (v - 8)
          }
          srCode match {
            case 12 => r.bits(8)
            case 13 | 14 => r.bits(16)
            case 15 => return None // invalid
            case _ => () // table / STREAMINFO codes carry no extra bytes
          }
          val crc8At = r.bytePos
          val crc8 = r.bits(8).toInt
          if (!r.ok || flacCrc8(bytes, frameStart, crc8At) != crc8) return None
          if (blockSize <= 0 || blockSize > (1L << 20)) return None
          val n = blockSize.toInt
          val decoded = chanBps.map(bd => decodeFlacSubframe(r, n, bd))
          if (decoded.exists(_.isEmpty) || !r.ok) return None
          val chs = decoded.map(_.get)
          r.alignToByte()
          val crc16At = r.bytePos
          if (crc16At + 2 > bytes.length) return None
          val crc16 = ((bytes(crc16At) & 0xff) << 8) | (bytes(crc16At + 1) & 0xff)
          if (flacCrc16(bytes, frameStart, crc16At) != crc16) return None
          // undo stereo decorrelation, then bound-check to 16 bits
          val (lr0, lr1) = chan match {
            case 0x8 => // left/side: R = L - side
              val l = chs(0); val sd = chs(1)
              (l, Array.tabulate(n)(j => l(j) - sd(j)))
            case 0x9 => // side/right: L = R + side
              val sd = chs(0); val rr = chs(1)
              (Array.tabulate(n)(j => rr(j) + sd(j)), rr)
            case 0xa => // mid/side: mid2 = (mid<<1)|(side&1)
              val mid = chs(0); val sd = chs(1)
              val l = Array.tabulate(n) { j =>
                (((mid(j) << 1) | (sd(j) & 1)) + sd(j)) >> 1
              }
              val rr = Array.tabulate(n) { j =>
                (((mid(j) << 1) | (sd(j) & 1)) - sd(j)) >> 1
              }
              (l, rr)
            case _ => (chs(0), if (chs.length > 1) chs(1) else null)
          }
          val perChan: Seq[Array[Int]] =
            if (channels == 1L) Seq(lr0) else Seq(lr0, lr1)
          var c = 0
          while (c < perChan.length) {
            val arr = perChan(c)
            var j = 0
            while (j < n) {
              val v = arr(j)
              if (v < Short.MinValue || v > Short.MaxValue) return None
              outs(c) += v.toShort
              j += 1
            }
            c += 1
          }
          i = crc16At + 2
        }
        if (nTotal > 0L && outs(0).length != nTotal) None
        else Some((rate, outs.toSeq.map(_.toArray)))
      case _ => None
    }
  }

  /** Mono 16-bit FLAC decode — [[flacDecodeFrames]] restricted to one
    * channel; the form the PCM operator family consumes through
    * [[decodePcm16Mono]]. */
  def flacDecode(bytes: Array[Byte]): Option[(Long, Array[Short])] =
    flacDecodeFrames(bytes) match {
      case Some((rate, Seq(mono))) => Some((rate, mono))
      case _ => None
    }

  /** Stereo 16-bit FLAC decode: (sample_rate, left, right) — exact
    * under every channel assignment; feeds [[pcmDownmix]]'s FLAC arm
    * (q334). */
  def flacDecodeStereo(
      bytes: Array[Byte]): Option[(Long, Array[Short], Array[Short])] =
    flacDecodeFrames(bytes) match {
      case Some((rate, Seq(l, r))) => Some((rate, l, r))
      case _ => None
    }

  /** Normalize any decodable mono-16-bit audio blob to (sample_rate,
    * samples): RIFF/WAVE via the chunk walk, FLAC via the REAL frame
    * decode ([[flacDecode]]). The single entry point the whole PCM
    * operator family routes through — [[pcmStats]], [[pcmResample]],
    * [[pcmTrimSilence]], [[pcmFrameStats]], [[audioFingerprint]] all
    * work identically on either container (q330/q331 pin the
    * equality); anything else (stereo, other depths, codec-bound
    * formats) returns None and is dropped by the operators, the same
    * honesty contract as before. */
  def decodePcm16Mono(bytes: Array[Byte]): Option[(Long, Array[Short])] = {
    if (bytes == null || bytes.length < 4) None
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      parseWavHeader(bytes).flatMap { case (rate, channels, bits, n) =>
        if (channels != 1 || bits != 16 || n <= 0) None
        else {
          val dataOff = findDataChunk(bytes)
          if (dataOff < 0 || dataOff + n * 2 > bytes.length) None
          else Some((rate, Array.tabulate(n.toInt) { j =>
            val o = dataOff + j * 2
            ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
          }))
        }
      }
    else if (bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')
      flacDecode(bytes)
    else None
  }

  /** Pure-JVM MP3 header parse: (mpeg_version, layer, bitrate_kbps,
    * sample_rate) from the first audio frame header, tolerating a
    * leading ID3v2 tag. `None` for anything that is not an MPEG audio
    * frame (bad sync, reserved indices, free-format bitrate).
    *
    * Layout (ISO 11172-3 / ID3v2.4): an optional `ID3` tag header —
    * 10 bytes whose length field is a 28-bit SYNCSAFE integer (7 bits
    * per byte, high bit zero) — then the 4-byte frame header: 11 sync
    * bits, 2 version bits (11=MPEG1, 10=MPEG2), 2 layer bits
    * (01=Layer III), then bitrate index (4) and sample-rate index (2),
    * both table lookups that differ per version. Only Layer III (the
    * "MP3" in MP3) decodes; other layers return None rather than
    * guessing at their tables. */
  def parseMp3Header(bytes: Array[Byte]): Option[(String, Long, Long, Long)] = {
    if (bytes == null || bytes.length < 4) return None
    var i = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val tagLen = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      i = 10 + tagLen
      if (i < 0 || i + 4 > bytes.length) return None
    }
    val b1 = bytes(i) & 0xff; val b2 = bytes(i + 1) & 0xff
    val b3 = bytes(i + 2) & 0xff
    if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return None // 11 sync bits
    val versionBits = (b2 >> 3) & 0x3
    val layerBits = (b2 >> 1) & 0x3
    if (layerBits != 1) return None // Layer III only
    val version = versionBits match {
      case 3 => "mpeg1"
      case 2 => "mpeg2"
      case _ => return None
    }
    val brIdx = (b3 >> 4) & 0xf
    val srIdx = (b3 >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val bitrate = if (version == "mpeg1")
      Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
    else
      Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
    val rate = if (version == "mpeg1") Seq(44100, 48000, 32000)(srIdx)
    else Seq(22050, 24000, 16000)(srIdx)
    Some((version, 3L, bitrate.toLong, rate.toLong))
  }

  /** Build a genuine ID3v2-prefixed MPEG Layer-III frame header — the
    * round-trip twin of [[parseMp3Header]]. `tagBytes` pads a real
    * (zeroed) ID3v2 tag in front so the syncsafe skip is exercised. */
  def mp3Header(
      mpeg1: Boolean, bitrateIndex: Int, sampleRateIndex: Int, tagBytes: Int = 32
  ): Array[Byte] = {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, s"bitrate idx $bitrateIndex")
    require(sampleRateIndex >= 0 && sampleRateIndex <= 2, s"rate idx $sampleRateIndex")
    require(tagBytes >= 0 && tagBytes < (1 << 28), s"tag size $tagBytes")
    val b = java.nio.ByteBuffer.allocate(10 + tagBytes + 4)
    b.put("ID3".getBytes("US-ASCII")).put(4.toByte).put(0.toByte).put(0.toByte)
      .put(((tagBytes >> 21) & 0x7f).toByte).put(((tagBytes >> 14) & 0x7f).toByte)
      .put(((tagBytes >> 7) & 0x7f).toByte).put((tagBytes & 0x7f).toByte)
    b.position(b.position() + tagBytes) // zeroed tag body
    val versionBits = if (mpeg1) 3 else 2
    b.put(0xff.toByte)
      .put((0xe0 | (versionBits << 3) | (1 << 1)).toByte) // sync + ver + L3
      .put(((bitrateIndex << 4) | (sampleRateIndex << 2)).toByte)
      .put(0.toByte)
    b.array()
  }

  /** Pure-JVM Ogg/Opus identification-header parse: (channels,
    * pre_skip, input_sample_rate) from the `OpusHead` packet on the
    * first Ogg page. `None` unless the page structure and the OpusHead
    * magic both check out (RFC 3533 page layout, RFC 7845 §5.1 header).
    * The segment table is walked, not assumed, so a first packet that
    * is not 19 bytes still parses as long as it holds OpusHead. */
  def parseOpusHead(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    def u16le(i: Int): Long = ((bytes(i + 1) & 0xff) << 8 | (bytes(i) & 0xff)).toLong
    def u32le(i: Int): Long =
      ((bytes(i + 3) & 0xffL) << 24) | ((bytes(i + 2) & 0xffL) << 16) |
        ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
    def ascii(from: Int, until: Int): String =
      new String(bytes.slice(from, until), "US-ASCII")
    if (bytes == null || bytes.length < 28 || ascii(0, 4) != "OggS" ||
      bytes(4) != 0) None
    else {
      val nSegs = bytes(26) & 0xff
      val dataAt = 27 + nSegs
      if (nSegs < 1 || dataAt + 19 > bytes.length) None
      else if (ascii(dataAt, dataAt + 8) != "OpusHead") None
      else Some((
        (bytes(dataAt + 9) & 0xff).toLong,
        u16le(dataAt + 10),
        u32le(dataAt + 12)))
    }
  }

  /** Build a genuine single-page Ogg stream holding an OpusHead — the
    * round-trip twin of [[parseOpusHead]] (CRC left zero: header-level
    * tooling reads structure, not checksums). */
  def opusHeader(channels: Long, preSkip: Long, sampleRate: Long): Array[Byte] = {
    require(channels >= 1 && channels <= 255 && preSkip >= 0 &&
      preSkip <= 0xffff && sampleRate > 0 && sampleRate <= 0xFFFFFFFFL,
      s"outside OpusHead ranges: ch=$channels preSkip=$preSkip rate=$sampleRate")
    val b = java.nio.ByteBuffer.allocate(27 + 1 + 19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OggS".getBytes("US-ASCII")).put(0.toByte) // version
      .put(0x02.toByte)   // header type: first page of stream
      .putLong(0L)        // granule position
      .putInt(1)          // serial
      .putInt(0)          // page sequence
      .putInt(0)          // CRC (unchecked at header level)
      .put(1.toByte)      // one segment
      .put(19.toByte)     // of 19 bytes: the OpusHead packet
    b.put("OpusHead".getBytes("US-ASCII"))
      .put(1.toByte)      // version
      .put(channels.toByte)
      .putShort(preSkip.toShort)
      .putInt(sampleRate.toInt)
      .putShort(0.toShort) // output gain
      .put(0.toByte)       // mapping family
    b.array()
  }

  final case class Mp3Meta(doc_id: Long, version: String, layer: Long,
      bitrate_kbps: Long, sample_rate: Long)

  /** Partition-wise MP3 metadata decode ([[parseMp3Header]]; stub row
    * for non-MP3 bytes, the decodeAudioMeta honesty contract). */
  def decodeMp3(df: DataFrame, idCol: String, binCol: String): Dataset[Mp3Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseMp3Header(bytes) match {
          case Some((v, l, br, sr)) => Mp3Meta(id, v, l, br, sr)
          case None => Mp3Meta(id, "stub", 0L, 0L, 0L)
        }
      })
  }

  final case class OpusMeta(doc_id: Long, channels: Long, pre_skip: Long,
      input_sample_rate: Long)

  /** Partition-wise Ogg/Opus metadata decode ([[parseOpusHead]]). */
  def decodeOpus(df: DataFrame, idCol: String, binCol: String): Dataset[OpusMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseOpusHead(bytes) match {
          case Some((ch, ps, sr)) => OpusMeta(id, ch, ps, sr)
          case None => OpusMeta(id, 0L, 0L, 0L)
        }
      })
  }

  /** Typed video-container metadata a decoder would emit. */
  final case class VideoMeta(
      doc_id: Long,
      brand: String,
      timescale: Long,
      duration_units: Long,
      duration_ms: Long
  )

  /** Pure-JVM MP4 (ISO BMFF, ISO/IEC 14496-12) box walk: the `ftyp`
    * major brand plus `mvhd`'s timescale and duration, no codec.
    * `None` for anything that is not a box-structured file with both.
    *
    * Each box is u32be size + 4-char type; size 1 = u64 largesize
    * follows, size 0 = box runs to end of file. `mvhd` lives inside
    * the `moov` container; its version byte picks the layout — v0
    * packs creation/modification/timescale/duration as u32, v1 widens
    * the times and duration to u64 (timescale stays u32). Sizes are
    * untrusted: the walk advances in Long so a corrupt u32 can neither
    * wrap negative nor stall, and any overshoot ends the scan. */
  def parseMp4Header(bytes: Array[Byte]): Option[(String, Long, Long)] = {
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def ascii(from: Int, until: Int): String =
      new String(bytes.slice(from, until), "US-ASCII")
    if (bytes == null || bytes.length < 16 || ascii(4, 8) != "ftyp") None
    else {
      var brand: Option[String] = None
      var mvhd: Option[(Long, Long)] = None // (timescale, duration)
      // walk(from, until): top-level boxes, recursing only into moov
      def walk(from: Long, until: Long, depth: Int): Unit = {
        var i = from
        while (i + 8 <= until && (brand.isEmpty || mvhd.isEmpty)) {
          val at = i.toInt
          val size0 = u32(at)
          val tag = ascii(at + 4, at + 8)
          val (payload, size) =
            if (size0 == 1 && i + 16 <= until) (i + 16, u64(at + 8))
            else if (size0 == 0) (i + 8, until - i) // runs to end
            else (i + 8, size0)
          if (size < 8 || i + size > until) return // corrupt: stop scan
          tag match {
            case "ftyp" if payload + 4 <= until =>
              brand = Some(ascii(payload.toInt, payload.toInt + 4))
            case "moov" if depth == 0 =>
              walk(payload, i + size, 1)
            case "mvhd" if depth == 1 =>
              val p = payload.toInt
              val version = bytes(p) & 0xff
              if (version == 1 && payload + 32 <= until)
                mvhd = Some((u32(p + 20), u64(p + 24)))
              else if (version == 0 && payload + 20 <= until)
                mvhd = Some((u32(p + 12), u32(p + 16)))
            case _ => ()
          }
          i += size
        }
      }
      walk(0L, bytes.length.toLong, 0)
      for (b <- brand; (ts, d) <- mvhd; if ts > 0) yield (b, ts, d)
    }
  }

  /** Build a real ISO BMFF prefix — a 16-byte `ftyp` plus a `moov`
    * holding one spec-complete `mvhd` (v0: 100-byte payload, v1:
    * 112-byte) — the round-trip twin of [[parseMp4Header]]. */
  def mp4Header(
      brand: String, timescale: Long, duration: Long, version: Int = 0
  ): Array[Byte] = {
    require(brand.length == 4, s"brand must be 4 ASCII chars: '$brand'")
    require(timescale > 0 && timescale <= 0xFFFFFFFFL,
      s"timescale out of u32: $timescale")
    require(duration >= 0 && (version == 1 || duration <= 0xFFFFFFFFL),
      s"duration $duration needs mvhd v1")
    require(version == 0 || version == 1, s"mvhd version 0 or 1: $version")
    val mvhdPayload = if (version == 0) 100 else 112
    val b = java.nio.ByteBuffer.allocate(16 + 8 + 8 + mvhdPayload)
    b.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put(brand.getBytes("US-ASCII")).putInt(0) // minor_version
    b.putInt(8 + 8 + mvhdPayload).put("moov".getBytes("US-ASCII"))
    b.putInt(8 + mvhdPayload).put("mvhd".getBytes("US-ASCII"))
      .putInt(version << 24) // version byte + zero flags
    if (version == 0)
      b.putInt(0).putInt(0) // creation/modification
        .putInt(timescale.toInt).putInt(duration.toInt)
    else
      b.putLong(0L).putLong(0L)
        .putInt(timescale.toInt).putLong(duration)
    b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort) // rate, volume
      .putLong(0L) // 2×u32 reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(b.putInt) // identity matrix
    (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
    b.putInt(2) // next_track_ID
    b.array()
  }

  /** One blob's triage row: sniffed container (or `unknown`) and
    * whether the cheap structural parse succeeded — decode_ok means
    * "this blob will survive its family's real decoder/parser", per
    * container: pixels for images, PCM reachability for WAV/FLAC
    * (mono or stereo 16-bit, via decodePcm16Mono/decodePcm16Stereo),
    * a valid moov for MP4, MJPEG frames for AVI. */
  final case class MediaTriage(
      doc_id: Long, container: String, decode_ok: Long, n_bytes: Long)

  /** MEDIA-LAKE TRIAGE — the first pass over a mixed blob column:
    * sniff every container ([[parseImageHeader]] for the five image
    * formats, RIFF/WAVE vs RIFF/AVI, fLaC, ISO-BMFF) and probe whether
    * its family's structural decode succeeds, without ever throwing on
    * junk (every parser here is totality-fuzzed). One partition-wise
    * pass, scan-speed, no shuffle — the census that decides which
    * downstream pipelines (image/audio/video) see which rows and how
    * much of the lake is dead weight. Gated by q338 against
    * construction truth over a deliberately mixed delivery. */
  def mediaTriage(
      df: DataFrame, idCol: String, binCol: String): Dataset[MediaTriage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          def ascii(from: Int, until: Int): String =
            if (b.length >= until)
              new String(b.slice(from, until), "US-ASCII") else ""
          val (container, ok) = parseImageHeader(b) match {
            case Some((fmt, _, _)) => (fmt, decodeImage(b).isDefined)
            case None if b.length >= 2 && b(0) == 'B' && b(1) == 'M' =>
              ("bmp", decodeImage(b).isDefined)
            case None if ascii(0, 4) == "RIFF" && ascii(8, 12) == "WAVE" =>
              ("wav", decodePcm16Mono(b).isDefined ||
                decodePcm16Stereo(b).isDefined)
            case None if ascii(0, 4) == "RIFF" && ascii(8, 12) == "AVI " =>
              ("avi", parseAviMjpegFrames(b).isDefined)
            case None if ascii(0, 4) == "fLaC" =>
              ("flac", decodePcm16Mono(b).isDefined ||
                decodePcm16Stereo(b).isDefined)
            case None if ascii(4, 8) == "ftyp" =>
              ("mp4", parseMp4Tracks(b).isDefined)
            case None => ("unknown", false)
          }
          MediaTriage(id, container, if (ok) 1L else 0L, b.length.toLong)
        }
      }
  }

  /** One MP4 track's container-level story, no codec: identity and
    * presentation size from `tkhd` (16.16 fixed-point, stored as whole
    * pixels), the media clock from `mdhd`, the sample timing runs from
    * `stts` (count, delta) and the sync-sample (keyframe) numbers from
    * `stss` — everything a seek/preview/triage pipeline needs before
    * any decoder runs. */
  final case class Mp4Track(
      trackId: Long, width: Long, height: Long,
      mediaTimescale: Long, mediaDuration: Long,
      stts: Seq[(Long, Long)], stss: Seq[Long],
      sampleSizes: Seq[Long] = Nil,          // stsz, materialized per sample
      stsc: Seq[(Long, Long)] = Nil,         // (first_chunk, samples_per_chunk)
      chunkOffsets: Seq[Long] = Nil)         // stco / co64

  /** Deep ISO BMFF walk (ISO/IEC 14496-12) — [[parseMp4Header]]'s
    * track-level extension: recurse `moov → trak → {tkhd, mdia → {mdhd,
    * minf → stbl → {stts, stss}}}` and return one [[Mp4Track]] per
    * `trak` carrying a valid `mdhd` (timescale > 0). No codec anywhere:
    * dimensions, clocks, sample timing and the keyframe index are all
    * container metadata — the point is that a 100 TB video lake can be
    * cataloged, deduped by structure, and seek-indexed without touching
    * H.264 (whose frame decode stays the documented stub).
    *
    * Totality: sizes/counts/offsets are untrusted — the walk advances in
    * Long (no u32 wrap), any overshoot or sub-8 size ends the enclosing
    * scan, `stts`/`stss` entry counts are bounds-checked against the box
    * END (a 4-billion entry_count in an 80-byte box reads nothing), and
    * v0/v1 layouts of `tkhd`/`mdhd` are both handled. Fuzz-pinned in
    * PropertySpec next to the other 16 parsers. */
  def parseMp4Tracks(bytes: Array[Byte]): Option[Seq[Mp4Track]] = {
    if (bytes == null || bytes.length < 16) return None
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def ascii(from: Int, until: Int): String =
      new String(bytes.slice(from, until), "US-ASCII")
    if (ascii(4, 8) != "ftyp") return None
    final class Cur {
      var id: Long = -1L; var w: Long = 0L; var h: Long = 0L
      var ts: Long = 0L; var dur: Long = 0L
      val stts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val stss = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stsz = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stsc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val stco = scala.collection.mutable.ArrayBuffer.empty[Long]
    }
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    var cur: Cur = null
    def walk(from: Long, until: Long, path: List[String]): Unit = {
      var i = from
      while (i + 8 <= until) {
        val at = i.toInt
        val size0 = u32(at)
        val tag = ascii(at + 4, at + 8)
        val (payload, size) =
          if (size0 == 1 && i + 16 <= until) (i + 16, u64(at + 8))
          else if (size0 == 0) (i + 8, until - i) // runs to end
          else (i + 8, size0)
        if (size < 8 || i + size > until || payload > i + size) return
        val boxEnd = i + size
        val p = payload.toInt
        (tag, path) match {
          case ("moov", Nil) => walk(payload, boxEnd, List("moov"))
          case ("trak", "moov" :: _) =>
            cur = new Cur
            walk(payload, boxEnd, "trak" :: path)
            if (cur.id >= 0 && cur.ts > 0)
              tracks += Mp4Track(cur.id, cur.w, cur.h, cur.ts, cur.dur,
                cur.stts.toSeq, cur.stss.toSeq, cur.stsz.toSeq,
                cur.stsc.toSeq, cur.stco.toSeq)
            cur = null
          case ("mdia", "trak" :: _) => walk(payload, boxEnd, "mdia" :: path)
          case ("minf", "mdia" :: _) => walk(payload, boxEnd, "minf" :: path)
          case ("stbl", "minf" :: _) => walk(payload, boxEnd, "stbl" :: path)
          case ("tkhd", "trak" :: _) if cur != null =>
            val v = if (payload + 1 <= boxEnd) bytes(p) & 0xff else -1
            if (v == 0 && payload + 84 <= boxEnd) {
              cur.id = u32(p + 12)
              cur.w = u32(p + 76) >> 16; cur.h = u32(p + 80) >> 16
            } else if (v == 1 && payload + 96 <= boxEnd) {
              cur.id = u32(p + 20)
              cur.w = u32(p + 88) >> 16; cur.h = u32(p + 92) >> 16
            }
          case ("mdhd", "mdia" :: _) if cur != null =>
            val v = if (payload + 1 <= boxEnd) bytes(p) & 0xff else -1
            if (v == 0 && payload + 20 <= boxEnd) {
              cur.ts = u32(p + 12); cur.dur = u32(p + 16)
            } else if (v == 1 && payload + 32 <= boxEnd) {
              cur.ts = u32(p + 20); cur.dur = u64(p + 24)
            }
          case ("stts", "stbl" :: _) if cur != null =>
            if (payload + 8 <= boxEnd) {
              val n = u32(p + 4)
              // bounds-check the ENTRY TABLE against the box end: a huge
              // count in a small box reads nothing instead of throwing
              if (n >= 0 && payload + 8 + n * 8 <= boxEnd) {
                var e = 0
                while (e < n) {
                  cur.stts += ((u32(p + 8 + e * 8), u32(p + 12 + e * 8)))
                  e += 1
                }
              }
            }
          case ("stss", "stbl" :: _) if cur != null =>
            if (payload + 8 <= boxEnd) {
              val n = u32(p + 4)
              if (n >= 0 && payload + 8 + n * 4 <= boxEnd) {
                var e = 0
                while (e < n) { cur.stss += u32(p + 8 + e * 4); e += 1 }
              }
            }
          case ("stsz", "stbl" :: _) if cur != null =>
            // u32 uniform sample_size (0 = per-sample table), u32 count;
            // a uniform size materializes count entries — count is still
            // bounds-capped (a 4-billion count expands nothing)
            if (payload + 12 <= boxEnd) {
              val uniform = u32(p + 4)
              val n = u32(p + 8)
              if (uniform > 0 && n >= 0 && n <= (1L << 20)) {
                var e = 0L
                while (e < n) { cur.stsz += uniform; e += 1 }
              } else if (uniform == 0 && n >= 0 &&
                  payload + 12 + n * 4 <= boxEnd) {
                var e = 0
                while (e < n) { cur.stsz += u32(p + 12 + e * 4); e += 1 }
              }
            }
          case ("stsc", "stbl" :: _) if cur != null =>
            if (payload + 8 <= boxEnd) {
              val n = u32(p + 4)
              if (n >= 0 && payload + 8 + n * 12 <= boxEnd) {
                var e = 0
                while (e < n) { // (first_chunk, samples_per_chunk); desc idx skipped
                  cur.stsc += ((u32(p + 8 + e * 12), u32(p + 12 + e * 12)))
                  e += 1
                }
              }
            }
          case ("stco", "stbl" :: _) if cur != null =>
            if (payload + 8 <= boxEnd) {
              val n = u32(p + 4)
              if (n >= 0 && payload + 8 + n * 4 <= boxEnd) {
                var e = 0
                while (e < n) { cur.stco += u32(p + 8 + e * 4); e += 1 }
              }
            }
          case ("co64", "stbl" :: _) if cur != null =>
            if (payload + 8 <= boxEnd) {
              val n = u32(p + 4)
              if (n >= 0 && payload + 8 + n * 8 <= boxEnd) {
                var e = 0
                while (e < n) { cur.stco += u64(p + 8 + e * 8); e += 1 }
              }
            }
          case _ => ()
        }
        i = boxEnd
      }
    }
    walk(0L, bytes.length.toLong, Nil)
    if (tracks.isEmpty) None else Some(tracks.toSeq)
  }

  /** Fixture spec for [[mp4WithTracks]] — the builder-side twin of
    * [[Mp4Track]]. */
  final case class Mp4TrackSpec(
      trackId: Long, width: Long, height: Long,
      mediaTimescale: Long, mediaDuration: Long,
      stts: Seq[(Long, Long)], stss: Seq[Long],
      sampleSizes: Seq[Long] = Nil,
      stsc: Seq[(Long, Long)] = Nil,
      chunkOffsets: Seq[Long] = Nil)

  /** Build a real ISO BMFF structural skeleton: `ftyp` + `moov { mvhd,
    * trak { tkhd, mdia { mdhd, minf { stbl { stts [, stss] } } } }* }`
    * with spec-exact v0 box layouts — the round-trip twin of
    * [[parseMp4Tracks]] (no `mdat`/`stsd`: the skeleton carries exactly
    * the container metadata the parser reads; a real file adds codec
    * boxes this walk ignores). */
  def mp4WithTracks(
      brand: String, timescale: Long, duration: Long,
      tracks: Seq[Mp4TrackSpec]): Array[Byte] = {
    require(brand.length == 4, s"brand must be 4 ASCII chars: '$brand'")
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def full(tag: String, body: java.nio.ByteBuffer): Array[Byte] =
      box(tag, body.array())
    val ftyp = {
      val b = java.nio.ByteBuffer.allocate(8)
      b.put(brand.getBytes("US-ASCII")).putInt(0)
      box("ftyp", b.array())
    }
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version + flags
        .putInt(0).putInt(0) // creation/modification
        .putInt(timescale.toInt).putInt(duration.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort)
        .putLong(0L)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)
      (1 to 6).foreach(_ => b.putInt(0))
      b.putInt(tracks.size + 1)
      full("mvhd", b)
    }
    val traks = tracks.map { t =>
      val tkhd = {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(0x00000007) // v0 + enabled/in-movie/in-preview flags
          .putInt(0).putInt(0) // creation/modification
          .putInt(t.trackId.toInt).putInt(0) // track_ID, reserved
          .putInt(0) // duration (movie timescale; skeleton leaves 0)
          .putLong(0L) // reserved
          .putShort(0.toShort).putShort(0.toShort) // layer, alt group
          .putShort(0.toShort).putShort(0.toShort) // volume, reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(b.putInt)
        b.putInt((t.width << 16).toInt).putInt((t.height << 16).toInt)
        full("tkhd", b)
      }
      val mdhd = {
        val b = java.nio.ByteBuffer.allocate(24)
        b.putInt(0).putInt(0).putInt(0)
          .putInt(t.mediaTimescale.toInt).putInt(t.mediaDuration.toInt)
          .putShort(0x55c4.toShort) // language 'und'
          .putShort(0.toShort)
        full("mdhd", b)
      }
      val stts = {
        val b = java.nio.ByteBuffer.allocate(8 + t.stts.size * 8)
        b.putInt(0).putInt(t.stts.size)
        t.stts.foreach { case (c, d) => b.putInt(c.toInt).putInt(d.toInt) }
        full("stts", b)
      }
      val stss =
        if (t.stss.isEmpty) Array.emptyByteArray
        else {
          val b = java.nio.ByteBuffer.allocate(8 + t.stss.size * 4)
          b.putInt(0).putInt(t.stss.size)
          t.stss.foreach(s => b.putInt(s.toInt))
          full("stss", b)
        }
      val stsz =
        if (t.sampleSizes.isEmpty) Array.emptyByteArray
        else {
          val b = java.nio.ByteBuffer.allocate(12 + t.sampleSizes.size * 4)
          b.putInt(0).putInt(0).putInt(t.sampleSizes.size) // per-sample table
          t.sampleSizes.foreach(s => b.putInt(s.toInt))
          full("stsz", b)
        }
      val stsc =
        if (t.stsc.isEmpty) Array.emptyByteArray
        else {
          val b = java.nio.ByteBuffer.allocate(8 + t.stsc.size * 12)
          b.putInt(0).putInt(t.stsc.size)
          t.stsc.foreach { case (fc, spc) =>
            b.putInt(fc.toInt).putInt(spc.toInt).putInt(1)
          }
          full("stsc", b)
        }
      val stco =
        if (t.chunkOffsets.isEmpty) Array.emptyByteArray
        else {
          val b = java.nio.ByteBuffer.allocate(8 + t.chunkOffsets.size * 4)
          b.putInt(0).putInt(t.chunkOffsets.size)
          t.chunkOffsets.foreach(o => b.putInt(o.toInt))
          full("stco", b)
        }
      val stbl = box("stbl", stts ++ stss ++ stsz ++ stsc ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ minf)
      box("trak", tkhd ++ mdia)
    }
    ftyp ++ box("moov", mvhd ++ traks.flatten.toArray)
  }

  /** Per-track container metadata row: sample count and total timing
    * units fold the `stts` runs, `n_keyframes` counts `stss`. */
  final case class Mp4TrackMetaRow(
      doc_id: Long, track_id: Long, width: Long, height: Long,
      media_timescale: Long, media_duration: Long,
      n_samples: Long, total_units: Long, n_keyframes: Long)

  /** Partition-wise MP4 track catalog over [[parseMp4Tracks]]: one row
    * per parsed track; blobs with no parseable `moov` are DROPPED (the
    * honesty contract — [[decodeVideoMeta]] is the stub-backed variant
    * that never drops). Pure per-row byte walk: scan-speed, no shuffle,
    * embarrassingly parallel at any scale. Gated by q329 against the
    * construction-truth oracle. */
  def mp4TrackMeta(
      df: DataFrame, idCol: String, binCol: String): Dataset[Mp4TrackMetaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parseMp4Tracks(bytes).toSeq.flatten.map { t =>
            Mp4TrackMetaRow(id, t.trackId, t.width, t.height,
              t.mediaTimescale, t.mediaDuration,
              t.stts.map(_._1).sum,
              t.stts.map { case (c, d) => c * d }.sum,
              t.stss.size.toLong)
          }
        }
      }
  }

  /** One keyframe (sync sample) with its media-clock timestamp. */
  final case class Mp4Keyframe(
      doc_id: Long, track_id: Long, sample_number: Long, t_units: Long)

  /** The SEEK TABLE: every `stss` sync sample resolved to its start time
    * on the media clock by walking the `stts` runs — `t_units` = Σ
    * deltas of samples before it, exact integer arithmetic. Sync
    * entries beyond the sample count (corrupt index) are dropped.
    * This is what "jump to the keyframe nearest t" needs, computed from
    * container metadata alone — no codec, scan-speed, no shuffle.
    * Gated by q328 against the construction-truth oracle. */
  def mp4KeyframeIndex(
      df: DataFrame, idCol: String, binCol: String): Dataset[Mp4Keyframe] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parseMp4Tracks(bytes).toSeq.flatten.flatMap { t =>
            val nSamples = t.stts.map(_._1).sum
            // run starts: sample number and time at each run boundary
            val starts = t.stts.scanLeft((1L, 0L)) {
              case ((s0, t0), (c, d)) => (s0 + c, t0 + c * d)
            }
            t.stss.filter(s => s >= 1 && s <= nSamples).map { s =>
              // the run containing sample s: last boundary with s0 <= s
              val ((s0, t0), (_, d)) =
                starts.zip(t.stts).takeWhile(_._1._1 <= s).last
              Mp4Keyframe(id, t.trackId, s, t0 + (s - s0) * d)
            }
          }
        }
      }
  }

  /** One sample's byte extent in the container. */
  final case class Mp4Sample(
      doc_id: Long, track_id: Long, sample_number: Long,
      chunk_number: Long, byte_offset: Long, size: Long)

  /** The SAMPLE BYTE MAP — "where exactly are sample N's bytes": the
    * stsc run-length (chunk c takes its samples-per-chunk from the last
    * entry with first_chunk ≤ c) assigns samples to chunks, stco/co64
    * places each chunk, and stsz sizes accumulate within a chunk —
    * offset(sample) = chunk_offset + Σ sizes of its chunk predecessors.
    * Exact integer arithmetic over container metadata only: this is the
    * random-access map a range-request extractor or a clip service
    * needs before touching any codec. Tracks whose three tables are
    * inconsistent (stsc-implied count ≠ stsz count, or missing chunks)
    * are DROPPED whole — a partially wrong seek map is worse than none.
    * Gated by q335 against the construction-truth oracle. */
  /** The pure extent walk behind [[mp4SampleMap]] and
    * [[mp4ExtractSamples]]: (sample_number, chunk_number, byte_offset,
    * size) per sample, or Nil when the three tables are missing or
    * inconsistent. */
  private def mp4SampleExtents(t: Mp4Track): Seq[(Long, Long, Long, Long)] = {
    if (t.sampleSizes.isEmpty || t.stsc.isEmpty || t.chunkOffsets.isEmpty)
      return Seq.empty
    // samples-per-chunk for chunk c (1-based): the last stsc entry with
    // first_chunk <= c (entries sorted per spec)
    val sorted = t.stsc.sortBy(_._1)
    def spcOf(c: Long): Long =
      sorted.takeWhile(_._1 <= c).lastOption.map(_._2).getOrElse(0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var sample = 0 // 0-based index into sampleSizes
    var consistent = true
    var c = 0
    while (c < t.chunkOffsets.length && consistent) {
      val spc = spcOf(c + 1L)
      if (spc <= 0) consistent = false
      else {
        var within = 0L
        var off = t.chunkOffsets(c)
        while (within < spc && consistent) {
          if (sample >= t.sampleSizes.length) consistent = false
          else {
            out += ((sample + 1L, c + 1L, off, t.sampleSizes(sample)))
            off += t.sampleSizes(sample)
            sample += 1; within += 1
          }
        }
      }
      c += 1
    }
    // every size must be consumed: trailing unplaced samples mean the
    // chunk tables are short — drop the track
    if (consistent && sample == t.sampleSizes.length) out.toSeq
    else Seq.empty
  }

  def mp4SampleMap(
      df: DataFrame, idCol: String, binCol: String): Dataset[Mp4Sample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parseMp4Tracks(bytes).toSeq.flatten.flatMap { t =>
            mp4SampleExtents(t).map { case (s, c, off, sz) =>
              Mp4Sample(id, t.trackId, s, c, off, sz)
            }
          }
        }
      }
  }

  /** One extracted sample payload. */
  final case class Mp4SamplePayload(
      doc_id: Long, track_id: Long, sample_number: Long, payload: Array[Byte])

  /** CLIP EXTRACTION: slice every sample's actual bytes out of the blob
    * through the [[mp4SampleMap]] extents — the map proven against REAL
    * `mdat` bytes, not just arithmetic (a wrong offset returns wrong
    * bytes, and q336's md5 gate catches it). Samples whose extent falls
    * outside the blob drop their whole TRACK (same all-or-nothing
    * contract as the map: a clip service serving partially wrong bytes
    * is worse than failing). */
  def mp4ExtractSamples(
      df: DataFrame, idCol: String, binCol: String): Dataset[Mp4SamplePayload] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          parseMp4Tracks(bytes).toSeq.flatten.flatMap { t =>
            val ext = mp4SampleExtents(t)
            if (ext.exists { case (_, _, off, sz) =>
              off < 0 || sz < 0 || off + sz > bytes.length }) Seq.empty
            else ext.map { case (s, _, off, sz) =>
              Mp4SamplePayload(id, t.trackId, s,
                java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt))
            }
          }
        }
      }
  }

  /** Partition-wise video metadata decode — the video face of
    * [[decodeMeta]]/[[decodeAudioMeta]]: real MP4 box walk,
    * deterministic stub values for other containers (same honesty
    * contract). `duration_ms` = units·1000 / timescale, exact integer
    * arithmetic. */
  def decodeVideoMeta(df: DataFrame, idCol: String, binCol: String): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          parseMp4Header(bytes) match {
            case Some((brand, ts, d)) =>
              VideoMeta(id, brand, ts, d, d * 1000L / ts)
            case None =>
              val len = if (bytes == null) 0L else bytes.length.toLong
              VideoMeta(id, "stub", 1000L, len, len)
          }
        }
      }
  }

  /** Media embedding row — feeds [[Similarity]] directly. */
  final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Feature extraction: binary → fixed-`dim` float vector. The stub is a
    * deterministic byte-bucket histogram (L1-normalized) — a real encoder
    * (CLIP, audio embedder…) replaces the histogram; per-partition model
    * init amortizes exactly where the comment sits. Output is the same
    * `array<float>` shape the similarity/ANN operators consume, so
    * `frameSampleStub → featureExtractStub → Similarity.withNorm →
    * ivfTopK` is a complete media-dedup pipeline. */
  /** REAL image embedding — the production replacement for
    * [[featureExtractStub]] wherever a decoder exists ([[decodeImage]]:
    * BMP/PNG/JPEG/GIF): decode → nearest-neighbor resample to a
    * `grid`×`grid` raster → the raw RGB cells as a 3·grid² float vector
    * (row-major, r/g/b per cell). Every dimension is an exact integer
    * 0–255, so downstream dot products and squared norms stay exact
    * integers in doubles (all partial sums < 2^53) — fold order cannot
    * matter and a SQL oracle can restate the whole ANN chain
    * arithmetically (q316). Undecodable blobs are DROPPED (the honesty
    * contract — [[featureExtractStub]] remains the documented stand-in
    * for bytes no JVM codec reads). Feeds [[graft.ops.Similarity]]
    * directly: `imageEmbedding → withNorm → bruteForceTopK/ivfTopK` is
    * the real media-similarity pipeline. */
  def imageEmbedding(
      df: DataFrame, idCol: String, binCol: String, grid: Int = 4
  ): Dataset[MediaEmbedding] = {
    require(grid >= 1, s"grid must be positive, got $grid")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { img =>
            val r = resampleNearest(img, grid, grid)
            MediaEmbedding(id, r.rgb.map(b => (b & 0xff).toFloat))
          }
        }
      }
  }

  def featureExtractStub(
      df: DataFrame, idCol: String, binCol: String, dim: Int = 16
  ): Dataset[MediaEmbedding] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition model load would go here
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val hist = new Array[Float](dim)
          b.foreach(x => hist((x & 0xff) % dim) += 1f)
          val total = math.max(1f, b.length.toFloat)
          MediaEmbedding(id, hist.map(_ / total))
        }
      }
  }
}

package graft.sources

/** GIF codec (public GIF89a spec): palette images behind GIF-variant LZW
  * (LSB-first packed, growing code width, CLEAR/EOI codes) — decodable on
  * the bare JVM like PNG/WAV. Decoder returns the FIRST image frame with
  * its palette applied; 89a extensions (graphic control, comments,
  * application) are skipped, interlaced frames are de-interlaced.
  * Encoder writes a single non-interlaced frame with a 256-entry global
  * color table and real LZW (dictionary growth + overflow CLEAR).
  */
object Gif {

  // ------------------------------------------------------------ decode
  /** (width, height, RGB interleaved — palette applied). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length > 13 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F',
      "not a GIF stream")
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    var pos = 6
    val sw = le16(pos); val sh = le16(pos + 2)
    val flags = u8(pos + 4)
    pos += 7
    var globalTable: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      globalTable = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
      pos += n * 3
    }
    while (pos < bytes.length) {
      u8(pos) match {
        case 0x3b => throw new IllegalArgumentException("GIF trailer before any image frame")
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (u8(pos) != 0) pos += 1 + u8(pos)
          pos += 1
        case 0x2c => // image descriptor
          val iw = le16(pos + 5); val ih = le16(pos + 7)
          val iflags = u8(pos + 9)
          pos += 10
          var table = globalTable
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            table = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
            pos += n * 3
          }
          require(table != null, "GIF frame without a color table")
          val minCode = u8(pos)
          pos += 1
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (u8(pos) != 0) {
            val len = u8(pos)
            data.write(bytes, pos + 1, len)
            pos += 1 + len
          }
          pos += 1
          val indices = lzwDecode(data.toByteArray, minCode, iw * ih)
          val ordered =
            if ((iflags & 0x40) == 0) indices
            else deinterlace(indices, iw, ih)
          val rgb = new Array[Byte](iw * ih * 3)
          var i = 0
          while (i < iw * ih) {
            val t = (ordered(i) & 0xff) * 3
            require(t + 2 < table.length, s"palette index ${ordered(i) & 0xff} out of range")
            rgb(i * 3) = table(t); rgb(i * 3 + 1) = table(t + 1); rgb(i * 3 + 2) = table(t + 2)
            i += 1
          }
          val _ = (sw, sh) // frame dims rule; screen dims only position frames
          return (iw, ih, rgb)
        case other => throw new IllegalArgumentException(f"bad GIF block 0x$other%02X")
      }
    }
    throw new IllegalArgumentException("GIF ended without an image frame")
  }

  /** Luma reduction (same fixed-point BT.601 weights as [[Png]]). */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, rgb) = decode(bytes)
    val g = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(i * 3) & 0xff; val gg = rgb(i * 3 + 1) & 0xff; val b = rgb(i * 3 + 2) & 0xff
      g(i) = ((77 * r + 151 * gg + 28 * b) >> 8).toByte
      i += 1
    }
    (w, h, g)
  }

  /** Interlaced GIF row passes: 8/8, 8/8 offset 4, 4/4 offset 2, 2/2 offset 1. */
  private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var row = start
      while (row < h) {
        System.arraycopy(px, src * w, out, row * w, w)
        src += 1
        row += step
      }
    }
    out
  }

  /** GIF-variant LZW decode: codes packed LSB-first, width grows from
    * minCode+1 up to 12 bits, CLEAR resets the dictionary, EOI ends.
    */
  private[sources] def lzwDecode(data: Array[Byte], minCode: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    // dictionary: prefix chains (suffix byte + prefix code)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = eoi + 1
    var width = minCode + 1
    var acc = 0L
    var nbits = 0
    var bp = 0
    var prev = -1
    def emit(code: Int): Byte = { // writes code's string, returns its first byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear) { stack = suffix(c) :: stack; c = prefix(c) }
      val first = c.toByte
      out.write(c)
      stack.foreach(b => out.write(b & 0xff))
      first
    }
    var done = false
    while (!done && out.size < expected) {
      while (nbits < width && bp < data.length) {
        acc |= (data(bp) & 0xffL) << nbits
        nbits += 8
        bp += 1
      }
      if (nbits < width) done = true // truncated — return what we have
      else {
        val code = (acc & ((1 << width) - 1)).toInt
        acc >>>= width
        nbits -= width
        if (code == clear) {
          dictSize = eoi + 1
          width = minCode + 1
          prev = -1
        } else if (code == eoi) done = true
        else if (prev < 0) {
          require(code < clear, "first code after CLEAR must be a literal")
          out.write(code)
          prev = code
        } else {
          val first =
            if (code < dictSize) emit(code)
            else { // KwKwK case: code == dictSize
              require(code == dictSize, s"LZW code $code beyond dictionary")
              var c = prev
              while (c >= clear) c = prefix(c)
              val f = c.toByte
              // prev's string + its own first byte
              var stack = List.empty[Byte]
              var d = prev
              while (d >= clear) { stack = suffix(d) :: stack; d = prefix(d) }
              out.write(d)
              stack.foreach(b => out.write(b & 0xff))
              out.write(f & 0xff)
              f
            }
          if (dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = first
            dictSize += 1
            if (dictSize == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
    }
    val arr = out.toByteArray
    require(arr.length >= expected, s"LZW stream ended at ${arr.length} of $expected pixels")
    java.util.Arrays.copyOf(arr, expected)
  }

  // ------------------------------------------------------------ encode
  /** Encode palette indices (one byte each, values < 256) with the given
    * 256-entry RGB table as a single-frame GIF89a.
    */
  def encode(indices: Array[Byte], w: Int, h: Int, table: Array[Byte]): Array[Byte] = {
    require(indices.length == w * h, "indices must be w*h row-major")
    require(table.length == 256 * 3, "need a 256-entry RGB color table")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0xf7) // global table, 256 entries, 8-bit color resolution
    out.write(0); out.write(0)
    out.write(table, 0, table.length)
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local table, not interlaced
    val minCode = 8
    out.write(minCode)
    val lzw = lzwEncode(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Grayscale convenience: identity 256-gray palette, pixel = index. */
  def encodeGray(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    val table = new Array[Byte](256 * 3)
    var i = 0
    while (i < 256) { table(i * 3) = i.toByte; table(i * 3 + 1) = i.toByte; table(i * 3 + 2) = i.toByte; i += 1 }
    encode(pixels.map(_.toByte), w, h, table)
  }

  /** Real GIF LZW encoder (dictionary growth, CLEAR on overflow). */
  private[sources] def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = scala.collection.mutable.HashMap.empty[Int, Int]
    var dictSize = eoi + 1
    put(clear)
    var prev = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prev < 0) prev = b
      else {
        val key = (prev << 8) | b
        dict.get(key) match {
          case Some(code) => prev = code
          case None =>
            put(prev)
            if (dictSize < 4096) {
              // width-bump BETWEEN writing this code and assigning its
              // entry (the giflib timing): the decoder constructs each
              // entry one code LATER than the encoder assigns it, so an
              // encoder post-add bump would switch width one code early
              if (dictSize >= (1 << width) && width < 12) width += 1
              dict(key) = dictSize
              dictSize += 1
            } else {
              put(clear)
              dict = scala.collection.mutable.HashMap.empty[Int, Int]
              dictSize = eoi + 1
              width = minCode + 1
            }
            prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }
}

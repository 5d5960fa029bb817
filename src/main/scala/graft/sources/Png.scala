package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** PNG codec (public RFC 2083 / W3C spec), self-contained on the JDK:
  * zlib rides on `java.util.zip`, filters and chunk framing are
  * implemented here. LOSSLESS — any content round-trips bit-exactly,
  * which is what lets the qm5 gate replay arbitrary (not block-constant)
  * pixels in SQL.
  *
  * Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  * 4 (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/
  * Average/Paeth); non-interlaced only (Adam7 throws loudly). Encoder
  * emits grayscale, filter 0, one IDAT.
  */
object Png {

  private val Signature = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // ------------------------------------------------------------ decode
  /** Decode to (width, height, channels, pixels) with pixels row-major,
    * `channels` interleaved (1 gray, 2 gray+alpha, 3 RGB, 4 RGBA —
    * palette expands to RGB).
    */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length > 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG stream (bad signature)")
    def u32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    var pos = 8
    var w = 0
    var h = 0
    var bitDepth = 0
    var colorType = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= bytes.length) {
      val len = u32(pos)
      val ctype = new String(bytes, pos + 4, 4, "ASCII")
      // a crafted negative/oversized length would leave pos stationary or
      // moving backwards and spin forever; widen to Long so a length near
      // Int.MaxValue can't wrap the sum past the check
      require(len >= 0 && pos.toLong + 8 + len + 4 <= bytes.length,
        s"corrupt PNG: chunk '$ctype' declares length $len at offset $pos")
      val dataOff = pos + 8
      ctype match {
        case "IHDR" =>
          w = u32(dataOff)
          h = u32(dataOff + 4)
          bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          require(bitDepth == 8, s"only 8-bit PNG supported, got depth $bitDepth")
          require(Set(0, 2, 3, 4, 6)(colorType), s"bad PNG color type $colorType")
          require((bytes(dataOff + 12) & 0xff) == 0,
            "interlaced (Adam7) PNG not supported — re-encode progressive assets")
        case "PLTE" => palette = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len)
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk — skip
      }
      pos = dataOff + len + 4 // + CRC
    }
    require(w > 0 && h > 0, "missing IHDR")
    val srcCh = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => 1 // palette indices
      case 4 => 2
      case 6 => 4
    }
    // inflate the filtered scanlines: h rows of (1 filter byte + w*ch)
    val stride = w * srcCh
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // zero progress = truncated stream OR a preset-dictionary (FDICT)
      // zlib header — either way corrupt for PNG; throw, never spin
      require(n > 0, if (inf.needsDictionary()) "IDAT demands a preset dictionary (corrupt PNG)"
        else "truncated IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"IDAT inflated to $got bytes, expected ${raw.length}")
    // undo per-row filters in place into the output array
    val out = new Array[Byte](stride * h)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= srcCh) out(rowOut + x - srcCh) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= srcCh) out(rowOut - stride + x - srcCh) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad PNG filter $other")
        }
        out(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    if (colorType == 3) {
      require(palette != null, "palette image without PLTE")
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val idx = (out(i) & 0xff) * 3
        rgb(i * 3) = palette(idx)
        rgb(i * 3 + 1) = palette(idx + 1)
        rgb(i * 3 + 2) = palette(idx + 2)
        i += 1
      }
      (w, h, 3, rgb)
    } else (w, h, srcCh, out)
  }

  /** Decode collapsed to one gray channel: gray passes through; color
    * reduces via the integer luma (77·R + 151·G + 28·B) >> 8 (the fixed-
    * point BT.601 weights — deterministic, no float); alpha is dropped.
    */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, ch, px) = decode(bytes)
    ch match {
      case 1 => (w, h, px)
      case 2 =>
        val g = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) { g(i) = px(i * 2); i += 1 }
        (w, h, g)
      case 3 | 4 =>
        val g = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          val r = px(i * ch) & 0xff; val gg = px(i * ch + 1) & 0xff; val b = px(i * ch + 2) & 0xff
          g(i) = ((77 * r + 151 * gg + 28 * b) >> 8).toByte
          i += 1
        }
        (w, h, g)
    }
  }

  // ------------------------------------------------------------ encode
  private def chunk(out: java.io.ByteArrayOutputStream, ctype: String, data: Array[Byte]): Unit = {
    def be32(v: Int): Array[Byte] =
      Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    out.write(be32(data.length), 0, 4)
    val tb = ctype.getBytes("ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb)
    crc.update(data)
    out.write(be32(crc.getValue.toInt), 0, 4)
  }

  /** Encode 8-bit grayscale (`pixels(row·w+col)` ∈ 0..255), filter 0. */
  def encodeGray(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, "pixels must be w*h row-major")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = ((v >>> 24) & 0xff).toByte; a(p + 1) = ((v >>> 16) & 0xff).toByte
      a(p + 2) = ((v >>> 8) & 0xff).toByte; a(p + 3) = (v & 0xff).toByte
    }
    putBe32(ihdr, 0, w)
    putBe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // gray
    chunk(out, "IHDR", ihdr)
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0 // filter: none
      var x = 0
      while (x < w) { raw(y * (w + 1) + 1 + x) = pixels(y * w + x).toByte; x += 1 }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    // growable sink: incompressible input inflates past raw.length via
    // stored-block overhead, so a fixed buffer could stall the loop
    val zipped = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) zipped.write(buf, 0, d.deflate(buf))
    d.end()
    chunk(out, "IDAT", zipped.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}

package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** BMP codec (public BITMAPINFOHEADER layout): uncompressed (BI_RGB)
  * 8-bit palette and 24-bit BGR images — raw rows behind a fixed header,
  * padded to 4-byte boundaries, bottom-up unless height is negative.
  * RLE/bitfield compressions throw loudly.
  */
object Bmp {

  /** (width, height, RGB interleaved, palette applied, rows top-down). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP stream")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(10)
    val dibSize = b.getInt(14)
    require(dibSize >= 40, s"BMP core-header variant (size $dibSize) not supported")
    val w = b.getInt(18)
    val hRaw = b.getInt(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = b.getShort(28) & 0xffff
    val comp = b.getInt(30)
    require(comp == 0, s"only uncompressed (BI_RGB) BMP supported, got compression $comp")
    require(bpp == 8 || bpp == 24, s"only 8-bit palette / 24-bit BMP supported, got $bpp bpp")
    require(w > 0 && h > 0, "bad BMP dimensions")
    val paletteOff = 14 + dibSize
    val stride = (w * (bpp / 8) + 3) & ~3
    val out = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val base = dataOff + srcRow * stride
      var x = 0
      while (x < w) {
        val o = (row * w + x) * 3
        if (bpp == 24) { // BGR on disk
          out(o) = bytes(base + x * 3 + 2)
          out(o + 1) = bytes(base + x * 3 + 1)
          out(o + 2) = bytes(base + x * 3)
        } else { // palette entries are BGRA quads
          val idx = bytes(base + x) & 0xff
          val p = paletteOff + idx * 4
          out(o) = bytes(p + 2)
          out(o + 1) = bytes(p + 1)
          out(o + 2) = bytes(p)
        }
        x += 1
      }
      row += 1
    }
    (w, h, out)
  }

  /** Luma reduction (same fixed-point BT.601 weights as [[Png]]/[[Gif]]). */
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

  /** Encode 8-bit grayscale (identity BGRA palette, bottom-up rows). */
  def encodeGray(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, "pixels must be w*h row-major")
    val stride = (w + 3) & ~3
    val dataOff = 14 + 40 + 256 * 4
    val total = dataOff + stride * h
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(dataOff)
    b.putInt(40).putInt(w).putInt(h) // bottom-up
    b.putShort(1).putShort(8)
    b.putInt(0) // BI_RGB
    b.putInt(stride * h).putInt(2835).putInt(2835).putInt(256).putInt(0)
    var i = 0
    while (i < 256) { // BGRA identity grays
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
      i += 1
    }
    var row = 0
    while (row < h) {
      val src = (h - 1 - row) * w // write bottom-up
      var x = 0
      while (x < w) { b.put(dataOff + row * stride + x, pixels(src + x).toByte); x += 1 }
      row += 1
    }
    b.array()
  }
}

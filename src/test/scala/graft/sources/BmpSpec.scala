package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class BmpSpec extends AnyFunSuite {

  test("8-bit palette round-trip: bottom-up rows and stride padding restore exactly") {
    val w = 13; val h = 7 // stride 16 != 13 exercises row padding
    val px = Array.tabulate(w * h)(i => (i * 37 + 9) % 256)
    val (dw, dh, gray) = Bmp.decodeGray(Bmp.encodeGray(px, w, h))
    assert(dw == w && dh == h)
    assert(gray.map(_ & 0xff).toSeq == px.toSeq) // identity gray palette: luma(v,v,v)=v
  }

  test("24-bit BGR decode, both row orders") {
    val w = 3; val h = 2
    // hand-build: BGR pixels, stride (3*3+3)&~3 = 12
    def build(topDown: Boolean): Array[Byte] = {
      val stride = 12
      val dataOff = 54
      val b = java.nio.ByteBuffer.allocate(dataOff + stride * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(b.capacity()).putInt(0).putInt(dataOff)
      b.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      b.putShort(1).putShort(24).putInt(0).putInt(stride * h)
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      // row content in FILE order; pixel (x, fileRow) = B=x, G=fileRow, R=200
      for (r <- 0 until h; x <- 0 until w) {
        b.put(dataOff + r * stride + x * 3, x.toByte)
        b.put(dataOff + r * stride + x * 3 + 1, r.toByte)
        b.put(dataOff + r * stride + x * 3 + 2, 200.toByte)
      }
      b.array()
    }
    val (_, _, rgbTop) = Bmp.decode(build(topDown = true))
    // top-down: output row 0 == file row 0 -> G channel 0
    assert((rgbTop(1) & 0xff) == 0 && (rgbTop(0) & 0xff) == 200 && (rgbTop(2) & 0xff) == 0)
    val (_, _, rgbBot) = Bmp.decode(build(topDown = false))
    // bottom-up: output row 0 == file row h-1 -> G channel 1
    assert((rgbBot(1) & 0xff) == 1)
  }

  test("RLE compression and odd bit depths fail loudly; multimodal dispatch works") {
    val enc = Bmp.encodeGray(Array.tabulate(16)(identity), 4, 4)
    val rle = enc.clone()
    rle(30) = 1 // BI_RLE8
    assert(intercept[IllegalArgumentException](Bmp.decode(rle)).getMessage.contains("BI_RGB"))
    assert(graft.multimodal.Multimodal.decodeImage(enc).get.map(_ & 0xff).toSeq == (0 until 16).toSeq)
  }
}

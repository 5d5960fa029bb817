package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {

  test("LZW kernel round-trips with dictionary growth across width bumps") {
    // enough distinct pairs to push the dictionary past 512 and 1024
    // entries -> 9->10->11 bit codes exercise the width-bump agreement
    val data = Array.tabulate(20000)(i => ((i * 7919 + i / 3) % 256).toByte)
    val out = Gif.lzwDecode(Gif.lzwEncode(data, 8), 8, data.length)
    assert(out.toSeq == data.toSeq)
  }

  test("LZW KwKwK case (code references the entry being defined)") {
    // classic trigger: aaaa... emits code==dictSize immediately
    val data = Array.fill(64)(7.toByte)
    val out = Gif.lzwDecode(Gif.lzwEncode(data, 8), 8, data.length)
    assert(out.toSeq == data.toSeq)
  }

  test("full-frame grayscale round-trip through the container") {
    val w = 33; val h = 21
    val px = Array.tabulate(w * h)(i => (i * 31 + 7) % 256)
    val (dw, dh, gray) = Gif.decodeGray(Gif.encodeGray(px, w, h))
    assert(dw == w && dh == h)
    // identity gray palette: luma of (v,v,v) = (77+151+28)*v >> 8 = v
    assert(gray.map(_ & 0xff).toSeq == px.toSeq)
  }

  test("89a extension blocks are skipped; interlaced frames deinterlace") {
    val w = 8; val h = 8
    val px = Array.tabulate(w * h)(i => (i * 3) % 256)
    val plain = Gif.encodeGray(px, w, h)
    // splice a graphic-control extension right before the image descriptor
    val imgDesc = plain.indexWhere(_ == 0x2c.toByte, 13 + 768)
    val gce = Array[Int](0x21, 0xf9, 4, 0, 0, 0, 0, 0).map(_.toByte)
    val spliced = plain.take(imgDesc) ++ gce ++ plain.drop(imgDesc)
    assert(Gif.decodeGray(spliced)._3.map(_ & 0xff).toSeq == px.toSeq)
    // interlace: reorder rows into pass order and set the interlace flag;
    // decode must restore natural order
    val passes = (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)
    val shuffled = passes.flatMap(r => px.slice(r * w, (r + 1) * w)).toArray
    val enc = Gif.encodeGray(shuffled, w, h)
    val d2 = enc.indexWhere(_ == 0x2c.toByte, 13 + 768)
    enc(d2 + 9) = 0x40.toByte // interlace flag in the image descriptor
    assert(Gif.decodeGray(enc)._3.map(_ & 0xff).toSeq == px.toSeq)
  }

  test("multimodal decodeImage dispatches GIF to real pixels") {
    val w = 17; val h = 9
    val px = Array.tabulate(w * h)(i => (i * 13 + 5) % 256)
    val enc = Gif.encodeGray(px, w, h)
    assert(graft.multimodal.Multimodal.imageDims(enc).contains(("gif", w, h)))
    assert(graft.multimodal.Multimodal.decodeImage(enc).get.map(_ & 0xff).toSeq == px.toSeq)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec: lossless round-trips, frame/CRC conformance, loud rejects. */
class FlacSpec extends AnyFunSuite {

  test("smooth waveform round-trips bit-exactly (fixed predictors + rice)") {
    val src = Array.tabulate(10000)(i =>
      (9000 * math.sin(i * 0.03) + 3000 * math.sin(i * 0.011)).toShort)
    val enc = Flac.encodeMono16(src, 16000)
    val (rate, out) = Flac.decodeMono16(enc)
    assert(rate == 16000)
    assert(out.length == src.length)
    assert(out.toSeq == src.toSeq)
    // losslessness buys compression on smooth content
    assert(enc.length < src.length * 2, s"FLAC grew: ${enc.length} vs ${src.length * 2}")
  }

  test("hostile content round-trips: noise, constants, extremes, tiny blocks") {
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(3000)((rnd.nextInt(65536) - 32768).toShort)
    assert(Flac.decodeMono16(Flac.encodeMono16(noise, 8000))._2.toSeq == noise.toSeq)
    val const = Array.fill(500)(1234.toShort)
    assert(Flac.decodeMono16(Flac.encodeMono16(const, 8000))._2.toSeq == const.toSeq)
    val extremes = Array.tabulate(777)(i => if (i % 2 == 0) Short.MinValue else Short.MaxValue)
    assert(Flac.decodeMono16(Flac.encodeMono16(extremes, 8000))._2.toSeq == extremes.toSeq)
    // multi-frame with a ragged tail block
    val long = Array.tabulate(4096 * 2 + 123)(i => ((i * 37) % 20000 - 10000).toShort)
    assert(Flac.decodeMono16(Flac.encodeMono16(long, 44100))._2.toSeq == long.toSeq)
    // small custom block size exercises frame numbering > 127 (UTF-8 2-byte)
    val many = Array.tabulate(16 * 200)(i => (i % 256 - 128).toShort)
    assert(Flac.decodeMono16(Flac.encodeMono16(many, 8000, blockSize = 16))._2.toSeq == many.toSeq)
  }

  test("corruption is caught: flipped payload bit fails the frame CRC-16") {
    val src = Array.tabulate(2000)(i => (1000 * math.sin(i * 0.1)).toShort)
    val enc = Flac.encodeMono16(src, 8000)
    val bad = enc.clone()
    bad(bad.length - 10) = (bad(bad.length - 10) ^ 0x40).toByte
    val ex = intercept[IllegalArgumentException](Flac.decodeMono16(bad))
    assert(ex.getMessage.contains("CRC") || ex.getMessage.contains("corrupt")
      || ex.getMessage.contains("sync") || ex.getMessage.contains("16 bits"))
    // non-FLAC bytes rejected loudly
    intercept[IllegalArgumentException](Flac.decodeMono16(Array.fill[Byte](100)(7)))
  }

  test("adversarial bytes after a fLaC magic always throw, never hang") {
    (0 until 50).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val junk = "fLaC".getBytes ++ Array.fill(200 + rnd.nextInt(400))(rnd.nextInt(256).toByte)
      intercept[Exception](Flac.decodeMono16(junk))
      // and through the dispatching multimodal tier: None, not a crash
      assert(graft.multimodal.Multimodal.decodeAudio(junk).isEmpty)
    }
  }

  test("STREAMINFO carries the real MD5 of the unencoded samples") {
    val src = Array.tabulate(100)(i => (i * 31).toShort)
    val enc = Flac.encodeMono16(src, 8000)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    src.foreach { s => md5.update((s & 0xff).toByte); md5.update(((s >> 8) & 0xff).toByte) }
    // STREAMINFO payload starts at byte 8; MD5 is its last 16 bytes (34-byte block)
    val stored = java.util.Arrays.copyOfRange(enc, 8 + 18, 8 + 34)
    assert(stored.toSeq == md5.digest().toSeq)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite {

  test("PCM16 mono round-trips exactly") {
    val samples = Array.tabulate(777)(i => (((i * 2731 + 5) % 65536) - 32768).toShort)
    val (rate, ch, out) = Wav.decode(Wav.encodeMono16(samples, 22050))
    assert(rate == 22050 && ch == 1)
    assert(out.toSeq == samples.toSeq)
  }

  test("8-bit PCM scales to the 16-bit range; odd chunks stay word-aligned") {
    // hand-build an 8-bit WAV with a LIST chunk of odd length before data
    val pcm8 = Array[Int](0, 64, 128, 192, 255).map(_.toByte)
    val list = Array[Byte]('x')
    val dataLen = pcm8.length
    val b = java.nio.ByteBuffer
      .allocate(12 + 8 + 16 + 8 + list.length + 1 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(0).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    b.put("LIST".getBytes).putInt(list.length).put(list).put(0.toByte) // pad to word boundary
    b.put("data".getBytes).putInt(dataLen).put(pcm8)
    val (rate, _, out) = Wav.decode(b.array())
    assert(rate == 8000)
    assert(out.toSeq == Seq(-32768, -16384, 0, 16384, 32512).map(_.toShort))
  }

  test("crafted negative chunk length throws instead of spinning forever") {
    val enc = Wav.encodeMono16(Array[Short](1, 2, 3), 8000)
    val bad = enc.clone()
    // patch the fmt chunk length (offset 16, LE u32) to -8: an unguarded
    // walk would compute pos = dataOff - 8 + 0 = pos and loop forever
    val b = java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(16, -8)
    val ex = intercept[IllegalArgumentException](Wav.decode(bad))
    assert(ex.getMessage.contains("corrupt WAV"))
  }

  test("non-PCM formats fail loudly; multimodal tier is null-safe") {
    val enc = Wav.encodeMono16(Array[Short](1, 2, 3), 8000)
    val bad = enc.clone()
    bad(20) = 3 // format code -> IEEE float
    val ex = intercept[IllegalArgumentException](Wav.decode(bad))
    assert(ex.getMessage.contains("PCM"))
    assert(graft.multimodal.Multimodal.decodeAudio(null).isEmpty)
    assert(graft.multimodal.Multimodal.decodeAudio("not audio".getBytes).isEmpty)
    assert(graft.multimodal.Multimodal.decodeAudio(enc).map(_._3.toSeq).contains(Seq[Short](1, 2, 3)))
  }
}

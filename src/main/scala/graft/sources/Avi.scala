package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal AVI (RIFF) container for MJPEG video — the public AVI 1.0
  * layout (LIST hdrl → avih + LIST strl(strh/strf), LIST movi with
  * '00dc' frame chunks, idx1). Each MJPEG frame is an independent
  * baseline JPEG stream, so video decode reduces to this chunk walk plus
  * the in-repo [[Jpeg]] codec: no external library, same contract as the
  * image/audio decode family.
  *
  * Reference has no video analog; this closes the builder's-brief
  * multimodal mandate (video as opaque binary + real decode plumbing).
  */
object Avi {

  /** Wrap per-frame JPEG payloads in an AVI/MJPG container. */
  def encodeMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    require(fps > 0, s"bad fps $fps")
    val maxFrame = frames.map(_.length).max
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val idxSize = 16 * frames.size
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val fileSize = 12 + (8 + hdrlSize) + (8 + moviSize) + (8 + idxSize)
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("ASCII"))
    fourcc("RIFF"); b.putInt(fileSize - 8); fourcc("AVI ")
    // ---- LIST hdrl
    fourcc("LIST"); b.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(1000000 / fps) // dwMicroSecPerFrame
    b.putInt(0) // dwMaxBytesPerSec
    b.putInt(0) // dwPaddingGranularity
    b.putInt(0x10) // dwFlags: AVIF_HASINDEX
    b.putInt(frames.size) // dwTotalFrames
    b.putInt(0) // dwInitialFrames
    b.putInt(1) // dwStreams
    b.putInt(maxFrame) // dwSuggestedBufferSize
    b.putInt(w); b.putInt(h)
    b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0) // dwReserved[4]
    // ---- LIST strl
    fourcc("LIST"); b.putInt(strlSize); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    b.putInt(0) // dwFlags
    b.putShort(0); b.putShort(0) // wPriority, wLanguage
    b.putInt(0) // dwInitialFrames
    b.putInt(1) // dwScale
    b.putInt(fps) // dwRate (rate/scale = fps)
    b.putInt(0) // dwStart
    b.putInt(frames.size) // dwLength (in frames)
    b.putInt(maxFrame) // dwSuggestedBufferSize
    b.putInt(-1) // dwQuality (default)
    b.putInt(0) // dwSampleSize (0 = variable)
    b.putShort(0); b.putShort(0); b.putShort(w.toShort); b.putShort(h.toShort) // rcFrame
    fourcc("strf"); b.putInt(40) // BITMAPINFOHEADER
    b.putInt(40); b.putInt(w); b.putInt(h)
    b.putShort(1); b.putShort(24) // biPlanes, biBitCount
    fourcc("MJPG") // biCompression
    b.putInt(w * h * 3) // biSizeImage (decoded)
    b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
    // ---- LIST movi
    val moviFccPos = b.position() + 8 // offset of the 'movi' fourcc itself
    fourcc("LIST"); b.putInt(moviSize); fourcc("movi")
    val offsets = new Array[Int](frames.size)
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = b.position() - moviFccPos // idx1 offsets are movi-relative
      fourcc("00dc"); b.putInt(f.length); b.put(f)
      if ((f.length & 1) == 1) b.put(0.toByte) // chunks are word-aligned
    }
    // ---- idx1
    fourcc("idx1"); b.putInt(idxSize)
    frames.zipWithIndex.foreach { case (f, i) =>
      fourcc("00dc")
      b.putInt(0x10) // AVIIF_KEYFRAME (every MJPEG frame is one)
      b.putInt(offsets(i))
      b.putInt(f.length)
    }
    b.array()
  }

  /** Extract the raw per-frame JPEG payloads from the movi list, in
    * stream order. Validates every chunk length before advancing — a
    * crafted negative length must throw, never spin (same contract as
    * the WAV/PNG walks).
    */
  def mjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 12, "not an AVI stream (too short)")
    require(
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ',
      "not an AVI stream (missing RIFF/AVI )")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int, inMovi: Boolean, depth: Int): Unit = {
      // real AVI nests LISTs 2-3 deep; a crafted file with thousands of
      // nested LISTs would otherwise StackOverflowError (fatal — a Try
      // around decode can't catch it), stalling the one-bad-file contract
      require(depth <= 32, s"corrupt AVI: LIST nesting exceeds 32 at offset $start")
      var pos = start
      while (pos + 8 <= end) {
        val id = new String(bytes, pos, 4, "ASCII")
        val len = b.getInt(pos + 4)
        require(len >= 0 && len <= end - pos - 8,
          s"corrupt AVI: chunk '$id' declares length $len at offset $pos")
        if (id == "LIST" && len >= 4) {
          val listType = new String(bytes, pos + 8, 4, "ASCII")
          walk(pos + 12, pos + 8 + len, inMovi || listType == "movi", depth + 1)
        } else if (inMovi && (id(2) == 'd' && (id(3) == 'c' || id(3) == 'b'))) {
          // '##dc' compressed / '##db' uncompressed video chunk
          out += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        }
        pos += 8 + len + (len & 1)
      }
    }
    val riffEnd = math.min(bytes.length.toLong, 8L + b.getInt(4)).toInt
    walk(12, riffEnd, inMovi = false, depth = 0)
    out.toSeq
  }
}

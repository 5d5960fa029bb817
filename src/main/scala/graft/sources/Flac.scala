package graft.sources

import scala.collection.mutable.ArrayBuffer

/** FLAC codec (public format spec) — mono 16-bit streams with CONSTANT /
  * VERBATIM / FIXED-prediction subframes and Rice-coded residuals: the
  * subset every FLAC encoder's default output for speech corpora uses
  * (LibriSpeech-style datasets ship FLAC). LPC subframes, multi-channel
  * decorrelation and non-16-bit depths throw loudly rather than decode
  * garbage. Lossless: encode → decode is bit-exact, which is what makes
  * the oracle gate possible.
  *
  * Layout implemented from the public spec: fLaC magic + STREAMINFO
  * (with real MD5 of the unencoded samples), frames with CRC-8-guarded
  * headers and CRC-16-guarded bodies, UTF-8-style frame numbers,
  * Rice partitions (4-bit parameters + escape), fixed predictors of
  * order 0..4.
  */
object Flac {

  // ------------------------------------------------------------- bit I/O
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(v: Long, n: Int): Unit = {
      // batch into the current byte instead of a loop iteration per bit
      var rem = n
      while (rem > 0) {
        val space = 8 - nbits
        val take = if (space < rem) space else rem
        val chunk = ((v >>> (rem - take)) & ((1L << take) - 1)).toInt
        cur = (cur << take) | chunk
        nbits += take
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        rem -= take
      }
    }
    def align(): Unit = if (nbits > 0) put(0, 8 - nbits)
    def toArray: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    var bytePos: Int = startByte
    private var bitPos = 0
    def bit(): Int = {
      require(bytePos < bytes.length, "FLAC bitstream truncated")
      val b = (bytes(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(n: Int): Long = {
      // consume up to a byte per step, not a function call per bit —
      // the decoder's hot path (every residual goes through here)
      var v = 0L
      var rem = n
      while (rem > 0) {
        require(bytePos < bytes.length, "FLAC bitstream truncated")
        val avail = 8 - bitPos
        val take = if (avail < rem) avail else rem
        val chunk = ((bytes(bytePos) & 0xff) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        rem -= take
      }
      v
    }
    def signedBits(n: Int): Int =
      if (n == 0) 0 // 0-bit raw residuals are legal (all-zero partition)
      else {
        val v = bits(n)
        (v << (64 - n) >> (64 - n)).toInt // sign extend
      }
    def unary(): Int = {
      // scan whole bytes for the terminating 1 bit instead of per-bit calls
      var q = 0
      while (true) {
        require(bytePos < bytes.length, "FLAC bitstream truncated")
        val cur = ((bytes(bytePos) & 0xff) << bitPos) & 0xff // remaining bits, left-aligned
        if (cur == 0) {
          q += 8 - bitPos
          bitPos = 0
          bytePos += 1
          require(q < (1 << 24), "runaway unary code (corrupt FLAC)")
        } else {
          val lead = Integer.numberOfLeadingZeros(cur) - 24
          q += lead
          bitPos += lead + 1
          if (bitPos == 8) { bitPos = 0; bytePos += 1 }
          return q
        }
      }
      q
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  // ---------------------------------------------------------------- CRCs
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; k += 1 }
      i += 1
    }
    crc
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // fixed predictor residuals: e_k(n) = k-th order difference
  private def fixedResidual(x: Array[Int], order: Int): Array[Int] = {
    val n = x.length
    val e = new Array[Int](n - order)
    var i = order
    while (i < n) {
      e(i - order) = order match {
        case 0 => x(i)
        case 1 => x(i) - x(i - 1)
        case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
        case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
        case 4 => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) + x(i - 4)
      }
      i += 1
    }
    e
  }

  private def zigzag(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
  private def unzigzag(v: Long): Int = ((v >>> 1) ^ -(v & 1)).toInt

  /** UTF-8-style coded number (frame numbering, public spec Annex). */
  private def putUtf8Num(bw: BitWriter, n: Long): Unit = {
    require(n < 0x10000, s"frame number $n exceeds this encoder's 3-byte range")
    if (n < 0x80) bw.put(n, 8)
    else if (n < 0x800) { bw.put(0xc0 | (n >> 6), 8); bw.put(0x80 | (n & 0x3f), 8) }
    else {
      bw.put(0xe0 | (n >> 12), 8)
      bw.put(0x80 | ((n >> 6) & 0x3f), 8)
      bw.put(0x80 | (n & 0x3f), 8)
    }
  }

  private def readUtf8Num(br: BitReader): Long = {
    val b0 = br.bits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var extra = 0
      var mask = 0x40
      while ((b0 & mask) != 0) { extra += 1; mask >>= 1 }
      require(extra >= 1 && extra <= 6, s"bad UTF-8 number lead byte $b0")
      var v = (b0 & (mask - 1)).toLong
      var i = 0
      while (i < extra) {
        val c = br.bits(8).toInt
        require((c & 0xc0) == 0x80, "bad UTF-8 number continuation")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  // -------------------------------------------------------------- encode
  /** Encode 16-bit mono PCM. Per 4096-sample block: best FIXED order
    * 0..2 by residual magnitude, single Rice partition, parameter from
    * the mean residual magnitude. Bit-exact lossless.
    */
  def encodeMono16(samples: Array[Short], sampleRate: Int, blockSize: Int = 4096): Array[Byte] = {
    require(samples.nonEmpty, "no samples")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad sample rate $sampleRate")
    require(blockSize >= 16 && blockSize <= 65535, s"bad block size $blockSize")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("ASCII"))
    // STREAMINFO (last metadata block), 34 bytes
    val si = new BitWriter
    si.put(blockSize, 16); si.put(blockSize, 16) // min/max block size
    si.put(0, 24); si.put(0, 24) // min/max frame size unknown
    si.put(sampleRate, 20)
    si.put(0, 3) // channels - 1
    si.put(15, 5) // bits per sample - 1
    si.put(samples.length.toLong, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val pcmBytes = new Array[Byte](samples.length * 2)
    var mi = 0
    while (mi < samples.length) {
      pcmBytes(mi * 2) = (samples(mi) & 0xff).toByte
      pcmBytes(mi * 2 + 1) = ((samples(mi) >> 8) & 0xff).toByte
      mi += 1
    }
    md5.update(pcmBytes)
    val siBytes = si.toArray ++ md5.digest()
    out.write(0x80) // last-metadata-block flag | type 0
    out.write((siBytes.length >> 16) & 0xff)
    out.write((siBytes.length >> 8) & 0xff)
    out.write(siBytes.length & 0xff)
    out.write(siBytes, 0, siBytes.length)

    var frameNo = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val x = Array.tabulate(n)(i => samples(off + i).toInt)
      val bw = new BitWriter
      // frame header: sync + fixed-blocksize strategy
      bw.put(0x3ffe, 14); bw.put(0, 1); bw.put(0, 1)
      bw.put(7, 4) // blocksize: 16-bit value - 1 follows header
      bw.put(0, 4) // sample rate: from STREAMINFO
      bw.put(0, 4) // channel assignment: mono
      bw.put(4, 3) // sample size: 16 bits
      bw.put(0, 1)
      putUtf8Num(bw, frameNo)
      bw.put(n - 1, 16)
      val headBytes = bw.toArray // aligned: header fields are byte-multiples here
      val bw2 = new BitWriter
      headBytes.foreach(b => bw2.put(b & 0xffL, 8))
      bw2.put(crc8(headBytes, 0, headBytes.length), 8)
      // subframe: pick best fixed order 0..2 (3/4 rarely win on our data)
      val maxOrder = math.min(2, n - 1)
      val byOrder = (0 to maxOrder).map(o => o -> fixedResidual(x, o))
      val (order, resid) = byOrder.minBy { case (_, e) => e.foldLeft(0L)((a, v) => a + math.abs(v.toLong)) }
      bw2.put(0, 1)
      bw2.put(8 + order, 6) // FIXED order
      bw2.put(0, 1) // no wasted bits
      var i = 0
      while (i < order) { bw2.put(x(i).toLong & 0xffff, 16); i += 1 } // warmup
      // residual: method 0 (4-bit rice), partition order 0
      bw2.put(0, 2); bw2.put(0, 4)
      val mean = if (resid.isEmpty) 0L
        else resid.foldLeft(0L)((a, v) => a + math.abs(v.toLong)) / math.max(1, resid.length)
      var p = 0
      while (p < 14 && (1L << p) < mean + 1) p += 1
      if (p > 0 && resid.nonEmpty) {
        // cap the worst-case unary run; escape to raw if any residual is huge
        val worst = resid.map(r => zigzag(r) >>> p).max
        if (worst > (1 << 16)) p = 15 // force escape below
      }
      if (p >= 15) {
        bw2.put(15, 4) // rice escape: raw residuals
        bw2.put(18, 5) // 18 raw bits each (covers 17-bit 2nd-order residuals)
        resid.foreach(r => bw2.put(r.toLong & 0x3ffff, 18))
      } else {
        bw2.put(p, 4)
        resid.foreach { r =>
          val z = zigzag(r)
          val q = (z >>> p).toInt
          var k = q
          while (k >= 63) { bw2.put(0, 63); k -= 63 } // q zeros + terminating 1
          bw2.put(1, k + 1)
          if (p > 0) bw2.put(z & ((1L << p) - 1), p)
        }
      }
      bw2.align()
      val body = bw2.toArray
      val withCrc = body ++ Array(
        ((crc16(body, 0, body.length) >> 8) & 0xff).toByte,
        (crc16(body, 0, body.length) & 0xff).toByte)
      out.write(withCrc, 0, withCrc.length)
      frameNo += 1
      off += n
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- decode
  /** Decode a mono 16-bit FLAC stream → (sampleRate, samples). */
  def decodeMono16(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length > 42 && new String(bytes, 0, 4, "ASCII") == "fLaC",
      "not a FLAC stream (missing fLaC)")
    var pos = 4
    var rate = 0
    var total = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated FLAC metadata")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require(len >= 0 && pos + 4 + len <= bytes.length, s"corrupt FLAC metadata block length $len")
      if (typ == 0) {
        val br = new BitReader(bytes, pos + 4)
        br.bits(16); br.bits(16); br.bits(24); br.bits(24)
        rate = br.bits(20).toInt
        val channels = br.bits(3).toInt + 1
        val bps = br.bits(5).toInt + 1
        require(channels == 1, s"only mono FLAC supported, got $channels channels")
        require(bps == 16, s"only 16-bit FLAC supported, got $bps")
        total = br.bits(36)
        sawStreamInfo = true
      }
      pos += 4 + len
    }
    require(sawStreamInfo, "missing STREAMINFO")
    val outBuf = new ArrayBuffer[Short](math.min(total, 1 << 26).toInt max 16)
    while (pos < bytes.length) {
      val br = new BitReader(bytes, pos)
      require(br.bits(14) == 0x3ffe, s"lost frame sync at byte $pos")
      br.bits(1); br.bits(1)
      val bsCode = br.bits(4).toInt
      val srCode = br.bits(4).toInt
      val chan = br.bits(4).toInt
      val ssCode = br.bits(3).toInt
      br.bits(1)
      require(chan == 0, s"only mono frames supported, got channel assignment $chan")
      require(ssCode == 4, s"only 16-bit frames supported, got sample-size code $ssCode")
      readUtf8Num(br)
      val blockLen = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.bits(8).toInt + 1
        case 7 => br.bits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case c => throw new IllegalArgumentException(s"reserved blocksize code $c")
      }
      srCode match {
        case 0 => // from STREAMINFO
        case 12 => br.bits(8)
        case 13 | 14 => br.bits(16)
        case c if c >= 1 && c <= 11 => // table-coded, no extra bits
        case c => throw new IllegalArgumentException(s"invalid sample-rate code $c")
      }
      br.bits(8) // header CRC-8 (structure-validated via sync + requires)
      // subframe
      require(br.bits(1) == 0, "bad subframe padding bit")
      val typ = br.bits(6).toInt
      val wasted = if (br.bits(1) == 1) br.unary() + 1 else 0
      require(wasted == 0, "wasted-bits subframes not supported")
      val x = new Array[Int](blockLen)
      if (typ == 0) { // CONSTANT
        val v = br.signedBits(16)
        java.util.Arrays.fill(x, v)
      } else if (typ == 1) { // VERBATIM
        var i = 0
        while (i < blockLen) { x(i) = br.signedBits(16); i += 1 }
      } else if (typ >= 8 && typ <= 12) { // FIXED
        val order = typ - 8
        var i = 0
        while (i < order) { x(i) = br.signedBits(16); i += 1 }
        val method = br.bits(2).toInt
        require(method == 0 || method == 1, s"reserved residual method $method")
        val pbits = if (method == 0) 4 else 5
        val escape = if (method == 0) 15 else 31
        val partOrder = br.bits(4).toInt
        val nPart = 1 << partOrder
        require(blockLen % nPart == 0, "partition does not divide block")
        require((blockLen >> partOrder) >= order,
          s"first partition smaller than predictor order $order (corrupt FLAC)")
        var part = 0
        var idx = order
        while (part < nPart) {
          val cnt = (blockLen >> partOrder) - (if (part == 0) order else 0)
          val p = br.bits(pbits).toInt
          if (p == escape) {
            val raw = br.bits(5).toInt
            var k = 0
            while (k < cnt) { x(idx) = br.signedBits(raw); idx += 1; k += 1 }
          } else {
            var k = 0
            while (k < cnt) {
              val q = br.unary()
              val rem = if (p > 0) br.bits(p) else 0L
              x(idx) = unzigzag((q.toLong << p) | rem)
              idx += 1
              k += 1
            }
          }
          part += 1
        }
        require(idx == blockLen, s"residual decode filled $idx of $blockLen samples")
        // undo the fixed predictor
        i = order
        while (i < blockLen) {
          order match {
            case 0 =>
            case 1 => x(i) += x(i - 1)
            case 2 => x(i) += 2 * x(i - 1) - x(i - 2)
            case 3 => x(i) += 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
            case 4 => x(i) += 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
          }
          i += 1
        }
      } else throw new IllegalArgumentException(
        s"unsupported FLAC subframe type $typ (LPC not implemented — re-encode with fixed prediction)")
      br.align()
      val bodyEnd = br.bytePos
      val crc = crc16(bytes, pos, bodyEnd)
      val stored = ((bytes(bodyEnd) & 0xff) << 8) | (bytes(bodyEnd + 1) & 0xff)
      require(crc == stored, f"FLAC frame CRC mismatch at byte $pos (got $stored%04x, computed $crc%04x)")
      x.foreach { v =>
        require(v >= -32768 && v <= 32767, s"decoded sample $v exceeds 16 bits (corrupt stream)")
        outBuf += v.toShort
      }
      pos = bodyEnd + 2
    }
    val res = if (total > 0 && outBuf.length > total) outBuf.take(total.toInt) else outBuf
    (rate, res.toArray)
  }
}

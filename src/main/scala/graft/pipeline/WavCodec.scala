package graft.pipeline

/** Pure-JVM RIFF/WAVE codec — the real (non-stub) decoder behind the
  * multimodal `audio/wav` branch. No codec libraries exist in this
  * container, but WAV's PCM container is a bounded spec: a RIFF header,
  * a `fmt ` chunk (PCM format tag, channel/rate/width fields), and a
  * `data` chunk of little-endian samples. The decoder is a proper
  * chunk WALKER, not a fixed-offset reader: unknown chunks (`LIST`,
  * `fact`, cue points…) are skipped by their declared size with the
  * RIFF odd-length pad byte honored, so files written by other tools
  * decode too — that behavior is spec-tested by inserting a foreign
  * chunk between `fmt ` and `data`.
  *
  * Scope: 16-bit mono PCM (format tag 1). Everything else fails loud
  * with a description rather than mis-decoding.
  */
object WavCodec {

  val DefaultSampleRate = 16000

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def putLe32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  private def putLe16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Standard-compliant 16-bit mono PCM WAV bytes. */
  def encode(samples: Array[Short], sampleRate: Int = DefaultSampleRate): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44 + samples.length * 2)
    val dataLen = samples.length * 2
    out.write("RIFF".getBytes("US-ASCII"))
    putLe32(out, 36 + dataLen) // riff payload: WAVE + fmt(8+16) + data(8+len)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    putLe32(out, 16)           // PCM fmt chunk body size
    putLe16(out, 1)            // format tag: PCM
    putLe16(out, 1)            // channels: mono
    putLe32(out, sampleRate)
    putLe32(out, sampleRate * 2) // byte rate = rate * block align
    putLe16(out, 2)            // block align = channels * bytes/sample
    putLe16(out, 16)           // bits per sample
    out.write("data".getBytes("US-ASCII"))
    putLe32(out, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(out, samples(i) & 0xffff)
      i += 1
    }
    out.toByteArray
  }

  /** Parse WAV bytes → (sampleRate, samples). Walks the chunk list;
    * validates RIFF/WAVE magics, PCM tag, mono, 16-bit; loud failure on
    * anything out of scope or truncated.
    */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF", s"not RIFF: '${tag(bytes, 0)}'")
    require(tag(bytes, 8) == "WAVE", s"not WAVE: '${tag(bytes, 8)}'")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' of $size bytes overruns the file at offset $off")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmtTag = le16(bytes, off + 8)
          val channels = le16(bytes, off + 10)
          val bits = le16(bytes, off + 22)
          require(fmtTag == 1, s"unsupported format tag $fmtTag (PCM only)")
          require(channels == 1, s"unsupported channel count $channels (mono only)")
          require(bits == 16, s"unsupported sample width $bits (16-bit only)")
          sampleRate = le32(bytes, off + 12)
        case "data" =>
          require(sampleRate >= 0, "data chunk before fmt chunk")
          require(size % 2 == 0, s"odd PCM16 data length $size")
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = le16(bytes, off + 8 + i * 2).toShort
            i += 1
          }
        case _ => () // foreign chunk (LIST, fact, …): skip by size
      }
      off += 8 + size + (size & 1) // RIFF pads odd chunks by one byte
    }
    require(sampleRate >= 0, "no fmt chunk found")
    require(samples != null, "no data chunk found")
    (sampleRate, samples)
  }
}

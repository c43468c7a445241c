package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Multimodal, WavCodec}

/** The real (non-stub) multimodal decoder: RIFF/WAVE round-trip, chunk
  * walking over foreign chunks with odd-length padding, loud rejection
  * of out-of-scope or corrupt payloads, and the `audio/wav` dispatch in
  * `decodeFeatures`.
  */
class WavCodecSpec extends AnyFunSuite {

  private val samples: Array[Short] =
    Array.tabulate(331)(k => ((k * 7919 % 65536) - 32768).toShort)

  test("encode/decode round-trip: samples and rate bit-exact") {
    val bytes = WavCodec.encode(samples, 22050)
    // standard minimal file: 44-byte header + 2 bytes per sample
    assert(bytes.length == 44 + samples.length * 2)
    val (rate, got) = WavCodec.decode(bytes)
    assert(rate == 22050)
    assert(got.toSeq == samples.toSeq)
  }

  test("chunk walker: foreign odd-sized chunk between fmt and data is skipped") {
    val std = WavCodec.encode(samples)
    // splice a 5-byte LIST chunk (odd → 1 pad byte) after fmt (ends at 36)
    val foreign = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "junk!".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = std.slice(0, 36) ++ foreign ++ std.drop(36)
    // patch the RIFF payload size (offset 4, little-endian)
    val riffLen = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    val (rate, got) = WavCodec.decode(spliced)
    assert(rate == WavCodec.DefaultSampleRate)
    assert(got.toSeq == samples.toSeq)
  }

  test("loud failures: truncation, wrong magic, stereo, float PCM") {
    val std = WavCodec.encode(samples)
    intercept[IllegalArgumentException](WavCodec.decode(std.take(30)))
    val notRiff = std.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException](WavCodec.decode(notRiff))
    val stereo = std.clone(); stereo(22) = 2 // channels field
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    val floatFmt = std.clone(); floatFmt(20) = 3 // IEEE-float format tag
    intercept[IllegalArgumentException](WavCodec.decode(floatFmt))
  }

  test("PPM round-trip: header + raster bit-exact; comments and whitespace tolerated") {
    import graft.pipeline.PpmCodec
    val img = PpmCodec.Image(5, 3,
      Array.tabulate(45)(i => ((i * 37) % 256).toByte))
    val std = PpmCodec.encode(img)
    val got = PpmCodec.decode(std)
    assert(got.width == 5 && got.height == 3 && got.rgb.toSeq == img.rgb.toSeq)
    // a foreign-tool header: comment lines + mixed whitespace
    val weird = ("P6 # binary pixmap\n# written by some tool\n 5\t3 # dims\n255\n"
      .getBytes("US-ASCII")) ++ img.rgb
    val got2 = PpmCodec.decode(weird)
    assert(got2.width == 5 && got2.height == 3 && got2.rgb.toSeq == img.rgb.toSeq)
    // loud failures: wrong magic, 16-bit maxval, truncated raster
    intercept[IllegalArgumentException](PpmCodec.decode("P5\n1 1\n255\n0".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      PpmCodec.decode(("P6\n1 1\n65535\n" .getBytes("US-ASCII")) ++ Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](PpmCodec.decode(std.dropRight(1)))
  }

  test("decodeFeatures dispatches audio/wav through the real decoder") {
    val spark = TestSpark.spark
    import spark.implicits._
    val wav = WavCodec.encode(samples)
    val media = Seq(
      Multimodal.MediaRow(1L, wav, "audio/wav"),
      Multimodal.MediaRow(2L, wav, "application/octet-stream"))
      .toDS()
    val rows = Multimodal.decodeFeatures(media).collect().map(r => r.id -> r).toMap
    val audio = rows(1L).features
    // audio branch: f3 = peak/32768 from DECODED samples (header bytes
    // excluded) — the byte-histogram of the same payload differs
    val peak = samples.map(s => math.abs(s.toInt)).max
    assert(math.abs(audio(3) - peak / 32768.0f) < 1e-6f)
    assert(audio.toSeq != rows(2L).features.toSeq)
    // zero-crossing rate is a real statistic of the PCM, in (0, 1]
    assert(audio(2) > 0f && audio(2) <= 1f)
  }

  test("resizeNearest: identity at same dims, exact index map, order-sensitive checksum") {
    import graft.pipeline.PpmCodec
    val img = PpmCodec.Image(5, 3, Array.tabulate(45)(i => (i * 7 % 251).toByte))
    // same-dims resize is the identity (x*w/w == x)
    assert(PpmCodec.resizeNearest(img, 5, 3).rgb.toSeq == img.rgb.toSeq)
    // up- and down-scale: every output pixel equals the ⌊x·w/W⌋,⌊y·h/H⌋ source
    for ((ow, oh) <- Seq((8, 4), (2, 2), (1, 1), (16, 12))) {
      val out = PpmCodec.resizeNearest(img, ow, oh)
      assert(out.width == ow && out.height == oh && out.rgb.length == 3 * ow * oh)
      for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 3) {
        val (sx, sy) = (x * img.width / ow, y * img.height / oh)
        assert(out.rgb(3 * (y * ow + x) + c) == img.rgb(3 * (sy * img.width + sx) + c),
          s"pixel ($x,$y) ch $c at ${ow}x$oh")
      }
    }
    // the ppmResizeStats checksum is position-weighted: swapping two
    // distinct pixels changes it (a right-multiset/wrong-order resize fails)
    def checksum(rgb: Array[Byte]): Long =
      (0 until rgb.length / 3).map { p =>
        (p + 1L) * ((rgb(3 * p) & 0xff) * 299L + (rgb(3 * p + 1) & 0xff) * 587L +
          (rgb(3 * p + 2) & 0xff) * 114L)
      }.sum
    val swapped = img.rgb.clone()
    for (c <- 0 until 3) {
      val t = swapped(c); swapped(c) = swapped(3 + c); swapped(3 + c) = t
    }
    assert(checksum(img.rgb) != checksum(swapped))
  }
}

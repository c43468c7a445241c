package graft.pipeline

/** Pure-JVM PPM (P6) codec — the image counterpart of [[WavCodec]] in
  * the multimodal decode dispatch. P6 is the binary Netpbm RGB format:
  * an ASCII header (`P6`, whitespace-separated width/height/maxval,
  * `#` comments legal anywhere in the header whitespace) followed by
  * 3·w·h raw sample bytes. The decoder parses the header with full
  * comment/whitespace handling — not fixed offsets — so files written
  * by other tools decode too; that behavior is spec-tested with a
  * comment-bearing header.
  *
  * Scope: 8-bit maxval (≤ 255). Out-of-scope or truncated payloads
  * fail loud with a description.
  */
object PpmCodec {

  case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != 3*$width*$height")
  }

  /** Standard-compliant P6 bytes. */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Parse P6 bytes → Image. Proper header tokenizer: any run of
    * whitespace separates tokens, `#` starts a comment through
    * end-of-line; exactly ONE whitespace byte follows the maxval before
    * the raster (the Netpbm spec rule).
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM payload")
    var off = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && off < bytes.length) {
        val b = bytes(off)
        if (b == '#') { while (off < bytes.length && bytes(off) != '\n') off += 1 }
        else if (b == ' ' || b == '\t' || b == '\r' || b == '\n') off += 1
        else going = false
      }
    }
    def token(): Int = {
      skipSpaceAndComments()
      require(off < bytes.length, "PPM header truncated")
      var v = 0; var any = false
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') {
        v = v * 10 + (bytes(off) - '0'); off += 1; any = true
      }
      require(any, s"expected integer in PPM header at offset $off")
      v
    }
    val width = token(); val height = token(); val maxval = token()
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(maxval > 0 && maxval <= 255, s"unsupported maxval $maxval (8-bit only)")
    // exactly one whitespace byte, then the raster
    require(off < bytes.length && isSpace(bytes(off)), "missing raster separator")
    off += 1
    val n = 3 * width * height
    require(bytes.length - off >= n,
      s"raster truncated: need $n bytes, have ${bytes.length - off}")
    Image(width, height, java.util.Arrays.copyOfRange(bytes, off, off + n))
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n'

  /** Nearest-neighbor resize to (outW, outH): source pixel for output
    * (x, y) is (⌊x·w/outW⌋, ⌊y·h/outH⌋) — the integer-exact index map
    * every engine can replay closed-form (no filtering kernel, no float
    * rounding to disagree over). Per-pixel constant work, pure map-side
    * when applied inside a partition iterator.
    */
  def resizeNearest(img: Image, outW: Int, outH: Int): Image = {
    require(outW > 0 && outH > 0, s"bad target ${outW}x$outH")
    val dst = new Array[Byte](3 * outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        val s = 3 * (sy * img.width + sx)
        val d = 3 * (y * outW + x)
        dst(d) = img.rgb(s); dst(d + 1) = img.rgb(s + 1); dst(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(outW, outH, dst)
  }
}

package graft.functions

/** Minimal pure-JVM PPM (P6) image codec — a REAL binary image format
  * (header `P6\n<w> <h>\n<maxval>\n` followed by w·h·3 RGB bytes), so
  * the multimodal decode stage exercises genuine codec work: header
  * parsing, bounds validation, pixel-plane statistics, downsampling.
  * Swapping this for a JPEG/PNG JNI codec changes these two functions,
  * not the Spark plan around them.
  */
object Ppm {

  final case class Image(width: Int, height: Int, maxVal: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3, "pixel plane size mismatch")
  }

  final case class Features(
      width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double, meanLuma: Double)

  /** Encode RGB pixels as P6. */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n${img.maxVal}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    header ++ img.pixels
  }

  /** Decode a P6 byte stream; throws IllegalArgumentException on a
    * malformed header or truncated pixel plane. */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def token(): String = {
      while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      require(pos > start, s"truncated PPM header at byte $start")
      new String(bytes, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
    }
    val magic = token()
    require(magic == "P6", s"not a P6 PPM (magic=$magic)")
    val (w, h, mv) = (token().toInt, token().toInt, token().toInt)
    require(w > 0 && h > 0 && mv > 0 && mv < 65536, s"bad PPM dims $w x $h maxval $mv")
    pos += 1 // single whitespace after maxval, then the pixel plane
    require(bytes.length - pos >= w * h * 3,
      s"truncated pixel plane: need ${w * h * 3}, have ${bytes.length - pos}")
    Image(w, h, mv, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
  }

  /** Per-channel means + Rec.601 luma — the feature-extract stage. */
  def features(bytes: Array[Byte]): Features = {
    val img = decode(bytes)
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.pixels.length) {
      r += img.pixels(i) & 0xFF; g += img.pixels(i + 1) & 0xFF; b += img.pixels(i + 2) & 0xFF
      i += 3
    }
    val n = (img.width * img.height).toDouble
    val (mr, mg, mb) = (r / n, g / n, b / n)
    Features(img.width, img.height, mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb)
  }

  /** 2× box-filter downsample (floor-halved dims) — the resize stage. */
  def downsample2x(img: Image): Image = {
    val w2 = math.max(img.width / 2, 1)
    val h2 = math.max(img.height / 2, 1)
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        var c = 0
        while (c < 3) {
          var acc = 0; var n = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val sx = math.min(2 * x + dx, img.width - 1)
              val sy = math.min(2 * y + dy, img.height - 1)
              acc += img.pixels((sy * img.width + sx) * 3 + c) & 0xFF
              n += 1; dx += 1
            }
            dy += 1
          }
          out((y * w2 + x) * 3 + c) = (acc / n).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(w2, h2, img.maxVal, out)
  }

  /** Deterministic synthetic image from a text seed (LCG over the
    * MurmurHash3 of the text) — the test-data generator standing in
    * for real camera payloads; dims vary to exercise header parsing. */
  def synth(text: String): Image = {
    val seed = scala.util.hashing.MurmurHash3.stringHash(text)
    val w = 4 + (seed & 3)
    val h = 4 + ((seed >>> 2) & 3)
    var s = seed.toLong & 0xFFFFFFFFL
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      s = (s * 6364136223846793005L + 1442695040888963407L) // Knuth LCG
      px(i) = (s >>> 33).toByte
      i += 1
    }
    Image(w, h, 255, px)
  }
}

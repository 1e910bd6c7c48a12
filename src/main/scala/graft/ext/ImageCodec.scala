package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL image encode/decode/resample on executor JVMs via `javax.imageio`
  * (ships in the JDK — no external codecs needed for PNG, closing the
  * round-7 "media decode is env-stubbed" gap for images; video/audio
  * containers still need codecs this environment lacks).
  *
  * Everything here is deterministic across JVMs BY CONSTRUCTION:
  *  - PNG is lossless, so decoded sample values are exact regardless of
  *    which encoder wrote the bytes;
  *  - the resampler is our own integer box-average (floor boundaries,
  *    integer-division mean) rather than Graphics2D interpolation, whose
  *    rounding is implementation-defined;
  *  - the aHash pooling/threshold uses cross-multiplied integer compares,
  *    never a floating average.
  * That determinism is what lets a DuckDB oracle reproduce decoded pixel
  * statistics from the generation formula alone (q_media_image_decode).
  */
object ImageCodec {

  // ImageIO's disk cache buys nothing for in-memory byte arrays and adds
  // tmp-file I/O per call on every executor thread
  ImageIO.setUseCache(false)

  /** Encode an 8-bit grayscale pixel grid (row-major, values 0–255) as
    * PNG bytes. */
  def encodeGrayPng(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
    require(pix.length == w * h, s"expected ${w * h} pixels, got ${pix.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pix(y * w + x)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload to (width, height, row-major
    * 8-bit luminance). Single-band images read their raster samples
    * directly (exact for gray PNG); multi-band ones reduce via the integer
    * BT.601 luma (299r + 587g + 114b) / 1000 — deterministic, no float. */
  def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    if (img.getRaster.getNumBands == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = img.getRaster.getSample(x, y, 0); x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          out(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000; x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }

  /** Per-pixel pooled (cellSum, cellCount) grids for a (tw, th) target:
    * source pixel (x, y) belongs to cell (x·tw/w, y·th/h) — integer
    * division, the partition `GROUP BY (x*tw)//w` produces in SQL (NOT the
    * floor-boundary box form, whose cells differ at e.g. w=13, x=1). One
    * pass over the pixels. */
  private def poolCells(w: Int, h: Int, pix: Array[Int], tw: Int,
      th: Int): (Array[Long], Array[Long]) = {
    val sums = new Array[Long](tw * th)
    val counts = new Array[Long](tw * th)
    var y = 0
    while (y < h) {
      val cj = y * th / h
      var x = 0
      while (x < w) {
        val c = cj * tw + x * tw / w
        sums(c) += pix(y * w + x); counts(c) += 1
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  /** Integer area-average downsample to (tw, th): target pixel (i, j) is
    * the integer-division mean of the source pixels whose cell index
    * ([[poolCells]]) is (i, j). Requires tw ≤ w and th ≤ h (every cell then
    * holds ≥ 1 pixel). */
  def areaResample(w: Int, h: Int, pix: Array[Int], tw: Int, th: Int): Array[Int] = {
    require(tw >= 1 && th >= 1 && tw <= w && th <= h,
      s"downsample only: ($w,$h) -> ($tw,$th)")
    val (sums, counts) = poolCells(w, h, pix, tw, th)
    Array.tabulate(tw * th)(c => (sums(c) / counts(c)).toInt)
  }

  /** aHash over decoded pixels as a 64-char '0'/'1' string (cell-major:
    * bit index = cj·8 + ci): pool to 8×8 cells ([[poolCells]] mapping),
    * bit = 1 iff the cell mean exceeds the image mean — compared exactly
    * via cross-multiplication (cellSum·nTotal > totalSum·nCell), never a
    * rounded average. A string, not an int64, so the SQL oracle needs no
    * 1<<63 sign-bit arithmetic. */
  def aHashBits(w: Int, h: Int, pix: Array[Int]): String = {
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
    var totalSum = 0L
    var p = 0
    while (p < pix.length) { totalSum += pix(p); p += 1 }
    val nTotal = pix.length.toLong
    val (sums, counts) = poolCells(w, h, pix, 8, 8)
    val sb = new StringBuilder(64)
    var c = 0
    while (c < 64) {
      sb += (if (sums(c) * nTotal > totalSum * counts(c)) '1' else '0')
      c += 1
    }
    sb.toString
  }
}

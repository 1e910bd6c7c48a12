package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{ImageCodec, Multimodal}

/** Real javax.imageio path (round-8 task 3): PNG roundtrips are exact,
  * the resampler/aHash use the SQL-reproducible per-pixel cell mapping,
  * and the image feature extractor reads decoded pixels. */
class ImageCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h)(p => ((p % w + p / w + seed) % 256).toInt)

  test("gray PNG encode -> decode roundtrips every pixel exactly") {
    for (seed <- Seq(0L, 7L, 123L); (w, h) <- Seq((8, 8), (13, 11), (20, 9))) {
      val pix = gradient(w, h, seed)
      val (dw, dh, out) = ImageCodec.decodeGray(ImageCodec.encodeGrayPng(w, h, pix))
      assert((dw, dh) == (w, h))
      assert(out.sameElements(pix), s"roundtrip mismatch at ${w}x$h seed $seed")
    }
  }

  test("decodeGray reduces RGB images via integer BT.601 luma") {
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, (x * 40 << 16) | (y * 100 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (_, _, pix) = ImageCodec.decodeGray(bos.toByteArray)
    for (y <- 0 until 2; x <- 0 until 4)
      assert(pix(y * 4 + x) == (299 * (x * 40) + 587 * (y * 100) + 114 * 200) / 1000)
  }

  test("areaResample uses the (x*tw)//w cell partition with integer means") {
    // w=3 -> tw=2: (x*2)//3 maps x∈{0,1} to cell 0 and x=2 to cell 1
    val pix = Array(10, 20, 40, 10, 20, 40) // 3x2
    val out = ImageCodec.areaResample(3, 2, pix, 2, 1)
    assert(out.toSeq == Seq((10 + 20 + 10 + 20) / 4, (40 + 40) / 2))
  }

  test("aHash bit string: gradient image lights the high-sum corner cells") {
    val w = 16; val h = 16
    val pix = Array.tabulate(w * h)(p => (p % w) + (p / w)) // ramp 0..30
    val bits = ImageCodec.aHashBits(w, h, pix)
    assert(bits.length == 64)
    assert(bits.head == '0' && bits.last == '1') // dark origin, bright corner
    // symmetric ramp: exactly the cells past the diagonal are above mean
    assert(bits.count(_ == '1') > 16 && bits.count(_ == '1') < 48)
  }

  test("property: random images roundtrip exactly and pooling invariants hold") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val dims = Gen.zip(Gen.choose(1, 40), Gen.choose(1, 40))
    for (s <- 1L to 40L) {
      val (w, h) = sample(dims, s)
      val pix = Array.tabulate(w * h)(p =>
        sample(Gen.choose(0, 255), s * 10007 + p))
      // lossless roundtrip at every size, including 1×n and n×1
      val (dw, dh, out) = ImageCodec.decodeGray(ImageCodec.encodeGrayPng(w, h, pix))
      assert((dw, dh) == (w, h) && out.sameElements(pix), s"seed $s ${w}x$h")
      // resample to (tw, th) ≤ (w, h): pixel count conserved per cell and
      // every output within the input range (means can't escape it)
      val tw = sample(Gen.choose(1, w), s + 99); val th = sample(Gen.choose(1, h), s + 7)
      val rs = ImageCodec.areaResample(w, h, pix, tw, th)
      assert(rs.length == tw * th)
      assert(rs.forall(v => v >= pix.min && v <= pix.max), s"seed $s range")
      // identity resample is exact
      assert(ImageCodec.areaResample(w, h, pix, w, h).sameElements(pix))
      // aHash: 64 bits, and a constant image hashes to all zeros (no cell
      // strictly exceeds the global mean)
      if (w >= 8 && h >= 8) {
        assert(ImageCodec.aHashBits(w, h, pix).length == 64)
        val const = Array.fill(w * h)(137)
        assert(ImageCodec.aHashBits(w, h, const) == "0" * 64)
      }
    }
  }

  test("ImageDecodeExtractor histograms decoded pixels, not raw bytes") {
    val pix = Array.fill(64)(255) // all-bright 8x8
    val png = ImageCodec.encodeGrayPng(8, 8, pix)
    val feats = new Multimodal.ImageDecodeExtractor().extract(png)
    assert(feats(15) == 1.0f && feats.take(15).forall(_ == 0.0f),
      "all-255 image must land entirely in the top luminance bin")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{ImageCodec, Multimodal, VideoCodec}

/** Real RIFF/AVI path (round-10 task 2): mux/demux round trips are exact,
  * malformed containers fail loudly, and sceneCuts over genuinely decoded
  * frames detects exactly the fixture's planted midpoint cut. */
class VideoCodecSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def gradFrame(w: Int, h: Int, off: Long, invert: Boolean): Array[Int] =
    Array.tabulate(w * h) { p =>
      val g = ((p % w + 2L * (p / w) + off) % 256).toInt
      if (invert) 255 - g else g
    }

  test("AVI mux -> demux round trips every frame byte-exactly") {
    val frames = (0 until 5).map(f =>
      ImageCodec.encodeGrayPng(12, 9, gradFrame(12, 9, f * 3L, invert = false)))
    val avi = VideoCodec.encodeAviMpng(12, 9, 10, frames)
    val (w, h, usec, out) = VideoCodec.decodeAvi(avi)
    assert((w, h, usec) == (12, 9, 100000))
    assert(out.length == 5)
    out.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // and each demuxed frame decodes back to the exact source pixels
    val (dw, dh, pix) = ImageCodec.decodeGray(out(3))
    assert((dw, dh) == (12, 9) &&
      pix.sameElements(gradFrame(12, 9, 9L, invert = false)))
  }

  test("malformed and truncated containers fail loudly, not plausibly") {
    intercept[IllegalArgumentException] {
      VideoCodec.decodeAvi("not a riff container at all......".getBytes)
    }
    val frames = (0 until 4).map(f =>
      ImageCodec.encodeGrayPng(8, 8, gradFrame(8, 8, f.toLong, invert = false)))
    val avi = VideoCodec.encodeAviMpng(8, 8, 10, frames)
    // a torn write that drops the tail must not return a frame prefix:
    // the avih-declared count no longer matches the movi payload
    intercept[IllegalArgumentException] {
      VideoCodec.decodeAvi(java.util.Arrays.copyOf(avi, avi.length - 40))
    }
  }

  test("demuxer skips JUNK chunks (real-world AVI padding) and odd-size pads") {
    // muxers pad with JUNK chunks for alignment; a demuxer that treats
    // unknown ids as frames (or mis-walks their pad byte) returns wrong
    // frame sets. Splice a JUNK chunk with an ODD payload length between
    // hdrl and movi — the walker must skip id, size, AND the pad byte.
    val frames = (0 until 3).map(f =>
      ImageCodec.encodeGrayPng(9, 8, gradFrame(9, 8, f.toLong, invert = false)))
    val avi = VideoCodec.encodeAviMpng(9, 8, 10, frames)
    val bb = java.nio.ByteBuffer.wrap(avi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // locate the movi LIST at top level to splice before it
    var p = 12
    while (!(bb.getInt(p) == 0x5453494c /* LIST */ &&
      bb.getInt(p + 8) == 0x69766f6d /* movi */)) p += 8 + bb.getInt(p + 4) +
      (bb.getInt(p + 4) & 1)
    val junkPayload = 7 // odd on purpose
    val junk = java.nio.ByteBuffer.allocate(8 + junkPayload + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.putInt(0x4b4e554a /* JUNK */).putInt(junkPayload)
      .put(Array.fill[Byte](junkPayload + 1)(0x55))
    val spliced = java.util.Arrays.copyOfRange(avi, 0, p) ++ junk.array() ++
      java.util.Arrays.copyOfRange(avi, p, avi.length)
    // fix the RIFF size for the inserted bytes
    val out = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putInt(4, bb.getInt(4) + 8 + junkPayload + 1)
    val (w, h, _, got) = VideoCodec.decodeAvi(spliced)
    assert((w, h) == (9, 8) && got.length == 3)
    got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("decodeVideoFrames + sceneCuts flags exactly the planted midpoint cut") {
    val docs = (0L until 40L).toDF("doc_id")
    val frames = Multimodal.decodeVideoFrames(Multimodal.videoPayload(docs))
    val cuts = Multimodal.sceneCuts(
      frames.select(col("media_id"), col("frame_no"), col("frame")), 10)
    val flagged = cuts.filter(col("is_cut"))
      .select(col("media_id"), col("frame_no")).as[(Long, Long)]
      .collect().toSet
    val expected = (0L until 40L).map(id => (id, (id % 5 + 4) / 2)).toSet
    assert(flagged == expected,
      s"missed ${expected -- flagged}, spurious ${flagged -- expected}")
    // per-frame luminance sums match the generation formula exactly
    val sums = frames.select(col("media_id"), col("frame_no"), col("sum_lum"))
      .as[(Long, Long, Long)].collect()
    sums.foreach { case (id, f, got) =>
      val w = (id % 9).toInt + 8; val h = (id % 6).toInt + 8
      val cutAt = ((id % 5).toInt + 4) / 2
      val want = (for (y <- 0 until h; x <- 0 until w) yield {
        val g = (x + 2L * y + 3L * f + id) % 256
        if (f < cutAt) g else 255 - g
      }).sum
      assert(got == want, s"sum_lum mismatch media=$id frame=$f")
    }
  }

  test("MJPG (motion-JPEG) AVIs demux and decode; unknown codecs refused") {
    // real-world intra-only AVIs carry plain JPEG frames javax.imageio
    // already decodes. JPEG is lossy, so the pin is structural (dims,
    // frame count, order) plus a tight tolerance on the flat-gray mean —
    // the tolerance-free pixel-exact oracle face stays on PNG.
    def jpegGray(w: Int, h: Int, level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val px = Array.fill(w * h)(level)
      img.getRaster.setSamples(0, 0, w, h, 0, px)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val levels = Seq(40, 128, 220)
    val frames = levels.map(jpegGray(16, 12, _))
    val avi = VideoCodec.encodeAvi(16, 12, 10, "MJPG", frames)
    val (w, h, usec, out) = VideoCodec.decodeAvi(avi)
    assert((w, h, usec) == (16, 12, 100000) && out.length == 3)
    out.zip(levels).foreach { case (f, lvl) =>
      val (dw, dh, pix) = ImageCodec.decodeGray(f)
      assert((dw, dh) == (16, 12))
      val mean = pix.sum.toDouble / pix.length
      assert(math.abs(mean - lvl) < 3.0, s"flat-$lvl decoded mean $mean")
    }
    // and the extractor path works end-to-end on MJPG payloads
    val hist = new Multimodal.MediaDecodeExtractor().extract(avi)
    assert(math.abs(hist.sum - 1.0f) < 1e-6)
    // a codec we can't decode is refused BY NAME at demux: patch the strh
    // fccHandler and strf biCompression from MJPG to a fake H264
    val patched = avi.clone()
    var hits = 0
    var i = 0
    while (i <= patched.length - 4) {
      if (patched(i) == 'M' && patched(i + 1) == 'J' &&
          patched(i + 2) == 'P' && patched(i + 3) == 'G') {
        patched(i) = 'H'; patched(i + 1) = '2'
        patched(i + 2) = '6'; patched(i + 3) = '4'
        hits += 1
      }
      i += 1
    }
    assert(hits == 2) // strh fccHandler + strf biCompression
    val err = intercept[IllegalArgumentException] {
      VideoCodec.decodeAvi(patched)
    }
    assert(err.getMessage.contains("unsupported video stream codec"))
  }

  test("MediaDecodeExtractor histograms genuinely decoded pixels") {
    // a flat-128 single-frame video: every pixel lands in bin 8, so the
    // histogram is a one-hot — wrong under any byte-histogram fallback
    // (PNG container bytes are spread across bins)
    val png = ImageCodec.encodeGrayPng(8, 8, Array.fill(64)(128))
    val avi = VideoCodec.encodeAviMpng(8, 8, 10, Seq(png))
    val h = new Multimodal.MediaDecodeExtractor().extract(avi)
    assert(h(8) == 1.0f && h.sum == 1.0f)
    // non-AVI payloads name the remaining (compressed-codec) boundary
    intercept[IllegalArgumentException] {
      new Multimodal.MediaDecodeExtractor().extract(Array.fill(64)(1.toByte))
    }
  }
}

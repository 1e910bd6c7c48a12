package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.AudioCodec

/** Real javax.sound.sampled path (round-9 task 4): WAV/PCM16 roundtrips are
  * exact, the decoder honors container endianness, and the fixture formula's
  * silence split holds on decoded samples. */
class AudioCodecSpec extends AnyFunSuite {

  test("PCM16 WAV encode -> decode roundtrips every sample exactly") {
    for (seed <- Seq(0L, 7L, 123L); n <- Seq(1, 160, 997)) {
      val samples = Array.tabulate(n)(t =>
        (((t * 31 + seed) % 65536) - 32768).toInt)
      val (sr, ch, out) =
        AudioCodec.decodePcm16(AudioCodec.encodePcm16Wav(8000, samples))
      assert((sr, ch) == (8000, 1))
      assert(out.sameElements(samples), s"roundtrip mismatch n=$n seed=$seed")
    }
  }

  test("stereo WAV roundtrips interleaved samples exactly, per channel") {
    val n = 320 // frames
    val interleaved = Array.tabulate(2 * n) { j =>
      val t = j / 2
      if (j % 2 == 0) ((t * 31) % 65536) - 32768 else ((t * 57 + 11) % 65536) - 32768
    }
    val (sr, ch, out) = AudioCodec.decodePcm16(
      AudioCodec.encodePcm16Wav(8000, interleaved, channels = 2))
    assert((sr, ch) == (8000, 2))
    assert(out.sameElements(interleaved), "stereo roundtrip mismatch")
    // de-interleaved views reconstruct each channel's stream
    val left = Array.tabulate(n)(t => out(2 * t))
    val right = Array.tabulate(n)(t => out(2 * t + 1))
    assert(left.sameElements(Array.tabulate(n)(t => ((t * 31) % 65536) - 32768)))
    assert(right.sameElements(Array.tabulate(n)(t => ((t * 57 + 11) % 65536) - 32768)))
    // a sample count that does not interleave is refused
    intercept[IllegalArgumentException] {
      AudioCodec.encodePcm16Wav(8000, new Array[Int](7), channels = 2)
    }
  }

  test("decoder honors a big-endian container (AIFF) for the same samples") {
    val samples = Array.tabulate(64)(t => t * 100 - 3200)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true)
    val bytes = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      bytes(2 * i) = ((samples(i) >> 8) & 0xff).toByte
      bytes(2 * i + 1) = (samples(i) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val (_, _, out) = AudioCodec.decodePcm16(bos.toByteArray)
    assert(out.sameElements(samples))
  }

  test("non-PCM16 payloads are rejected, not misread") {
    val e = intercept[IllegalArgumentException] {
      // 8-bit unsigned PCM — decodable container, wrong sample width
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        8000f, 8, 1, 1, 8000f, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(Array[Byte](1, 2, 3, 4)), fmt, 4L),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      AudioCodec.decodePcm16(bos.toByteArray)
    }
    assert(e.getMessage.contains("16-bit signed PCM"))
  }
}

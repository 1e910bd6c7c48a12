package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio encode/decode on executor JVMs via `javax.sound.sampled`
  * (ships in the JDK — the same no-external-codecs argument that closed
  * images with `javax.imageio` in round 8; WAV/PCM needs no native codec).
  * Compressed containers (mp3/aac/ogg) still need codecs this environment
  * lacks — they would swap a decoder in front of the same sample loop.
  *
  * Deterministic across JVMs BY CONSTRUCTION: PCM in a WAV container is
  * lossless integer samples, so a decode returns the exact values encoded
  * regardless of which writer produced the bytes. That determinism is what
  * lets a DuckDB oracle reproduce decoded-sample statistics from the
  * generation formula alone (q_media_audio_decode).
  */
object AudioCodec {

  /** Encode 16-bit signed PCM samples (values in [-32768, 32767]) as a
    * WAV container at `sampleRate` Hz, little-endian — the canonical
    * PCM16LE WAV every audio tool reads. `channels > 1` takes the samples
    * CHANNEL-INTERLEAVED in frame order (L R L R …), the WAV wire layout
    * (round 12 widened from mono — real corpora are stereo). */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Int],
      channels: Int = 1): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    require(channels > 0, s"channels must be positive, got $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not interleave into $channels channels")
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, 2 * channels, sampleRate.toFloat, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      // fail fast, not wrap: silently truncating to the low 16 bits would
      // break the decode-returns-what-was-encoded contract far from here
      require(v >= Short.MinValue && v <= Short.MaxValue,
        s"sample $i out of 16-bit range: $v")
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      (samples.length / channels).toLong) // AudioInputStream length is FRAMES
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV (or any `AudioSystem`-supported container holding 16-bit
    * signed PCM) to (sampleRate, channels, samples). Samples come back
    * channel-interleaved in file order, exact — honoring the container's
    * declared endianness, not assuming it. */
  def decodePcm16(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16,
        s"expected 16-bit signed PCM, got ${fmt.getEncoding}/" +
          s"${fmt.getSampleSizeInBits}-bit")
      val data = ais.readAllBytes()
      val n = data.length / 2
      val out = new Array[Int](n)
      var i = 0
      if (fmt.isBigEndian)
        while (i < n) {
          out(i) = (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff); i += 1
        }
      else
        while (i < n) {
          out(i) = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff); i += 1
        }
      (fmt.getSampleRate.toInt, fmt.getChannels, out)
    } finally ais.close()
  }
}

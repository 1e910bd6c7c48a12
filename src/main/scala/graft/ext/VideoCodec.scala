package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** REAL video-container mux/demux on executor JVMs: AVI (the RIFF container,
  * public Microsoft "AVI RIFF File Reference" layout) carrying
  * PNG-compressed frames (fourcc `MPNG` — the lossless PNG-in-AVI stream
  * ffmpeg's `-c:v png` writes). This closes the round-9 "video decode is
  * env-stubbed" gap the same way images (round 8, `javax.imageio`) and WAV
  * audio (round 9, `javax.sound.sampled`) closed: the container is a simple
  * chunk grammar needing no external codec, and every demuxed frame is a
  * plain PNG that [[ImageCodec.decodeGray]] already decodes. The demuxer
  * also accepts `MJPG` (motion JPEG — the common real-world intra-only AVI,
  * whose frames are plain JPEGs `javax.imageio` likewise decodes). Only
  * INTER-frame-compressed codecs (H.264 etc.) genuinely need external
  * libraries and remain out of scope — [[Multimodal.MediaDecodeExtractor]]
  * names that boundary.
  *
  * Determinism: PNG is lossless and the chunk layout is fully specified, so
  * a mux→demux→decode round trip reproduces pixel values EXACTLY — which is
  * what lets a SQL oracle predict every statistic of a real decode from the
  * fixture generation formula alone (q_media_video_decode).
  *
  * All multi-byte integers little-endian; chunks pad to even length (RIFF
  * word alignment). The demuxer is strict: it verifies the RIFF/AVI
  * signatures, walks the declared chunk sizes, and cross-checks the frame
  * count against the `avih` header, failing loudly on truncation instead of
  * returning a plausible prefix (the torn-write failure mode).
  */
object VideoCodec {

  private def fcc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) |
      ((s(3) & 0xff) << 24)
  }

  private val RIFF = fcc("RIFF")
  private val AVI = fcc("AVI ")
  private val LIST = fcc("LIST")
  private val HDRL = fcc("hdrl")
  private val AVIH = fcc("avih")
  private val STRL = fcc("strl")
  private val STRH = fcc("strh")
  private val STRF = fcc("strf")
  private val VIDS = fcc("vids")
  private val MPNG = fcc("MPNG")
  private val MJPG = fcc("MJPG")
  private val MOVI = fcc("movi")
  private val DC00 = fcc("00dc")
  private val DB00 = fcc("00db")
  private val IDX1 = fcc("idx1")

  /** Mux PNG frame payloads into an AVI container (stream fourcc `MPNG`).
    * `fps` becomes the stream rate over scale 1. */
  def encodeAviMpng(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] =
    encodeAvi(w, h, fps, "MPNG", frames)

  /** Mux intra-coded frame payloads into an AVI container with an explicit
    * stream fourcc: "MPNG" for PNG frames, "MJPG" for JPEG (motion JPEG).
    * The frame bytes are stored verbatim — the caller supplies payloads
    * already in the codec's frame format. */
  def encodeAvi(w: Int, h: Int, fps: Int, fourccName: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty)
    val codec = fcc(fourccName)
    require(codec == MPNG || codec == MJPG,
      s"unsupported mux codec $fourccName (MPNG or MJPG)")
    val maxFrame = frames.map(_.length).max

    def chunk(id: Int, data: Array[Byte]): Array[Byte] = {
      val padded = data.length + (data.length & 1)
      val bb = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(id).putInt(data.length).put(data)
      bb.array() // trailing pad byte (if any) stays zero
    }
    def list(kind: Int, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(LIST).putInt(body.length + 4).putInt(kind).put(body)
      bb.array()
    }

    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / fps) // dwMicroSecPerFrame
        .putInt(0)             // dwMaxBytesPerSec
        .putInt(0)             // dwPaddingGranularity
        .putInt(0x10)          // dwFlags: AVIF_HASINDEX
        .putInt(frames.length) // dwTotalFrames
        .putInt(0)             // dwInitialFrames
        .putInt(1)             // dwStreams
        .putInt(maxFrame)      // dwSuggestedBufferSize
        .putInt(w).putInt(h)   // dwWidth, dwHeight
      bb.array() // dwReserved[4] zero
    }
    val strh = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(VIDS).putInt(codec)
        .putInt(0)             // dwFlags
        .putShort(0).putShort(0) // wPriority, wLanguage
        .putInt(0)             // dwInitialFrames
        .putInt(1).putInt(fps) // dwScale, dwRate → fps frames/sec
        .putInt(0)             // dwStart
        .putInt(frames.length) // dwLength
        .putInt(maxFrame)      // dwSuggestedBufferSize
        .putInt(-1)            // dwQuality (default)
        .putInt(0)             // dwSampleSize (0: varying frame size)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }
    val strf = { // BITMAPINFOHEADER with biCompression = the stream fourcc
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24) // biPlanes, biBitCount
        .putInt(codec)           // biCompression
        .putInt(w * h * 3)       // biSizeImage (nominal)
      bb.array() // resolution/clr fields zero
    }
    val hdrl = list(HDRL, chunk(AVIH, avih) ++
      list(STRL, chunk(STRH, strh) ++ chunk(STRF, strf)))

    val moviBody = new ByteArrayOutputStream()
    val offsets = new Array[Int](frames.length)
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = 4 + moviBody.size() // from the 'movi' fourcc, per spec
      moviBody.write(chunk(DC00, f))
    }
    val movi = list(MOVI, moviBody.toByteArray)

    val idx1 = {
      val bb = ByteBuffer.allocate(16 * frames.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      frames.zipWithIndex.foreach { case (f, i) =>
        bb.putInt(DC00).putInt(0x10) // AVIIF_KEYFRAME (every PNG frame is)
          .putInt(offsets(i)).putInt(f.length)
      }
      chunk(IDX1, bb.array())
    }

    val body = hdrl ++ movi ++ idx1
    val out = ByteBuffer.allocate(12 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(RIFF).putInt(body.length + 4).putInt(AVI).put(body)
    out.array()
  }

  /** Demux an AVI payload: (width, height, usecPerFrame, frame payloads).
    * Frames come back as the stored compressed bytes (PNG for `MPNG`
    * streams, JPEG for `MJPG`) in stream order; decode each with
    * [[ImageCodec.decodeGray]]. Fails loudly on a malformed or truncated
    * container. */
  def decodeAvi(payload: Array[Byte]): (Int, Int, Int, Vector[Array[Byte]]) = {
    require(payload != null && payload.length >= 24, "payload too short for AVI")
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == RIFF && bb.getInt(8) == AVI,
      "payload is not a RIFF/AVI container")
    val riffEnd = math.min(payload.length.toLong, 8L + bb.getInt(4)).toInt

    var width = -1; var height = -1; var usecPerFrame = -1; var declared = -1
    val frames = Vector.newBuilder[Array[Byte]]
    var nFrames = 0

    // walk [from, to) as a chunk sequence; recurse into LISTs we care about
    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = bb.getInt(p)
        val size = bb.getInt(p + 4)
        // Long arithmetic: a hostile size near Int.MaxValue would wrap
        // p + 8 + size negative and slip past an int-typed bound check
        require(size >= 0 && p + 8L + size <= to,
          s"truncated chunk at offset $p (size $size, limit $to)")
        if (id == LIST) {
          val kind = bb.getInt(p + 8)
          if (kind == HDRL || kind == STRL || kind == MOVI)
            walk(p + 12, p + 8 + size)
        } else if (id == AVIH) {
          usecPerFrame = bb.getInt(p + 8)
          declared = bb.getInt(p + 8 + 16)
          width = bb.getInt(p + 8 + 32)
          height = bb.getInt(p + 8 + 36)
        } else if (id == STRH) {
          // intra-frame codecs whose frames javax.imageio decodes directly:
          // MPNG (PNG-in-AVI, what encodeAviMpng writes) and MJPG (motion
          // JPEG — the common real-world intra-only AVI). Inter-frame
          // codecs (H.264 etc.) genuinely need external libraries.
          val codec = bb.getInt(p + 12)
          require(bb.getInt(p + 8) != VIDS || codec == MPNG || codec == MJPG,
            "unsupported video stream codec (MPNG/PNG and MJPG/JPEG frames" +
              " only; inter-frame-compressed codecs like H.264 need" +
              " external decoder libraries)")
        } else if (id == DC00 || id == DB00) {
          frames += java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + size)
          nFrames += 1
        }
        p += 8 + size + (size & 1) // chunks pad to even length
      }
    }
    walk(12, riffEnd)

    require(width > 0 && height > 0, "missing avih header")
    require(declared == nFrames,
      s"header declares $declared frames but movi holds $nFrames (truncated?)")
    (width, height, usecPerFrame, frames.result())
  }
}

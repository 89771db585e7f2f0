package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** REAL video codec binding for the one format the bare JDK can fully
  * decode: MJPEG inside an AVI/RIFF container (each frame is an independent
  * JPEG, which `javax.imageio` handles). No external libraries.
  *
  * The RIFF/AVI layout is public and simple (Microsoft "AVI RIFF File
  * Reference"): a `RIFF('AVI ')` file holds a `LIST('hdrl')` with the
  * `avih` main header (frame period, frame count, dimensions) and a
  * `LIST('movi')` whose `..dc`/`..db` chunks carry one compressed frame
  * each. The parser walks that structure leniently — it needs only `avih`
  * and the movi frame chunks, and tolerates index/extension chunks it
  * doesn't know.
  *
  * Inter-frame-compressed codecs (H.264 & co.) stay out of reach without a
  * real decoder library; those bytes fail [[parse]] and callers fall back
  * to the labeled stub in [[Media]], exactly like compressed audio.
  *
  * Reference capability: EXACT ingests only tabular CSV/JSON
  * (Backend/api.py dataset import) — multimodal columns are a
  * beyond-reference training-pipeline operator per the build brief.
  */
object VideoCodec {

  /** `avih` fields we surface (all little-endian u32 in the container). */
  case class VideoMeta(width: Int, height: Int, nFrames: Int,
                       microSecPerFrame: Long) {
    def durationMs: Long = nFrames.toLong * microSecPerFrame / 1000L
    /** Native frame rate (frames per second). */
    def fps: Double =
      if (microSecPerFrame <= 0) 0.0 else 1e6 / microSecPerFrame.toDouble
  }

  /** Parsed container: header meta + each frame's raw JPEG bytes (lazy
    * decode — frame sampling should skip most frames without JPEG cost). */
  case class ParsedVideo(meta: VideoMeta, frames: IndexedSeq[Array[Byte]])

  private def fourcc(b: ByteBuffer): String = {
    val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
  }

  /** Parse an MJPEG-AVI byte array; None for anything that is not a
    * well-formed RIFF/AVI with at least a main header. */
  def parse(bytes: Array[Byte]): Option[ParsedVideo] = {
    try {
      if (bytes.length < 24) return None
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (fourcc(buf) != "RIFF") return None
      buf.getInt // RIFF payload size; trust actual array length instead
      if (fourcc(buf) != "AVI ") return None

      var meta: Option[VideoMeta] = None
      val frames = IndexedSeq.newBuilder[Array[Byte]]

      /** Walk chunks in [from, until); descend into LISTs. */
      def walk(from: Int, until: Int): Unit = {
        var pos = from
        while (pos + 8 <= until) {
          val b = ByteBuffer.wrap(bytes, pos, until - pos)
            .order(ByteOrder.LITTLE_ENDIAN)
          val id = fourcc(b)
          val size = b.getInt
          val dataStart = pos + 8
          val dataEnd = math.min(dataStart + size.toLong, until.toLong).toInt
          if (size < 0 || dataStart > until) return
          id match {
            case "LIST" =>
              // list type fourcc occupies the first 4 payload bytes
              if (dataEnd - dataStart >= 4) walk(dataStart + 4, dataEnd)
            case "avih" if size >= 40 =>
              val h = ByteBuffer.wrap(bytes, dataStart, 40)
                .order(ByteOrder.LITTLE_ENDIAN)
              val uspf = h.getInt(dataStart) & 0xffffffffL
              val totalFrames = h.getInt(dataStart + 16)
              val width = h.getInt(dataStart + 32)
              val height = h.getInt(dataStart + 36)
              meta = Some(VideoMeta(width, height, totalFrames, uspf))
            case _ if (id.substring(2) == "dc" || id.substring(2) == "db") &&
                id.take(2).forall(_.isDigit) =>
              // '##dc' (compressed) / '##db' (uncompressed) stream data
              frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            case _ => // strh/strf/idx1/JUNK/...: skip
          }
          pos = dataEnd + (size & 1) // chunks pad to even length
        }
      }
      walk(12, bytes.length)
      meta.map { m =>
        val fs = frames.result()
        // headers lie sometimes; trust the movi chunk count when present
        val n = if (fs.nonEmpty) fs.length else m.nFrames
        ParsedVideo(m.copy(nFrames = n), fs)
      }
    } catch { case _: Exception => None }
  }

  /** Decode one frame's bytes (JPEG for MJPEG streams) to pixels. */
  def decodeFrame(frameBytes: Array[Byte]): Option[BufferedImage] =
    ImageCodec.decode(frameBytes)

  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    // JPEG writers reject alpha channels — normalize to 3-byte BGR
    val rgb =
      if (img.getType == BufferedImage.TYPE_3BYTE_BGR) img
      else {
        val out = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
        out
      }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(rgb, "jpg", bos)
    bos.toByteArray
  }

  /** Encode frames as an MJPEG-AVI (the writer dual of [[parse]] — a real
    * sink for frame-sampled output, and the fixture source for specs). */
  def encodeAvi(framesIn: Seq[BufferedImage], fps: Int): Array[Byte] = {
    require(framesIn.nonEmpty && fps > 0, "need >= 1 frame and fps > 0")
    val jpegs = framesIn.map(encodeJpeg)
    val w = framesIn.head.getWidth
    val h = framesIn.head.getHeight
    val uspf = 1000000 / fps

    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = ByteBuffer.allocate(8 + payload.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ payload)
    def u32s(vs: Int*): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putInt); b.array()
    }

    val maxBytes = jpegs.map(_.length).max
    // dwMicroSecPerFrame, dwMaxBytesPerSec, dwPaddingGranularity, dwFlags,
    // dwTotalFrames, dwInitialFrames, dwStreams, dwSuggestedBufferSize,
    // dwWidth, dwHeight, dwReserved[4]
    val avih = chunk("avih", u32s(uspf, maxBytes * fps, 0, 0,
      jpegs.length, 0, 1, maxBytes, w, h, 0, 0, 0, 0))
    // AVISTREAMHEADER: fccType, fccHandler, flags, prio+lang, initialFrames,
    // scale, rate, start, length, bufSize, quality, sampleSize, rcFrame
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        u32s(0, 0, 0, 1, fps, 0, jpegs.length, maxBytes, -1, 0,
          0, (h << 16) | w))
    // BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = chunk("strf", u32s(40, w, h) ++
      u32s((24 << 16) | 1) ++ // biPlanes=1 (u16) | biBitCount=24 (u16)
      "MJPG".getBytes("US-ASCII") ++ u32s(w * h * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }
}

package graft.multimodal

/** The video-decode SEAM: one interface for probe-container /
  * demux-frame-slices / decode-one-frame, shared by every video leg
  * ([[Multimodal.withVideoMeta]], [[Multimodal.sampleVideoFrames]]).
  * Implementations must be Serializable — they ride into
  * `mapPartitions` closures and are reused across a partition's rows.
  *
  * Two implementations ship: [[MjpegAviFrameDecoder]] (the one
  * container+codec a bare JVM fully decodes — real demux, real JPEG
  * pixels) and [[StubFrameDecoder]] (deterministic md5-derived
  * metadata for codecs that need a native binding). A production
  * ffmpeg/JNI binding is a third implementation of THIS trait — the
  * callers and their schemas don't change, which is the point of the
  * seam (MultimodalSpec pins that both shipped decoders drive the same
  * call sites).
  */
trait FrameDecoder extends Serializable {

  /** Label reported as the container/codec in metadata rows. */
  def format: String

  /** Container-level metadata, or a decode error (fail-soft). */
  def probe(bytes: Array[Byte]): Either[String, FrameDecoder.VideoInfo]

  /** (offset, length) of each encoded frame in stream order; empty when
    * the container is not demuxable by this decoder. */
  def frameSlices(bytes: Array[Byte]): Seq[(Int, Int)]

  /** Decode one frame slice to its pixel (width, height). */
  def decodeDims(bytes: Array[Byte], off: Int,
      len: Int): Either[String, (Int, Int)]

  /** SEQUENTIAL pixel decode of every demuxed frame, in stream order —
    * the API an INTER-FRAME codec needs (its frames are not
    * independently decodable; see [[RleAviFrameDecoder]]). Default:
    * decode each slice standalone (correct for intra-frame codecs). */
  def decodeFrames(bytes: Array[Byte])
      : Iterator[Either[String, java.awt.image.BufferedImage]] =
    frameSlices(bytes).iterator.map { case (off, len) =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len))
        if (img == null) Left("frame is not decodable image data")
        else Right(img)
      } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
    }
}

object FrameDecoder {
  /** (width, height, declared frame count, frame interval µs). */
  final case class VideoInfo(width: Int, height: Int, nFrames: Int,
      usPerFrame: Long)
}

/** Real decoder for MJPEG-in-AVI, delegating to [[AviMjpeg]]: RIFF
  * walk, movi demux, javax.imageio JPEG pixels. */
object MjpegAviFrameDecoder extends FrameDecoder {
  def format = "avi/mjpeg"

  def probe(bytes: Array[Byte]): Either[String, FrameDecoder.VideoInfo] =
    AviMjpeg.parseInfo(bytes).map(i =>
      FrameDecoder.VideoInfo(i.width, i.height, i.nFrames, i.usPerFrame))

  def frameSlices(bytes: Array[Byte]): Seq[(Int, Int)] =
    AviMjpeg.frameSlices(bytes)

  def decodeDims(bytes: Array[Byte], off: Int,
      len: Int): Either[String, (Int, Int)] =
    AviMjpeg.decodeFrame(bytes, off, len)
      .map(img => (img.getWidth, img.getHeight))
}

/** Deterministic stand-in for codecs that need a native binding
  * (H.264 …): metadata derives from md5 of the bytes (engine- and
  * run-stable, oracle-checkable), frame slices split the payload into
  * `nFrames` even chunks. Clearly a stub — real pixels require a real
  * codec — but it exercises every seam call site with the production
  * signatures, batching and error handling. */
object StubFrameDecoder extends FrameDecoder {
  def format = "stub"

  private def h60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  def probe(bytes: Array[Byte]): Either[String, FrameDecoder.VideoInfo] =
    if (bytes == null || bytes.isEmpty) Left("empty media")
    else {
      val h = h60(bytes)
      Right(FrameDecoder.VideoInfo(
        16 + (h % 4080L).toInt, 16 + ((h / 128L) % 2160L).toInt,
        1 + bytes.length % 240, 33333L))
    }

  def frameSlices(bytes: Array[Byte]): Seq[(Int, Int)] =
    probe(bytes) match {
      case Right(info) if bytes.length >= info.nFrames =>
        val n = info.nFrames
        val step = bytes.length / n
        (0 until n).map(i => (i * step,
          if (i == n - 1) bytes.length - i * step else step))
      case _ => Nil
    }

  def decodeDims(bytes: Array[Byte], off: Int,
      len: Int): Either[String, (Int, Int)] =
    probe(bytes).map(i => (i.width, i.height))
}

package graft.multimodal

/** Pure-JDK parser for the one video container a bare JVM can fully
  * handle: MJPEG-in-AVI. An AVI file is a RIFF tree — `RIFF('AVI '
  * LIST('hdrl' 'avih' …) LIST('movi' '00dc'…))` — and in the MJPEG
  * codec every `..dc`/`..db` chunk in the `movi` list is a complete
  * JFIF/JPEG image, which `javax.imageio` decodes natively. So header
  * parse, frame demux AND pixel decode are all real with zero external
  * dependencies; inter-frame codecs (H.264 etc.) stay out of scope and
  * fail soft with a clear error (the documented production slot for an
  * ffmpeg binding — reference analog: the media upload surface,
  * `backend/routers/documents.py` treats uploads as opaque bytes).
  *
  * All integers little-endian per RIFF; chunk bodies are word-aligned
  * (odd sizes pad one byte). The walker is bounds-checked and
  * truncation-tolerant: a cut-off file yields the frames seen so far,
  * never an exception.
  */
object AviMjpeg {

  /** (width, height, usPerFrame, declared frame count) from `avih`. */
  final case class Info(width: Int, height: Int, nFrames: Int,
      usPerFrame: Long)

  private[multimodal] def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private[multimodal] def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Depth-first chunk walk over [start, end); `f(id, bodyOff, size)`
    * per leaf chunk. LISTs recurse; truncated tails are dropped. */
  private[multimodal] def walk(bytes: Array[Byte], start: Int, end: Int,
      f: (String, Int, Int) => Unit): Unit = {
    var off = start
    var done = false
    while (!done && off + 8 <= end) {
      val id   = fourcc(bytes, off)
      val size = u32(bytes, off + 4)
      val body = off + 8
      if (size < 0 || size > Int.MaxValue || body + size > end) done = true
      else {
        val sz = size.toInt
        if (id == "LIST" && sz >= 4) walk(bytes, body + 4, body + sz, f)
        else f(id, body, sz)
        off = body + sz + (sz & 1)
      }
    }
  }

  private[multimodal] def isRiffAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  /** `..dc` (compressed) / `..db` (uncompressed) stream-data chunks
    * hold the frames; the two leading chars are the stream number. */
  private def isFrameChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.endsWith("dc") || id.endsWith("db"))

  /** Container metadata from the `avih` header chunk. */
  def parseInfo(bytes: Array[Byte]): Either[String, Info] =
    if (!isRiffAvi(bytes)) Left("not a RIFF/AVI container")
    else {
      var info: Option[Info] = None
      walk(bytes, 12, bytes.length, (id, body, sz) =>
        if (id == "avih" && sz >= 40 && info.isEmpty)
          info = Some(Info(
            width    = u32(bytes, body + 32).toInt,
            height   = u32(bytes, body + 36).toInt,
            nFrames  = u32(bytes, body + 16).toInt,
            usPerFrame = u32(bytes, body))))
      info.toRight("no avih header chunk")
    }

  /** (offset, length) of every frame chunk body, in stream order.
    * Offsets point INTO the original array — zero copying here; callers
    * slice only the frames they keep.
    *
    * `keepEmpty`: a zero-byte `##dc` chunk conventionally means
    * "repeat the previous frame" in inter-frame codecs (BI_RLE8), so
    * the RLE leg must keep them to stay aligned with the container
    * timeline; for MJPEG (intra-frame) an empty chunk carries no image
    * and is dropped (the default). */
  def frameSlices(bytes: Array[Byte]): Seq[(Int, Int)] =
    frameSlices(bytes, keepEmpty = false)

  def frameSlices(bytes: Array[Byte], keepEmpty: Boolean): Seq[(Int, Int)] =
    if (!isRiffAvi(bytes)) Nil
    else {
      val out = Seq.newBuilder[(Int, Int)]
      walk(bytes, 12, bytes.length, (id, body, sz) =>
        if (isFrameChunk(id) && (keepEmpty || sz > 0)) out += ((body, sz)))
      out.result()
    }

  /** Decode one demuxed MJPEG frame to pixels (real JPEG decode). */
  def decodeFrame(bytes: Array[Byte], off: Int,
      len: Int): Either[String, java.awt.image.BufferedImage] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes, off, len))
      if (img == null) Left("frame is not decodable image data") else Right(img)
    } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
}

package graft.multimodal

import java.awt.image.BufferedImage

/** REAL inter-frame video decode, pure JVM: Microsoft RLE8
  * (`BI_RLE8`, biCompression = 1) in AVI — the classic palettized
  * run-length codec whose DELTA and skip escapes make later frames
  * depend on earlier ones. This closes the repo's one documented
  * multimodal stub ("inter-frame codecs need a native binding"): the
  * binding is ~150 lines of documented public byte format, not ffmpeg.
  *
  * Wire format (bottom-up rows, 8-bit palette indices), a stream of
  * byte pairs per frame chunk:
  *   - `(n > 0, idx)`  — run: n pixels of palette index idx;
  *   - `(0, 0)`        — end of line (x := 0, y := y + 1);
  *   - `(0, 1)`        — end of bitmap;
  *   - `(0, 2, dx, dy)`— DELTA: skip right dx and UP dy rows — the
  *     skipped pixels KEEP THE PREVIOUS FRAME's content (this is what
  *     makes it inter-frame; on the first frame they stay palette 0);
  *   - `(0, n ≥ 3, n idx bytes, pad to word)` — absolute literal run.
  *
  * The palette rides in the video stream's `strf` chunk
  * (BITMAPINFOHEADER + BGRX quads). The decoder is bounds-checked and
  * truncation-tolerant: a malformed frame yields a per-frame error,
  * never an exception, and decoding continues on the carried canvas
  * (the fail-soft discipline of the media legs).
  */
object AviRle8 {

  import AviMjpeg.{fourcc, isRiffAvi, u32, walk}

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** The first video stream's (biCompression, width, height, palette
    * as packed RGB ints). Palette size from biClrUsed (0 = 256). */
  final case class Format(compression: Long, width: Int, height: Int,
      palette: Array[Int])

  def parseFormat(bytes: Array[Byte]): Either[String, Format] =
    if (!isRiffAvi(bytes)) Left("not a RIFF/AVI container")
    else {
      var fmt: Option[Format] = None
      var inVideo = false
      walk(bytes, 12, bytes.length, (id, body, sz) => id match {
        case "strh" =>
          // reset on EVERY strh: a malformed/short strh for a following
          // stream must not leave inVideo stale from the prior video
          // stream (its strf would be misparsed as the video format)
          inVideo = sz >= 8 && fourcc(bytes, body) == "vids"
        case "strf" if inVideo && sz >= 40 && fmt.isEmpty =>
          val w = u32(bytes, body + 4).toInt
          val h = u32(bytes, body + 8).toInt
          val comp = u32(bytes, body + 16)
          val clrUsed = u32(bytes, body + 32).toInt
          val n = if (clrUsed == 0) 256 else clrUsed
          val pal = new Array[Int](256)
          var i = 0
          while (i < n && body + 40 + i * 4 + 2 < body + sz) {
            val o = body + 40 + i * 4 // BGRX quads
            pal(i) = ((bytes(o + 2) & 0xff) << 16) |
              ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
            i += 1
          }
          fmt = Some(Format(comp, w, h, pal))
        case _ =>
      })
      fmt.toRight("no video strf chunk")
    }

  /** Is this an AVI whose video stream is BI_RLE8? */
  def isRle8(bytes: Array[Byte]): Boolean =
    parseFormat(bytes).exists(_.compression == 1L)

  /** Decode one RLE8 frame chunk ONTO the carried index canvas
    * (bottom-up coordinates). Returns None on success, Some(error) on
    * malformed input (canvas keeps whatever was painted — fail-soft). */
  private def decodeChunk(bytes: Array[Byte], off: Int, len: Int,
      canvas: Array[Byte], w: Int, h: Int): Option[String] = {
    var p = off
    val end = off + len
    var x = 0
    var y = 0 // bottom-up row
    while (p + 1 < end) {
      val b1 = bytes(p) & 0xff
      val b2 = bytes(p + 1) & 0xff
      p += 2
      if (b1 > 0) { // encoded run
        var i = 0
        while (i < b1) {
          if (x < w && y < h) canvas((h - 1 - y) * w + x) = b2.toByte
          x += 1; i += 1
        }
      } else b2 match {
        case 0 => x = 0; y += 1 // EOL
        case 1 => return None // EOB
        case 2 => // DELTA: skipped pixels keep the previous frame
          if (p + 1 >= end) return Some("truncated DELTA escape")
          x += bytes(p) & 0xff
          y += bytes(p + 1) & 0xff
          p += 2
        case n => // absolute run, word-aligned
          if (p + n > end) return Some("truncated absolute run")
          var i = 0
          while (i < n) {
            if (x < w && y < h)
              canvas((h - 1 - y) * w + x) = bytes(p + i)
            x += 1; i += 1
          }
          p += n + (n & 1)
      }
    }
    Some("frame ended without EOB")
  }

  /** Sequential pixel decode of every frame — the inter-frame canvas
    * carries across chunks. One BufferedImage per demuxed frame (or a
    * per-frame error; decode continues on the carried canvas). */
  def decodeFrames(bytes: Array[Byte])
      : Iterator[Either[String, BufferedImage]] =
    parseFormat(bytes) match {
      case Left(e) => Iterator.single(Left(e))
      case Right(f) if f.compression != 1L =>
        Iterator.single(Left(s"not BI_RLE8 (compression=${f.compression})"))
      case Right(f) =>
        val w = f.width; val h = f.height
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26))
          Iterator.single(Left(s"implausible dimensions ${w}x$h"))
        else {
          val canvas = new Array[Byte](w * h)
          def paint(): BufferedImage = {
            val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            var i = 0
            while (i < w * h) {
              img.setRGB(i % w, i / w, f.palette(canvas(i) & 0xff))
              i += 1
            }
            img
          }
          // keepEmpty: a zero-byte ##dc chunk means "repeat previous
          // frame" — emit the carried canvas so frame numbering stays
          // aligned with the container timeline (and header nFrames)
          AviMjpeg.frameSlices(bytes, keepEmpty = true).iterator.map {
            case (_, 0) => Right(paint())
            case (off, len) =>
              decodeChunk(bytes, off, len, canvas, w, h) match {
                case Some(err) => Left(err)
                case None      => Right(paint())
              }
          }
        }
    }
}

/** [[FrameDecoder]] over [[AviRle8]] — same demux as the MJPEG leg,
  * SEQUENTIAL pixel decode (inter-frame state). `decodeDims` answers
  * from the header (an RLE frame has no standalone dimensions). */
object RleAviFrameDecoder extends FrameDecoder {
  def format = "avi/rle8"

  def probe(bytes: Array[Byte]): Either[String, FrameDecoder.VideoInfo] =
    AviMjpeg.parseInfo(bytes).flatMap { i =>
      if (AviRle8.isRle8(bytes))
        Right(FrameDecoder.VideoInfo(i.width, i.height, i.nFrames,
          i.usPerFrame))
      else Left("video stream is not BI_RLE8")
    }

  def frameSlices(bytes: Array[Byte]): Seq[(Int, Int)] =
    if (AviRle8.isRle8(bytes))
      AviMjpeg.frameSlices(bytes, keepEmpty = true)
    else Nil

  def decodeDims(bytes: Array[Byte], off: Int,
      len: Int): Either[String, (Int, Int)] =
    AviRle8.parseFormat(bytes).map(f => (f.width, f.height))

  override def decodeFrames(bytes: Array[Byte])
      : Iterator[Either[String, java.awt.image.BufferedImage]] =
    AviRle8.decodeFrames(bytes)
}

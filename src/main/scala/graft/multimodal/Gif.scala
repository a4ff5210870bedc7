package graft.multimodal

import java.awt.image.BufferedImage

/** REAL inter-frame animated-GIF decode, pure JVM: GIF89a (CompuServe
  * 1989/1990 public specification) — LZW-compressed palettized frames
  * with PARTIAL-frame placement, per-frame TRANSPARENCY, and DISPOSAL
  * methods, all of which make later frames depend on the composited
  * canvas carried from earlier ones. The second real inter-frame codec
  * beside [[AviRle8]], and a different seam: RLE8 exercises carried
  * pixels via skip escapes; GIF exercises palette indirection (global
  * vs local color tables), sub-rectangle composition, transparency
  * holes, restore-to-background/previous disposal, interlaced row
  * order, and a growing LZW dictionary.
  *
  * Wire format (reference: the GIF89a spec, public):
  *   - header `GIF87a`/`GIF89a`; logical screen descriptor (w, h,
  *     packed GCT flag/size, background index); optional global color
  *     table of 2^(n+1) RGB triples;
  *   - blocks until trailer 0x3B:
  *     - 0x21 extension (label + length-prefixed sub-blocks); the
  *       graphic control extension (label 0xF9) carries the NEXT
  *       image's disposal method, delay (centiseconds) and transparent
  *       index;
  *     - 0x2C image descriptor: (left, top, w, h, packed LCT
  *       flag/size + interlace flag), optional local color table, LZW
  *       minimum code size byte, then the compressed pixel stream as
  *       sub-blocks.
  *
  * Composition (the inter-frame part): each frame paints its
  * non-transparent indices into the carried RGB canvas at its
  * (left, top) offset; after emitting the composited frame, disposal
  * 2 clears the frame's rectangle to the background color and
  * disposal 3 restores the canvas bytes from before the frame was
  * painted (0/1 leave the canvas). The decoder is bounds-checked and
  * truncation-tolerant: a malformed frame yields a per-frame error and
  * decoding continues on the carried canvas where the block structure
  * allows (the fail-soft discipline of the media legs).
  */
object Gif {

  /** Header + block-walk summary: canvas dims, background color
    * index, frame (image descriptor) count, first frame delay in
    * centiseconds (0 when no graphic control extension precedes the
    * first image). */
  final case class ScreenInfo(width: Int, height: Int, bgIndex: Int,
      gct: Array[Int], nFrames: Int, delayCs: Int)

  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a'

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Skip a run of length-prefixed sub-blocks starting at `p`;
    * returns the offset past the 0x00 terminator, or -1 on
    * truncation. */
  private def skipSubBlocks(b: Array[Byte], p0: Int): Int = {
    var p = p0
    while (p < b.length && b(p) != 0) p += 1 + (b(p) & 0xff)
    if (p >= b.length) -1 else p + 1
  }

  /** Concatenate a run of sub-blocks into one payload; returns
    * (payload, offset past terminator) or an error on truncation. */
  private def readSubBlocks(b: Array[Byte],
      p0: Int): Either[String, (Array[Byte], Int)] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = p0
    while (p < b.length && b(p) != 0) {
      val n = b(p) & 0xff
      if (p + 1 + n > b.length) return Left("truncated sub-block")
      out.write(b, p + 1, n)
      p += 1 + n
    }
    if (p >= b.length) Left("sub-blocks missing terminator")
    else Right((out.toByteArray, p + 1))
  }

  /** Parse the header and walk every block once (cheap — LZW data is
    * skipped, not decoded). */
  def parseScreen(bytes: Array[Byte]): Either[String, ScreenInfo] = {
    if (!isGif(bytes)) return Left("not a GIF87a/GIF89a stream")
    if (bytes.length < 13) return Left("truncated screen descriptor")
    val w = u16(bytes, 6)
    val h = u16(bytes, 8)
    val packed = bytes(10) & 0xff
    val bg = bytes(11) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctN = if (hasGct) 2 << (packed & 7) else 0
    if (13 + gctN * 3 > bytes.length) return Left("truncated color table")
    val gct = new Array[Int](gctN)
    var i = 0
    while (i < gctN) {
      val o = 13 + i * 3
      gct(i) = ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
        (bytes(o + 2) & 0xff)
      i += 1
    }
    var p = 13 + gctN * 3
    var n = 0
    var delay = -1
    var done = false
    while (!done && p < bytes.length) (bytes(p) & 0xff) match {
      case 0x3b => done = true
      case 0x21 =>
        if (p + 2 > bytes.length) return Left("truncated extension")
        if ((bytes(p + 1) & 0xff) == 0xf9 && delay < 0 &&
            p + 2 < bytes.length && (bytes(p + 2) & 0xff) >= 4 &&
            p + 7 <= bytes.length)
          delay = u16(bytes, p + 4)
        p = skipSubBlocks(bytes, p + 2)
        if (p < 0) return Left("truncated extension sub-blocks")
      case 0x2c =>
        if (p + 10 > bytes.length) return Left("truncated image descriptor")
        val ipacked = bytes(p + 9) & 0xff
        val lctN = if ((ipacked & 0x80) != 0) 2 << (ipacked & 7) else 0
        val q = p + 10 + lctN * 3 + 1 // + LZW min code size byte
        if (q > bytes.length) return Left("truncated local color table")
        n += 1
        p = skipSubBlocks(bytes, q)
        if (p < 0) return Left("truncated image data")
      case other => return Left(f"unknown block 0x$other%02x")
    }
    if (!done) Left("missing trailer")
    else Right(ScreenInfo(w, h, bg, gct, n, math.max(delay, 0)))
  }

  /** GIF-variant LZW decode of `nPixels` palette indices: LSB-first
    * bit packing, clear/EOI codes, code width growing 'minCodeSize+1'
    * → 12 bits, dictionary reset on clear. Tolerates a missing EOI
    * (common in the wild) but never overruns `nPixels`. */
  private[multimodal] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      nPixels: Int): Either[String, Array[Byte]] = {
    if (minCodeSize < 1 || minCodeSize > 8)
      return Left(s"bad LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as parallel arrays: prefix code + appended suffix byte
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val pixels = new Array[Byte](nPixels)
    var nOut = 0
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    // LSB-first bit reader over the concatenated sub-block payload
    var acc = 0L
    var nBits = 0
    var p = 0
    val stack = new Array[Byte](4097)
    def expand(code0: Int): Boolean = { // emit code's string
      var sp = 0
      var c = code0
      while (c >= clear + 2) { // walk the chain down to a root
        if (sp >= stack.length) return false // cycle guard
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      stack(sp) = c.toByte; sp += 1
      while (sp > 0 && nOut < nPixels) {
        sp -= 1; pixels(nOut) = stack(sp); nOut += 1
      }
      true
    }
    def firstByte(code0: Int): Int = {
      var c = code0
      while (c >= clear + 2) c = prefix(c)
      c
    }
    while (nOut < nPixels) {
      while (nBits < codeSize) {
        if (p >= data.length)
          return Left(s"LZW stream ended at $nOut/$nPixels pixels")
        acc |= (data(p) & 0xffL) << nBits
        nBits += 8
        p += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      nBits -= codeSize
      if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return Left(s"early EOI at $nOut/$nPixels pixels")
      } else if (prev < 0) { // first code after (implicit) clear
        if (code >= clear) return Left(s"bad first code $code")
        pixels(nOut) = code.toByte; nOut += 1; prev = code
      } else if (code < next && (code < clear || code >= eoi + 1)) {
        if (!expand(code)) return Left("corrupt LZW chain")
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = firstByte(code).toByte
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      } else if (code == next && next < 4096) { // KwKwK
        val fb = firstByte(prev)
        prefix(next) = prev; suffix(next) = fb.toByte
        next += 1
        if (!expand(next - 1)) return Left("corrupt LZW chain")
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = next - 1
      } else {
        return Left(s"LZW code $code out of range (next=$next)")
      }
    }
    Right(pixels)
  }

  /** The four-pass interlaced row order of the spec: rows 0,8,16…,
    * then 4,12…, then 2,6,10…, then 1,3,5…. Returns the target row of
    * each SEQUENTIAL decoded row. */
  private[multimodal] def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
         y <- start until h by step) { out(i) = y; i += 1 }
    out
  }

  /** Sequential pixel decode of every frame — the composition canvas
    * carries across frames. One canvas-sized BufferedImage per image
    * descriptor (or a per-frame error; structural errors end the
    * stream with one final Left). */
  def decodeFrames(bytes: Array[Byte])
      : Iterator[Either[String, BufferedImage]] =
    parseScreen(bytes) match {
      case Left(e) => Iterator.single(Left(e))
      case Right(info) =>
        val w = info.width; val h = info.height
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26))
          return Iterator.single(Left(s"implausible dimensions ${w}x$h"))
        val bg = if (info.bgIndex < info.gct.length)
          info.gct(info.bgIndex) else 0
        val canvas = Array.fill[Int](w * h)(bg)
        def paintImage(): BufferedImage = {
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          img.setRGB(0, 0, w, h, canvas, 0, w)
          img
        }
        var p = 13 + info.gct.length * 3
        // pending graphic-control state (applies to the NEXT image)
        var disposal = 0
        var transIdx = -1
        new Iterator[Either[String, BufferedImage]] {
          private var ended = false
          private var pending: Option[Either[String, BufferedImage]] = None
          private def advance(): Unit = {
            while (pending.isEmpty && !ended && p < bytes.length)
              (bytes(p) & 0xff) match {
                case 0x3b => ended = true
                case 0x21 =>
                  if ((bytes(p + 1) & 0xff) == 0xf9 &&
                      p + 7 <= bytes.length &&
                      (bytes(p + 2) & 0xff) >= 4) {
                    val gp = bytes(p + 3) & 0xff
                    disposal = (gp >> 2) & 7
                    transIdx = if ((gp & 1) != 0) bytes(p + 6) & 0xff
                      else -1
                  }
                  p = skipSubBlocks(bytes, p + 2) // parseScreen bounded it
                case 0x2c =>
                  val left = u16(bytes, p + 1)
                  val top = u16(bytes, p + 3)
                  val fw = u16(bytes, p + 5)
                  val fh = u16(bytes, p + 7)
                  val ipacked = bytes(p + 9) & 0xff
                  val interlaced = (ipacked & 0x40) != 0
                  val lctN = if ((ipacked & 0x80) != 0)
                    2 << (ipacked & 7) else 0
                  val pal = if (lctN > 0) {
                    val t = new Array[Int](lctN)
                    var i = 0
                    while (i < lctN) {
                      val o = p + 10 + i * 3
                      t(i) = ((bytes(o) & 0xff) << 16) |
                        ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
                      i += 1
                    }
                    t
                  } else info.gct
                  val q = p + 10 + lctN * 3
                  val minCode = bytes(q) & 0xff
                  readSubBlocks(bytes, q + 1) match {
                    case Left(err) =>
                      pending = Some(Left(err)); ended = true
                    case Right((data, pNext)) =>
                      p = pNext
                      val res = lzwDecode(data, minCode,
                          fw.toLong.toInt * fh) match {
                        case Left(err) =>
                          // fail-soft: canvas carries, stream continues
                          Left(err)
                        case Right(idx) =>
                          val saved = if (disposal == 3) canvas.clone()
                            else null
                          val rowOf = if (interlaced) interlaceRows(fh)
                            else null
                          var r = 0
                          while (r < fh) {
                            val y = top + (if (rowOf != null) rowOf(r)
                              else r)
                            var x = 0
                            while (x < fw) {
                              val v = idx(r * fw + x) & 0xff
                              if (v != transIdx && y < h && left + x < w)
                                canvas(y * w + left + x) =
                                  if (v < pal.length) pal(v) else 0
                              x += 1
                            }
                            r += 1
                          }
                          val img = paintImage()
                          disposal match {
                            case 2 => // restore rect to background
                              var yy = top
                              while (yy < math.min(top + fh, h)) {
                                var xx = left
                                while (xx < math.min(left + fw, w)) {
                                  canvas(yy * w + xx) = bg; xx += 1
                                }
                                yy += 1
                              }
                            case 3 =>
                              System.arraycopy(saved, 0, canvas, 0,
                                canvas.length)
                            case _ =>
                          }
                          Right(img)
                      }
                      disposal = 0; transIdx = -1 // GCE is one-shot
                      pending = Some(res)
                  }
                case _ => ended = true // parseScreen already rejected it
              }
            if (p >= bytes.length) ended = true
          }
          def hasNext: Boolean = { advance(); pending.isDefined }
          def next(): Either[String, BufferedImage] = {
            advance()
            val r = pending.get; pending = None; r
          }
        }
    }
}

/** [[FrameDecoder]] over [[Gif]] — SEQUENTIAL composition (partial
  * frames, transparency and disposal make GIF inter-frame).
  * `frameSlices` spans each image descriptor block; `decodeDims`
  * answers canvas dimensions (a composited GIF frame is always
  * canvas-sized). Delay is centiseconds on the wire → µs here. */
object GifFrameDecoder extends FrameDecoder {
  def format = "gif"

  def probe(bytes: Array[Byte]): Either[String, FrameDecoder.VideoInfo] =
    Gif.parseScreen(bytes).map(i => FrameDecoder.VideoInfo(
      i.width, i.height, i.nFrames,
      if (i.delayCs > 0) i.delayCs * 10000L else 100000L))

  def frameSlices(bytes: Array[Byte]): Seq[(Int, Int)] =
    Gif.parseScreen(bytes) match {
      case Left(_) => Nil
      // descriptor offsets are not independently decodable (LZW state
      // is per-frame but the CANVAS is not): report even spans so
      // slice counts and sampling stay aligned with the composition
      // sequence, like the RLE8 leg's repeat chunks
      case Right(i) if i.nFrames > 0 =>
        val step = math.max(bytes.length / i.nFrames, 1)
        (0 until i.nFrames).map(k => (k * step,
          if (k == i.nFrames - 1) bytes.length - k * step else step))
      case _ => Nil
    }

  def decodeDims(bytes: Array[Byte], off: Int,
      len: Int): Either[String, (Int, Int)] =
    Gif.parseScreen(bytes).map(i => (i.width, i.height))

  override def decodeFrames(bytes: Array[Byte])
      : Iterator[Either[String, java.awt.image.BufferedImage]] =
    Gif.decodeFrames(bytes)
}

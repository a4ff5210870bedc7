package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic animated-GIF89a writer — the mirror of [[Gif]] (the
  * relationship [[AviRle8Write]] has to [[AviRle8]]): a logical screen
  * with a 4-entry global color table, per-frame graphic control
  * extensions (disposal, transparency), full OR PARTIAL image
  * descriptors, optional interlacing, and a REAL LZW encoder
  * (dictionary growth, width escalation, clear-code reset at 4096).
  * Built for the oracled video queries: synthetic clips whose frame
  * content is a pure function of row data, so a SQL oracle can replay
  * the scene-cut schedule in closed form while the engine decodes real
  * inter-frame GIF bytes.
  *
  * Frame vocabulary:
  *  - `Full(splitCol)` — a canvas-sized two-tone vertical split
  *    (palette 1 left of the split column, palette 2 right) — the same
  *    pattern language as [[AviRle8Write.frameBody]];
  *  - `Carry(underSplit)` — a PARTIAL frame (the center half-rect)
  *    that repaints what the carried canvas already shows at that
  *    offset, with every (x+y)-even pixel punched TRANSPARENT: pixel
  *    content is provably unchanged, but only if offset composition,
  *    transparency skip and the carried canvas are all correct — the
  *    GIF-specific inter-frame seams, made oracle-load-bearing.
  */
object GifWrite {

  /** Palette: 0 black (background), 1 dark gray, 2 white,
    * 3 the transparent slot (color value never shown). */
  val Palette: Seq[Int] = Seq(0x000000, 0x303030, 0xffffff, 0xff00ff)
  val TransIdx = 3
  private val MinCodeSize = 2 // 4-entry palette → 2-bit roots

  sealed trait Frame extends Serializable
  final case class Full(splitCol: Int, interlaced: Boolean = false)
    extends Frame
  final case class Carry(underSplit: Int) extends Frame
  /** Arbitrary frame for the specs: any rect, any disposal, any
    * per-pixel index function (FRAME-relative coordinates). */
  final case class Custom(left: Int, top: Int, fw: Int, fh: Int,
      disposal: Int, transparent: Boolean, interlaced: Boolean,
      px: (Int, Int) => Int) extends Frame

  /** GIF-variant LZW encode: LSB-first bit packing, leading clear
    * code, width escalation in step with [[Gif.lzwDecode]], dictionary
    * reset when the 4096-entry table fills, trailing EOI. */
  private[multimodal] def lzwEncode(pixels: Array[Byte],
      minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8
      }
    }
    // dictionary: (prefix code << 8 | suffix byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    if (pixels.nonEmpty) {
      var w = pixels(0) & 0xff
      var i = 1
      while (i < pixels.length) {
        val c = pixels(i) & 0xff
        val key = Integer.valueOf((w << 8) | c)
        val hit = dict.get(key)
        if (hit != null) w = hit.intValue()
        else {
          emit(w)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            next += 1
            // the code AFTER this insert is wider once next passes the
            // width boundary — the encoder-side twin of the decoder's
            // next == (1 << codeSize) bump (one entry later, because
            // the decoder's table lags the encoder's by one insert)
            if (next > (1 << codeSize) && codeSize < 12) codeSize += 1
          } else { // table full: reset (exercises the clear-code path)
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            codeSize = minCodeSize + 1
          }
          w = c
        }
        i += 1
      }
      emit(w)
    }
    emit(eoi)
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  private def u16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }

  private def subBlocks(o: ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var p = 0
    while (p < data.length) {
      val n = math.min(255, data.length - p)
      o.write(n); o.write(data, p, n)
      p += n
    }
    o.write(0)
  }

  /** The spec's four-pass interlace permutation applied to row-major
    * indices: output row r of the STREAM is source row
    * [[Gif.interlaceRows]](h)(r). */
  private def interlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rows = Gif.interlaceRows(h)
    val out = new Array[Byte](idx.length)
    var r = 0
    while (r < h) {
      System.arraycopy(idx, rows(r) * w, out, r * w, w)
      r += 1
    }
    out
  }

  /** One image block (GCE + descriptor + LZW data) painted from a
    * pixel-index function over the frame rect. */
  private def imageBlock(o: ByteArrayOutputStream, left: Int, top: Int,
      fw: Int, fh: Int, disposal: Int, transparent: Boolean,
      interlaced: Boolean, delayCs: Int, px: (Int, Int) => Int): Unit = {
    // graphic control extension
    o.write(0x21); o.write(0xf9); o.write(4)
    o.write((disposal << 2) | (if (transparent) 1 else 0))
    u16(o, delayCs)
    o.write(if (transparent) TransIdx else 0)
    o.write(0)
    // image descriptor
    o.write(0x2c)
    u16(o, left); u16(o, top); u16(o, fw); u16(o, fh)
    o.write(if (interlaced) 0x40 else 0x00) // no LCT
    val idx = new Array[Byte](fw * fh)
    var y = 0
    while (y < fh) {
      var x = 0
      while (x < fw) { idx(y * fw + x) = px(x, y).toByte; x += 1 }
      y += 1
    }
    o.write(MinCodeSize)
    subBlocks(o, lzwEncode(
      if (interlaced) interlace(idx, fw, fh) else idx, MinCodeSize))
  }

  /** A complete animated GIF89a. */
  def gif(w: Int, h: Int, frames: Seq[Frame],
      delayCs: Int = 4): Array[Byte] = {
    require(w <= 0xffff && h <= 0xffff)
    val o = new ByteArrayOutputStream()
    o.write("GIF89a".getBytes("US-ASCII"))
    u16(o, w); u16(o, h)
    o.write(0x80 | 0x01) // GCT present, 2^(1+1) = 4 entries
    o.write(0)           // background index 0
    o.write(0)           // aspect
    Palette.foreach { rgb =>
      o.write((rgb >> 16) & 0xff); o.write((rgb >> 8) & 0xff)
      o.write(rgb & 0xff)
    }
    // NETSCAPE2.0 loop-forever application extension (the block every
    // real animated GIF carries; exercises the extension-skip path)
    o.write(0x21); o.write(0xff); o.write(11)
    o.write("NETSCAPE2.0".getBytes("US-ASCII"))
    o.write(3); o.write(1); u16(o, 0); o.write(0)
    frames.foreach {
      case Full(split, il) =>
        imageBlock(o, 0, 0, w, h, disposal = 1, transparent = false,
          interlaced = il, delayCs = delayCs,
          px = (x, _) => if (x < split) 1 else 2)
      case Carry(under) =>
        // center half-rect, repainting the carried pattern with a
        // transparent checkerboard punched through it
        val left = w / 4; val top = h / 4
        imageBlock(o, left, top, w / 2, h / 2, disposal = 1,
          transparent = true, interlaced = false, delayCs = delayCs,
          px = (x, y) =>
            if (((left + x) + (top + y)) % 2 == 0) TransIdx
            else if (left + x < under) 1 else 2)
      case Custom(left, top, fw, fh, disposal, transparent, il, px) =>
        imageBlock(o, left, top, fw, fh, disposal, transparent, il,
          delayCs, px)
    }
    o.write(0x3b)
    o.toByteArray
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic BI_RLE8 AVI writer — the mirror of [[AviRle8]] (the
  * same relationship [[graft.embed.OnnxWrite]] has to
  * [[graft.embed.Onnx]]): a minimal RIFF tree (`avih`, one `vids`
  * stream with an 8-bit palette `strf`, a `movi` list of `00dc`
  * chunks) whose frames are RLE8 ABSOLUTE runs. Built for the oracled
  * video queries: synthetic clips whose frame content is a pure
  * function of row data, so a SQL oracle can replay the scene-cut
  * schedule in closed form while the engine decodes real inter-frame
  * video bytes.
  *
  * Frame vocabulary:
  *  - `frame(pattern)` — a full-frame absolute encoding of a two-tone
  *    vertical split (palette 1 left of the split column, palette 2
  *    right), one row per RLE line;
  *  - `repeatFrame` — a ZERO-BYTE `00dc` chunk: the conventional
  *    "repeat previous frame" no-op ([[AviMjpeg.frameSlices]]'s
  *    keepEmpty leg decodes it as the carried canvas).
  */
object AviRle8Write {

  final class W {
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def chunk(id: String)(f: W => Unit): Unit = {
      val b = new W; f(b); val body = b.out.toByteArray
      cc(id); u32(body.length.toLong); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    def list(kind: String)(f: W => Unit): Unit = {
      val b = new W; b.cc(kind); f(b); val body = b.out.toByteArray
      cc("LIST"); u32(body.length.toLong); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
  }

  /** Palette: 0 black, 1 dark gray, 2 white — the two-tone split uses
    * 1|2 so both sides differ from the initial canvas (palette 0). */
  val Palette: Seq[Int] = Seq(0x000000, 0x303030, 0xffffff)

  /** One full-frame RLE8 body: rows of `splitCol` pixels of palette 1
    * then `w - splitCol` of palette 2, each row ended by EOL, the
    * frame by EOB. Encoded runs cap at 255 (the one-byte count). */
  def frameBody(w: Int, h: Int, splitCol: Int): Array[Byte] = {
    require(w <= 255 && splitCol >= 0 && splitCol <= w)
    val out = new ByteArrayOutputStream()
    var y = 0
    while (y < h) {
      if (splitCol > 0) { out.write(splitCol); out.write(1) }
      if (splitCol < w) { out.write(w - splitCol); out.write(2) }
      out.write(0); out.write(0) // EOL
      y += 1
    }
    out.write(0); out.write(1) // EOB
    out.toByteArray
  }

  /** A complete single-stream BI_RLE8 AVI. `frames`: Some(splitCol) =
    * a full two-tone frame, None = a zero-byte repeat chunk. */
  def avi(w: Int, h: Int, frames: Seq[Option[Int]],
      usPerFrame: Long = 40000L): Array[Byte] = {
    val top = new W
    val inner = new W
    inner.cc("AVI ")
    inner.list("hdrl") { hd =>
      hd.chunk("avih") { a =>
        a.u32(usPerFrame); a.u32(0); a.u32(0); a.u32(0)
        a.u32(frames.length.toLong); a.u32(0); a.u32(1); a.u32(0)
        a.u32(w.toLong); a.u32(h.toLong); (0 until 4).foreach(_ => a.u32(0))
      }
      hd.list("strl") { s =>
        s.chunk("strh") { t =>
          t.cc("vids"); t.cc("mrle")
          (0 until 12).foreach(_ => t.u32(0))
        }
        s.chunk("strf") { f =>
          f.u32(40); f.u32(w.toLong); f.u32(h.toLong); f.u16(1); f.u16(8)
          f.u32(1) // biCompression = BI_RLE8
          f.u32(0); f.u32(0); f.u32(0); f.u32(Palette.length.toLong)
          f.u32(0)
          Palette.foreach { rgb => // BGRX quads
            f.out.write(rgb & 0xff); f.out.write((rgb >> 8) & 0xff)
            f.out.write((rgb >> 16) & 0xff); f.out.write(0)
          }
        }
      }
    }
    inner.list("movi") { mv =>
      frames.foreach {
        case Some(split) => mv.chunk("00dc")(b =>
          b.out.write(frameBody(w, h, split)))
        case None => mv.chunk("00dc")(_ => ())
      }
    }
    val body = inner.out.toByteArray
    top.cc("RIFF"); top.u32(body.length.toLong); top.out.write(body)
    top.out.toByteArray
  }
}

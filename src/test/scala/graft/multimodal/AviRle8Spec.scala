package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AviRle8]] — the real inter-frame codec leg: a hand-built
  * BI_RLE8 AVI (RIFF writer below, every byte per the documented
  * format) decodes to exact pixels, DELTA/skip escapes carry the
  * PREVIOUS frame's content (the inter-frame property itself is
  * asserted), and the decoder drives the same seam call sites as the
  * MJPEG leg (sceneCuts, withVideoMeta) with fail-soft errors. */
class AviRle8Spec extends SparkSpec {

  // ---- minimal RIFF/AVI writer ---------------------------------------
  private class W {
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def chunk(id: String)(f: W => Unit): Unit = {
      val b = new W; f(b); val body = b.out.toByteArray
      cc(id); u32(body.length); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    def list(kind: String)(f: W => Unit): Unit = {
      val b = new W; b.cc(kind); f(b); val body = b.out.toByteArray
      cc("LIST"); u32(body.length); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
  }

  private val Wd = 8; private val Ht = 6
  private val Pal = Seq(0x000000, 0xff0000, 0x00ff00, 0x0000ff) // K R G B

  private def rleAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val w = new W
    val inner = new W
    inner.cc("AVI ")
    inner.list("hdrl") { h =>
      h.chunk("avih") { a =>
        a.u32(40000); a.u32(0); a.u32(0); a.u32(0) // usPerFrame..flags
        a.u32(frames.length); a.u32(0); a.u32(1); a.u32(0)
        a.u32(Wd); a.u32(Ht); (0 until 4).foreach(_ => a.u32(0))
      }
      h.list("strl") { s =>
        s.chunk("strh") { t =>
          t.cc("vids"); t.cc("mrle")
          (0 until 12).foreach(_ => t.u32(0))
        }
        s.chunk("strf") { f =>
          f.u32(40); f.u32(Wd); f.u32(Ht); f.u16(1); f.u16(8)
          f.u32(1) // biCompression = BI_RLE8
          f.u32(0); f.u32(0); f.u32(0); f.u32(Pal.length); f.u32(0)
          Pal.foreach { rgb => // BGRX quads
            f.out.write(rgb & 0xff); f.out.write((rgb >> 8) & 0xff)
            f.out.write((rgb >> 16) & 0xff); f.out.write(0)
          }
        }
      }
    }
    inner.list("movi") { m =>
      frames.foreach(fr => m.chunk("00dc")(b => b.out.write(fr)))
    }
    val body = inner.out.toByteArray
    w.cc("RIFF"); w.u32(body.length); w.out.write(body)
    w.out.toByteArray
  }

  private def bytes(vals: Int*): Array[Byte] = vals.map(_.toByte).toArray

  // frame 1: solid red — per bottom-up row, one full run + EOL; EOB
  private val f1 = bytes((0 until Ht).flatMap(_ =>
    Seq(Wd, 1, 0, 0)) ++ Seq(0, 1): _*)
  // frame 2: only the bottom row's first 2 px turn green; EVERYTHING
  // else must carry over from frame 1 (the inter-frame assertion)
  private val f2 = bytes(2, 2, 0, 1)
  // frame 3: DELTA to (x=2, y=3), absolute run of 3 blue px (+pad)
  private val f3 = bytes(0, 2, 2, 3, 0, 3, 3, 3, 3, 0, 0, 1)

  private lazy val avi = rleAvi(Seq(f1, f2, f3))

  test("format parse: BI_RLE8 stream with the BGRX palette") {
    val f = AviRle8.parseFormat(avi).toOption.get
    assert(f.compression == 1L && f.width == Wd && f.height == Ht)
    assert((0 until 4).map(f.palette) == Pal)
    assert(AviRle8.isRle8(avi))
    assert(!AviRle8.isRle8("RIFFxxxxWAVE".getBytes("US-ASCII")))
  }

  test("sequential decode: exact pixels per frame, and DELTA/skip " +
      "regions CARRY THE PREVIOUS FRAME (the inter-frame property)") {
    val fs = AviRle8.decodeFrames(avi).toSeq
    assert(fs.length == 3 && fs.forall(_.isRight), fs.toString)
    val Seq(i1, i2, i3) = fs.map(_.toOption.get)
    // frame 1: solid red
    for (y <- 0 until Ht; x <- 0 until Wd)
      assert((i1.getRGB(x, y) & 0xffffff) == 0xff0000, s"f1($x,$y)")
    // frame 2: bottom row x0,x1 green (bottom-up row 0 = image row
    // Ht-1); every other pixel red — carried, not re-encoded
    assert((i2.getRGB(0, Ht - 1) & 0xffffff) == 0x00ff00)
    assert((i2.getRGB(1, Ht - 1) & 0xffffff) == 0x00ff00)
    assert((i2.getRGB(2, Ht - 1) & 0xffffff) == 0xff0000)
    assert((i2.getRGB(0, 0) & 0xffffff) == 0xff0000)
    // frame 3: bottom-up row 3 (image row Ht-1-3 = 2), x 2..4 blue;
    // frame 2's green corner still carried
    for (x <- 2 to 4)
      assert((i3.getRGB(x, Ht - 1 - 3) & 0xffffff) == 0x0000ff, s"x=$x")
    assert((i3.getRGB(0, Ht - 1) & 0xffffff) == 0x00ff00)
    assert((i3.getRGB(5, Ht - 1 - 3) & 0xffffff) == 0xff0000)
  }

  test("a zero-byte ##dc chunk is 'repeat previous frame': the slice " +
      "is KEPT, the carried canvas is emitted, frame numbering stays " +
      "aligned with the header count") {
    val withRepeat = rleAvi(Seq(f1, Array.emptyByteArray, f2))
    assert(RleAviFrameDecoder.frameSlices(withRepeat).length == 3)
    assert(RleAviFrameDecoder.probe(withRepeat).toOption.get.nFrames == 3)
    val fs = AviRle8.decodeFrames(withRepeat).toSeq
    assert(fs.length == 3 && fs.forall(_.isRight), fs.toString)
    val Seq(i1, i2, i3) = fs.map(_.toOption.get)
    // repeat frame is pixel-identical to frame 1 (solid red)
    for (y <- 0 until Ht; x <- 0 until Wd)
      assert((i2.getRGB(x, y) & 0xffffff) == (i1.getRGB(x, y) & 0xffffff))
    // ...and f2's green corner lands on frame index 2, not 1
    assert((i3.getRGB(0, Ht - 1) & 0xffffff) == 0x00ff00)
    // sceneCuts over the repeat frame: hamming 0, never a cut
    import spark.implicits._
    val cuts = Multimodal.sceneCuts(
      Seq((1L, withRepeat)).toDF("id", "v"), "v", cutHamming = 1,
      decoder = RleAviFrameDecoder)
      .select("frame_no", "hamming", "is_cut").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(cuts.length == 3 && cuts(1) == ((1, 0)))
    // the MJPEG (intra-frame) leg still DROPS empty chunks
    assert(AviMjpeg.frameSlices(withRepeat).length == 2)
  }

  test("sampleVideoFrames never ships a repeat chunk as a standalone " +
      "frame: zero-length picks are error-flagged, not empty bytes " +
      "with plausible dims") {
    import spark.implicits._
    val withRepeat = rleAvi(Seq(f1, Array.emptyByteArray, f2))
    val out = Multimodal.sampleVideoFrames(
      Seq((1L, withRepeat)).toDF("id", "v"), "v", 3,
      decoder = RleAviFrameDecoder)
      .select("src_frame", "frame_bytes", "frame_width", "frame_error")
      .orderBy("src_frame").collect()
    assert(out.length == 3)
    // frames 0 and 2 are real standalone chunks
    assert(out(0).isNullAt(3) && !out(0).isNullAt(1) && !out(0).isNullAt(2))
    assert(out(2).isNullAt(3) && !out(2).isNullAt(1))
    // frame 1 is the inter-frame repeat: error row, NO bytes, NO dims
    assert(!out(1).isNullAt(3) &&
      out(1).getString(3).contains("repeat"), out(1).toString)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("sceneCuts classifies container-level failure as a null-frame_no " +
      "row even when decodeFrames surfaces it as a single Left") {
    import spark.implicits._
    val out = Multimodal.sceneCuts(
      Seq((1L, Array[Byte](9, 9, 9))).toDF("id", "v"), "v",
      decoder = RleAviFrameDecoder)
      .select("frame_no", "cut_error").collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(0), "container error must keep frame_no null")
    assert(out(0).getString(1) != null)
    // ...while a PARSEABLE container with a malformed frame keeps
    // per-frame semantics: frame_no set, error in cut_error
    val bad = rleAvi(Seq(f1, bytes(0, 2, 2), f2))
    val pf = Multimodal.sceneCuts(
      Seq((1L, bad)).toDF("id", "v"), "v", decoder = RleAviFrameDecoder)
      .select("frame_no", "cut_error").collect()
    assert(pf.length == 3 && pf.forall(!_.isNullAt(0)))
    assert(pf.count(!_.isNullAt(1)) == 1)
  }

  test("fail-soft: truncated frames error per-frame, garbage bytes " +
      "error once, and decode continues on the carried canvas") {
    val bad = rleAvi(Seq(f1, bytes(0, 2, 2), f2)) // truncated DELTA
    val fs = AviRle8.decodeFrames(bad).toSeq
    assert(fs(0).isRight && fs(1).isLeft && fs(2).isRight)
    assert(fs(1).swap.toOption.get.contains("truncated DELTA"))
    assert(AviRle8.decodeFrames(bytes(1, 2, 3)).toSeq.head.isLeft)
  }

  test("seam integration: RleAviFrameDecoder drives withVideoMeta and " +
      "sceneCuts; the MJPEG decoder rejects the RLE stream cleanly") {
    import spark.implicits._
    val df = Seq((1L, avi), (2L, Array[Byte](9, 9, 9))).toDF("id", "v")
    val meta = Multimodal.withVideoMeta(df, "v",
      decoder = RleAviFrameDecoder).select("id", "video_meta.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getString(1) == "avi/rle8")
    assert(meta(1L).getInt(2) == Wd && meta(1L).getInt(3) == Ht)
    assert(meta(1L).getInt(4) == 3)
    assert(meta(2L).getString(6) != null) // fail row
    val cuts = Multimodal.sceneCuts(df.filter($"id" === 1L), "v",
      cutHamming = 1, decoder = RleAviFrameDecoder)
      .select("frame_no", "hamming", "is_cut", "cut_error").collect()
    assert(cuts.length == 3 && cuts.forall(_.isNullAt(3)))
    assert(cuts(0).isNullAt(1) && !cuts(0).getBoolean(2))
    // MJPEG decoder must not claim the RLE stream's frames
    assert(MjpegAviFrameDecoder.decodeFrames(avi).forall(_.isLeft))
  }
}

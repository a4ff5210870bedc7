package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Gif]] / [[GifWrite]] — the second real inter-frame codec leg:
  * LZW round-trips (incl. width escalation and the 4096 dictionary
  * reset), CROSS-VALIDATION against javax.imageio's independent GIF
  * codec in both directions, partial-frame + transparency + disposal
  * composition semantics, interlaced row order, fail-soft truncation,
  * and the [[GifFrameDecoder]] seam (probe + sceneCuts). */
class GifSpec extends SparkSpec {

  private def rgb(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, out, 0, w)
    out.map(_ & 0xffffff)
  }

  private def frames(bytes: Array[Byte]): Seq[Either[String, BufferedImage]] =
    Gif.decodeFrames(bytes).toSeq

  private def fullPattern(w: Int, h: Int, split: Int): Array[Int] =
    Array.tabulate(w * h)(i =>
      if (i % w < split) GifWrite.Palette(1) else GifWrite.Palette(2))

  // deterministic high-entropy indices (md5-fed), enough to escalate
  // the code width and overflow the 4096-entry dictionary
  private def noisy(n: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](n)
    var i = 0
    var seed = Array[Byte](42)
    while (i < n) {
      seed = md.digest(seed)
      var j = 0
      while (j < seed.length && i < n) {
        out(i) = ((seed(j) & 0xff) % 4).toByte
        i += 1; j += 1
      }
    }
    out
  }

  test("LZW round-trip: uniform, two-tone, and dictionary-overflow inputs") {
    for (px <- Seq(
        Array.fill[Byte](977)(1),
        Array.tabulate[Byte](1024)(i => if (i % 64 < 20) 1 else 2),
        noisy(60000))) {
      val enc = GifWrite.lzwEncode(px, 2)
      val dec = Gif.lzwDecode(enc, 2, px.length)
      assert(dec.isRight, dec)
      assert(dec.toOption.get.toSeq == px.toSeq)
    }
    // the 60k noisy input must actually have exercised the reset path:
    // 4 symbols × growing phrases fill 4096 entries well before 60k
    // pixels (if this stops holding, grow the input, don't drop the
    // assertion — the reset path is the point)
    val enc = GifWrite.lzwEncode(noisy(60000), 2)
    assert(enc.length > 4096, "dictionary can't have filled")
  }

  test("writer output decodes identically under javax.imageio (independent codec)") {
    val (w, h) = (40, 30)
    val bytes = GifWrite.gif(w, h, Seq(GifWrite.Full(13)))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "imageio could not decode our GIF")
    assert(rgb(img).toSeq == fullPattern(w, h, 13).toSeq)
  }

  test("imageio-written GIF decodes identically under our decoder") {
    val (w, h) = (33, 21)
    val src = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, GifWrite.Palette((x + 2 * y) % 3))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", out))
    val fs = frames(out.toByteArray)
    assert(fs.size == 1 && fs.head.isRight, fs)
    assert(rgb(fs.head.toOption.get).toSeq == rgb(src).toSeq)
  }

  test("composition: Carry repaints the carried canvas bit-for-bit; a new Full switches it") {
    val (w, h) = (64, 48)
    val bytes = GifWrite.gif(w, h, Seq(
      GifWrite.Full(16), GifWrite.Carry(16), GifWrite.Full(48),
      GifWrite.Carry(48)))
    val fs = frames(bytes)
    assert(fs.size == 4 && fs.forall(_.isRight), fs.filter(_.isLeft))
    val px = fs.map(f => rgb(f.toOption.get).toSeq)
    assert(px(0) == fullPattern(w, h, 16).toSeq)
    assert(px(1) == px(0), "Carry changed pixels")
    assert(px(2) == fullPattern(w, h, 48).toSeq)
    assert(px(3) == px(2), "Carry changed pixels after the switch")
  }

  test("disposal 2 restores the frame rect to background; disposal 3 restores the prior canvas") {
    val (w, h) = (16, 12)
    val white = GifWrite.Custom(4, 3, 8, 6, disposal = 2,
      transparent = false, interlaced = false, px = (_, _) => 2)
    val probe = GifWrite.Custom(0, 0, w, h, disposal = 1,
      transparent = true, interlaced = false,
      px = (_, _) => GifWrite.TransIdx) // all-transparent: shows canvas
    val d2 = frames(GifWrite.gif(w, h,
      Seq(GifWrite.Full(16), white, probe)))
    assert(d2.forall(_.isRight), d2.filter(_.isLeft))
    val after2 = rgb(d2(2).toOption.get)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = if (x >= 4 && x < 12 && y >= 3 && y < 9)
        GifWrite.Palette(0) // background-restored rect
      else GifWrite.Palette(1) // Full(16) on a 16-wide canvas: all 1
      assert(after2(y * w + x) == expect, s"($x,$y)")
    }
    val white3 = white.copy(disposal = 3)
    val d3 = frames(GifWrite.gif(w, h,
      Seq(GifWrite.Full(16), white3, probe)))
    assert(d3.forall(_.isRight), d3.filter(_.isLeft))
    // the white overlay itself was visible in ITS frame...
    assert(rgb(d3(1).toOption.get)(5 * w + 8) == GifWrite.Palette(2))
    // ...but disposal 3 rewinds it for the next
    assert(rgb(d3(2).toOption.get).toSeq ==
      rgb(d3(0).toOption.get).toSeq)
  }

  test("interlaced frames decode to the same pixels as sequential ones") {
    val (w, h) = (24, 17) // odd height: pass boundaries off the easy case
    val pat = (x: Int, y: Int) => (x + 2 * y) % 3
    val il = GifWrite.Custom(0, 0, w, h, 1, transparent = false,
      interlaced = true, px = pat)
    val seqF = GifWrite.Custom(0, 0, w, h, 1, transparent = false,
      interlaced = false, px = pat)
    val a = frames(GifWrite.gif(w, h, Seq(il)))
    val b = frames(GifWrite.gif(w, h, Seq(seqF)))
    assert(a.head.isRight && b.head.isRight, (a, b))
    assert(rgb(a.head.toOption.get).toSeq == rgb(b.head.toOption.get).toSeq)
  }

  test("fail-soft: truncation errors cleanly; mid-frame corruption stays per-frame") {
    val bytes = GifWrite.gif(20, 14,
      Seq(GifWrite.Full(5), GifWrite.Full(15)))
    // truncate inside the first frame's LZW data
    val cut = bytes.take(bytes.length / 2)
    val fs = frames(cut)
    assert(fs.nonEmpty && fs.forall(_.isLeft),
      "truncated stream produced frames: " + fs)
    // garbage container
    assert(frames("not a gif at all".getBytes).head.isLeft)
    assert(Gif.parseScreen(Array[Byte]()).isLeft)
    // corrupt frame 1's LZW payload IN PLACE (sub-block structure
    // intact): frame 1 fails per-frame, frame 2 still decodes
    val bad = bytes.clone()
    val desc = bad.indexWhere(_ == 0x2c.toByte)
    assert(desc > 0)
    val firstData = desc + 10 + 1 + 1 // descriptor, min-code, len byte
    bad(firstData) = 0xff.toByte
    bad(firstData + 1) = 0xff.toByte
    val fs2 = frames(bad)
    assert(fs2.size == 2, fs2)
    assert(fs2(0).isLeft, "corrupt frame decoded: " + fs2(0))
    assert(fs2(1).isRight, fs2(1))
    assert(rgb(fs2(1).toOption.get).toSeq ==
      fullPattern(20, 14, 15).toSeq)
  }

  test("GifFrameDecoder: probe metadata and sceneCuts over real GIF bytes") {
    import spark.implicits._
    val clip = GifWrite.gif(64, 48, Seq(
      GifWrite.Full(16), GifWrite.Carry(16), GifWrite.Full(48),
      GifWrite.Full(48), GifWrite.Carry(48)), delayCs = 7)
    val info = GifFrameDecoder.probe(clip)
    assert(info == Right(FrameDecoder.VideoInfo(64, 48, 5, 70000L)), info)
    assert(GifFrameDecoder.frameSlices(clip).size == 5)
    val cuts = Multimodal.sceneCuts(
        Seq((1L, clip)).toDF("id", "v"), "v", cutHamming = 4,
        decoder = GifFrameDecoder)
      .select("frame_no", "is_cut", "cut_error").orderBy("frame_no")
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getString(2)))
    assert(cuts.toSeq == Seq(
      (0, false, null), // first frame is never a cut
      (1, false, null), // carry: hamming exactly 0
      (2, true, null),  // pattern switch
      (3, false, null), // same pattern repainted: hamming 0
      (4, false, null)), cuts.toSeq)
  }
}

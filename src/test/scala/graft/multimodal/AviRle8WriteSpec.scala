package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[AviRle8Write]] — the RLE8 writer feeding the oracled video query:
  * written clips must decode through the REAL reader ([[AviRle8]] /
  * [[RleAviFrameDecoder]]) to exactly the two-tone patterns and
  * carried-canvas repeats the oracle's closed-form schedule assumes. */
class AviRle8WriteSpec extends AnyFunSuite {

  private val W = 64
  private val H = 48

  test("written frames decode to the exact two-tone split; a zero-byte " +
      "repeat chunk reproduces the carried canvas pixel-for-pixel") {
    val bytes = AviRle8Write.avi(W, H, Seq(Some(16), None, Some(48)))
    assert(AviRle8.isRle8(bytes))
    assert(RleAviFrameDecoder.probe(bytes).toOption.get.nFrames == 3)
    val fs = AviRle8.decodeFrames(bytes).toSeq
    assert(fs.length == 3 && fs.forall(_.isRight), fs.toString)
    val Seq(a, rep, b) = fs.map(_.toOption.get)
    val left  = AviRle8Write.Palette(1)
    val right = AviRle8Write.Palette(2)
    for (y <- Seq(0, H / 2, H - 1); x <- 0 until W) {
      assert((a.getRGB(x, y) & 0xffffff) ==
        (if (x < 16) left else right), s"A($x,$y)")
      assert((rep.getRGB(x, y) & 0xffffff) ==
        (a.getRGB(x, y) & 0xffffff), s"rep($x,$y)")
      assert((b.getRGB(x, y) & 0xffffff) ==
        (if (x < 48) left else right), s"B($x,$y)")
    }
  }

  test("the two patterns are far apart under dHash and a repeat is at " +
      "distance zero — the margins the q356 oracle's schedule needs") {
    val bytes = AviRle8Write.avi(W, H,
      Seq(Some(16), Some(16), None, Some(48)))
    val hs = AviRle8.decodeFrames(bytes).toSeq.map(f =>
      Multimodal.dHashOf(f.toOption.get))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) == 0) // re-encoded same pattern
    assert(ham(hs(1), hs(2)) == 0) // zero-byte repeat
    assert(ham(hs(2), hs(3)) >= 4, // the cut threshold, with margin
      s"switch hamming ${ham(hs(2), hs(3))}")
  }
}

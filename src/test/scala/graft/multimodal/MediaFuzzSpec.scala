package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input hardening for the hand-rolled byte parsers added
  * this round: ARBITRARY bytes (including RIFF-prefixed garbage and
  * truncations of a VALID RLE8 file at every length) must fail soft —
  * a Left/empty result, never an exception. The ingest surfaces feed
  * these parsers raw user uploads, so "never throws" is part of the
  * fail-row contract. */
class MediaFuzzSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(7331L + i)))


  private val junk: Gen[Array[Byte]] =
    Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  private val riffJunk: Gen[Array[Byte]] =
    junk.map(b => "RIFF".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 127) ++ "AVI ".getBytes("US-ASCII") ++ b)

  test("AviRle8 parse + decode never throw on arbitrary bytes") {
    samples(Gen.oneOf(junk, riffJunk), 200).foreach { b =>
      AviRle8.parseFormat(b)
      AviRle8.isRle8(b)
      AviRle8.decodeFrames(b).foreach(_ => ())
      AviMjpeg.parseInfo(b)
      AviMjpeg.frameSlices(b)
    }
  }

  test("every truncation of a valid RLE8 AVI fails soft") {
    // a minimal valid file: header + 1 keyframe
    val full = {
      val bos = new java.io.ByteArrayOutputStream()
      def u32(v: Long): Unit = {
        bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
        bos.write(((v >> 16) & 0xff).toInt)
        bos.write(((v >> 24) & 0xff).toInt)
      }
      def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
      // hand-assembled: RIFF(AVI  LIST(hdrl avih LIST(strl strh strf))
      //                        LIST(movi 00dc))
      val strf = {
        val b = new java.io.ByteArrayOutputStream()
        def fu32(v: Long): Unit = {
          b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
          b.write(((v >> 16) & 0xff).toInt)
          b.write(((v >> 24) & 0xff).toInt)
        }
        fu32(40); fu32(4); fu32(2); b.write(1); b.write(0)
        b.write(8); b.write(0); fu32(1); fu32(0); fu32(0); fu32(0)
        fu32(2); fu32(0)
        b.write(Array[Byte](0, 0, 0, 0, 0, 0, -1, 0)) // 2 BGRX quads
        b.toByteArray
      }
      val strh = "vids".getBytes("US-ASCII") ++
        "mrle".getBytes("US-ASCII") ++ new Array[Byte](48)
      val avih = new Array[Byte](56)
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val h = new java.io.ByteArrayOutputStream()
        h.write(id.getBytes("US-ASCII"))
        var v = body.length.toLong
        (0 until 4).foreach { i => h.write(((v >> (8 * i)) & 0xff).toInt) }
        h.write(body)
        if ((body.length & 1) == 1) h.write(0)
        h.toByteArray
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", kind.getBytes("US-ASCII") ++ body)
      val frame = Array[Byte](4, 1, 0, 0, 4, 1, 0, 1)
      val inner = "AVI ".getBytes("US-ASCII") ++
        list("hdrl", chunk("avih", avih) ++
          list("strl", chunk("strh", strh) ++ chunk("strf", strf))) ++
        list("movi", chunk("00dc", frame))
      cc("RIFF"); u32(inner.length); bos.write(inner)
      bos.toByteArray
    }
    // the complete file decodes
    assert(AviRle8.decodeFrames(full).toSeq.exists(_.isRight))
    // every prefix fails soft
    (0 until full.length).foreach { n =>
      val t = java.util.Arrays.copyOf(full, n)
      AviRle8.parseFormat(t)
      AviRle8.decodeFrames(t).foreach(_ => ())
    }
  }

  test("GlyphSegmenter + OCR engines never throw on arbitrary bytes") {
    samples(junk, 150).foreach { b =>
      graft.ingest.GlyphSegmenter.segment(b, 12, 12, 5, 7)
      graft.ingest.NeuralOcrEngine.recognize(b)
      graft.ingest.TemplateOcrEngine.recognize(b)
    }
  }

  test("Onnx.load / ColbertEncoder never throw uncontrolled on junk " +
      "model bytes (loud IllegalState/Unsupported is fine)") {
    samples(junk, 200).foreach { b =>
      try graft.embed.Onnx.load(b)
      catch {
        case _: IllegalStateException | _: IllegalArgumentException |
            _: UnsupportedOperationException |
            _: ArrayIndexOutOfBoundsException |
            _: IndexOutOfBoundsException | _: NegativeArraySizeException =>
        // controlled/loud failure classes for malformed protobuf
      }
    }
  }
}

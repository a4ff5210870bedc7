package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image/png", "fake png bytes here".getBytes("UTF-8")),
    (2L, "video/mp4", ("x" * 1000).getBytes("UTF-8")),
    (3L, "image/png", Array.empty[Byte])
  ).toDF("media_id", "mime", "media")

  test("withDecodedMeta: typed meta struct, fail-soft on empty media") {
    val d = Multimodal.withDecodedMeta(media, "media", "mime")
    assert(d.schema("meta").dataType.typeName === "struct")
    val rows = d.orderBy("media_id").collect()
    assert(rows(0).getStruct(3).getAs[String]("mime") === "image/png")
    assert(rows(0).getStruct(3).getAs[Int]("width") > 0)
    assert(rows(2).getStruct(3).getAs[String]("decode_error") === "empty media")
    // deterministic
    val again = Multimodal.withDecodedMeta(media, "media", "mime")
      .orderBy("media_id").collect()
    assert(again(0).getStruct(3) === rows(0).getStruct(3))
  }

  // ---- real image codec (pure JDK javax.imageio) ----------------------

  /** A real encoded image: solid color with one distinct corner pixel. */
  private def png(w: Int, h: Int, rgb: Int, format: String = "png")
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    img.setRGB(0, 0, 0xffffff ^ rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  private lazy val images = Seq(
    (1L, png(40, 20, 0x336699)),
    (2L, png(8, 8, 0x000000, format = "jpg")),
    (3L, "not an image at all".getBytes("UTF-8")),
    (4L, Array.empty[Byte])
  ).toDF("media_id", "media")

  test("withImageMeta: REAL decode — true formats and dimensions, fail-soft") {
    val rows = Multimodal.withImageMeta(images, "media")
      .orderBy("media_id").collect()
    val m1 = rows(0).getStruct(2)
    assert((m1.getAs[String]("format"), m1.getAs[Int]("width"),
      m1.getAs[Int]("height")) === (("png", 40, 20)))
    assert(rows(1).getStruct(2).getAs[String]("format")
      .matches("jpe?g"))
    assert(rows(2).getStruct(2).getAs[String]("decode_error") != null)
    assert(rows(3).getStruct(2).getAs[String]("decode_error") === "empty media")
  }

  test("withImageResized: REAL resample — aspect-preserving fit, decodable output") {
    val rows = Multimodal.withImageResized(images, "media", 16, 16)
      .orderBy("media_id").collect()
    // 40x20 fits 16x16 at scale 0.4 → 16x8
    assert(rows(0).getStruct(3) === org.apache.spark.sql.Row(16, 8))
    val outBytes = rows(0).getAs[Array[Byte]](2)
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(outBytes))
    assert((round.getWidth, round.getHeight) === ((16, 8)))
    // small images never upscale
    assert(rows(1).getStruct(3) === org.apache.spark.sql.Row(8, 8))
    // undecodable/empty fail soft
    assert(rows(2).getAs[Array[Byte]](2).isEmpty)
    assert(rows(3).getStruct(3) === org.apache.spark.sql.Row(null, null))
  }

  test("withImageFeatures: REAL luminance histogram — unit norm, mass where expected") {
    val rows = Multimodal.withImageFeatures(images, "media", bins = 16)
      .orderBy("media_id").collect()
    val f1 = rows(0).getSeq[Float](2)
    val norm = math.sqrt(f1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // solid 0x336699: luma = (299*0x33 + 587*0x66 + 114*0x99)/1000 = 92
    // → bin 92*16/256 = 5 holds nearly all mass (one corner pixel apart)
    assert(f1(5) > 0.99f, f1.toString)
    assert(rows(0).getString(3) != null) // integer-count signature present
    // undecodable → zero vector, null signature
    assert(rows(2).getSeq[Float](2).forall(_ === 0f))
    assert(rows(2).getString(3) == null)
  }

  test("sampleFrames: n rows per media row, non-empty frame bytes") {
    val f = Multimodal.sampleFrames(media.filter(col("media_id") === 2L),
      "media", 4)
    val rows = f.collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Int]("frame_no")).sorted === Array(0, 1, 2, 3))
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").length === 250))
  }

  test("withResizedMedia: deterministic, never grows, capped dims, empty-safe") {
    val r1 = Multimodal.withResizedMedia(media, "media", 64, 64)
      .orderBy("media_id").collect()
    val r2 = Multimodal.withResizedMedia(media, "media", 64, 64)
      .orderBy("media_id").collect()
    r1.zip(r2).foreach { case (a, b) =>
      assert(a.getAs[Array[Byte]]("media_resized").toSeq ===
        b.getAs[Array[Byte]]("media_resized").toSeq)
    }
    r1.take(2).foreach { r =>
      val orig    = r.getAs[Array[Byte]]("media")
      val resized = r.getAs[Array[Byte]]("media_resized")
      assert(resized.length <= orig.length && resized.nonEmpty)
      val dims = r.getAs[org.apache.spark.sql.Row]("media_resized_dims")
      assert(dims.getInt(0) <= 64 && dims.getInt(1) <= 64)
    }
    // empty media → empty output, null geometry
    val empty = r1(2)
    assert(empty.getAs[Array[Byte]]("media_resized").isEmpty)
    assert(empty.getAs[org.apache.spark.sql.Row]("media_resized_dims")
      .isNullAt(0))
  }

  test("withFrameSamples: spans tile the stream; digests match direct md5") {
    val f = Multimodal.withFrameSamples(media, "media", n = 4)
      .orderBy("media_id").collect()
    val frames1 = f(0).getSeq[org.apache.spark.sql.Row](3)
    assert(frames1.length === 4)
    // spans are contiguous and cover every byte exactly once
    val total = "fake png bytes here".getBytes("UTF-8").length.toLong
    assert(frames1.map(_.getAs[Long]("frame_len")).sum === total)
    assert(frames1.head.getAs[Long]("frame_off") === 0L)
    // digest of the first span equals a directly computed md5
    val bytes = "fake png bytes here".getBytes("UTF-8")
    val l0 = frames1.head.getAs[Long]("frame_len").toInt
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(bytes, 0, l0))
      .map(b => f"$b%02x").mkString
    assert(frames1.head.getAs[String]("frame_md5") === expect)
    // empty media → no frames
    assert(f(2).getSeq[org.apache.spark.sql.Row](3).isEmpty)
  }

  test("withMediaFeatures: unit-norm fixed-dim vector; zero for empty") {
    val f = Multimodal.withMediaFeatures(media, "media", dim = 32)
      .orderBy("media_id").collect()
    val v1 = f(0).getSeq[Float](3)
    assert(v1.length === 32)
    assert(math.abs(math.sqrt(v1.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    assert(f(2).getSeq[Float](3).forall(_ == 0f))
  }

  // ---- perceptual hash (real pixels) ----------------------------------

  /** Gradient image (luma rises left→right) with an optional corner
    * blemish — dHash of the clean and blemished variants differ in only
    * a few gradient bits, while an inverted gradient flips ~all bits. */
  private def gradientPng(w: Int, h: Int, invert: Boolean = false,
      blemish: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = if (invert) 255 - x * 255 / w else x * 255 / w
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    if (blemish)
      (0 until h / 8).foreach(y => (0 until w / 8).foreach(x =>
        img.setRGB(x, y, 0xffffff)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("withImageDHash: deterministic, re-encode-stable, gradient-sensitive") {
    val d = Seq(
      (1L, gradientPng(64, 64)),
      (2L, gradientPng(96, 96)),             // same content, other size
      (3L, gradientPng(64, 64, blemish = true)),
      (4L, gradientPng(64, 64, invert = true)),
      (5L, "not an image".getBytes("UTF-8"))
    ).toDF("img_id", "media")
    val hs = Multimodal.withImageDHash(d, "media")
      .orderBy("img_id").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same gradient at two sizes → identical area-mean grid → same hash
    assert(hs(0).get === hs(1).get)
    // small blemish → few bits flip
    assert(ham(hs(0).get, hs(2).get) > 0 && ham(hs(0).get, hs(2).get) <= 10)
    // inverted gradient → nearly all gradient bits flip
    assert(ham(hs(0).get, hs(3).get) > 32)
    assert(hs(4).isEmpty) // fail-soft
  }

  test("imageDHashPairs: finds the near-dup pair, skips the inverse") {
    val d = Multimodal.withImageDHash(Seq(
      (1L, gradientPng(64, 64)),
      (2L, gradientPng(64, 64, blemish = true)),
      (3L, gradientPng(64, 64, invert = true)),
      (4L, Array.empty[Byte])
    ).toDF("img_id", "media"), "media")
    val pairs = Multimodal.imageDHashPairs(d, "img_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  // ---- real audio codec (pure JDK javax.sound.sampled) ----------------

  /** A real encoded WAV: 16-bit signed PCM, sample-by-sample from `gen`
    * (values in [-1, 1]), `channels`-way duplicated. */
  private def wav(sampleRate: Float, nFrames: Int, channels: Int = 1)
      (gen: Int => Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate,
      16, channels, 2 * channels, sampleRate, false)
    val raw = new Array[Byte](nFrames * 2 * channels)
    (0 until nFrames).foreach { i =>
      val s = math.max(-32768, math.min(32767,
        math.round(gen(i) * 32767).toInt)).toShort
      (0 until channels).foreach { c =>
        val o = (i * channels + c) * 2
        raw(o) = (s & 0xff).toByte
        raw(o + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, nFrames)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  // 440 Hz sine, half a second at 8 kHz
  private def sine(i: Int): Double =
    0.8 * math.sin(2 * math.Pi * 440 * i / 8000.0)

  private lazy val audio = Seq(
    (1L, wav(8000f, 4000)(sine)),                       // pure tone
    (2L, wav(8000f, 4000)(i => if (i < 2000) sine(i) else 0.0)), // half dead air
    (3L, wav(16000f, 1600, channels = 2)(_ => 0.25)),   // stereo DC
    (4L, "not audio".getBytes("UTF-8")),
    (5L, Array.empty[Byte])
  ).toDF("media_id", "media")

  test("withAudioMeta: REAL header parse — rate/channels/frames/duration") {
    val rows = Multimodal.withAudioMeta(audio, "media")
      .orderBy("media_id").collect()
    val m1 = rows(0).getStruct(2)
    assert(m1.getAs[String]("encoding") === "PCM_SIGNED")
    assert(m1.getAs[Float]("sample_rate") === 8000f)
    assert(m1.getAs[Int]("channels") === 1)
    assert(m1.getAs[Int]("bits") === 16)
    assert(m1.getAs[Long]("n_frames") === 4000L)
    assert(m1.getAs[Long]("duration_ms") === 500L)
    val m3 = rows(2).getStruct(2)
    assert(m3.getAs[Int]("channels") === 2)
    assert(m3.getAs[Float]("sample_rate") === 16000f)
    assert(rows(3).getStruct(2).getAs[String]("decode_error") != null)
    assert(rows(4).getStruct(2).getAs[String]("decode_error") === "empty media")
  }

  test("withAudioFeatures: RMS/peak/ZCR/silence over real PCM samples") {
    val rows = Multimodal.withAudioFeatures(audio, "media")
      .orderBy("media_id").collect()
    val f1 = rows(0).getStruct(2)
    assert(f1.getAs[Long]("n_samples") === 4000L)
    // full-scale*0.8 sine: rms = 0.8/sqrt(2), peak ~ 0.8
    assert(math.abs(f1.getAs[Double]("rms") - 0.8 / math.sqrt(2)) < 0.01)
    assert(math.abs(f1.getAs[Double]("peak") - 0.8) < 0.01)
    // 440 Hz at 8 kHz crosses zero 2*440 times/sec → zcr ~ 0.11
    assert(math.abs(f1.getAs[Double]("zcr") - 2 * 440 / 8000.0) < 0.01)
    assert(f1.getAs[Double]("silence_ratio") === 0.0)
    // half the windows are dead air (25 windows of 160 samples; the one
    // straddling the tone/silence boundary can land either side → ±1 win)
    val f2 = rows(1).getStruct(2)
    assert(math.abs(f2.getAs[Double]("silence_ratio") - 0.5) <= 0.04 + 1e-9)
    // stereo DC mixes to 0.25 constant: rms = peak = 0.25, zcr = 0
    val f3 = rows(2).getStruct(2)
    assert(math.abs(f3.getAs[Double]("rms") - 0.25) < 0.01)
    assert(f3.getAs[Double]("zcr") === 0.0)
    assert(rows(3).getStruct(2).getAs[String]("decode_error") != null)
    assert(rows(4).getStruct(2).getAs[String]("decode_error") === "empty media")
  }

  // ---------------------------------------------- real MJPEG-AVI video leg

  /** One solid-color JPEG via the JDK encoder. */
  private def jpegBytes(rgb: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Assemble a minimal MJPEG-AVI: RIFF('AVI ' LIST('hdrl' avih)
    * LIST('movi' 00dc…)) — the layout every MJPEG camera writes. */
  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body ++ pad
    }
    val avih = u32(usPerFrame) ++ u32(0) ++ u32(0) ++ u32(0) ++
      u32(frames.size.toLong) ++ u32(0) ++ u32(1) ++ u32(0) ++
      u32(w.toLong) ++ u32(h.toLong) ++ Array.fill(16)(0.toByte)
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ chunk("avih", avih))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII")); out.write(u32(payload.length.toLong))
    out.write(payload)
    out.toByteArray
  }

  test("withVideoMeta: real MJPEG-AVI header parse + demuxed frame count") {
    val avi = mjpegAvi((0 until 6).map(i => jpegBytes(0x102030 * i, 32, 24)),
      32, 24, 40000L) // 25 fps
    val df = Seq((1L, avi), (2L, "not a video".getBytes("UTF-8")),
      (3L, Array.empty[Byte])).toDF("vid", "media")
    val rows = Multimodal.withVideoMeta(df, "media").orderBy("vid").collect()
    val m1 = rows(0).getStruct(2)
    assert(m1.getAs[String]("container") === "avi/mjpeg")
    assert(m1.getAs[Int]("width") === 32 && m1.getAs[Int]("height") === 24)
    assert(m1.getAs[Int]("n_frames") === 6)
    assert(m1.getAs[Long]("duration_ms") === 240L) // 6 * 40ms
    assert(m1.getAs[String]("decode_error") == null)
    assert(rows(1).getStruct(2).getAs[String]("decode_error") != null)
    assert(rows(2).getStruct(2).getAs[String]("decode_error") != null)
  }

  test("FrameDecoder seam: stub and MJPEG decoders drive the SAME call sites and schema") {
    val avi = mjpegAvi((0 until 3).map(i => jpegBytes(0x102030 * i, 16, 8)),
      16, 8, 40000L)
    val payload = Array.tabulate(300)(i => (i % 251).toByte) // "h264" bytes
    val real = Multimodal.withVideoMeta(Seq((1L, avi)).toDF("vid", "media"),
      "media")
    val sdf = Seq((1L, payload)).toDF("vid", "media")
    val stubbed = Multimodal.withVideoMeta(sdf, "media",
      decoder = StubFrameDecoder)
    // decoder choice never changes the caller's schema — the seam contract
    assert(real.schema === stubbed.schema)
    assert(real.head().getStruct(2).getAs[String]("container") === "avi/mjpeg")
    val sm = stubbed.head().getStruct(2)
    assert(sm.getAs[String]("container") === "stub")
    assert(sm.getAs[Int]("n_frames") === 1 + payload.length % 240)
    assert(sm.getAs[String]("decode_error") == null)
    // frame sampling through the same seam: stub slices decode to the
    // probe geometry, real slices to true JPEG pixels — same columns
    val sf = Multimodal.sampleVideoFrames(sdf, "media", 2,
      decoder = StubFrameDecoder).collect()
    assert(sf.length === 2)
    sf.foreach { r =>
      assert(r.getAs[String]("frame_error") == null)
      assert(r.getAs[Int]("frame_width") === sm.getAs[Int]("width"))
      assert(r.getAs[Int]("frame_height") === sm.getAs[Int]("height"))
    }
  }

  test("sampleVideoFrames: evenly spaced TRUE JPEG frames, fail-soft") {
    val frames = (0 until 10).map(i => jpegBytes(0x111111 * (i % 8), 20, 10))
    val avi = mjpegAvi(frames, 20, 10, 33333L)
    val df = Seq((1L, avi), (2L, "junk".getBytes("UTF-8")))
      .toDF("vid", "media")
    val out = Multimodal.sampleVideoFrames(df, "media", 4)
      .orderBy("vid", "frame_no").collect()
    val good = out.filter(_.getLong(0) == 1L)
    assert(good.length === 4)
    // evenly spaced across the 10 source frames: 0, 3, 6, 9
    assert(good.map(_.getAs[Int]("src_frame")).toSeq === Seq(0, 3, 6, 9))
    good.foreach { r =>
      // the emitted bytes ARE the stored JPEG — byte-identical slice —
      // and the decoded dims are the true frame geometry
      val src = r.getAs[Int]("src_frame")
      assert(r.getAs[Array[Byte]]("frame_bytes").toSeq === frames(src).toSeq)
      assert(r.getAs[Int]("frame_width") === 20)
      assert(r.getAs[Int]("frame_height") === 10)
      assert(r.getAs[String]("frame_error") == null)
      // and it round-trips through the real image leg
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame_bytes")))
      assert(img.getWidth === 20 && img.getHeight === 10)
    }
    val bad = out.filter(_.getLong(0) == 2L)
    assert(bad.length === 1 && bad(0).getAs[String]("frame_error") != null)
    // fewer frames than n: all frames come back, none duplicated
    val short = Multimodal.sampleVideoFrames(
      Seq((9L, mjpegAvi(frames.take(2), 20, 10, 40000L))).toDF("vid", "media"),
      "media", 4).collect()
    assert(short.map(_.getAs[Int]("src_frame")).toSeq === Seq(0, 1))
  }

  test("sceneCuts: a hard scene change is a cut, a static run is not") {
    import spark.implicits._
    // dHash is a LUMA-GRADIENT hash — uniform frames all hash to 0, so
    // the shots need structure: dark|bright halves, then the inverse
    def halves(rgbL: Int, rgbR: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(36, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgbL)); g.fillRect(0, 0, 18, 24)
      g.setColor(new java.awt.Color(rgbR)); g.fillRect(18, 0, 18, 24)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq.fill(3)(halves(0x000000, 0xffffff)) ++
      Seq.fill(3)(halves(0xffffff, 0x000000))
    val avi = mjpegAvi(frames, 36, 24, 40000L)
    val out = Multimodal.sceneCuts(
        Seq((1L, avi)).toDF("vid", "media"), "media", cutHamming = 8)
      .orderBy("frame_no").collect()
    assert(out.length == 6)
    assert(out.head.getAs[Any]("hamming") == null, "frame 0 has no prev")
    val cuts = out.filter(r => r.getAs[Boolean]("is_cut"))
    assert(cuts.map(_.getAs[Int]("frame_no")).toSeq == Seq(3),
      s"exactly the shot boundary must cut: ${out.map(_.toSeq).toSeq}")
    // within-shot frames are identical → hamming 0
    assert(out.filter(r => Seq(1, 2, 4, 5).contains(
      r.getAs[Int]("frame_no"))).forall(_.getAs[Int]("hamming") == 0))
  }

  test("sceneCuts fails soft on an unparseable container") {
    import spark.implicits._
    val out = Multimodal.sceneCuts(
      Seq((1L, "junk".getBytes("UTF-8"))).toDF("vid", "media"),
      "media").collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("cut_error") != null)
  }
}

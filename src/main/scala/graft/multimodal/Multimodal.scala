package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * IMAGES are decoded for real — `javax.imageio` ships in the JDK
  * (PNG/JPEG/BMP/GIF/WBMP), so [[withImageMeta]], [[withImageResized]]
  * and [[withImageFeatures]] run true decode / resample / pixel-feature
  * stages with no external dependency. AUDIO is likewise real —
  * `javax.sound.sampled` ships in the JDK (WAV/AIFF/AU, PCM + u-law/
  * a-law), so [[withAudioMeta]] and [[withAudioFeatures]] parse true
  * headers and compute time-domain features over actual PCM samples.
  * VIDEO is real for MJPEG-in-AVI — a RIFF demux is pure byte algebra
  * and every demuxed frame is a JPEG the JDK decodes ([[AviMjpeg]]) —
  * so [[withVideoMeta]] and [[sampleVideoFrames]] run true container
  * parse / frame decode. Inter-frame codecs (H.264 …) are NOT in the
  * JDK, so the GENERIC media `decode*` stages remain clearly-marked
  * deterministic STUBS that a production deployment replaces with a
  * real library call inside the same `mapPartitions` slot. In all
  * cases the Spark-side design is real
  * and tested: schema, batch shape (per-partition iterator — decoder
  * state initialized once per partition, rows streamed through),
  * fail-soft error rows, and bounded memory (never materialize a
  * partition's media in a list).
  */
object Multimodal {

  // ------------------------------------------------------ real image leg

  /** Image metadata struct for [[withImageMeta]]. */
  val ImageMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("decode_error", StringType)))

  /** Sniff + decode one image; fail-soft. Runs executor-side. */
  private def decodeImage(bytes: Array[Byte])
      : Either[String, (String, java.awt.image.BufferedImage)] =
    if (bytes == null || bytes.isEmpty) Left("empty media")
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Left("no decoder for content")
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Right((r.getFormatName.toLowerCase, r.read(0)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }

  /** REAL image decode: appends a `(format, width, height, decode_error)`
    * struct from the actual bytes. */
  def withImageMeta(df: DataFrame, binCol: String,
      outCol: String = "image_meta"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ImageMetaSchema))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp files on executors
      rows.map { r =>
        val meta = decodeImage(r.getAs[Array[Byte]](binIdx)) match {
          case Right((fmt, img)) => Row(fmt, img.getWidth, img.getHeight, null)
          case Left(err)         => Row(null, null, null, err)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL resample: decode, aspect-preserving fit into `maxW x maxH`
    * (never upscales), bilinear redraw, PNG re-encode. Emits
    * `<binCol>_resized` + post-resize dims; undecodable media fail soft
    * to empty bytes + null dims. */
  def withImageResized(df: DataFrame, binCol: String, maxW: Int,
      maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, "target dims must be positive")
    val outCol = binCol + "_resized"
    val schema = df.schema
      .add(StructField(outCol, BinaryType))
      .add(StructField(outCol + "_dims", StructType(Seq(
        StructField("width", IntegerType), StructField("height", IntegerType)))))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        decodeImage(r.getAs[Array[Byte]](binIdx)) match {
          case Right((_, img)) =>
            val scale = math.min(1.0, math.min(
              maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
            val w = math.max(1, math.round(img.getWidth * scale).toInt)
            val h = math.max(1, math.round(img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null); ()
            } finally g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", baos)
            Row.fromSeq(r.toSeq :+ baos.toByteArray :+ Row(w, h))
          case Left(_) =>
            Row.fromSeq(r.toSeq :+ Array.empty[Byte] :+ Row(null, null))
        }
      }
    }(enc)
  }

  /** REAL pixel features: L2-normalized luminance histogram over the
    * decoded pixels (the no-model image feature), plus an integer-count
    * md5 signature like [[withMediaFeatures]]. Undecodable media → zero
    * vector + null signature. */
  def withImageFeatures(df: DataFrame, binCol: String, bins: Int = 64,
      outCol: String = "image_features"): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val schema = df.schema
      .add(StructField(outCol, ArrayType(FloatType)))
      .add(StructField(outCol + "_sig", StringType))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        decodeImage(r.getAs[Array[Byte]](binIdx)) match {
          case Right((_, img)) =>
            val counts = new Array[Long](bins)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                // ITU-R BT.601 integer luma
                val luma = (299 * ((rgb >> 16) & 0xff) +
                  587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                counts(math.min(bins - 1, luma * bins / 256)) += 1L
                x += 1
              }
              y += 1
            }
            val norm = math.sqrt(counts.foldLeft(0.0)((a, c) =>
              a + c.toDouble * c.toDouble))
            val feats = counts.map(c =>
              if (norm == 0) 0f else (c.toDouble / norm).toFloat).toSeq
            md.reset()
            val sig = md.digest(counts.mkString(",").getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString
            Row.fromSeq(r.toSeq :+ feats :+ sig)
          case Left(_) =>
            Row.fromSeq(r.toSeq :+
              Seq.fill(bins)(0f) :+ null.asInstanceOf[String])
        }
      }
    }(enc)
  }

  // ------------------------------------------------------ real audio leg

  /** Audio metadata struct for [[withAudioMeta]]. */
  val AudioMetaSchema: StructType = StructType(Seq(
    StructField("encoding", StringType),
    StructField("sample_rate", FloatType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("decode_error", StringType)))

  /** Audio feature struct for [[withAudioFeatures]]: time-domain
    * features over the decoded, mono-mixed PCM samples in [-1, 1]. */
  val AudioFeatureSchema: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("rms", DoubleType),          // sqrt(mean(s^2))
    StructField("peak", DoubleType),         // max |s|
    StructField("zcr", DoubleType),          // zero crossings / (n-1)
    StructField("silence_ratio", DoubleType), // frac of 20ms wins, rms<1%
    StructField("decode_error", StringType)))

  /** Decode one audio file to mono-mixed double samples in [-1, 1];
    * fail-soft. Non-PCM encodings (u-law/a-law) are transcoded to
    * 16-bit signed PCM by the JDK first. Runs executor-side. */
  private def decodeAudio(bytes: Array[Byte])
      : Either[String, (javax.sound.sampled.AudioFormat, Array[Double])] =
    if (bytes == null || bytes.isEmpty) Left("empty media")
    else try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val dec = AudioSystem.getAudioInputStream(pcm, in)
        try {
          val raw = dec.readAllBytes()
          val ch  = pcm.getChannels
          val n   = raw.length / (2 * ch)
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var sum = 0.0
            var c = 0
            while (c < ch) {
              val o  = (i * ch + c) * 2
              val s  = ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort
              sum += s / 32768.0
              c += 1
            }
            out(i) = sum / ch
            i += 1
          }
          Right((src, out))
        } finally dec.close()
      } finally in.close()
    } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }

  /** REAL audio metadata: header-only parse (no sample decode) of the
    * actual bytes via `javax.sound.sampled` — WAV/AIFF/AU. Appends an
    * [[AudioMetaSchema]] struct; undecodable media fail soft. */
  def withAudioMeta(df: DataFrame, binCol: String,
      outCol: String = "audio_meta"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, AudioMetaSchema))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta =
          if (bytes == null || bytes.isEmpty)
            Row(null, null, null, null, null, null, "empty media")
          else try {
            // header-only: AudioFileFormat never reads the sample data
            val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(bytes))
            val f  = ff.getFormat
            val nf = ff.getFrameLength.toLong
            val durMs =
              if (nf >= 0 && f.getFrameRate > 0)
                math.round(nf * 1000.0 / f.getFrameRate)
              else null.asInstanceOf[Long]
            Row(f.getEncoding.toString, f.getSampleRate, f.getChannels,
              f.getSampleSizeInBits, nf, durMs, null)
          } catch {
            case e: Exception =>
              Row(null, null, null, null, null, null,
                String.valueOf(e.getMessage))
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL audio features over decoded PCM: RMS energy, peak, zero-
    * crossing rate, and silence ratio (fraction of 20 ms windows whose
    * RMS is below 1% full scale) — the no-model audio quality/content
    * signals (speech-band ZCR separates tone from noise; silence ratio
    * flags dead air). Mono-mixed before measuring, like production
    * loudness pipelines. Undecodable media fail soft. */
  def withAudioFeatures(df: DataFrame, binCol: String,
      outCol: String = "audio_features"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, AudioFeatureSchema))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feat = decodeAudio(r.getAs[Array[Byte]](binIdx)) match {
          case Right((fmt, s)) if s.nonEmpty =>
            var sq = 0.0; var peak = 0.0; var zc = 0L
            var i = 0
            while (i < s.length) {
              val v = s(i)
              sq += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              if (i > 0 && (v > 0) != (s(i - 1) > 0)) zc += 1
              i += 1
            }
            val win = math.max(1, (fmt.getSampleRate * 0.02).toInt)
            var silent = 0L; var wins = 0L
            var off = 0
            while (off < s.length) {
              val end = math.min(off + win, s.length)
              var wsq = 0.0
              var j = off
              while (j < end) { wsq += s(j) * s(j); j += 1 }
              if (math.sqrt(wsq / (end - off)) < 0.01) silent += 1
              wins += 1
              off = end
            }
            Row(s.length.toLong, math.sqrt(sq / s.length), peak,
              if (s.length > 1) zc.toDouble / (s.length - 1) else 0.0,
              silent.toDouble / wins, null)
          case Right(_) => Row(0L, 0.0, 0.0, 0.0, 0.0, null)
          case Left(err) =>
            Row(null, null, null, null, null, err)
        }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** REAL perceptual hash (dHash) over decoded pixels: area-mean 9×8
    * grayscale grid, one bit per horizontal luminance gradient — the
    * standard near-duplicate IMAGE signature (robust to re-encoding and
    * mild resizing, unlike the byte-level md5). Pure integer block
    * means, no Graphics2D resampling — bit-for-bit deterministic across
    * platforms. Undecodable media → null. */
  def withImageDHash(df: DataFrame, binCol: String,
      outCol: String = "dhash"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, LongType))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val h: java.lang.Long = decodeImage(r.getAs[Array[Byte]](binIdx)) match {
          case Right((_, img)) => dHashOf(img)
          case Left(_)         => null
        }
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** 64-bit difference hash of a decoded image: 9×8 grid of luma means,
    * bit = right cell brighter than left. Shared by [[withImageDHash]]
    * and the video [[sceneCuts]] leg. */
  private[multimodal] def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val w = img.getWidth
    val hh = img.getHeight
    val cell = Array.ofDim[Long](gh, gw)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * hh / gh
      val y1 = math.max((cy + 1) * hh / gh, y0 + 1)
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.max((cx + 1) * w / gw, x0 + 1)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, hh)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += (299 * ((rgb >> 16) & 0xff) +
              587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        cell(cy)(cx) = sum / ((math.min(y1, hh) - y0).toLong *
          math.max(1, math.min(x1, w) - x0))
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (cell(y)(x + 1) > cell(y)(x))
          bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Near-duplicate image pairs by dHash Hamming distance: the 64-bit
    * hash splits into 4×16-bit bands (the SimHash-LSH pattern —
    * pigeonhole: near-dups almost always share a band), candidates from
    * band-equality groups (memory-bounded collect caps hot bands), then
    * exact `bit_count(xor)` verification. Never a self-join. */
  def imageDHashPairs(df: DataFrame, idCol: String,
      hashCol: String = "dhash", maxHamming: Int = 10,
      maxGroupSize: Int = 10000): DataFrame = {
    import org.apache.spark.sql.graftext.{BoundedCollectAgg, PairsAscExpr}
    val sigs = df.select(col(idCol).as("img_id"), col(hashCol).as("hb"))
      .filter(col("hb").isNotNull)
    val bands = sigs.select(col("img_id"), explode(array(
      (0 until 4).map(q => struct(lit(q).as("q"),
        shiftright(col("hb"), q * 16).bitwiseAND(lit((1L << 16) - 1))
          .as("v"))): _*)).as("band"))
    val cand = bands.groupBy("band")
      .agg(sort_array(BoundedCollectAgg.boundedCollectSet(
        col("img_id"), maxGroupSize)).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
      .select(explode(PairsAscExpr.pairsAsc(col("ids"))).as("p"))
      .select(col("p._1").as("a"), col("p._2").as("b"))
      .distinct()
    cand
      .join(sigs.select(col("img_id").as("a"), col("hb").as("ha")), "a")
      .join(sigs.select(col("img_id").as("b"), col("hb").as("hb2")), "b")
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb2"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  // ------------------------------------------- real video (MJPEG-AVI) leg

  /** Video metadata struct for [[withVideoMeta]]. */
  val VideoMetaSchema: StructType = StructType(Seq(
    StructField("container", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType),
    StructField("decode_error", StringType)))

  /** Video decode through the [[FrameDecoder]] seam (default: the real
    * MJPEG-in-AVI decoder): probes the container, reports dimensions,
    * the DEMUXED frame count (counted from the frame slices, never
    * trusted from the header) and the duration from the frame interval.
    * Anything the decoder rejects fails soft into `decode_error`. A
    * production codec binding (ffmpeg) is one more [[FrameDecoder]] —
    * callers don't change. */
  def withVideoMeta(df: DataFrame, binCol: String,
      outCol: String = "video_meta",
      decoder: FrameDecoder = MjpegAviFrameDecoder): DataFrame = {
    val schema = df.schema.add(StructField(outCol, VideoMetaSchema))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta = decoder.probe(bytes) match {
          case Right(info) =>
            val n = decoder.frameSlices(bytes).size
            Row(decoder.format, info.width, info.height, n,
              info.usPerFrame * n / 1000L, null)
          case Left(err) => Row(null, null, null, null, null, err)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL frame sampling for MJPEG-AVI: demuxes the container and emits
    * up to `n` evenly spaced TRUE JPEG frames — one output row per
    * (video, frame), each carrying the frame bytes (feedable straight
    * into the image leg: [[withImageMeta]], [[imageNearDupPairs]]) and
    * its decoded pixel dimensions. Fail-soft: an unparseable container
    * emits ONE row with null frame and the error (visible, never
    * job-fatal). Bounded memory: only kept frames are sliced out of the
    * container buffer; skipped frames are never copied. */
  def sampleVideoFrames(df: DataFrame, binCol: String, n: Int,
      decoder: FrameDecoder = MjpegAviFrameDecoder): DataFrame = {
    require(n >= 1, "need n >= 1 frames")
    val schema = df.schema
      .add(StructField("frame_no", IntegerType))
      .add(StructField("src_frame", IntegerType))
      .add(StructField("frame_bytes", BinaryType))
      .add(StructField("frame_width", IntegerType))
      .add(StructField("frame_height", IntegerType))
      .add(StructField("frame_error", StringType))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes  = r.getAs[Array[Byte]](binIdx)
        val slices = decoder.frameSlices(bytes)
        if (slices.isEmpty)
          Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null,
            null, s"no demuxable frames (not ${decoder.format}?)")))
        else {
          val m = slices.size
          val picks: Seq[Int] =
            if (m <= n) 0 until m
            else if (n == 1) Seq(0)
            else (0 until n).map(i => i * (m - 1) / (n - 1))
          picks.iterator.zipWithIndex.map { case (src, i) =>
            val (off, len) = slices(src)
            // zero-length slice = inter-frame "repeat previous" chunk
            // (RLE8 ##dc with no payload): NOT standalone-decodable, so
            // never ship empty bytes with plausible dims — error-flag it
            // (downstream image legs skip error rows; sceneCuts is the
            // surface that decodes repeats correctly via decodeFrames).
            val tail =
              if (len == 0)
                Seq(i, src, null, null, null,
                  "inter-frame repeat chunk: not standalone-decodable")
              else {
                val fb = java.util.Arrays.copyOfRange(bytes, off, off + len)
                decoder.decodeDims(bytes, off, len) match {
                  case Right((w, h)) => Seq(i, src, fb, w, h, null)
                  case Left(e)       => Seq(i, src, fb, null, null, e)
                }
              }
            Row.fromSeq(r.toSeq ++ tail)
          }
        }
      }
    }(enc)
  }

  /** Scene-cut detection over the real video decode path: every demuxed
    * frame is dHashed ([[dHashOf]] — the same perceptual hash the image
    * leg uses) and compared to its predecessor; a Hamming distance ≥
    * `cutHamming` marks a shot boundary. The keyframe-selection
    * primitive of video curation: sample one frame per SHOT instead of
    * one per time slice ([[sampleVideoFrames]]), so a static-camera
    * hour costs one frame and a cut-heavy trailer keeps its variety.
    *
    * Streaming memory: frames decode sequentially, state is ONE 64-bit
    * hash — a 2-hour video never holds two decoded frames at once. One
    * output row per frame (frame 0: null distance); undecodable
    * containers fail soft with a single error row (the S4/raster-page
    * discipline). */
  def sceneCuts(df: DataFrame, binCol: String, cutHamming: Int = 16,
      decoder: FrameDecoder = MjpegAviFrameDecoder): DataFrame = {
    require(cutHamming >= 1 && cutHamming <= 64,
      s"cutHamming out of range: $cutHamming")
    val schema = df.schema
      .add(StructField("frame_no", IntegerType))
      .add(StructField("hamming", IntegerType))
      .add(StructField("is_cut", BooleanType))
      .add(StructField("cut_error", StringType))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val bytes  = r.getAs[Array[Byte]](binIdx)
        // Container-level vs per-frame failure is classified by `probe`
        // (a header walk, negligible next to pixel decode): a container
        // the decoder rejects outright gets ONE null-frame_no row with
        // the probe error — so consumers keep distinguishing container
        // errors (frame_no null) from per-frame errors (frame_no set),
        // even for decoders like RLE8 whose decodeFrames surfaces the
        // container failure as a single leading Left.
        val containerErr = decoder.probe(bytes).left.toOption
        val frames =
          if (containerErr.isDefined) Iterator.empty
          else decoder.decodeFrames(bytes)
        if (!frames.hasNext)
          Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null, null,
            containerErr.getOrElse(
              s"no demuxable frames (not ${decoder.format}?)"))))
        else {
          var prev: java.lang.Long = null
          frames.zipWithIndex.map { case (fr, i) =>
            val tail: Seq[Any] = fr match {
              case Right(img) =>
                val h = dHashOf(img)
                val out = if (prev == null) Seq(i, null, false, null)
                else {
                  val d = java.lang.Long.bitCount(prev ^ h)
                  Seq(i, d, d >= cutHamming, null)
                }
                prev = h
                out
              case Left(e) =>
                prev = null // a gap resets the comparison chain
                Seq(i, null, null, e)
            }
            Row.fromSeq(r.toSeq ++ tail)
          }
        }
      }
    }(enc)
  }

  /** Typed metadata carried next to the opaque media bytes. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType),
    StructField("decode_error", StringType)))

  /** First 60 bits of md5(bytes) — identical to the portable SQL form
    * `('0x' || substr(md5(x),1,15))::UBIGINT` (TextFunctions.md5Long),
    * so stub metadata derived from it is oracle-checkable. */
  private def md5Long60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  /** STUB decode: derives deterministic pseudo-metadata from md5 of the
    * byte content (md5, not JVM hashCode — any engine can reproduce it).
    * Replace the body with a real decoder (e.g. javax.imageio / ffmpeg
    * bindings) — the signature, batching and error handling are the
    * production shape. */
  private def stubDecode(bytes: Array[Byte], mime: String): Row =
    if (bytes == null || bytes.isEmpty)
      Row(mime, null, null, null, null, "empty media")
    else {
      val h60 = md5Long60(bytes)
      val w = 16 + (h60 % 4080L).toInt
      val h = 16 + ((h60 / 128L) % 2160L).toInt
      val frames = 1 + bytes.length % 240
      Row(mime, w, h, frames, bytes.length.toLong * 2, null)
    }

  /** Decode stage: appends a `meta` struct column. Per-partition
    * iterator — a real decoder is initialized once per partition here. */
  def withDecodedMeta(df: DataFrame, binCol: String,
      mimeCol: String): DataFrame = {
    val schema  = df.schema.add(StructField("meta", MetaSchema))
    val enc     = org.apache.spark.sql.Encoders.row(schema)
    val binIdx  = df.schema.fieldIndex(binCol)
    val mimeIdx = df.schema.fieldIndex(mimeCol)
    df.mapPartitions { rows =>
      // real impl: open decoder/codec context HERE, once per partition
      rows.map { r =>
        val meta = stubDecode(r.getAs[Array[Byte]](binIdx),
          r.getString(mimeIdx))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Frame sampling (video → n evenly spaced frames). STUB slices byte
    * windows as stand-in frames; real impl decodes keyframes. Output is
    * one row per (row, frame) — the UDTF/explode shape — so downstream
    * per-frame stages parallelize beyond the video count. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int): DataFrame = {
    val frameIdx = sequence(lit(0), lit(n - 1))
    df.withColumn("frame_no", explode(frameIdx))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_no * greatest(length($binCol) div $n, 1) + 1, " +
          s"greatest(length($binCol) div $n, 1))"))
  }

  /** Feature extraction: media bytes → fixed-dim float vector (L2
    * normalized byte-bucket histogram — a deterministic STUB; a real
    * embedding model plugs into the same per-partition batch slot).
    * Also emits `<outCol>_sig`: md5 of the raw integer histogram — the
    * digest an external oracle can reproduce (float formatting is
    * engine-specific, integer counts are not), pinning the feature
    * computation end-to-end. */
  def withMediaFeatures(df: DataFrame, binCol: String, dim: Int = 64,
      outCol: String = "media_features"): DataFrame = {
    val schema = df.schema
      .add(StructField(outCol, ArrayType(FloatType)))
      .add(StructField(outCol + "_sig", StringType))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes  = r.getAs[Array[Byte]](binIdx)
        val counts = new Array[Long](dim)
        if (bytes != null)
          bytes.foreach(b => counts(math.floorMod(b.toInt, dim)) += 1L)
        val norm = math.sqrt(counts.foldLeft(0.0)((a, c) =>
          a + c.toDouble * c.toDouble))
        val feats = counts.map(c =>
          if (norm == 0) 0f else (c.toDouble / norm).toFloat).toSeq
        md.reset()
        val sig = md.digest(counts.mkString(",").getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        Row.fromSeq(r.toSeq :+ feats :+ sig)
      }
    }(enc)
  }

  /** Resize stage: media bytes → smaller media bytes targeting
    * `targetW x targetH` (STUB: deterministic byte decimation at the
    * pixel-count ratio — a real impl decodes, resamples, and re-encodes
    * in this same per-partition slot, decoder state initialized once).
    * Emits `<binCol>_resized` plus a `(width, height)` struct so
    * downstream stages see the post-resize geometry. Empty/null media
    * pass through as empty with null geometry (fail-soft, like decode).
    */
  def withResizedMedia(df: DataFrame, binCol: String, targetW: Int,
      targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val outCol = binCol + "_resized"
    val schema = df.schema
      .add(StructField(outCol, BinaryType))
      .add(StructField(outCol + "_dims", StructType(Seq(
        StructField("width", IntegerType), StructField("height", IntegerType)))))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // real impl: decoder/encoder context opened HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.isEmpty)
          Row.fromSeq(r.toSeq :+ Array.empty[Byte] :+ Row(null, null))
        else {
          val h60 = md5Long60(bytes)
          val w   = 16 + (h60 % 4080L).toInt          // stubDecode geometry
          val h   = 16 + ((h60 / 128L) % 2160L).toInt
          val ratio = math.min(1.0,
            targetW.toLong * targetH / (w.toDouble * h))
          val step = math.max(1, math.round(1.0 / math.max(ratio, 1e-9)).toInt)
          val out  = bytes.indices.collect {
            case i if i % step == 0 => bytes(i)
          }.toArray
          Row.fromSeq(r.toSeq :+ out :+
            Row(math.min(w, targetW), math.min(h, targetH)))
        }
      }
    }(enc)
  }

  /** Digest manifest companion to [[sampleFrames]]: where that emits the
    * raw frame bytes for downstream decode, this slices the stream into
    * `n` spans covering ALL of it (`i*L/n` boundaries) and emits
    * `(frame_idx, frame_off, frame_len, frame_md5)` — the shape for
    * per-frame dedup / integrity checks. Integer offsets + md5 are
    * exactly reproducible by an external engine, so the sampling stage
    * is oracle-checkable end-to-end (q59). Empty media → empty array;
    * `n` is the knob, so per-row output is bounded by construction. */
  def withFrameSamples(df: DataFrame, binCol: String, n: Int = 4,
      outCol: String = "frames"): DataFrame = {
    require(n >= 1, s"frame sample count must be >= 1, got $n")
    val frameType = ArrayType(StructType(Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_off", LongType, nullable = false),
      StructField("frame_len", LongType, nullable = false),
      StructField("frame_md5", StringType, nullable = false))),
      containsNull = false)
    val schema = df.schema.add(StructField(outCol, frameType))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val frames =
          if (bytes == null || bytes.isEmpty) Seq.empty[Row]
          else {
            val len = bytes.length.toLong
            (0 until n).map { i =>
              val off = i.toLong * len / n
              val end = (i + 1).toLong * len / n
              md.reset()
              val dg = md.digest(
                java.util.Arrays.copyOfRange(bytes, off.toInt, end.toInt))
                .map(b => f"$b%02x").mkString
              Row(i, off, end - off, dg)
            }
          }
        Row.fromSeq(r.toSeq :+ frames)
      }
    }(enc)
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The actual codecs (image/audio/video decoding) are NOT available in
  * this build — every `decode*` here is a clearly-marked deterministic
  * STUB that a production deployment replaces with a real library call
  * inside the same `mapPartitions` slot. What IS real and tested is the
  * Spark-side design: schema, batch shape (per-partition iterator —
  * decoder state initialized once per partition, rows streamed through),
  * fail-soft error rows, and bounded memory (never materialize a
  * partition's media in a list).
  */
object Multimodal {

  /** Typed metadata carried next to the opaque media bytes. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType),
    StructField("decode_error", StringType)))

  /** STUB decode: derives deterministic pseudo-metadata from the byte
    * content (size/first bytes). Replace the body with a real decoder
    * (e.g. javax.imageio / ffmpeg bindings) — the signature, batching
    * and error handling are the production shape. */
  private def stubDecode(bytes: Array[Byte], mime: String): Row =
    if (bytes == null || bytes.isEmpty)
      Row(mime, null, null, null, null, "empty media")
    else {
      val w = 16 + math.floorMod(java.util.Arrays.hashCode(bytes), 4080)
      val h = 16 + math.floorMod(java.util.Arrays.hashCode(bytes) >> 7, 2160)
      val frames = 1 + math.floorMod(bytes.length, 240)
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

  /** Feature extraction: media bytes → fixed-dim float vector. STUB uses
    * a hashed byte histogram (deterministic); a real embedding model
    * plugs into the same per-partition batch slot. */
  def withMediaFeatures(df: DataFrame, binCol: String, dim: Int = 64,
      outCol: String = "media_features"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(FloatType)))
    val enc    = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val v = new Array[Float](dim)
        if (bytes != null)
          bytes.foreach(b => v(math.floorMod(b.toInt, dim)) += 1f)
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        val out = if (norm == 0) v else v.map(x => (x / norm).toFloat)
        Row.fromSeq(r.toSeq :+ out.toSeq)
      }
    }(enc)
  }
}

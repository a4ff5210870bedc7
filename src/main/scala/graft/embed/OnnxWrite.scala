package graft.embed

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Serializer for the encoder model class [[Onnx]] executes: a minimal
  * protobuf writer (the mirror of [[Onnx.Pb]]) plus a graph builder
  * for an N-layer single-head transformer encoder — Gather embedding,
  * scaled-dot attention, residual + LayerNormalization, GELU-via-Erf
  * FFN — the length-agnostic export shape (no Reshape, so ONE model
  * file runs any sequence length L, unlike multi-head exports that
  * bake L into the head-split Reshape tensors).
  *
  * This is how [[TinyEncoderTrain]]'s trained weights become a real
  * `.onnx` file: the committed fixture at
  * `src/main/resources/graft/tiny_encoder.onnx` is the output of this
  * writer, parsed back and executed by [[Onnx.run]] — the same seam a
  * production sentence-encoder export would ride (reference embeds
  * with bge-m3 via Ollama, `backend/process/parsing.py:49`; zero
  * egress forbids downloading those weights but not training real
  * ones in-repo).
  */
object OnnxWrite {

  /** Mirror of the reader: length-delimited protobuf message writer. */
  final class PbW {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7
      }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length); out.write(b)
    }
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def msg(field: Int)(f: PbW => Unit): Unit = {
      val w = new PbW; f(w); bytes(field, w.out.toByteArray)
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** FLOAT TensorProto with raw_data payload (the real-export dtype). */
  def tensorRaw(name: String, dims: Seq[Int], data: Array[Float])(
      w: PbW): Unit = {
    require(dims.product == data.length, s"$name: ${dims.mkString("x")}")
    dims.foreach(d => w.int(1, d))
    w.int(2, 1) // FLOAT
    w.str(8, name)
    val bb = ByteBuffer.allocate(data.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putFloat)
    w.bytes(9, bb.array())
  }

  def node(op: String, ins: Seq[String], outs: Seq[String],
      attrs: Map[String, Long] = Map.empty,
      attrsF: Map[String, Float] = Map.empty,
      attrsInts: Map[String, Seq[Long]] = Map.empty)(w: PbW): Unit = {
    ins.foreach(w.str(1, _)); outs.foreach(w.str(2, _)); w.str(4, op)
    attrs.foreach { case (n, v) =>
      w.msg(5) { a => a.str(1, n); a.int(3, v) }
    }
    attrsF.foreach { case (n, v) =>
      w.msg(5) { a =>
        a.str(1, n); a.tag(2, 5)
        a.out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(java.lang.Float.floatToIntBits(v)).array())
      }
    }
    attrsInts.foreach { case (n, vs) =>
      w.msg(5) { a => a.str(1, n); vs.foreach(a.int(8, _)) }
    }
  }

  /** One encoder layer's weights, float, row-major ([in, out] for the
    * right-multiplied MatMul convention `x · W`). `rb`: learned
    * relative-position attention bias weights (RBF buckets around the
    * diagonal, [[EncoderCore]]); empty = content-only attention. */
  final case class LayerW(
      wq: Array[Float], wk: Array[Float], wv: Array[Float],
      wo: Array[Float],
      w1: Array[Float], b1: Array[Float],
      w2: Array[Float], b2: Array[Float],
      g1: Array[Float], be1: Array[Float],
      g2: Array[Float], be2: Array[Float],
      rb: Array[Float] = Array.emptyFloatArray)

  final case class EncoderW(vocab: Int, dim: Int, ffn: Int,
      emb: Array[Float], layers: Seq[LayerW])

  /** Serialize the encoder as a ModelProto. Input `ids` [L] (any L),
    * output `y` [L, dim] — per-token contextual states. Graph shape is
    * the single-head twin of the multi-head export pattern pinned in
    * OnnxSpec (reference pattern: BERT-family exports). */
  def encoderModel(w: EncoderW): Array[Byte] = {
    val d = w.dim; val f = w.ffn
    require(w.emb.length == w.vocab * d)
    val nb = w.layers.headOption.map(_.rb.length).getOrElse(0)
    require(w.layers.forall(_.rb.length == nb), "uneven rb buckets")
    val m = new PbW
    m.int(1, 8) // ir_version
    m.msg(7) { g =>
      g.str(2, "tiny_encoder")
      g.msg(1)(node("Gather", Seq("emb", "ids"), Seq("x0")))
      if (nb > 0) {
        // relative-position RBF basis, shared by every layer: the
        // caller supplies `pos` = [0..L-1] (the position_ids input of
        // HuggingFace-style exports); φ_b = exp(−2 (posⱼ−posᵢ−μ_b)²)
        // via stock Sub/Mul/Pow over an outer broadcast — no
        // length-dependent constant, so the graph stays L-agnostic.
        g.msg(1)(node("Unsqueeze", Seq("pos"), Seq("p_i"),
          attrsInts = Map("axes" -> Seq(1L))))
        g.msg(1)(node("Unsqueeze", Seq("pos"), Seq("p_j"),
          attrsInts = Map("axes" -> Seq(0L))))
        g.msg(1)(node("Sub", Seq("p_j", "p_i"), Seq("drel")))
        for (b <- 0 until nb) {
          g.msg(1)(node("Sub", Seq("drel", s"mu$b"), Seq(s"rd$b")))
          g.msg(1)(node("Mul", Seq(s"rd$b", s"rd$b"), Seq(s"rd2_$b")))
          g.msg(1)(node("Mul", Seq(s"rd2_$b", "negtwo"), Seq(s"rde$b")))
          g.msg(1)(node("Pow", Seq("econst", s"rde$b"), Seq(s"phi$b")))
          g.msg(5)(tensorRaw(s"mu$b", Seq(1),
            Array((b - nb / 2).toFloat)))
        }
        g.msg(5)(tensorRaw("negtwo", Seq(1), Array(-2.0f)))
        g.msg(5)(tensorRaw("econst", Seq(1), Array(math.E.toFloat)))
      }
      for ((lw, l) <- w.layers.zipWithIndex) {
        val p = s"l$l"
        val xin = if (l == 0) "x0" else s"l${l - 1}out"
        val xout = if (l == w.layers.length - 1) "y" else s"${p}out"
        def n(op: String, ins: Seq[String], outs: Seq[String],
            attrs: Map[String, Long] = Map.empty,
            attrsF: Map[String, Float] = Map.empty): Unit =
          g.msg(1)(node(op, ins, outs, attrs, attrsF))
        n("MatMul", Seq(xin, s"${p}wq"), Seq(s"${p}q"))
        n("MatMul", Seq(xin, s"${p}wk"), Seq(s"${p}k"))
        n("MatMul", Seq(xin, s"${p}wv"), Seq(s"${p}v"))
        n("Transpose", Seq(s"${p}k"), Seq(s"${p}kt"))
        n("MatMul", Seq(s"${p}q", s"${p}kt"), Seq(s"${p}sc"))
        n("Div", Seq(s"${p}sc", "sqrtd"), Seq(s"${p}scd"))
        val logits = if (nb == 0) s"${p}scd" else {
          // logits += Σ_b rb_b · φ_b — the layer's learned relative bias
          for (b <- 0 until nb) {
            n("Mul", Seq(s"phi$b", s"${p}rb$b"), Seq(s"${p}bt$b"))
            g.msg(5)(tensorRaw(s"${p}rb$b", Seq(1), Array(lw.rb(b))))
            val prev = if (b == 0) s"${p}scd" else s"${p}bs${b - 1}"
            n("Add", Seq(prev, s"${p}bt$b"), Seq(s"${p}bs$b"))
          }
          s"${p}bs${nb - 1}"
        }
        n("Softmax", Seq(logits), Seq(s"${p}aw"), Map("axis" -> -1L))
        n("MatMul", Seq(s"${p}aw", s"${p}v"), Seq(s"${p}ctx"))
        n("MatMul", Seq(s"${p}ctx", s"${p}wo"), Seq(s"${p}proj"))
        n("Add", Seq(s"${p}proj", xin), Seq(s"${p}res1"))
        n("LayerNormalization", Seq(s"${p}res1", s"${p}g1", s"${p}be1"),
          Seq(s"${p}ln1"), Map("axis" -> -1L), Map("epsilon" -> 1e-5f))
        n("MatMul", Seq(s"${p}ln1", s"${p}w1"), Seq(s"${p}ff0"))
        n("Add", Seq(s"${p}ff0", s"${p}b1"), Seq(s"${p}ffb"))
        // GELU(x) = 0.5 · x · (1 + erf(x / √2))
        n("Div", Seq(s"${p}ffb", "sqrt2"), Seq(s"${p}ge0"))
        n("Erf", Seq(s"${p}ge0"), Seq(s"${p}ge1"))
        n("Add", Seq(s"${p}ge1", "one"), Seq(s"${p}ge2"))
        n("Mul", Seq(s"${p}ffb", s"${p}ge2"), Seq(s"${p}ge3"))
        n("Mul", Seq(s"${p}ge3", "half"), Seq(s"${p}gelu"))
        n("MatMul", Seq(s"${p}gelu", s"${p}w2"), Seq(s"${p}ff2"))
        n("Add", Seq(s"${p}ff2", s"${p}b2"), Seq(s"${p}ffo"))
        n("Add", Seq(s"${p}ffo", s"${p}ln1"), Seq(s"${p}res2"))
        n("LayerNormalization", Seq(s"${p}res2", s"${p}g2", s"${p}be2"),
          Seq(xout), Map("axis" -> -1L), Map("epsilon" -> 1e-5f))
        g.msg(5)(tensorRaw(s"${p}wq", Seq(d, d), lw.wq))
        g.msg(5)(tensorRaw(s"${p}wk", Seq(d, d), lw.wk))
        g.msg(5)(tensorRaw(s"${p}wv", Seq(d, d), lw.wv))
        g.msg(5)(tensorRaw(s"${p}wo", Seq(d, d), lw.wo))
        g.msg(5)(tensorRaw(s"${p}w1", Seq(d, f), lw.w1))
        g.msg(5)(tensorRaw(s"${p}b1", Seq(f), lw.b1))
        g.msg(5)(tensorRaw(s"${p}w2", Seq(f, d), lw.w2))
        g.msg(5)(tensorRaw(s"${p}b2", Seq(d), lw.b2))
        g.msg(5)(tensorRaw(s"${p}g1", Seq(d), lw.g1))
        g.msg(5)(tensorRaw(s"${p}be1", Seq(d), lw.be1))
        g.msg(5)(tensorRaw(s"${p}g2", Seq(d), lw.g2))
        g.msg(5)(tensorRaw(s"${p}be2", Seq(d), lw.be2))
      }
      g.msg(5)(tensorRaw("emb", Seq(w.vocab, d), w.emb))
      g.msg(5)(tensorRaw("sqrtd", Seq(1), Array(math.sqrt(d).toFloat)))
      g.msg(5)(tensorRaw("sqrt2", Seq(1), Array(math.sqrt(2.0).toFloat)))
      g.msg(5)(tensorRaw("one", Seq(1), Array(1.0f)))
      g.msg(5)(tensorRaw("half", Seq(1), Array(0.5f)))
      g.msg(11)(OnnxWrite.valueInfo("ids"))
      if (nb > 0) g.msg(11)(OnnxWrite.valueInfo("pos"))
      g.msg(12)(OnnxWrite.valueInfo("y"))
    }
    m.toBytes
  }

  def valueInfo(name: String)(w: PbW): Unit = w.str(1, name)
}

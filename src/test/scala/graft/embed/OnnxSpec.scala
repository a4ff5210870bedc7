package graft.embed

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** [[Onnx]] — the dependency-free ONNX subset runtime: wire-format
  * parsing (raw_data AND float_data tensors, packed and unpacked),
  * a hand-computed MLP forward pass, Gemm attribute handling, and
  * [[OnnxEmbedder]] as a drop-in [[Embedder]] through the BatchEmbed
  * partition path. The fixture model is BUILT here with a minimal
  * protobuf writer — a real serialized ModelProto, not a mock. */
class OnnxSpec extends SparkSpec {

  // ---- minimal protobuf writer --------------------------------------
  private class PbW {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length); out.write(b)
    }
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def float(field: Int, v: Float): Unit = {
      tag(field, 5)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(java.lang.Float.floatToIntBits(v)).array())
    }
    def msg(field: Int)(f: PbW => Unit): Unit = {
      val w = new PbW; f(w); bytes(field, w.out.toByteArray)
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  private def tensorRaw(name: String, dims: Seq[Int],
      data: Array[Float])(w: PbW): Unit = {
    dims.foreach(d => w.int(1, d))
    w.int(2, 1) // FLOAT
    w.str(8, name)
    val bb = ByteBuffer.allocate(data.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putFloat)
    w.bytes(9, bb.array())
  }
  private def tensorFloats(name: String, dims: Seq[Int],
      data: Array[Float])(w: PbW): Unit = {
    dims.foreach(d => w.int(1, d))
    w.int(2, 1)
    w.str(8, name)
    data.foreach(v => w.float(4, v))
  }
  private def valueInfo(name: String)(w: PbW): Unit = w.str(1, name)
  private def node(op: String, ins: Seq[String], outs: Seq[String],
      attrs: Map[String, Long] = Map.empty)(w: PbW): Unit = {
    ins.foreach(w.str(1, _)); outs.foreach(w.str(2, _)); w.str(4, op)
    attrs.foreach { case (n, v) =>
      w.msg(5) { a => a.str(1, n); a.int(3, v) }
    }
  }

  /** x[4] → h = tanh(W1ᵀ? no: Gemm(x, W1, b1, transB=1) → relu? tanh
    * → y = MatMul(h, W2) + b2. Weights chosen small + exact. */
  private val W1 = Array[Float]( // 3 rows (out) × 4 cols (in), transB
    0.5f, -0.25f, 0.0f, 1.0f,
    -1.0f, 0.5f, 0.25f, 0.0f,
    0.0f, 1.0f, -0.5f, 0.25f)
  private val b1 = Array[Float](0.1f, -0.2f, 0.0f)
  private val W2 = Array[Float]( // 3×2
    1.0f, 0.0f,
    -0.5f, 0.5f,
    0.25f, 1.0f)
  private val b2 = Array[Float](0.0f, 0.05f)

  private def mlpModel: Array[Byte] = {
    val m = new PbW
    m.int(1, 8) // ir_version
    m.msg(7) { g =>
      g.str(2, "mlp")
      g.msg(1)(node("Gemm", Seq("x", "w1", "b1"), Seq("z1"),
        Map("transB" -> 1L)))
      g.msg(1)(node("Tanh", Seq("z1"), Seq("h")))
      g.msg(1)(node("MatMul", Seq("h", "w2"), Seq("z2")))
      g.msg(1)(node("Add", Seq("z2", "b2"), Seq("y")))
      g.msg(5)(tensorRaw("w1", Seq(3, 4), W1))
      g.msg(5)(tensorFloats("b1", Seq(3), b1))
      g.msg(5)(tensorRaw("w2", Seq(3, 2), W2))
      g.msg(5)(tensorRaw("b2", Seq(2), b2))
      g.msg(11)(valueInfo("x"))
      g.msg(12)(valueInfo("y"))
    }
    m.toBytes
  }

  private def forward(x: Array[Float]): Array[Float] = {
    val h = Array.tabulate(3) { i =>
      math.tanh(b1(i) +
        (0 until 4).map(j => W1(i * 4 + j) * x(j)).sum).toFloat
    }
    Array.tabulate(2)(j =>
      b2(j) + (0 until 3).map(i => h(i) * W2(i * 2 + j)).sum)
  }

  test("load + run a real serialized ModelProto matches the " +
      "hand-computed forward pass (raw_data and float_data tensors)") {
    val g = Onnx.load(mlpModel)
    assert(g.inputs == Seq("x") && g.outputs == Seq("y"))
    assert(g.nodes.map(_.opType) == Seq("Gemm", "Tanh", "MatMul", "Add"))
    val x = Array(0.5f, -1.0f, 2.0f, 0.25f)
    val y = Onnx.run(g, Map("x" -> Onnx.Tensor(Array(4), x)))("y")
    val exp = forward(x)
    assert(y.data.length == 2)
    (0 until 2).foreach(i =>
      assert(math.abs(y.data(i) - exp(i)) < 1e-6,
        s"y($i): ${y.data(i)} vs ${exp(i)}"))
  }

  test("batched input: [m,k] MatMul path gives per-row results") {
    val g = Onnx.load(mlpModel)
    val rows = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 2f, -1f, 0.5f))
    val batch = Onnx.Tensor(Array(2, 4), rows.flatten.toArray)
    val y = Onnx.run(g, Map("x" -> batch))("y")
    assert(y.dims.toSeq == Seq(2, 2))
    rows.zipWithIndex.foreach { case (r, i) =>
      val exp = forward(r)
      (0 until 2).foreach(j =>
        assert(math.abs(y.data(i * 2 + j) - exp(j)) < 1e-6))
    }
  }

  test("OnnxEmbedder is a drop-in Embedder: deterministic, unit-norm, " +
      "output dim from the graph, and similar texts stay similar") {
    val e = OnnxEmbedder(mlpModel, featureDim = 4)
    assert(e.dim == 2)
    val a = e.embed("spark catalyst optimizer")
    val b = e.embed("spark catalyst optimizer")
    assert(a.toSeq == b.toSeq)
    assert(math.abs(a.map(v => v.toDouble * v).sum - 1.0) < 1e-6)
    // serialization round-trip (closure shipping) preserves behavior
    val bos = new ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(e); oos.close()
    val e2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[OnnxEmbedder]
    assert(e2.embed("spark catalyst optimizer").toSeq == a.toSeq)
  }

  test("BatchEmbed runs the ONNX embedder per partition over documents") {
    val docs = graft.Tables.documents(spark, SfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .limit(50)
    val e = OnnxEmbedder(mlpModel, featureDim = 4)
    val out = BatchEmbed.withEmbedding(docs, "text", "emb", e)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getSeq[Float](2).length == 2))
  }

  test("unsupported ops and non-float tensors fail loudly") {
    val m = new PbW
    m.msg(7) { g =>
      g.msg(1)(node("Conv", Seq("x"), Seq("y")))
      g.msg(11)(valueInfo("x")); g.msg(12)(valueInfo("y"))
    }
    val g = Onnx.load(m.toBytes)
    intercept[UnsupportedOperationException] {
      Onnx.run(g, Map("x" -> Onnx.Tensor(Array(1), Array(1f))))
    }
  }
}

package graft.embed

import java.nio.{ByteBuffer, ByteOrder}

/** A minimal, dependency-free ONNX loader + executor for the
  * feed-forward model class embedding pipelines actually ship
  * (projection / MLP / pooling heads): enough to run a real `.onnx`
  * file — protobuf wire format parsed directly, no protobuf library,
  * no native runtime — inside executor JVMs with zero egress.
  *
  * This is the production leg of the [[Embedder]] seam (reference
  * embeds with bge-m3 via Ollama, `parsing.py:49`): [[OnnxEmbedder]]
  * featurizes text deterministically and runs the graph per call. The
  * op set is the dense-inference subset up to the ENCODER class:
  * MatMul (incl. batched)/Gemm, elementwise arithmetic with
  * scalar-or-vector broadcast, Relu/Tanh/Sigmoid/Sqrt/Erf/Neg/Pow,
  * ReduceMean/ReduceSum, LpNormalization, Identity, Gather (embedding
  * lookup), Transpose (arbitrary perm), Softmax,
  * LayerNormalization, Reshape/Squeeze/Unsqueeze — enough to execute
  * a real single-head attention block (pinned against hand
  * computation in OnnxSpec). Still out: multi-head Split/Concat
  * plumbing, Where/masking, quantized tensors — a full production
  * sentence-encoder would ride the same trait through a real runtime
  * binding instead.
  *
  * Integer tensors (INT32/INT64 — Gather indices, Reshape shapes) are
  * stored as floats: exact up to 2^24, far beyond any vocab or shape
  * this subset targets; larger ids fail loudly at the Gather bound
  * check rather than silently truncating.
  *
  * Scale shape: the model BYTES are what ships into closures
  * (broadcast-friendly); the parsed graph is rebuilt lazily
  * per-executor ([[OnnxEmbedder]] is Serializable with a @transient
  * parsed form — the [[BatchEmbed]] one-instance-per-partition
  * discipline).
  */
object Onnx {

  // ------------------------------------------------------ protobuf wire
  /** Cursor over one length-delimited scope of protobuf wire format. */
  final class Pb(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def fixed32(): Int = {
      val v = ByteBuffer.wrap(bytes, pos, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def fixed64(): Long = {
      val v = ByteBuffer.wrap(bytes, pos, 8)
        .order(ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8; v
    }
    def lenDelim(): Pb = {
      val n = varint().toInt
      val r = new Pb(bytes, pos, pos + n)
      pos += n; r
    }
    def bytesOut(): Array[Byte] = {
      val n = varint().toInt
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; r
    }
    def str(): String = new String(bytesOut(), "UTF-8")
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 =>
        // NB: `pos += varint()` reads pos BEFORE varint() advances it
        val n = varint().toInt
        pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  // ------------------------------------------------------------- model
  final case class Tensor(dims: Array[Int], data: Array[Float]) {
    def rows: Int = if (dims.length >= 2) dims(dims.length - 2) else 1
    def cols: Int = dims.last
  }
  final case class Node(opType: String, inputs: Seq[String],
      outputs: Seq[String], attrI: Map[String, Long],
      attrF: Map[String, Float], attrInts: Map[String, Seq[Long]])
  final case class Graph(nodes: Seq[Node],
      initializers: Map[String, Tensor],
      inputs: Seq[String], outputs: Seq[String])

  /** Parse a serialized ModelProto. Unknown fields are skipped, so
    * files with opset imports / docs / metadata load fine. */
  def load(modelBytes: Array[Byte]): Graph = {
    val m = new Pb(modelBytes, 0, modelBytes.length)
    var graph: Graph = null
    while (m.hasMore) {
      val (f, w) = m.tag()
      if (f == 7 && w == 2) graph = parseGraph(m.lenDelim())
      else m.skip(w)
    }
    require(graph != null, "no GraphProto in model")
    graph
  }

  private def parseGraph(p: Pb): Graph = {
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    while (p.hasMore) {
      val (f, w) = p.tag()
      (f, w) match {
        case (1, 2)  => nodes += parseNode(p.lenDelim())
        case (5, 2)  => inits += parseTensor(p.lenDelim())
        case (11, 2) => ins += valueInfoName(p.lenDelim())
        case (12, 2) => outs += valueInfoName(p.lenDelim())
        case _       => p.skip(w)
      }
    }
    val initMap = inits.result()
    // graph "inputs" include initializers in some exporters; the FEED
    // inputs are those without initializer entries
    Graph(nodes.result(), initMap,
      ins.result().filterNot(initMap.contains), outs.result())
  }

  private def valueInfoName(p: Pb): String = {
    var name = ""
    while (p.hasMore) {
      val (f, w) = p.tag()
      if (f == 1 && w == 2) name = p.str() else p.skip(w)
    }
    name
  }

  private def parseNode(p: Pb): Node = {
    val in = Seq.newBuilder[String]; val out = Seq.newBuilder[String]
    var op = ""
    val ai = Map.newBuilder[String, Long]
    val af = Map.newBuilder[String, Float]
    val aints = Map.newBuilder[String, Seq[Long]]
    while (p.hasMore) {
      val (f, w) = p.tag()
      (f, w) match {
        case (1, 2) => in += p.str()
        case (2, 2) => out += p.str()
        case (4, 2) => op = p.str()
        case (5, 2) =>
          val a = p.lenDelim()
          var name = ""; var iv: Option[Long] = None
          var fv: Option[Float] = None
          val ints = Seq.newBuilder[Long]
          while (a.hasMore) {
            val (af2, aw) = a.tag()
            (af2, aw) match {
              case (1, 2) => name = a.str()
              case (2, 5) => fv = Some(java.lang.Float
                .intBitsToFloat(a.fixed32()))
              case (3, 0) => iv = Some(a.varint())
              case (8, 0) => ints += a.varint()
              case (8, 2) => // packed ints
                val q = a.lenDelim()
                while (q.hasMore) ints += q.varint()
              case _ => a.skip(aw)
            }
          }
          iv.foreach(v => ai += name -> v)
          fv.foreach(v => af += name -> v)
          val is = ints.result()
          if (is.nonEmpty) aints += name -> is
        case _ => p.skip(w)
      }
    }
    Node(op, in.result(), out.result(), ai.result(), af.result(),
      aints.result())
  }

  private def parseTensor(p: Pb): (String, Tensor) = {
    val dims = Seq.newBuilder[Long]
    var name = ""
    var raw: Array[Byte] = null
    val floats = Seq.newBuilder[Float]
    var dtype = 1L
    while (p.hasMore) {
      val (f, w) = p.tag()
      (f, w) match {
        case (1, 0) => dims += p.varint()
        case (1, 2) => // packed dims
          val q = p.lenDelim(); while (q.hasMore) dims += q.varint()
        case (2, 0) => dtype = p.varint()
        case (4, 5) => floats += java.lang.Float.intBitsToFloat(p.fixed32())
        case (4, 2) => // packed float_data
          val q = p.lenDelim()
          while (q.hasMore) floats += java.lang.Float.intBitsToFloat(q.fixed32())
        case (5, 0) => floats += p.varint().toInt.toFloat // int32_data
        case (5, 2) =>
          val q = p.lenDelim()
          while (q.hasMore) floats += q.varint().toInt.toFloat
        case (7, 0) => floats += int64ToFloat(p.varint()) // int64_data
        case (7, 2) =>
          val q = p.lenDelim()
          while (q.hasMore) floats += int64ToFloat(q.varint())
        case (8, 2) => name = p.str()
        case (9, 2) => raw = p.bytesOut()
        case _ => p.skip(w)
      }
    }
    require(dtype == 1L || dtype == 6L || dtype == 7L,
      s"tensor $name: only FLOAT/INT32/INT64 supported, got $dtype")
    val data =
      if (raw != null) {
        val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        dtype match {
          case 1L => Array.fill(raw.length / 4)(bb.getFloat)
          case 6L => Array.fill(raw.length / 4)(bb.getInt.toFloat)
          case 7L => Array.fill(raw.length / 8)(int64ToFloat(bb.getLong))
        }
      } else floats.result().toArray
    name -> Tensor(dims.result().map(_.toInt).toArray, data)
  }

  /** INT64 → float with a loud exactness bound (see class doc). */
  private def int64ToFloat(v: Long): Float = {
    require(math.abs(v) <= (1L << 24),
      s"int tensor value $v exceeds the float-exact range 2^24")
    v.toFloat
  }

  // ---------------------------------------------------------- executor
  /** Execute the graph (nodes are topologically ordered per the ONNX
    * spec) on the given feeds; returns the requested outputs. */
  def run(g: Graph, feeds: Map[String, Tensor]): Map[String, Tensor] = {
    val env = scala.collection.mutable.Map[String, Tensor]()
    env ++= g.initializers
    env ++= feeds
    g.nodes.foreach { n =>
      def in(i: Int): Tensor = env.getOrElse(n.inputs(i),
        throw new IllegalStateException(
          s"${n.opType}: missing input ${n.inputs(i)}"))
      val out: Tensor = n.opType match {
        case "MatMul" => matmul(in(0), in(1))
        case "Gemm" =>
          val alpha = n.attrF.getOrElse("alpha", 1.0f)
          val beta = n.attrF.getOrElse("beta", 1.0f)
          val tA = n.attrI.getOrElse("transA", 0L) == 1L
          val tB = n.attrI.getOrElse("transB", 0L) == 1L
          val a = if (tA) transpose(in(0)) else in(0)
          val b = if (tB) transpose(in(1)) else in(1)
          val ab = matmul(a, b)
          val scaled = Tensor(ab.dims, ab.data.map(_ * alpha))
          if (n.inputs.length > 2)
            broadcastBin(scaled, Tensor(in(2).dims,
              in(2).data.map(_ * beta)), _ + _)
          else scaled
        case "Add" => broadcastBin(in(0), in(1), _ + _)
        case "Sub" => broadcastBin(in(0), in(1), _ - _)
        case "Mul" => broadcastBin(in(0), in(1), _ * _)
        case "Div" => broadcastBin(in(0), in(1), _ / _)
        case "Relu" => unary(in(0), x => math.max(x, 0.0f))
        case "Tanh" => unary(in(0), x => math.tanh(x).toFloat)
        case "Sigmoid" =>
          unary(in(0), x => (1.0 / (1.0 + math.exp(-x))).toFloat)
        case "Sqrt" => unary(in(0), x => math.sqrt(x).toFloat)
        case "Erf" => unary(in(0), x => erf(x.toDouble).toFloat)
        case "Neg" => unary(in(0), x => -x)
        case "Pow" => broadcastBin(in(0), in(1),
          (a, b) => math.pow(a, b).toFloat)
        case "Identity" => in(0)
        case "Gather" =>
          require(n.attrI.getOrElse("axis", 0L) == 0L,
            "Gather: only axis 0 (embedding-lookup shape)")
          gather(in(0), in(1))
        case "Transpose" =>
          val t = in(0)
          val perm = n.attrInts.get("perm").map(_.map(_.toInt))
            .getOrElse(t.dims.indices.reverse.toSeq)
          permute(t, perm)
        case "Softmax" =>
          val t = in(0)
          val ax = n.attrI.getOrElse("axis", -1L)
          require(ax == -1L || ax == t.dims.length - 1L,
            "Softmax: only the last axis")
          softmaxLast(t)
        case "LayerNormalization" =>
          val t = in(0)
          val ax = n.attrI.getOrElse("axis", -1L)
          require(ax == -1L || ax == t.dims.length - 1L,
            "LayerNormalization: only the last axis")
          layerNorm(t, in(1),
            if (n.inputs.length > 2) Some(in(2)) else None,
            n.attrF.getOrElse("epsilon", 1e-5f))
        case "Reshape" =>
          reshape(in(0), in(1).data.map(_.toLong))
        case "Squeeze" | "Unsqueeze" =>
          // pure dims bookkeeping on a row-major buffer; the executor's
          // ops are all last-axis/flat, so dropping or adding size-1
          // axes never moves data
          val t = in(0)
          if (n.opType == "Squeeze") {
            val d = t.dims.filter(_ != 1)
            Tensor(if (d.isEmpty) Array(1) else d, t.data)
          }
          else {
            val axes = n.attrInts.getOrElse("axes",
              if (n.inputs.length > 1) in(1).data.map(_.toLong).toSeq
              else Seq(0L)).map(_.toInt)
            val out = t.dims.toBuffer
            axes.sorted.foreach(a => out.insert(
              if (a < 0) out.length + 1 + a else a, 1))
            Tensor(out.toArray, t.data)
          }
        case "ReduceMean" => reduce(in(0), mean = true)
        case "ReduceSum" => reduce(in(0), mean = false)
        case "LpNormalization" =>
          require(n.attrI.getOrElse("p", 2L) == 2L, "only L2")
          val t = in(0)
          val norm = math.sqrt(t.data.map(x => x.toDouble * x).sum)
          if (norm == 0.0) t
          else Tensor(t.dims, t.data.map(x => (x / norm).toFloat))
        case op => throw new UnsupportedOperationException(
          s"ONNX op $op outside the dense-inference subset")
      }
      env += n.outputs.head -> out
    }
    g.outputs.map(o => o -> env.getOrElse(o,
      throw new IllegalStateException(s"graph output $o not produced")))
      .toMap
  }

  private def unary(t: Tensor, f: Float => Float): Tensor =
    Tensor(t.dims, t.data.map(f))

  /** erf via the Numerical-Recipes Chebyshev erfc fit — |err| ≤ 1.2e-7,
    * below float32 resolution across the range (GELU's operand). */
  private def erf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.5 * math.abs(x))
    val tau = t * math.exp(-x * x - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
      t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
      t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) 1.0 - tau else tau - 1.0
  }

  /** Gather on axis 0: data [V, …rest], indices any shape (row ids) →
    * [indices.dims…, …rest] — the embedding-lookup shape. */
  private def gather(data: Tensor, idx: Tensor): Tensor = {
    val v = data.dims(0)
    val slice = if (data.dims.length == 1) 1 else data.dims.drop(1).product
    val out = new Array[Float](idx.data.length * slice)
    var i = 0
    while (i < idx.data.length) {
      val id = idx.data(i).toInt
      require(id >= 0 && id < v, s"Gather: index $id out of [0, $v)")
      System.arraycopy(data.data, id * slice, out, i * slice, slice)
      i += 1
    }
    val dims = idx.dims ++ data.dims.drop(1)
    Tensor(if (dims.isEmpty) Array(1) else dims, out)
  }

  /** General axis permutation (row-major strides both sides). */
  private def permute(t: Tensor, perm: Seq[Int]): Tensor = {
    require(perm.length == t.dims.length && perm.sorted == t.dims.indices,
      s"Transpose perm ${perm.mkString(",")} vs rank ${t.dims.length}")
    val inDims = t.dims
    val outDims = perm.map(inDims(_)).toArray
    val inStride = new Array[Int](inDims.length)
    var s = 1
    var i = inDims.length - 1
    while (i >= 0) { inStride(i) = s; s *= inDims(i); i -= 1 }
    val out = new Array[Float](t.data.length)
    val outIdx = new Array[Int](outDims.length)
    var o = 0
    while (o < out.length) {
      var inPos = 0
      var d = 0
      while (d < outDims.length) {
        inPos += outIdx(d) * inStride(perm(d)); d += 1
      }
      out(o) = t.data(inPos)
      // odometer over outIdx
      d = outDims.length - 1
      var carry = true
      while (d >= 0 && carry) {
        outIdx(d) += 1
        if (outIdx(d) == outDims(d)) { outIdx(d) = 0; d -= 1 }
        else carry = false
      }
      o += 1
    }
    Tensor(outDims, out)
  }

  /** Numerically stable last-axis softmax. */
  private def softmaxLast(t: Tensor): Tensor = {
    val n = t.cols
    val m = t.data.length / n
    val out = new Array[Float](t.data.length)
    var i = 0
    while (i < m) {
      var mx = Double.NegativeInfinity
      var j = 0
      while (j < n) { mx = math.max(mx, t.data(i * n + j)); j += 1 }
      var sum = 0.0
      j = 0
      while (j < n) {
        val e = math.exp(t.data(i * n + j) - mx)
        out(i * n + j) = e.toFloat; sum += e; j += 1
      }
      j = 0
      while (j < n) { out(i * n + j) = (out(i * n + j) / sum).toFloat; j += 1 }
      i += 1
    }
    Tensor(t.dims, out)
  }

  /** Last-axis LayerNormalization (biased variance, per the ONNX op). */
  private def layerNorm(t: Tensor, scale: Tensor, bias: Option[Tensor],
      eps: Float): Tensor = {
    val n = t.cols
    require(scale.data.length == n, "LayerNormalization scale size")
    bias.foreach(b => require(b.data.length == n,
      "LayerNormalization bias size"))
    val m = t.data.length / n
    val out = new Array[Float](t.data.length)
    var i = 0
    while (i < m) {
      var mu = 0.0
      var j = 0
      while (j < n) { mu += t.data(i * n + j); j += 1 }
      mu /= n
      var va = 0.0
      j = 0
      while (j < n) {
        val d = t.data(i * n + j) - mu; va += d * d; j += 1
      }
      va /= n
      val inv = 1.0 / math.sqrt(va + eps)
      j = 0
      while (j < n) {
        val y = (t.data(i * n + j) - mu) * inv * scale.data(j) +
          bias.map(_.data(j).toDouble).getOrElse(0.0)
        out(i * n + j) = y.toFloat; j += 1
      }
      i += 1
    }
    Tensor(t.dims, out)
  }

  /** Reshape with a single -1 inferred dim and 0 = copy-input-dim. */
  private def reshape(t: Tensor, shape: Array[Long]): Tensor = {
    val resolved = shape.zipWithIndex.map {
      case (0L, i) => t.dims(i).toLong
      case (d, _) => d
    }
    val known = resolved.filter(_ > 0).product
    val dims = resolved.map {
      case -1L =>
        require(known > 0 && t.data.length % known == 0,
          s"Reshape: cannot infer -1 for ${shape.mkString(",")}")
        (t.data.length / known).toInt
      case d => d.toInt
    }
    require(dims.product == t.data.length,
      s"Reshape ${t.dims.mkString("x")} -> ${dims.mkString("x")}")
    Tensor(dims, t.data)
  }

  /** Elementwise with trailing-dimension broadcast: equal sizes, or the
    * smaller side a scalar / last-dim vector. */
  private def broadcastBin(a: Tensor, b: Tensor,
      f: (Float, Float) => Float): Tensor = {
    // outer broadcast first: [1,n] ∘ [m,1] has EQUAL flat lengths when
    // m == n, so the elementwise fast path below would silently zero a
    // position-difference matrix (caught live by the relative-bias
    // parity check)
    if (a.dims.length == 2 && b.dims.length == 2 &&
        a.dims(0) == 1 && b.dims(1) == 1 &&
        (a.dims(1) > 1 || b.dims(0) > 1))
      Tensor(Array(b.dims(0), a.dims(1)),
        Array.tabulate(b.dims(0) * a.dims(1))(i =>
          f(a.data(i % a.dims(1)), b.data(i / a.dims(1)))))
    else if (a.dims.length == 2 && b.dims.length == 2 &&
        a.dims(1) == 1 && b.dims(0) == 1 &&
        (a.dims(0) > 1 || b.dims(1) > 1))
      Tensor(Array(a.dims(0), b.dims(1)),
        Array.tabulate(a.dims(0) * b.dims(1))(i =>
          f(a.data(i / b.dims(1)), b.data(i % b.dims(1)))))
    else if (a.data.length == b.data.length)
      Tensor(a.dims, Array.tabulate(a.data.length)(i =>
        f(a.data(i), b.data(i))))
    else if (b.data.length == 1)
      Tensor(a.dims, a.data.map(f(_, b.data(0))))
    else if (a.data.length == 1)
      Tensor(b.dims, b.data.map(f(a.data(0), _)))
    else if (a.data.length % b.data.length == 0 && a.cols == b.data.length)
      Tensor(a.dims, Array.tabulate(a.data.length)(i =>
        f(a.data(i), b.data(i % b.data.length))))
    else throw new IllegalArgumentException(
      s"broadcast ${a.dims.mkString("x")} vs ${b.dims.mkString("x")}")
  }

  private def transpose(t: Tensor): Tensor = {
    require(t.dims.length == 2, "transpose needs a matrix")
    val (r, c) = (t.dims(0), t.dims(1))
    val out = new Array[Float](t.data.length)
    var i = 0
    while (i < r) {
      var j = 0
      while (j < c) { out(j * r + i) = t.data(i * c + j); j += 1 }
      i += 1
    }
    Tensor(Array(c, r), out)
  }

  /** [k]×[k,n]→[n]; [m,k]×[k,n]→[m,n] (leading dims of `a` flatten —
    * the [B,L,k]×[k,n] projection case rides this); batched
    * [B,m,k]×[B,k,n]→[B,m,n]. */
  private def matmul(a: Tensor, b: Tensor): Tensor = {
    if (b.dims.length == 3) {
      require(a.dims.length == 3 && a.dims(0) == b.dims(0),
        s"batched matmul: ${a.dims.mkString("x")} × ${b.dims.mkString("x")}")
      val batch = a.dims(0)
      val (m, k, n2) = (a.dims(1), a.dims(2), b.dims(2))
      require(b.dims(1) == k, "batched matmul inner dim")
      val out = new Array[Float](batch * m * n2)
      var bi = 0
      while (bi < batch) {
        val r = matmul(
          Tensor(Array(m, k), java.util.Arrays.copyOfRange(
            a.data, bi * m * k, (bi + 1) * m * k)),
          Tensor(Array(k, n2), java.util.Arrays.copyOfRange(
            b.data, bi * k * n2, (bi + 1) * k * n2)))
        System.arraycopy(r.data, 0, out, bi * m * n2, m * n2)
        bi += 1
      }
      return Tensor(Array(batch, m, n2), out)
    }
    require(b.dims.length == 2, "matmul rhs must be a matrix")
    val k = b.dims(0); val nOut = b.dims(1)
    require(a.cols == k,
      s"matmul shape: ${a.dims.mkString("x")} × ${b.dims.mkString("x")}")
    val m = a.data.length / k
    val out = new Array[Float](m * nOut)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < nOut) {
        var s = 0.0
        var t = 0
        while (t < k) { s += a.data(i * k + t) * b.data(t * nOut + j); t += 1 }
        out(i * nOut + j) = s.toFloat
        j += 1
      }
      i += 1
    }
    if (a.dims.length == 1) Tensor(Array(nOut), out)
    else Tensor(a.dims.dropRight(1) :+ nOut, out)
  }

  private def reduce(t: Tensor, mean: Boolean): Tensor = {
    // last-axis reduce (the pooling shape); keepdims collapses to [1]
    val n = t.cols
    val m = t.data.length / n
    val out = new Array[Float](m)
    var i = 0
    while (i < m) {
      var s = 0.0
      var j = 0
      while (j < n) { s += t.data(i * n + j); j += 1 }
      out(i) = (if (mean) s / n else s).toFloat
      i += 1
    }
    Tensor(if (t.dims.length == 1) Array(1) else Array(m), out)
  }
}

/** The [[Embedder]] production leg: deterministic feature hashing (the
  * same md5 bag-of-tokens front end as [[DeterministicEmbedder]] — a
  * tokenizer stack would slot in here) followed by a REAL ONNX forward
  * pass through [[Onnx]]. `modelBytes` is what serializes into task
  * closures; the parsed graph rebuilds lazily per executor. */
final case class OnnxEmbedder(modelBytes: Array[Byte],
    featureDim: Int, seed: Long = 42L) extends Embedder {

  @transient private lazy val graph = Onnx.load(modelBytes)
  @transient private lazy val inputName = graph.inputs.headOption
    .getOrElse(throw new IllegalArgumentException("model has no input"))

  lazy val dim: Int = embedFeatures(new Array[Float](featureDim)).length

  private def features(text: String): Array[Float] = {
    val v = new Array[Float](featureDim)
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    toks.foreach { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$t".getBytes("UTF-8"))
      val h = java.nio.ByteBuffer.wrap(d).getInt(0)
      val idx = math.floorMod(h, featureDim)
      val sign = if (math.floorMod(h >> 16, 2) == 0) 1.0f else -1.0f
      v(idx) += sign
    }
    v
  }

  private def embedFeatures(x: Array[Float]): Array[Float] = {
    val out = Onnx.run(graph,
      Map(inputName -> Onnx.Tensor(Array(featureDim), x)))
    val raw = out(graph.outputs.head).data
    val norm = math.sqrt(raw.map(v => v.toDouble * v).sum)
    if (norm == 0.0) raw else raw.map(v => (v / norm).toFloat)
  }

  def embed(text: String): Array[Float] = embedFeatures(features(text))
}

/** The SEQUENCE-model production leg of the [[Embedder]] seam — the
  * transformer-encoder shape ([[Onnx]] now executes Gather + attention
  * + LayerNormalization + GELU end-to-end; OnnxSpec pins a real block
  * against hand computation). Where [[OnnxEmbedder]] feeds one
  * bag-of-tokens feature VECTOR, this feeds a token-ID SEQUENCE:
  *
  *   text → tokenize → md5-hash ids (deterministic, vocab-bounded,
  *   id 0 reserved) → `ids` tensor [L] → the model (embedding Gather,
  *   attention blocks, …) → [L, d] token states or [d] pooled —
  *   [L, d] outputs are mean-pooled here; either way L2-normalized.
  *
  * A REAL trained encoder exported to ONNX runs through this class
  * unchanged as long as it stays inside the documented op subset; the
  * md5 front end stands in for its tokenizer (a WordPiece/BPE vocab
  * file would slot in at [[tokenIds]]). Same closure-shipping shape as
  * [[OnnxEmbedder]]: bytes serialize, the graph rebuilds lazily
  * per executor. */
final case class OnnxSequenceEmbedder(modelBytes: Array[Byte],
    vocab: Int, maxLen: Int, seed: Long = 42L) extends Embedder {
  require(vocab >= 2 && maxLen >= 1)

  @transient private lazy val graph = Onnx.load(modelBytes)
  @transient private lazy val inputName = graph.inputs.headOption
    .getOrElse(throw new IllegalArgumentException("model has no input"))

  lazy val dim: Int = embedIds(Array(1.0f)).length

  /** Deterministic hash-tokenizer: ids in [1, vocab) — 0 is reserved
    * (PAD/UNK conventions), so a real vocab can adopt it. */
  private[embed] def tokenIds(text: String): Array[Float] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .take(maxLen)
    toks.map { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$t".getBytes("UTF-8"))
      (math.floorMod(java.nio.ByteBuffer.wrap(d).getInt(0),
        vocab - 1) + 1).toFloat
    }
  }

  private def embedIds(ids: Array[Float]): Array[Float] = {
    val out = Onnx.run(graph,
      Map(inputName -> Onnx.Tensor(Array(ids.length), ids)))
    val t = out(graph.outputs.head)
    val d = t.cols
    val pooled =
      if (t.data.length == d) t.data
      else { // [L, d] token states → mean pool
        val l = t.data.length / d
        Array.tabulate(d) { j =>
          var s = 0.0; var i = 0
          while (i < l) { s += t.data(i * d + j); i += 1 }
          (s / l).toFloat
        }
      }
    val norm = math.sqrt(pooled.map(v => v.toDouble * v).sum)
    if (norm == 0.0) pooled else pooled.map(v => (v / norm).toFloat)
  }

  def embed(text: String): Array[Float] = {
    val ids = tokenIds(text)
    if (ids.isEmpty) new Array[Float](dim) else embedIds(ids)
  }
}

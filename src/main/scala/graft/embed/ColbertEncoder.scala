package graft.embed

/** Deployment wrapper for the in-repo-trained transformer encoder
  * ([[TinyEncoderTrain]]) — ColBERT-style late interaction (Khattab &
  * Zaharia, SIGIR'20) shaped for Spark + an exact SQL oracle:
  *
  *   - [[contextualStates]]: the full token-id sequence through the
  *     trained graph via [[Onnx.run]] → per-token CONTEXTUAL states,
  *     each L2-normalized (the query tower — attention genuinely mixes
  *     positions here);
  *   - [[tokenTable]]: every live id 1..vocab-1 through the SAME graph
  *     with L = 1 → the context-free document-token table. 63 rows of
  *     corpus-independent constants — small enough to broadcast to
  *     every executor AND to inline as a SQL VALUES table, which is
  *     what makes a transformer-scored retrieval query hash-checkable
  *     against DuckDB;
  *   - [[scoreTable]]: the two combined into the integer MaxSim score
  *     matrix `m(id)(j) = round(1e6 · q̂_j · d̂_id)` — per-document
  *     scoring downstream is ALL integer algebra (join + max + sum),
  *     immune to float summation-order divergence between engines.
  *
  * Tokenization is the repo's cross-engine id map
  * (`Md5HashingTF.bucket(tok, 63) + 1` ↔ SQL `md5Long(tok) % 63 + 1`),
  * the same map the encoder was TRAINED with.
  *
  * Scale shape: the encoder runs a fixed 64 + 1 times on the driver
  * (microseconds); the corpus side is one scan → explode → broadcast
  * hash join against 63 rows → partial max-agg. No shuffle carries
  * anything wider than (doc_id, Lq longs).
  */
trait LateInteractionEncoder extends Serializable {

  /** Serialized ONNX encoder graph (see [[OnnxWrite.encoderModel]]). */
  def modelBytes: Array[Byte]

  /** Vocab size; ids 1..vocab-1 live, 0 reserved (PAD). */
  def vocab: Int

  /** Text → token ids in [1, vocab). Implementation-specific: the tiny
    * encoder uses the md5-bucket map, the corpus encoder real BPE. */
  def tokenIds(text: String): Array[Int]

  @transient private lazy val graph = Onnx.load(modelBytes)

  lazy val dim: Int = tokenTable()(1).length

  protected def l2(row: Array[Float]): Array[Float] = {
    val n = math.sqrt(row.map(v => v.toDouble * v).sum)
    if (n == 0.0) row else row.map(v => (v / n).toFloat)
  }

  private def runIds(ids: Array[Float]): Array[Array[Float]] = {
    val feed = Map("ids" -> Onnx.Tensor(Array(ids.length), ids)) ++
      // graphs with relative-position attention take position_ids too
      (if (graph.inputs.contains("pos"))
        Map("pos" -> Onnx.Tensor(Array(ids.length),
          Array.tabulate(ids.length)(_.toFloat)))
      else Map.empty)
    val t = Onnx.run(graph, feed)(graph.outputs.head)
    val d = t.cols
    Array.tabulate(t.data.length / d)(i =>
      l2(java.util.Arrays.copyOfRange(t.data, i * d, (i + 1) * d)))
  }

  /** L2-normalized contextual state per token of `text`. `maxTokens`
    * truncates the sequence first (the ColBERT document-side cap —
    * real deployments encode a bounded passage, not unbounded text). */
  def contextualStates(text: String,
      maxTokens: Int = Int.MaxValue): Array[Array[Float]] = {
    val ids = tokenIds(text).take(maxTokens)
    if (ids.isEmpty) Array.empty else runIds(ids.map(_.toFloat))
  }

  /** id → L2-normalized context-free state, for ids 1..vocab-1
    * (index 0 unused — the reserved PAD id). */
  def tokenTable(): Array[Array[Float]] = {
    val out = new Array[Array[Float]](vocab)
    var id = 1
    while (id < vocab) {
      out(id) = runIds(Array(id.toFloat))(0)
      id += 1
    }
    out
  }

  /** Integer MaxSim score matrix for a query: row id ∈ [1, vocab),
    * column j ∈ [0, Lq): `round(1e6 · q̂_j · d̂_id)` half-away-from-zero
    * — the exact-integer currency both Spark and the oracle sum. */
  def scoreTable(queryText: String): Array[Array[Long]] = {
    val qs = contextualStates(queryText)
    require(qs.nonEmpty, "empty query")
    val tt = tokenTable()
    Array.tabulate(vocab) { id =>
      if (id == 0) new Array[Long](qs.length)
      else Array.tabulate(qs.length) { j =>
        var d = 0.0; var t = 0
        while (t < qs(j).length) {
          d += qs(j)(t).toDouble * tt(id)(t).toDouble; t += 1
        }
        math.round(d * 1e6) // half-up on positives, |d| ≤ 1 so exact
      }
    }
  }
}

final case class ColbertEncoder(modelBytes: Array[Byte], vocab: Int)
    extends LateInteractionEncoder with Embedder {

  def tokenIds(text: String): Array[Int] =
    TinyEncoderTrain.tokenIds(text)

  /** Semantic near-dup scoring over CANDIDATE pairs with the trained
    * encoder — the dedup-family leg of the deployment (beside
    * MinHash/SimHash/TF-IDF): each document's bag embedding is the SUM
    * of its tokens' integer-scaled encoder vectors (exact BIGINTs —
    * order-free, so Spark and a SQL oracle agree bit-for-bit), and the
    * pair score is the cosine of those sums, computed as one
    * fixed-order 16-term dot expression over exact integers with a
    * single double division at the end.
    *
    * Scale shape: one corpus scan → broadcast join against the 63-row
    * integer token table → 16-column partial-agg sums; the pair join
    * touches only the candidate relation (banded LSH output — never
    * corpus²). Returns (a, b, cos) for candidates with cos ≥ minCos. */
  def bagCosinePairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, pairs: org.apache.spark.sql.DataFrame,
      minCos: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.Row
    import graft.operators.Ckpt.CkptOps
    val spark = docs.sparkSession
    val tt = tokenTable()
    val d = dim
    val schema = StructType(
      StructField("tok_id", LongType, nullable = false) +:
        (0 until d).map(k => StructField(s"w$k", LongType, nullable = false)))
    // 1e4 scaling (not 1e6): the dot terms are (Σ w)² and must stay
    // inside BIGINT under ANSI — at 1e4 a document may carry ~76k
    // tokens before the 16-term dot can overflow, far beyond any
    // chunked-ingest page; parity is unaffected (both engines consume
    // the SAME integers, scaling only sets fidelity to the float model)
    val tv = spark.createDataFrame(java.util.Arrays.asList(
      (1 until vocab).map(id => Row.fromSeq(id.toLong +:
        (0 until d).map(k => math.round(tt(id)(k).toDouble * 1e4)))): _*),
      schema)
    val sums = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("tok"))
      .select(col("doc_id"),
        (pmod(graft.functions.TextFunctions.md5Long(col("tok")),
          lit((vocab - 1).toLong)) + lit(1L)).as("tok_id"))
      .join(broadcast(tv), "tok_id")
      .groupBy("doc_id")
      .agg(sum(col("w0")).as("s0"),
        (1 until d).map(k => sum(col(s"w$k")).as(s"s$k")): _*)
      // TWO consumers (the a-side and b-side joins) — without the
      // checkpoint the corpus scan + explode + 16-col agg runs twice
      .graftCheckpoint(false)
    def pref(p: String) = sums.select(col("doc_id") +:
      (0 until d).map(k => col(s"s$k").as(s"$p$k")): _*)
    def dot(x: String, y: String) =
      (0 until d).map(k => col(s"$x$k") * col(s"$y$k")).reduce(_ + _)
    pairs
      .join(pref("x").withColumnRenamed("doc_id", "a"), "a")
      .join(pref("y").withColumnRenamed("doc_id", "b"), "b")
      .select(col("a"), col("b"),
        round(dot("x", "y").cast("double") /
          (sqrt(dot("x", "x").cast("double")) *
            sqrt(dot("y", "y").cast("double"))), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Pooled single-vector embedding (mean of contextual states, L2) —
    * the [[Embedder]] face, so the trained encoder rides BatchEmbed
    * like every other leg of the seam. */
  def embed(text: String): Array[Float] = {
    val states = contextualStates(text)
    if (states.isEmpty) return new Array[Float](dim)
    val d = states(0).length
    val pooled = Array.tabulate(d) { j =>
      var s = 0.0; var i = 0
      while (i < states.length) { s += states(i)(j); i += 1 }
      (s / states.length).toFloat
    }
    l2(pooled)
  }
}

object ColbertEncoder {
  /** The committed trained fixture (see [[TinyEncoderTrain]] — the
    * spec pins byte-identical retraining). */
  lazy val trained: ColbertEncoder = {
    val in = getClass.getResourceAsStream("/graft/tiny_encoder.onnx")
    require(in != null, "fixture /graft/tiny_encoder.onnx missing")
    val bytes = in.readAllBytes()
    in.close()
    ColbertEncoder(bytes, TinyEncoderTrain.V)
  }
}

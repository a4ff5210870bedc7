package graft.embed

/** In-repo training of a REAL (small) transformer encoder — the
  * zero-egress answer to the reference's pretrained bge-m3 embeddings
  * (`backend/process/parsing.py:49`): we cannot download weights, but
  * we can LEARN them. A 2-layer single-head encoder (vocab 64, d 16,
  * FFN 32; embedding Gather → scaled-dot attention → residual +
  * LayerNorm → GELU FFN → residual + LayerNorm, exactly the graph
  * [[OnnxWrite.encoderModel]] serializes and [[Onnx.run]] executes) is
  * trained by ANALYTIC BACKPROPAGATION — softmax-attention, LayerNorm,
  * GELU and L2-normalization gradients all derived by hand and pinned
  * against central finite differences in TinyEncoderTrainSpec — with
  * plain SGD on a ColBERT-style MaxSim contrastive objective
  * (Khattab & Zaharia, SIGIR'20: late interaction
  * `s(q,D) = mean_j max_i  q̂_j · d̂_i`):
  *
  *   - query tower: the full sequence through the encoder → per-token
  *     CONTEXTUAL states, each L2-normalized;
  *   - document tower: each token id through the SAME encoder with
  *     L = 1 → a context-free token table (what makes the deployment
  *     SQL-oracle-able: 63 rows of constants);
  *   - triplet hinge loss on themed synthetic text, tokenized with the
  *     repo's cross-engine id map `Md5HashingTF.bucket(tok, 63) + 1`
  *     (the SQL twin is `md5Long(tok) % 63 + 1`).
  *
  * The math lives in [[EncoderCore]] (dimension-parameterized — the
  * corpus-trained d-32 encoder, [[CorpusEncoderTrain]], instantiates
  * the same hand-derived backprop). Everything is seeded and
  * sequential: training is bit-deterministic (JEP 306 — all JVM float
  * math is strictfp since Java 17), so the committed fixture
  * `src/main/resources/graft/tiny_encoder.onnx` is reproducible
  * byte-for-byte by [[main]] and pinned so in the spec.
  */
object TinyEncoderTrain {

  val V = 64      // vocab: id 0 reserved, ids 1..63 live
  val D = 16      // model width
  val F = 32      // FFN hidden width
  val NLayers = 2
  val Margin = 0.2
  val Steps = 6000
  val Seed = 20260816L

  val core = new EncoderCore(V, D, F, NLayers)

  type M = EncoderCore.M
  type LW = EncoderCore.LW
  type W = EncoderCore.W
  type LC = EncoderCore.LC
  type Triple = EncoderCore.Triple
  val Triple = EncoderCore.Triple

  def forward(ids: Array[Int], w: W): (M, M, Array[LC]) =
    core.forward(ids, w)
  def towerBwd(dyhat: M, yraw: M, ids: Array[Int], caches: Array[LC],
      w: W, g: W): Unit = core.towerBwd(dyhat, yraw, ids, caches, w, g)
  def maxsim(qh: M, dh: M): (Double, Array[Int]) = core.maxsim(qh, dh)
  def lossAndGrad(w: W, t: Triple, margin: Double, g: W): Double =
    core.lossAndGrad(w, t, margin, g)
  def lossOnly(w: W, t: Triple, margin: Double): Double =
    core.lossOnly(w, t, margin)
  def initWeights(seed: Long): W = core.initWeights(seed)
  def zeroLike(w: W): W = core.zeroLike(w)

  // ------------------------------------------------------------ corpus
  /** Themed word lists — the deterministic synthetic corpus. The model
    * learns bucket-level co-occurrence (words hash into 63 ids). */
  val Themes: Seq[Seq[String]] = Seq(
    Seq("filter", "pushdown", "partition", "shuffle", "broadcast",
      "catalyst", "parquet", "executor"),
    Seq("whale", "coral", "tide", "reef", "shark", "wave", "salt",
      "kelp"),
    Seq("guitar", "melody", "rhythm", "chord", "drum", "tempo",
      "violin", "song"),
    Seq("bread", "cheese", "butter", "garlic", "onion", "pepper",
      "olive", "tomato"),
    Seq("orbit", "rocket", "comet", "nebula", "galaxy", "lunar",
      "astronaut", "telescope"),
    Seq("goal", "referee", "stadium", "tackle", "sprint", "medal",
      "coach", "league"),
    Seq("court", "judge", "verdict", "statute", "appeal", "contract",
      "clause", "plaintiff"),
    Seq("pine", "moss", "fern", "timber", "owl", "cedar", "bark",
      "grove"))

  /** The repo's cross-engine token-id map: md5-bucket + 1 ∈ [1, 63].
    * SQL twin: `(md5Long(tok) % 63) + 1`. */
  def tokenId(tok: String): Int = Md5HashingTF.bucket(tok, V - 1) + 1

  def tokenIds(text: String): Array[Int] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(tokenId)

  private def sampleIds(rng: java.util.Random, theme: Seq[String],
      n: Int): Array[Int] =
    Array.fill(n)(tokenId(theme(rng.nextInt(theme.length))))

  def sampleTriple(rng: java.util.Random): Triple = {
    val t = rng.nextInt(Themes.length)
    var u = rng.nextInt(Themes.length)
    while (u == t) u = rng.nextInt(Themes.length)
    Triple(
      q = sampleIds(rng, Themes(t), 3 + rng.nextInt(3)),
      pos = sampleIds(rng, Themes(t), 4 + rng.nextInt(4)),
      neg = sampleIds(rng, Themes(u), 4 + rng.nextInt(4)))
  }

  // ----------------------------------------------------------- training
  /** Deterministic end-to-end training run. */
  def train(seed: Long = Seed, steps: Int = Steps): W = {
    val w = core.initWeights(seed)
    val rng = new java.util.Random(seed + 1)
    var step = 0
    while (step < steps) {
      val t = sampleTriple(rng)
      val g = core.zeroLike(w)
      val loss = core.lossAndGrad(w, t, Margin, g)
      if (loss > 0.0) core.sgd(w, g, lr = 0.05 * (1.0 - step.toDouble / steps))
      step += 1
    }
    w
  }

  // ------------------------------------------------------------- export
  def toEncoderW(w: W): OnnxWrite.EncoderW = core.toEncoderW(w)

  def trainedModelBytes(): Array[Byte] =
    OnnxWrite.encoderModel(toEncoderW(train()))

  /** Regenerates the committed fixture:
    * `runMain graft.embed.TinyEncoderTrain <outPath>`. */
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0)
      else "src/main/resources/graft/tiny_encoder.onnx"
    val bytes = trainedModelBytes()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(out), bytes)
    println(s"wrote ${bytes.length} bytes to $out")
  }
}

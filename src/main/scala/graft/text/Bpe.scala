package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer: distributed TRAINING (the iterative
  * merge-learning pass over the corpus) and per-partition APPLY (encode
  * text with a learned merge table) — the real sub-word tokenizer the
  * `bpeishTokenCount` budget proxy stands in for.
  *
  * Training is the textbook algorithm (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"),
  * re-shaped for Spark:
  *  - The working set is the WORD-FREQUENCY table, not the corpus: one
  *    corpus pass builds `(word, freq)` (vocabulary-scale — millions of
  *    rows at 100 TB, not billions), and every training iteration runs
  *    over it alone.
  *  - One iteration = one partial-agg-friendly groupBy: explode each
  *    word's adjacent symbol pairs weighted by freq, sum, take the
  *    global best — a single metadata-scale row crosses to the driver
  *    per iteration (the merge to learn). The merge is applied to the
  *    symbol arrays with pure array algebra (an index fold — no UDF),
  *    and the loop continues on the updated table.
  *  - Determinism: ties on count break lexicographically on the pair.
  *
  * APPLY broadcasts the learned merge ranks and encodes per partition
  * with the standard greedy lowest-rank-first loop — per-row imperative
  * logic over a ~dozen-symbol word, the documented `mapPartitions`
  * slot (a 200-deep nested column expression would defeat codegen).
  *
  * Training is NOT SQL-expressible (an iterative fixpoint over its own
  * output), so unlike the engine's other text operators this one is
  * pinned by hand-computed specs rather than a DuckDB oracle.
  */
object Bpe {

  /** End-of-word marker: its own initial symbol, so merges can learn
    * word-final units ("ing</w>") distinct from word-internal ones. */
  val EndOfWord = "</w>"

  /** A learned model: ordered merges, highest priority first. */
  final case class Model(merges: Seq[(String, String)]) {
    /** pair -> rank (lower merges first), for the greedy apply loop. */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Encode one word (no marker) to its BPE symbols. */
    def encodeWord(word: String): Seq[String] = {
      var syms = word.map(_.toString) :+ EndOfWord
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var at = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) done = true
        else syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++
          syms.drop(at + 2)
        if (syms.length < 2) done = true
      }
      syms
    }
  }

  /** Persist a trained model in the standard merges.txt shape (one
    * "left right" pair per line, priority order — the GPT-2/BPE-paper
    * interchange format). The model is tokenizer METADATA (kBs): it
    * ships to executors by broadcast and to other systems as this file.
    * Symbols never contain whitespace (words are split on non-alnum and
    * `</w>` is the only marker), so the space separator is unambiguous. */
  def save(model: Model, path: String): Unit = {
    val lines = model.merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      String.join("\n", lines: _*).getBytes("UTF-8"))
  }

  /** Load a model written by [[save]] (or any merges.txt). */
  def load(path: String): Model = {
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
    Model(lines.map { l =>
      val i = l.indexOf(' ')
      require(i > 0 && i < l.length - 1, s"malformed merges line: '$l'")
      (l.substring(0, i), l.substring(i + 1))
    })
  }

  /** Initial symbol array for a word column: characters + [[EndOfWord]].
    * Explicit per-index substrings — `split(word, "")` is Java
    * `split("", -1)`, which appends a trailing empty string. */
  private def initialSymbols(word: org.apache.spark.sql.Column) =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** Replace every adjacent (a, b) in `syms` by the merged symbol,
    * left-to-right non-overlapping — pure array algebra: an index fold
    * where the accumulator carries (output-so-far, skip-next flag). */
  private def applyMerge(syms: org.apache.spark.sql.Column,
      a: String, b: String) = {
    val merged = a + b
    val acc0 = struct(
      typedLit(Array.empty[String]).as("out"), lit(false).as("skip"))
    aggregate(
      sequence(lit(1), size(syms)), acc0,
      (acc, i) => {
        val cur  = element_at(syms, i)
        // try_: ANSI mode (Spark 4 default) makes plain element_at THROW
        // past the end; the lookahead at the last index must be null
        val next = try_element_at(syms, i + 1)
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
          .when(cur === a && next === b,
            struct(concat(acc.getField("out"), array(lit(merged))).as("out"),
              lit(true).as("skip")))
          .otherwise(
            struct(concat(acc.getField("out"), array(cur)).as("out"),
              lit(false).as("skip")))
      },
      acc => acc.getField("out"))
  }

  /** Learn `numMerges` merges from the corpus. Stops early when no pair
    * reaches `minPairCount`.
    *
    * The merge loop is driver-coordinated by nature (one global argmax
    * per merge — standard BPE), so each merge costs a pass over the
    * VOCABULARY table. At corpus scale the vocabulary converges long
    * before the corpus is exhausted, which is why production tokenizers
    * train on a sample: `sampleRate < 1` keeps a deterministic
    * content-hash sample of the documents (md5 of the text — stable
    * across runs/engines/partitionings, no id column needed) before the
    * single corpus pass. `sampleRate = 1.0` (default) is exact training;
    * `minPairCount` applies to the sampled counts. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, sampleRate: Double = 1.0): Model = {
    require(sampleRate > 0 && sampleRate <= 1.0,
      s"sampleRate must be in (0, 1], got $sampleRate")
    val spark = docs.sparkSession
    val corpus =
      if (sampleRate >= 1.0) docs
      else docs.filter(
        pmod(TextFunctions.md5Long(col(textCol)), lit(1000000L))
          < lit((sampleRate * 1000000).toLong))
    // ONE corpus pass; everything after runs on the vocabulary table
    var words = corpus
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .persist()
    words.count()

    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      // adjacent pairs weighted by word freq; ONE row to the driver
      val best = words
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      best.headOption.filter(_.getLong(2) >= minPairCount) match {
        case None => exhausted = true
        case Some(r: Row) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          learned += 1
          // localCheckpoint, not persist: the applyMerge fold is a deep
          // nested expression, and persist keeps the LOGICAL plan — after
          // N merges Catalyst would re-analyze an N-deep fold tower per
          // iteration (measured: the driver, not the executors, dominates
          // a few hundred merges). Checkpointing truncates the plan to
          // the materialized vocabulary table, keeping each iteration's
          // analysis O(1). The table is vocabulary-scale and regenerable
          // from the corpus pass, so the reliability note on
          // localCheckpoint does not apply at this size.
          val next = words
            .select(applyMerge(col("syms"), a, b).as("syms"), col("freq"))
            .localCheckpoint(true)
          // Retire the previous generation's storage NOW, not at GC:
          // unpersist() covers the persisted gen-0 corpus table but is a
          // NO-OP for checkpoint blocks (the cache manager never tracked
          // them), so later generations also need Ckpt.free — which drops
          // the root LogicalRDD's blocks directly (root-matched: on the
          // persist-managed gen-0, and on any upstream checkpoint inside
          // the CALLER's docs lineage, it is deliberately a no-op).
          // Safe: `next` is already eagerly materialized, nothing reads
          // `words` again.
          words.unpersist()
          graft.operators.Ckpt.free(words)
          words = next
      }
    }
    words.unpersist()
    graft.operators.Ckpt.free(words)
    Model(merges.result())
  }

  /** Encode a text column: `outCol` holds the BPE symbols of every
    * token in order (flat — token boundaries are the `</w>` markers).
    * The model's ranks broadcast once; encoding is per-partition. */
  def encode(df: DataFrame, textCol: String, model: Model,
      outCol: String = "bpe_tokens"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val schema = df.schema.add(StructField(outCol,
      ArrayType(StringType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val m = bc.value
      m.ranks // force the lazy map once per partition, not per row
      rows.map { r =>
        val text = r.getString(textIdx)
        val toks =
          if (text == null) Array.empty[String]
          else text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        Row.fromSeq(r.toSeq :+ toks.flatMap(m.encodeWord).toSeq)
      }
    }(enc)
  }

  /** Sub-word token count under the model — the budget the `bpeish`
    * proxy approximates. */
  def tokenCount(df: DataFrame, textCol: String, model: Model,
      outCol: String = "n_bpe"): DataFrame =
    encode(df, textCol, model, "__bpe_syms")
      .withColumn(outCol, size(col("__bpe_syms")).cast("long"))
      .drop("__bpe_syms")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Johnson–Lindenstrauss random projection with a HASH-DERIVED sign
  * matrix (Achlioptas 2003: ±1 entries preserve pairwise distances in
  * expectation just like Gaussians): p_j = (1/√k) Σ_i x_i · s(i, j),
  * s(i, j) = ±1 from the parity of the first md5 nibble of "i_j".
  * Deriving R from a hash instead of an RNG makes the projection a
  * pure function of (i, j) — reproducible across engines, sessions
  * and cluster sizes with no seed state to ship (the same discipline
  * as the repo's hash-based samplers).
  *
  * Scale shape: the sign matrix is (inDim × outDim) METADATA — built
  * once, broadcast; the projection itself is one posexplode +
  * broadcast-join + partial-agg groupBy, fully distributed. Each
  * product rounds to 9 dp and sums in DECIMAL, so the per-cell
  * reduction is associativity-free (engine-exact in any partitioning).
  * This is the training-free dimension-reduction path that pairs with
  * PCA (q201): no fit pass, no centering — the right tool when the
  * corpus is too big to want a second scan before reducing.
  */
object Projection {

  /** Sign-matrix relation (i, j, s) for `inDim` → `outDim`. */
  def signMatrix(df: DataFrame, inDim: Int, outDim: Int): DataFrame = {
    val s = df.sparkSession
    s.range(inDim).select(col("id").as("i"))
      .crossJoin(s.range(outDim).select(col("id").as("j")))
      .withColumn("s",
        when(substring(md5(concat(col("i"), lit("_"), col("j"))), 1, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), lit(1.0))
          .otherwise(lit(-1.0)))
  }

  /** Project `vecCol` (Array[Float], length `inDim`) down to `outDim`
    * components. Returns (idCol, j, p) — one row per output
    * component, p rounded to 6 dp. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    val signs = signMatrix(df, inDim, outDim)
    val terms = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .join(broadcast(signs), "i")
      .select(col(idCol), col("j"),
        round(col("x").cast("double") * col("s"), 9)
          .cast(DecimalType(28, 9)).as("t"))
    terms.groupBy(idCol, "j")
      .agg(round(sum(col("t")).cast("double") / math.sqrt(outDim.toDouble), 6)
        .as("p"))
  }
}

package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mutual information between two categorical columns — the
  * dependence audit behind feature selection ("does source leak
  * language?") and stratification design. One corpus pass builds the
  * contingency cells; every log runs on the metadata-sized cell grid
  * (|C1|·|C2| rows), so the expensive scan is a plain partial-agg
  * groupBy and the float work is bounded by category cardinality. */
object Dependence {

  /** MI (nats), marginal entropies and normalized MI
    * = MI/sqrt(H1·H2): one row (n, mi, h1, h2, nmi), rounded 6.
    * NMI is 0-guarded: a constant column has H=0 and carries no
    * information, so nmi is 0 rather than a division blow-up. */
  def mutualInformation(df: DataFrame, c1: String, c2: String)
      : DataFrame = {
    // the cell grid feeds FOUR consumers (marginals, total, MI sum) —
    // materialize the metadata-sized frame once so the corpus groupBy
    // isn't re-scanned per consumer (the Triangles/Association pattern)
    val cells = df.groupBy(col(c1).as("a"), col(c2).as("b"))
      .agg(count(lit(1)).as("nab")).graftCheckpoint(true)
    val ma = cells.groupBy("a").agg(sum("nab").as("na"))
    val mb = cells.groupBy("b").agg(sum("nab").as("nb"))
    val n = cells.agg(sum("nab").as("n"))
    val joined = cells
      .join(broadcast(ma), "a").join(broadcast(mb), "b")
      .join(broadcast(n))
    val nn = col("n").cast("double")
    val mi = joined.agg(
      max(col("n")).as("nTot"),
      sum((col("nab").cast("double") / nn)
        * log(nn * col("nab").cast("double")
          / (col("na").cast("double") * col("nb").cast("double"))))
        .as("mi"))
    val h1 = ma.join(broadcast(n))
      .agg(sum(lit(-1.0) * (col("na").cast("double") / nn)
        * log(col("na").cast("double") / nn)).as("h1"))
    val h2 = mb.join(broadcast(n))
      .agg(sum(lit(-1.0) * (col("nb").cast("double") / nn)
        * log(col("nb").cast("double") / nn)).as("h2"))
    mi.join(broadcast(h1)).join(broadcast(h2))
      .select(col("nTot").cast("long").as("n"),
        round(col("mi"), 6).as("mi"),
        round(col("h1"), 6).as("h1"),
        round(col("h2"), 6).as("h2"),
        round(when(col("h1") <= 0.0 || col("h2") <= 0.0, 0.0)
          .otherwise(col("mi") / sqrt(col("h1") * col("h2"))), 6)
          .as("nmi"))
  }

  /** Pearson χ² test of independence + Cramér's V — the classical
    * hypothesis-test companion to [[mutualInformation]]. Same scale
    * shape: one partial-agg scan to the contingency cells, float work
    * on the metadata grid. Per-cell (O−E)²/E terms round to 9 dp and
    * sum in DECIMAL, so the statistic is order-free on both engines.
    * Returns one row (n, dof, chi2, cramers_v); dof 0 (a degenerate
    * 1×k table) yields null V rather than a division blow-up. */
  def chi2(df: DataFrame, c1: String, c2: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df.groupBy(col(c1).as("a"), col(c2).as("b"))
      .agg(count(lit(1)).as("nab")).graftCheckpoint(true)
    val ma = cells.groupBy("a").agg(sum("nab").as("na"))
    val mb = cells.groupBy("b").agg(sum("nab").as("nb"))
    val tot = broadcast(ma.agg(sum("na").as("n"),
        count(lit(1)).as("ka"))
      .crossJoin(mb.agg(count(lit(1)).as("kb"))))
    // every (a, b) cell including empty ones: χ² charges E for zeros
    val grid = ma.crossJoin(broadcast(mb))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("nab"), lit(0L)))
    val e = col("na").cast("double") * col("nb").cast("double") /
      col("n").cast("double")
    val stat = grid.crossJoin(tot)
      .select(col("n"), col("ka"), col("kb"),
        round((col("o").cast("double") - e) * (col("o").cast("double") - e)
          / e, 9).cast(DecimalType(28, 9)).as("t"))
      .groupBy("n", "ka", "kb").agg(sum(col("t")).cast("double").as("x2"))
    val dof = (col("ka") - 1) * (col("kb") - 1)
    stat.select(col("n").cast("long").as("n"),
      dof.cast("long").as("dof"),
      round(col("x2"), 6).as("chi2"),
      when(dof === 0, lit(null).cast("double"))
        .otherwise(round(sqrt(col("x2") / (col("n").cast("double")
          * least(col("ka") - 1, col("kb") - 1).cast("double"))), 6))
        .as("cramers_v"))
  }

  /** Cochran–Armitage trend test (1954/1955) — [[chi2]]'s ORDERED
    * companion for a binary outcome across ordinal dose levels: is
    * success probability monotonically associated with the dose
    * score? With per-dose totals nᵢ and successes rᵢ (scores tᵢ = the
    * dose value), T = Σtᵢrᵢ − R·Σtᵢnᵢ/N and
    * Var(T) = (R/N)(1−R/N)·(Σtᵢ²nᵢ − (Σtᵢnᵢ)²/N); clearing
    * denominators gives
    *
    *   z = (N·Σtr − R·Σtn) · √N / √(R·(N−R)·(N·Σt²n − (Σtn)²))
    *
    * where every radicand/numerator factor is an exact DECIMAL(38,0)
    * integer from ONE partial-agg scan to the dose grid — the float
    * work is two square roots and a division on a 1-row frame,
    * token-identical in both engines and +0.0-normalized. Degenerate
    * inputs (one dose level, all/no successes) yield a null z.
    * Returns one row (k, n, r, z). */
  def cochranArmitage(df: DataFrame, doseCol: String,
      successCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(col(doseCol).cast("long").as("t"),
        successCol.cast("boolean").as("x"))
      .groupBy("t").agg(count(lit(1)).as("ni"),
        sum(when(col("x"), 1L).otherwise(0L)).as("ri"))
    cells.agg(count(lit(1)).as("k"),
        sum(col("ni")).cast(dec).as("n"),
        sum(col("ri")).cast(dec).as("r"),
        sum(col("t").cast(dec) * col("ni")).as("stn"),
        sum(col("t").cast(dec) * col("ri")).as("str"),
        sum(col("t").cast(dec) * col("t") * col("ni")).as("st2n"))
      .select(col("k"), col("n").cast("long").as("n"),
        col("r").cast("long").as("r"),
        when(col("k") < 2 || col("r") === 0 || col("r") === col("n")
            || expr("n * st2n - stn * stn") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            expr("n * str - r * stn").cast("double")
              * sqrt(col("n").cast("double"))
              / sqrt(expr("r * (n - r) * (n * st2n - stn * stn)")
                .cast("double")), 6) + lit(0.0)).as("z"))
  }

  /** Kendall's τ-b (tie-corrected) between two LOW-CARDINALITY ordinal
    * columns — the concordance companion to [[Ranks.spearman]]: of all
    * row pairs, how many order the same way on both axes? The corpus
    * pass is ONE groupBy to the joint (x, y) value grid; concordant /
    * discordant pair counts come from a grid×grid self-join
    * (|grid|² cell pairs — metadata-sized for discretized inputs, the
    * documented precondition; corpus-scale-distinct values belong in
    * [[Ranks.spearman]]). All pair counting is exact integer
    * arithmetic (C, D, and tie pairs stay < 2^63 up to ~10⁹ rows);
    * only τ's final ratio is float. Returns one row (n, nc, nd, tau_b). */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .agg(count(lit(1)).as("c")).graftCheckpoint(true)
    val pairs = cells.select(col("x").as("x1"), col("y").as("y1"),
        col("c").as("c1"))
      .join(cells.select(col("x").as("x2"), col("y").as("y2"),
        col("c").as("c2")), col("x1") < col("x2"))
      .agg(
        sum(when(col("y1") < col("y2"), col("c1") * col("c2"))
          .otherwise(0L)).as("nc"),
        sum(when(col("y1") > col("y2"), col("c1") * col("c2"))
          .otherwise(0L)).as("nd"))
    val tx = cells.groupBy("x").agg(sum("c").as("t"))
      .agg(sum(col("t") * (col("t") - 1L) / 2L).as("n1"))
    val ty = cells.groupBy("y").agg(sum("c").as("t"))
      .agg(sum(col("t") * (col("t") - 1L) / 2L).as("n2"))
    val n = cells.agg(sum("c").as("n"))
    pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(n))
      .select(col("n"), col("nc"), col("nd"),
        round((col("nc") - col("nd")).cast("double")
          / sqrt((col("n").cast("double") * (col("n").cast("double") - 1.0)
              / 2.0 - col("n1").cast("double"))
            * (col("n").cast("double") * (col("n").cast("double") - 1.0)
              / 2.0 - col("n2").cast("double"))), 6).as("tau_b"))
  }

  /** Per-entity category-entropy distribution: for each `entityCol`
    * (user, session, source…) the Shannon entropy of its `catCol`
    * histogram, summarized as mean + exact quartiles — the behavioral-
    * diversity profile ("do users do one thing or many?") that powers
    * bot screening and stratification design. Each entity's entropy is
    * a 9-dp-rounded DECIMAL term sum (order-free); the distribution
    * summary reuses the exact quantile grid. Returns one row
    * (n_entities, mean_entropy, p25, p50, p75). */
  def entropyProfile(df: DataFrame, entityCol: String, catCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df.groupBy(col(entityCol).as("u"), col(catCol).as("c"))
      .agg(count(lit(1)).as("nc"))
    val tot = cells.groupBy("u").agg(sum("nc").as("nu"))
    val ent = cells.join(tot, "u") // entity-keyed join, partial-agg both sides
      .select(col("u"),
        round(lit(-1.0) * (col("nc").cast("double") / col("nu").cast("double"))
          * log(col("nc").cast("double") / col("nu").cast("double")), 9)
          .cast(DecimalType(28, 9)).as("t"))
      .groupBy("u").agg(sum(col("t")).as("hd"))
      .select(col("u"), col("hd"), col("hd").cast("double").as("h"))
      .graftCheckpoint(true) // feeds mean + quantile legs
    val qs = Ranks.quantileDisc(ent.withColumn("g", lit("all")), "g", "h",
      Seq(0.25, 0.5, 0.75))
      .groupBy()
      .agg(max(when(col("p") === 0.25, col("value"))).as("p25"),
        max(when(col("p") === 0.5, col("value"))).as("p50"),
        max(when(col("p") === 0.75, col("value"))).as("p75"))
    ent.agg(count(lit(1)).as("n_entities"),
        sum(col("hd")).cast("double").as("sh"))
      .crossJoin(broadcast(qs))
      .select(col("n_entities"),
        round(col("sh") / col("n_entities").cast("double"), 6)
          .as("mean_entropy"),
        round(col("p25"), 6).as("p25"), round(col("p50"), 6).as("p50"),
        round(col("p75"), 6).as("p75"))
  }
}

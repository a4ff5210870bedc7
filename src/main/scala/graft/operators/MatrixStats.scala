package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ES `matrix_stats` parity: pairwise covariance/correlation over a
  * fixed set of numeric columns in ONE aggregation pass — n, Σx per
  * column and Σxy per pair are plain codegen'd sums (for k columns
  * that is k + k(k+1)/2 aggregates, all partial-aggregated map-side),
  * and the pair matrix is reconstructed from the single moments row.
  * Never a per-pair scan, never a posexplode fan-out: the fact scan
  * is read once whether k is 2 or 20 (columns are a fixed schema set,
  * unlike the q201 embedding case whose dimensions needed the typed
  * aggregate).
  *
  * Fixture money columns are 2-dp decimals, so every moment rides
  * DECIMAL and is engine-exact; the covariance/correlation arithmetic
  * on top is identical IEEE double math in any engine. */
object MatrixStats {

  /** (a, b, cov, corr) for every unordered column pair a ≤ b,
    * population covariance, rounded to 6. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, "need at least two columns")
    require(cols == cols.sorted, "pass columns sorted for a stable output")
    def d(c: String): Column = col(c).cast(DecimalType(18, 4))
    val pairs = for { i <- cols.indices; j <- i until cols.length }
      yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).cast("double").as("n")) ++
      cols.map(c => sum(d(c)).cast("double").as(s"s_$c")) ++
      pairs.map { case (a, b) =>
        sum((d(a) * d(b)).cast(DecimalType(38, 8))).cast("double")
          .as(s"s_${a}_$b")
      }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("n")
      val cov = col(s"s_${a}_$b") / n - (col(s"s_$a") / n) * (col(s"s_$b") / n)
      def variance(c: String): Column =
        col(s"s_${c}_$c") / n - (col(s"s_$c") / n) * (col(s"s_$c") / n)
      struct(lit(a).as("a"), lit(b).as("b"),
        round(cov, 6).as("cov"),
        round(cov / sqrt(variance(a) * variance(b)), 6).as("corr"))
    }
    m.select(explode(array(rows: _*)).as("p"))
      .select(col("p.a"), col("p.b"), col("p.cov"), col("p.corr"))
      .orderBy("a", "b")
  }

  /** First-order partial correlation — the [[correlationMatrix]]
    * follow-up question: how much of r(x,y) survives once z is held
    * fixed?  r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)) —
    * the confounder screen (a raw price↔anything correlation mostly
    * relays quantity; the partial strips it). Same ONE-pass decimal
    * moment discipline as the matrix: 3 + 6 exact sums, all the float
    * work on the single moments row, token-identical in both engines
    * and +0.0-normalized. Perfect collinearity with z (either
    * 1−r² ≤ 0) reports null. Returns (n, r_xy, r_xy_given_z). */
  def partialCorrelation(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    val cs = Seq(xCol, yCol, zCol)
    require(cs.distinct.length == 3, "three distinct columns")
    def d(c: String): Column = col(c).cast(DecimalType(18, 4))
    val pairs = for { i <- cs.indices; j <- i until cs.length }
      yield (cs(i), cs(j))
    val aggs =
      Seq(count(lit(1)).cast("double").as("n")) ++
      cs.map(c => sum(d(c)).cast("double").as(s"s_$c")) ++
      pairs.map { case (a, b) =>
        sum((d(a) * d(b)).cast(DecimalType(38, 8))).cast("double")
          .as(s"s_${a}_$b")
      }
    val m = df.agg(aggs.head, aggs.tail: _*)
    def sab(a: String, b: String): Column =
      if (cs.indexOf(a) <= cs.indexOf(b)) col(s"s_${a}_$b")
      else col(s"s_${b}_$a")
    def cov(a: String, b: String): Column =
      sab(a, b) / col("n") -
        (col(s"s_$a") / col("n")) * (col(s"s_$b") / col("n"))
    def r(a: String, b: String): Column =
      cov(a, b) / sqrt(cov(a, a) * cov(b, b))
    val den = (lit(1.0) - r(xCol, zCol) * r(xCol, zCol)) *
      (lit(1.0) - r(yCol, zCol) * r(yCol, zCol))
    // a zero variance means the r's divide by zero: DuckDB's float
    // division nulls through, ANSI Spark would throw — guard FIRST
    // (CaseWhen evaluates branches lazily, so den never runs there)
    val degenerate = cov(xCol, xCol) <= 0.0 || cov(yCol, yCol) <= 0.0 ||
      cov(zCol, zCol) <= 0.0
    m.select(col("n").cast("long").as("n"),
      when(cov(xCol, xCol) <= 0.0 || cov(yCol, yCol) <= 0.0,
        lit(null).cast("double"))
        .otherwise(round(r(xCol, yCol), 6)).as("r_xy"),
      when(degenerate || col("n") < 2, lit(null).cast("double"))
        .when(den <= 0.0, lit(null).cast("double"))
        .otherwise(round(
          (r(xCol, yCol) - r(xCol, zCol) * r(yCol, zCol)) / sqrt(den),
          6) + lit(0.0)).as("r_xy_given_z"))
  }
}

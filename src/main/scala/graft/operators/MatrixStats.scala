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
}

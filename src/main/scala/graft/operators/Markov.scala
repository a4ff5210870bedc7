package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-entity event
  * sequences — the behavioral model behind next-event prediction,
  * anomalous-session scoring and funnel leak analysis.
  *
  * Scale shape: the only window partitions by the ENTITY key (user) —
  * high cardinality, so each task sorts one user's short sequence,
  * never a corpus column. The (from, to) matrix is state² ≤ metadata-
  * sized; probabilities are integer ppm (n·10⁶ div n_from) so rows are
  * engine-exact with no float division in the aggregate. */
object Markov {

  /** Transition counts and row-normalized probabilities:
    * (from_state, to_state, n, p_ppm), terminal events (no successor)
    * excluded. `idCol` breaks ts ties deterministically. */
  def transitions(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(idCol))
    val pairs = df
      .select(col(entityCol), col(tsCol), col(idCol),
        col(stateCol).as("from_state"))
      .withColumn("to_state", lead("from_state", 1).over(w))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy("from_state") // state-cardinality grid
    counts
      .withColumn("__tot", sum("n").over(wRow))
      .withColumn("p_ppm", expr("(n * 1000000) div __tot"))
      .drop("__tot")
  }
}

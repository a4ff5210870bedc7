package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-armed-bandit allocation scoring — the serving-side consumer
  * of the experimentation ladder ([[AbTest]], [[Resample]]): given a
  * reward log, score each arm with UCB1 (Auer et al. 2002):
  * ucb(a) = x̄_a + √(2 ln N / n_a). The arm argmax is the next pull; a
  * batch engine recomputes scores per window and ships them to the
  * server (this is how bandit layers actually run at scale — scoring
  * is batch, pulling is online).
  *
  * One partial-agg scan to (arm, n, Σreward) with decimal reward sums;
  * UCB1's float ops run per-arm on the metadata frame in one fixed
  * expression. Rewards must lie in [0, 1] per UCB1's regret bound —
  * pass a normalizing `reward` expression; rows with null reward are
  * ignored (impressions without an outcome). */
object Bandit {

  /** UCB1 scores per arm: (arm, n, mean_reward, ucb1), ordered by
    * descending score (the top row is the pull). */
  def ucb1(df: DataFrame, armCol: String, reward: Column): DataFrame = {
    val cells = df
      .select(col(armCol).cast("string").as("arm"),
        reward.cast(DecimalType(18, 6)).as("__r"))
      .filter(col("__r").isNotNull)
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("__r")).as("__s"))
    val tot = broadcast(cells.agg(sum(col("n")).as("bigN")))
    cells.crossJoin(tot)
      .select(col("arm"), col("n"),
        round(col("__s").cast("double") / col("n").cast("double"), 6)
          .as("mean_reward"),
        round(col("__s").cast("double") / col("n").cast("double")
          + sqrt(lit(2.0) * log(col("bigN").cast("double"))
            / col("n").cast("double")), 6).as("ucb1"))
      .orderBy(col("ucb1").desc, col("arm"))
  }
}

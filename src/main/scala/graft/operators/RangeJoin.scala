package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join: match right rows whose time falls inside a per-left-row
  * interval `[start, end)` sharing an equality key. A naive non-equi
  * join degenerates to BroadcastNestedLoopJoin (O(n·m)); the scalable
  * shape is interval bucketization:
  *   1. left rows replicate once per time bucket their interval overlaps
  *      (intervals are bounded, so fan-out = interval/bucket, a constant);
  *   2. right rows land in exactly one bucket;
  *   3. equality join on (key, bucket) — hash-partitioned, skew-free as
  *      long as bucket width tracks interval width;
  *   4. residual filter applies the exact bounds.
  */
object RangeJoin {

  /** @param bucketSeconds bucket width; pick ≈ the typical interval
    *                      length so each left row replicates O(1) times. */
  def byTime(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String, rightTime: String,
      bucketSeconds: Long): DataFrame = {
    val b = lit(bucketSeconds)
    val lo = (unix_timestamp(col(startCol)) / b).cast("long")
    val hi = (unix_timestamp(col(endCol) - expr("INTERVAL 1 MICROSECOND")) / b)
      .cast("long")
    val leftB = left.withColumn("__bucket",
      explode(sequence(least(lo, hi), greatest(lo, hi))))
    val rightB = right.withColumn("__bucket",
      (unix_timestamp(col(rightTime)) / b).cast("long"))
    leftB.join(rightB, keyCols :+ "__bucket")
      .filter(col(rightTime) >= col(startCol) &&
        col(rightTime) < col(endCol))
      .drop("__bucket")
  }
}

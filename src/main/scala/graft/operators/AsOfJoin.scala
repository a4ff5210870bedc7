package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same key
  * and `rightTime <= leftTime` (the "what was the state when X happened"
  * join — trade enrichment, feature backfill, slowly-changing lookups).
  *
  * Spark has no native as-of join. The scalable shape used here is
  * union + single window pass:
  *   1. tag right rows (carriers) and left rows (probes);
  *   2. one sort within each key partition by (time, tag, tiebreak);
  *   3. `last(value, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
  *      propagates the most recent carrier to every probe.
  * One shuffle on the key, one sort — O(n log n) per key, no per-row
  * lookup, no range self-join blow-up. Ties: carriers sort before probes
  * at equal time (inclusive <=), and equal-time carriers resolve by
  * `tiebreak` so both engines agree deterministically.
  */
object AsOfJoin {

  /** @param left      probe rows
    * @param right     carrier rows (the state being looked up)
    * @param keyCols   equality key (both sides)
    * @param leftTime  probe time column name (left side)
    * @param rightTime carrier time column name (right side)
    * @param valueCols carrier columns to carry onto probes
    * @param tiebreak  carrier column ordering equal-time carriers (last wins)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = "__asof_t"; val tag = "__asof_tag"; val tb = "__asof_tb"

    val carriers = right.select(
      keyCols.map(col) ++ Seq(col(rightTime).as(t), lit(0).as(tag),
        col(tiebreak).as(tb)) ++
        valueCols.map(col) ++
        leftCols.filterNot(c => keyCols.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val probes = left.select(
      keyCols.map(col) ++ Seq(col(leftTime).as(t), lit(1).as(tag),
        lit(null).cast(right.schema(tiebreak).dataType).as(tb)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => keyCols.contains(c)).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(t).asc, col(tag).asc, col(tb).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carriers.unionByName(probes)
      .select((keyCols ++ leftCols.filterNot(keyCols.contains)).map(col) ++
        Seq(col(tag)) ++
        valueCols.map(c => last(col(c), ignoreNulls = true).over(w)
          .as(c)): _*)
    carried.filter(col(tag) === 1).drop(tag)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the nearest right row with the same
  * key at-or-before (backward) or at-or-after (forward) the left time —
  * the "what was the state when X happened" join (trade enrichment,
  * feature backfill, slowly-changing lookups), plus the next-touch
  * variant, with an optional tolerance window.
  *
  * Spark has no native as-of join. The scalable shape used here is
  * union + single window pass:
  *   1. tag right rows (carriers) and left rows (probes);
  *   2. one sort within each key partition by (time, tag, tiebreak) —
  *      time DESC for the forward direction, which turns "earliest
  *      carrier at-or-after" into the same trailing-window problem;
  *   3. `last(value, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
  *      propagates the nearest carrier to every probe.
  * One shuffle on the key, one sort — O(n log n) per key, no per-row
  * lookup, no range self-join blow-up. Ties: carriers sort before probes
  * at equal time (inclusive match), and equal-time carriers resolve by
  * `tiebreak` — max wins backward, min wins forward — so both engines
  * agree deterministically.
  *
  * Tolerance: because the propagated carrier is the NEAREST one, "null
  * out matches farther than `toleranceSec`" is exactly "match within
  * tolerance" — if the nearest is too far, every carrier is.
  */
object AsOfJoin {

  /** @param left         probe rows
    * @param right        carrier rows (the state being looked up)
    * @param keyCols      equality key (both sides)
    * @param leftTime     probe time column name (left side)
    * @param rightTime    carrier time column name (right side)
    * @param valueCols    carrier columns to carry onto probes
    * @param tiebreak     carrier column ordering equal-time carriers
    * @param direction    "backward" (carrier <= probe) or "forward"
    * @param toleranceSec max |probe - carrier| seconds; farther matches
    *                     become null (timestamp time columns)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tiebreak: String, direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val t = "__asof_t"; val tag = "__asof_tag"; val tb = "__asof_tb"
    val ct = "__asof_ct" // carrier time, carried for the tolerance check

    val carriers = right.select(
      keyCols.map(col) ++ Seq(col(rightTime).as(t), lit(0).as(tag),
        col(tiebreak).as(tb), col(rightTime).as(ct)) ++
        valueCols.map(col) ++
        leftCols.filterNot(c => keyCols.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val probes = left.select(
      keyCols.map(col) ++ Seq(col(leftTime).as(t), lit(1).as(tag),
        lit(null).cast(right.schema(tiebreak).dataType).as(tb),
        lit(null).cast(right.schema(rightTime).dataType).as(ct)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => keyCols.contains(c)).map(col): _*)

    val ordering: Seq[Column] =
      if (direction == "backward")
        Seq(col(t).asc, col(tag).asc, col(tb).asc_nulls_first)
      else // reversed traversal: last carrier seen = earliest at-or-after
        Seq(col(t).desc, col(tag).asc, col(tb).desc_nulls_first)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carriers.unionByName(probes)
      .select((keyCols ++ leftCols.filterNot(keyCols.contains)).map(col) ++
        Seq(col(tag), last(col(ct), ignoreNulls = true).over(w).as(ct)) ++
        valueCols.map(c => last(col(c), ignoreNulls = true).over(w)
          .as(c)): _*)
      .filter(col(tag) === 1)

    val out = toleranceSec match {
      case None => carried
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            unix_timestamp(col(leftTime)) - unix_timestamp(col(ct))
          else unix_timestamp(col(ct)) - unix_timestamp(col(leftTime))
        val within = col(ct).isNotNull && gap <= tol
        carried.select(
          (keyCols ++ leftCols.filterNot(keyCols.contains))
            .map(col) ++ Seq(col(tag), col(ct)) ++
            valueCols.map(c =>
              when(within, col(c)).otherwise(lit(null)).as(c)): _*)
    }
    out.drop(tag, ct)
  }
}

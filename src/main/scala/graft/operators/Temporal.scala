package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins (beyond-reference: the events table makes event-time
  * capabilities part of the engine surface).
  *
  * As-of join — for each left row, the latest right row with
  * `right.time <= left.time` on the same key — implemented with the
  * union + carry-forward pattern: tag sides, sort-partition by (key,
  * time, side) once, and `last(_, ignoreNulls)` carries every right
  * payload forward to the left rows that follow it. ONE shuffle total
  * (the window), vs a range-join's candidate explosion; at 100 TB the
  * window is the same shuffle a sort-merge join would pay, minus the
  * O(matches) blowup.
  *
  * Equal timestamps: the right row sorts before the left row (side tag),
  * so `<=` semantics hold — matching DuckDB's `ASOF JOIN ... ON l.t >=
  * r.t`, which the qe2 oracle uses to cross-validate. Right rows must be
  * unique per (key, time) — pre-aggregate ties (the qe2 query keeps
  * `max_by` per instant).
  */
object Temporal {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__is_left", lit(1))
    val r = right.withColumn("__is_left", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(timeCol), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_left") === 1).drop("__is_left")
  }
}

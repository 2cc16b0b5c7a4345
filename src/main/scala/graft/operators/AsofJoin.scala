package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `right.ts <= left.ts` in the same key group — the event-attribution /
  * point-in-time-lookup operator (DuckDB spells it `ASOF JOIN`; the
  * oracle twin uses exactly that).
  *
  * Spark-first design note: this is a tagged-union + running-last window
  * COMPOSITION, not a custom LogicalPlan/SparkStrategy — Spark's
  * built-ins express the semantics exactly (SURVEY.md §4's preference
  * order: compose before extending), and the composed plan is the one a
  * native operator would emit anyway:
  *
  *   Exchange hashpartitioning(key)            <- the ONE shuffle
  *   +- Sort (key, ts, side) per partition
  *      +- Window [last(payload) ignoreNulls]  <- linear scan, O(1) state
  *
  * No join node at all, so there is nothing to explode: a range join
  * would produce O(left × right-within-range) intermediates; this is
  * O(left + right) rows through one exchange — the same shuffle shape
  * as sessionization, at 100 TB each key group moves once.
  */
object AsofJoin {

  /** `right` must be unique per (key, ts) — pre-aggregate it if not
    * (equal-ts duplicates would make "the most recent row" ambiguous on
    * any engine). Right-side columns listed in `payload` are carried
    * onto each left row from its as-of match (all null when the group
    * has no right row at or before the left ts, i.e. LEFT semantics).
    * Payload columns MAY be null on right rows: the fill runs over one
    * struct per right row, so every payload column always comes from
    * the SAME matched row — never a torn mix of two rows.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String, payload: Seq[String]): DataFrame = {
    // the helper columns would silently clobber same-named input columns
    // (withColumn replaces) and then be dropped — corrupt results, not an
    // error — so reject such inputs up front
    val reserved = Seq("_is_l", "_pay")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"asofJoin reserves column name(s) ${clash.distinct.mkString(", ")}; rename them on the inputs")
    // side tag orders right rows BEFORE left rows at equal ts, so an
    // exactly-simultaneous right row is visible to the left row (<=)
    val l = left.withColumn("_is_l", lit(1))
    val r = right.withColumn("_is_l", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct, non-null exactly on right rows (even when every field
    // inside is null), filled by ONE last(ignoreNulls): all payload
    // columns unpack from the same as-of row
    val filled = u
      .withColumn("_pay",
        last(when(col("_is_l") === 0, struct(payload.map(col): _*)),
          ignoreNulls = true).over(w))
    payload.foldLeft(filled) { (df, c) => df.withColumn(c, col(s"_pay.$c")) }
      .where(col("_is_l") === 1)
      .drop("_pay", "_is_l")
  }
}

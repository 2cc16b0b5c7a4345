package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles from a value-count histogram — the scale-safe
  * replacement for Spark's buffering `median`/`percentile` aggregates.
  *
  * The built-in exact percentile holds EVERY value of a group in one
  * aggregation buffer (an OpenHashMap the size of the group), so a hot
  * group — one source contributing a large share of a 100 TB corpus —
  * is an executor OOM. When the measured values are small-domain
  * integers (token lengths, integral quantities), the same exact result
  * falls out of a (group, value)-count aggregation: per-group state
  * becomes O(distinct values), bounded by the value domain rather than
  * the row count, and survives any group skew.
  *
  * The arithmetic reproduces the type-7 linear interpolation both
  * Spark's `percentile` and DuckDB's `quantile_cont` use — 0-based
  * position pos = q·(n−1), result = x⌊pos⌋ + (pos−⌊pos⌋)·(x⌊pos⌋₊₁ −
  * x⌊pos⌋) — so swapping the implementation cannot move a hash-verified
  * oracle: the bracketing ranks are exact integer arithmetic, and the
  * two IEEE ops (multiply, add) are the ones both engines already
  * perform on the same doubles.
  *
  * Plan shape: one hash aggregation to the histogram (corpus-scale
  * shuffle with map-side combine, slim rows), then ONE window pass
  * partitioned by group (cumulative count + group total in the same
  * exchange — the all-rows frame needs no sort beyond the cumulative
  * one), then one histogram-sized aggregation that picks each
  * quantile's two bracketing values via rank-containment predicates.
  * Ties across histogram rows with equal values are safe under any
  * cumulative order: every row covering a rank carries the same value.
  */
object ExactQuantiles {

  /** SQL (DuckDB-oracle) replay of the same selection: the three
    * aggregates — bracketing values by rank containment plus the
    * fractional position — over a `w` relation exposing (groupCols,
    * `valueCol`, cnt, cum, n). Oracles use this instead of DuckDB's
    * `quantile_cont`, whose internal interpolation order differs from
    * the lo + frac·(hi−lo) tree in the last ulp on some inputs. */
  def replaySelectSql(q: String, tag: String, valueCol: String): String =
    s"""MAX(CASE WHEN cum - cnt < CAST(floor($q * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
       |           AND CAST(floor($q * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 <= cum
       |         THEN $valueCol END) AS lo_$tag,
       |MAX(CASE WHEN cum - cnt < least(CAST(floor($q * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 2, n)
       |           AND least(CAST(floor($q * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 2, n) <= cum
       |         THEN $valueCol END) AS hi_$tag,
       |MAX($q * CAST(n - 1 AS DOUBLE) - floor($q * CAST(n - 1 AS DOUBLE))) AS frac_$tag""".stripMargin

  /** The matching interpolation expression over [[replaySelectSql]]'s
    * output columns — the identical IEEE tree [[fromHistogram]] emits. */
  def replayInterpSql(tag: String): String =
    s"(CAST(lo_$tag AS DOUBLE) + frac_$tag * (CAST(hi_$tag AS DOUBLE) - CAST(lo_$tag AS DOUBLE)))"

  /** Append one exact-quantile column per `(name, q)` to a per-group
    * aggregate of `hist`, a (groupCols ⊎ other, valueCol, cntCol)
    * histogram. `extraAggs` are ordinary aggregate columns evaluated in
    * the SAME per-group aggregation (counts, sums, countDistinct over
    * histogram columns), so callers get their stats without a second
    * pass or a join. Output columns: groupCols, extraAggs, then the
    * quantile columns (double) in `qs` order. */
  def fromHistogram(hist: DataFrame, groupCols: Seq[String], valueCol: String,
      cntCol: String, qs: Seq[(String, Double)],
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val ranked = hist
      .withColumn("__cum", sum(col(cntCol)).over(wCum))
      .withColumn("__n", sum(col(cntCol)).over(wAll))
    val qAggs = qs.flatMap { case (name, q) =>
      // 0-based pos = q·(n−1); bracketing 1-based ranks lo and hi=lo+1
      // (hi clamped to n so the max value interpolates with itself)
      val pos = lit(q) * (col("__n") - 1).cast("double")
      val lo = floor(pos).cast("long") + 1
      val hi = least(lo + 1, col("__n"))
      def valueAtRank(r: Column) =
        max(when(col("__cum") - col(cntCol) < r && r <= col("__cum"), col(valueCol)))
      Seq(valueAtRank(lo).as(s"__${name}_lo"), valueAtRank(hi).as(s"__${name}_hi"),
        max(pos - floor(pos)).as(s"__${name}_frac"))
    }
    val allAggs = extraAggs ++ qAggs
    val agged = ranked.groupBy(g: _*).agg(allAggs.head, allAggs.tail: _*)
    qs.foldLeft(agged) { case (df, (name, _)) =>
      df.withColumn(name,
          col(s"__${name}_lo").cast("double") +
            col(s"__${name}_frac") *
              (col(s"__${name}_hi").cast("double") - col(s"__${name}_lo").cast("double")))
        .drop(s"__${name}_lo", s"__${name}_hi", s"__${name}_frac")
    }
  }
}

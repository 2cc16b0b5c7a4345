package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-profiling and rule-based quality checking — the pre-ingest
  * audit surface a pipeline runs BEFORE trusting a new data drop
  * (the Deequ/"unit tests for data" shape, re-expressed as plain
  * aggregates):
  *
  *  - [[profileLineitem]]: per-column null counts, exact distinct
  *    counts, and min/max in two codegen passes — a wide non-distinct
  *    aggregate for nulls/min/max, and an unpivot + two-level groupBy
  *    for exact distincts (partial aggregation bounds the shuffle at
  *    Σ per-column cardinality; no Expand). A corpus-scale deployment
  *    that can tolerate sketched distincts swaps in the
  *    [[graft.functions.KmvSketch]] aggregate (the
  *    `approx_distinct_tokens` precedent) and drops pass 2's shuffle
  *    to a constant per column.
  *  - [[dqChecks]]: a violations report over declarative row rules.
  *    All single-table rules for a table fuse into ONE conditional-
  *    aggregate pass (COUNT(CASE) per rule — never a scan per rule);
  *    referential rules are key-only anti-join counts (the orphan side
  *    shuffles 8-byte keys, and the build side is the referenced key
  *    set, broadcast when dimension-sized).
  *
  * Values in the profile are rendered VARCHAR so one report row type
  * covers every column type; the fixture's doubles carry exactly two
  * decimal digits, so Spark's and DuckDB's shortest-round-trip
  * double→string renderings agree (spec + oracle enforce it).
  */
object DataQuality {

  /** The profiled lineitem columns, in report order. */
  val LineitemCols: Seq[String] = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** The double-typed profile columns — rendered through an EXPLICIT
    * `DECIMAL(18,2)` cast on BOTH engines rather than the engine-default
    * double→string: Java's `Double.toString` switches to scientific
    * notation at ≥1e7 while DuckDB never does, so the default renderings
    * diverge exactly on large money values. The fixture's doubles are
    * 2-decimal money (quantities, prices, rates — [[LineitemRules]]
    * police the ranges), so the decimal render is lossless AND identical
    * text on both engines at any magnitude; it also collapses signed
    * zeros (BigDecimal has no -0.0), which value-DISTINCT requires.
    * The oracle counts distinct over the SAME decimal domain so
    * distinct-on-render equals distinct-on-value by construction. */
  private val LineitemDoubleCols: Set[String] =
    Set("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** The shared fixed-point render — identical SQL text runs on Spark
    * and DuckDB. `c` picks the render; `x` is the rendered expression
    * (defaults to the column itself). */
  private def renderSql(c: String, x: String = null): String = {
    val e = if (x == null) c else x
    if (LineitemDoubleCols(c)) s"CAST(CAST($e AS DECIMAL(18,2)) AS STRING)"
    else s"CAST($e AS STRING)"
  }

  /** Per-column profile: (column_name, n_nulls, n_distinct, min_val,
    * max_val), one row per column. Two scans, both whole-stage codegen:
    * pass 1 is one wide non-distinct aggregate (nulls + typed min/max);
    * pass 2 unpivots to (column, rendered value) and counts exact
    * distincts with a two-level groupBy — map-side partial aggregation
    * bounds the shuffle at Σ per-column cardinality. (A single aggregate
    * holding 11 COUNT(DISTINCT)s instead plans as a 12-projection Expand
    * feeding one monolithic aggregate — measured 50× slower at sf0.1.)
    * Distinct-on-render equals distinct-on-value because every profiled
    * type's rendering is injective on its domain (longs, 2-decimal money
    * through the shared DECIMAL(18,2) render, identity strings,
    * timestamps) — and the oracle distincts over the same decimal
    * domain, so the equality holds by construction at any magnitude. */
  def profileLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    def render(x: org.apache.spark.sql.Column, c: String): org.apache.spark.sql.Column =
      if (LineitemDoubleCols(c)) x.cast("decimal(18,2)").cast("string")
      else x.cast("string")
    val baseAggs = LineitemCols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        render(min(col(c)), c).as(s"${c}_min"),
        render(max(col(c)), c).as(s"${c}_max"))
    }
    val row = li.agg(baseAggs.head, baseAggs.tail: _*)
    val stackArgs = LineitemCols.map { c =>
      s"'$c', ${c}_nulls, ${c}_min, ${c}_max"
    }.mkString(", ")
    val base = row.selectExpr(s"stack(${LineitemCols.size}, $stackArgs) AS " +
      "(column_name, n_nulls, min_val, max_val)")
    val unpivot = LineitemCols.map { c =>
      s"'$c', ${renderSql(c)}"
    }.mkString(", ")
    val distincts = li
      .selectExpr(s"stack(${LineitemCols.size}, $unpivot) AS (column_name, val)")
      .where(col("val").isNotNull)
      .groupBy(col("column_name"), col("val")).agg(count(lit(1)).as("__n"))
      .groupBy(col("column_name")).agg(count(lit(1)).as("n_distinct"))
    base.join(broadcast(distincts), Seq("column_name"), "left")
      .select(col("column_name"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"))
      .orderBy(col("column_name").asc)
  }

  val profileLineitemSql: String =
    LineitemCols.map { c =>
      val distinctArg =
        if (LineitemDoubleCols(c)) s"CAST($c AS DECIMAL(18,2))" else c
      s"""SELECT '$c' AS column_name,
         |       COUNT(*) - COUNT($c) AS n_nulls,
         |       COUNT(DISTINCT $distinctArg) AS n_distinct,
         |       ${renderSql(c, s"MIN($c)")} AS min_val,
         |       ${renderSql(c, s"MAX($c)")} AS max_val
         |FROM lineitem""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\nORDER BY column_name ASC")

  /** The declarative single-table rules: (rule name, violation
    * predicate SQL) — the SQL text is the shared source of truth, so
    * the Spark side (`expr`) and the DuckDB oracle evaluate the
    * IDENTICAL predicate. */
  val LineitemRules: Seq[(String, String)] = Seq(
    "lineitem.nonpositive_price" -> "l_extendedprice <= 0",
    "lineitem.discount_range" -> "l_discount < 0 OR l_discount > 0.5",
    "lineitem.quantity_range" -> "l_quantity < 1 OR l_quantity > 200",
    "lineitem.null_orderkey" -> "l_orderkey IS NULL",
    "lineitem.flag_domain" -> "l_returnflag NOT IN ('A', 'N', 'R')")

  val OrdersRules: Seq[(String, String)] = Seq(
    "orders.nonpositive_total" -> "o_totalprice <= 0",
    "orders.null_orderdate" -> "o_orderdate IS NULL",
    "orders.status_domain" -> "o_orderstatus NOT IN ('F', 'O', 'P')")

  /** Rule-violations report: (rule, n_violations, n_checked), one row
    * per rule INCLUDING zero-violation rules (a missing row is
    * indistinguishable from an unchecked rule — the
    * temperature-mixture n_selected=0 lesson). */
  /** One conditional-aggregate pass evaluating every rule of one table
    * — package-private so the spec can drive it over a frame with KNOWN
    * violations (the fixture is clean, so the end-to-end report alone
    * would never exercise a non-zero count). */
  private[graft] def tableReport(df: DataFrame,
                                 rules: Seq[(String, String)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(expr(pred), 1L).otherwise(0L)).as(name)
    } :+ count(lit(1)).as("__checked")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) => s"'$name', `$name`" }.mkString(", ")
    row.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)", "__checked")
      .select(col("rule"), col("n_violations"), col("__checked").as("n_checked"))
  }

  def dqChecks(spark: SparkSession, sfDir: String): DataFrame = {
    val li = tableReport(Tables.lineitem(spark, sfDir), LineitemRules)
    val ord = tableReport(Tables.orders(spark, sfDir), OrdersRules)
    // referential rules: key-only anti joins
    val orphanLi = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem.orphan_orderkey").as("rule"), col("n_violations"))
      .crossJoin(broadcast(
        Tables.lineitem(spark, sfDir).agg(count(lit(1)).as("n_checked"))))
    val orphanOrd = Tables.orders(spark, sfDir).select(col("o_custkey"))
      .join(Tables.customer(spark, sfDir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders.orphan_custkey").as("rule"), col("n_violations"))
      .crossJoin(broadcast(
        Tables.orders(spark, sfDir).agg(count(lit(1)).as("n_checked"))))
    li.unionByName(ord).unionByName(orphanLi).unionByName(orphanOrd)
      .orderBy(col("rule").asc)
  }

  private def tableSelectSql(table: String, rules: Seq[(String, String)]): Seq[String] =
    rules.map { case (name, pred) =>
      s"""SELECT '$name' AS rule,
         |       COUNT(CASE WHEN $pred THEN 1 END) AS n_violations,
         |       COUNT(*) AS n_checked
         |FROM $table""".stripMargin
    }

  /** Integrity rules for the documents corpus. `lang_unlisted` fires on
    * real fixture rows (languages outside [[Curation.LangAllow]]), so
    * the oracle hash-verifies a NON-zero violation count — the others
    * pin the fixture's integrity invariants (redundant-column
    * consistency, presence). */
  val DocumentRules: Seq[(String, String)] = {
    val langs = Curation.LangAllow.map(l => s"'$l'").mkString(", ")
    Seq(
      "documents.null_text" -> "text IS NULL",
      "documents.empty_text" -> "length(text) < 1",
      "documents.chars_mismatch" -> "n_chars <> length(text)",
      s"documents.lang_unlisted" -> s"lang NOT IN ($langs)")
  }

  /** [[dqChecks]] for the documents corpus — the audit a text pipeline
    * runs on every new crawl drop before curation. */
  def dqDocs(spark: SparkSession, sfDir: String): DataFrame =
    tableReport(Tables.documents(spark, sfDir), DocumentRules)
      .orderBy(col("rule").asc)

  val dqDocsSql: String =
    tableSelectSql("documents", DocumentRules)
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY rule ASC")

  /** Typed-cogroup row for the orders side. */
  private[graft] case class OrderKey(o_orderkey: Long, o_orderstatus: String)
  /** Typed-cogroup row for the lineitem side. */
  private[graft] case class LineNum(l_orderkey: Long, l_linenumber: Long)

  /** Per-order line-sequence reconciliation via typed COGROUP — the
    * integrity audit that needs BOTH sides of a key at once: every
    * order meets its (possibly empty) line set in one function call, so
    * zero-line orders are first-class (an inner join would drop them,
    * and the check itself — "do the line numbers form exactly 1..n?" —
    * is per-group sequence logic, not an aggregate). Cogroup shuffles
    * each side once on the order key and streams the groups; per-group
    * memory is one order's lines. Classified per order, aggregated per
    * status. The oracle restates the check relationally (count/min/max/
    * distinct against n), so the cogroup encoding is cross-verified,
    * not replayed. */
  def ordersReconcile(spark: SparkSession, sfDir: String): DataFrame =
    // output memoized per (session, dir) — order-status-sized rows;
    // shared by orders_reconcile and sql_reconcile (each previously
    // re-ran the orders⋈lineitem cogroup — the one typed-Dataset
    // aggregation in the library, lineitem-scale)
    Materialize.memoized(spark,
        s"reconcile_${Materialize.dirTag(sfDir)}") {
      reconcileCore(
        Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderstatus")),
        Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_linenumber")))
    }.orderBy(col("o_orderstatus").asc)

  /** Frame-parametric core so the spec can pin each class against
    * PLANTED defects with known classifications (the fixture's own
    * line numbering is genuinely dirty — random 1..7 with duplicates —
    * so all three classes also fire on real rows and the non-zero
    * counts are hash-verified end-to-end). */
  private[graft] def reconcileCore(ordersDf: DataFrame,
                                   linesDf: DataFrame): DataFrame = {
    val spark = ordersDf.sparkSession
    import spark.implicits._
    val orders = ordersDf.as[OrderKey].groupByKey(_.o_orderkey)
    val lines = linesDf.as[LineNum].groupByKey(_.l_orderkey)
    orders.cogroup(lines) { (_, os, ls) =>
      val nums = ls.map(_.l_linenumber).toArray
      java.util.Arrays.sort(nums)
      val n = nums.length
      val contiguous = n > 0 && nums(0) == 1L && nums(n - 1) == n.toLong &&
        (0 until n - 1).forall(i => nums(i) != nums(i + 1))
      os.map { o =>
        (o.o_orderstatus,
          if (n == 0) "no_lines" else if (contiguous) "contiguous" else "broken")
      }
    }.toDF("o_orderstatus", "line_check")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("line_check") === "no_lines", 1L).otherwise(0L))
          .as("n_no_lines"),
        sum(when(col("line_check") === "contiguous", 1L).otherwise(0L))
          .as("n_contiguous"),
        sum(when(col("line_check") === "broken", 1L).otherwise(0L))
          .as("n_broken"))
      .orderBy(col("o_orderstatus").asc)
  }

  val ordersReconcileSql: String =
    """WITH per_order AS (
      |  SELECT o.o_orderkey, o.o_orderstatus,
      |         COUNT(l.l_orderkey) AS n,
      |         COALESCE(MIN(l.l_linenumber), 0) AS mn,
      |         COALESCE(MAX(l.l_linenumber), 0) AS mx,
      |         COUNT(DISTINCT l.l_linenumber) AS nd
      |  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY o.o_orderkey, o.o_orderstatus)
      |SELECT o_orderstatus,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
      |       CAST(SUM(CASE WHEN n > 0 AND mn = 1 AND mx = n AND nd = n
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_contiguous,
      |       CAST(SUM(CASE WHEN n > 0 AND NOT (mn = 1 AND mx = n AND nd = n)
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_broken
      |FROM per_order
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus ASC""".stripMargin

  val dqChecksSql: String = {
    def tableSelect(table: String, rules: Seq[(String, String)]): Seq[String] =
      tableSelectSql(table, rules)
    val referential = Seq(
      s"""SELECT 'lineitem.orphan_orderkey' AS rule,
         |       (SELECT COUNT(*) FROM lineitem l
         |        WHERE NOT EXISTS (SELECT 1 FROM orders o
         |                          WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
         |       (SELECT COUNT(*) FROM lineitem) AS n_checked""".stripMargin,
      s"""SELECT 'orders.orphan_custkey' AS rule,
         |       (SELECT COUNT(*) FROM orders o
         |        WHERE NOT EXISTS (SELECT 1 FROM customer c
         |                          WHERE c.c_custkey = o.o_custkey)) AS n_violations,
         |       (SELECT COUNT(*) FROM orders) AS n_checked""".stripMargin)
    (tableSelect("lineitem", LineitemRules) ++ tableSelect("orders", OrdersRules) ++
      referential).mkString("\n", "\nUNION ALL\n", "\nORDER BY rule ASC")
  }
}

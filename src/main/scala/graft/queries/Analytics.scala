package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Helpers._

/** SURVEY.md §2.4-2.6: aggregations, sorts/limits, scalar-function catalog,
  * plus window analytics (beyond the reference surface — SURVEY §2.5 notes
  * windows are absent there; they are first-class here).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Distinct co-purchase edges (u < v part pairs sharing an order) — ONE
    * graph definition shared by the triangle census and the degree
    * distribution, so they can never drift onto different graphs. */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    li.select(col("l_orderkey"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("v")),
        Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
  }

  /** Fixed "as-of" date for aging — the reference pins 'now' for determinism
    * (expand_sap_test_db.py:102 pins 2026-03-06). */
  val AsOf = "2001-06-01"

  val queries: Seq[Q] = Seq(
    // ── §2.4 GROUP BY on an expression (reference GROUP BY SUBSTR(OBJNR,7))
    Q(
      "q_agg_groupby_expr",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupBy(year(col("o_orderdate")).cast("long").as("order_year"),
            substring(col("o_orderpriority"), 1, 1).as("prio_class"))
          .agg(count(lit(1)).as("n"),
            // exact decimal sum internally, DOUBLE out — the driver's hash
            // floats decimals, so trailing-zero decimal strings break it
            sum(money(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(col("order_year"), col("prio_class"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
        SUBSTR(o_orderpriority, 1, 1) AS prio_class,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1, 2 ORDER BY order_year, prio_class""")),

    // ── §2.4 HAVING (reference "Purchase orders over threshold value") ───
    Q(
      "q_agg_having",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(col("l_suppkey"))
          .agg(sum(money(col("l_extendedprice"))).as("spend_dec"),
            count(lit(1)).as("n_lines"))
          .filter(col("spend_dec") > lit(50000).cast(DecimalType(18, 2)))
          .select(col("l_suppkey"), col("spend_dec").cast("double").as("total_spend"),
            col("n_lines"))
          .orderBy(desc("total_spend"), col("l_suppkey"))
      },
      Some("""SELECT l_suppkey, CAST(spend_dec AS DOUBLE) AS total_spend, n_lines FROM (
          SELECT l_suppkey,
            SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS spend_dec,
            COUNT(*) AS n_lines
          FROM lineitem GROUP BY l_suppkey
          HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) > CAST(50000 AS DECIMAL(18,2)))
        ORDER BY total_spend DESC, l_suppkey""")),

    // ── §2.4 conditional aggregation / pivot-by-CASE (reference
    //    actual-vs-plan WRTTP='04' vs '01', sap_semantic_model.json:7537) ─
    Q(
      "q_agg_conditional_pivot",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
          .agg(
            sum(when(col("l_returnflag") === "R", money(col("l_extendedprice")))
              .otherwise(lit(0).cast(DecimalType(18, 2))))
              .cast("double").as("returned_amt"),
            sum(when(col("l_returnflag") =!= "R", money(col("l_extendedprice")))
              .otherwise(lit(0).cast(DecimalType(18, 2))))
              .cast("double").as("kept_amt"),
            count(lit(1)).as("n"))
          .orderBy(col("ship_year"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS returned_amt,
        CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS kept_amt,
        COUNT(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY ship_year""")),

    // ── §2.5 ORDER BY a CASE expression + aging buckets (reference FBL5N
    //    aging template, sap_semantic_model.json:7635-7645) ───────────────
    Q(
      "q_aging_buckets",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val open = o.filter(col("o_orderstatus") === "O")
          .withColumn("days_past_due",
            datediff(lit(AsOf).cast("date"), to_date(col("o_orderdate"))).cast("long"))
          .withColumn("aging_bucket", agingBucket(col("days_past_due")))
        open.groupBy(col("aging_bucket"))
          .agg(count(lit(1)).as("n_orders"),
            sum(money(col("o_totalprice"))).cast("double").as("open_amount"))
          .orderBy(agingBucketOrder(col("aging_bucket")))
      },
      Some(s"""SELECT aging_bucket, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_amount
        FROM (
          SELECT o_totalprice,
            CASE WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') <= 0 THEN 'Not yet due'
                 WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') BETWEEN 1 AND 30 THEN '1-30 days'
                 WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') BETWEEN 31 AND 60 THEN '31-60 days'
                 WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') BETWEEN 61 AND 90 THEN '61-90 days'
                 ELSE 'Over 90 days' END AS aging_bucket
          FROM orders WHERE o_orderstatus = 'O')
        GROUP BY aging_bucket
        ORDER BY CASE aging_bucket WHEN 'Not yet due' THEN 0 WHEN '1-30 days' THEN 1
          WHEN '31-60 days' THEN 2 WHEN '61-90 days' THEN 3 ELSE 4 END""")),

    // ── §2.4 SUM/COUNT/COUNT DISTINCT/MIN/MAX in one pass ────────────────
    Q(
      "q_agg_basic",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"),
            countDistinct(col("p_type")).as("n_types"),
            min(col("p_size")).cast("long").as("min_size"),
            max(col("p_size")).cast("long").as("max_size"),
            min(money(col("p_retailprice"))).cast("double").as("min_price"),
            max(money(col("p_retailprice"))).cast("double").as("max_price"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, COUNT(*) AS n_parts, COUNT(DISTINCT p_type) AS n_types,
        CAST(MIN(p_size) AS BIGINT) AS min_size, CAST(MAX(p_size) AS BIGINT) AS max_size,
        CAST(MIN(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        CAST(MAX(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // ── §2.4 horizontal (cross-column) sum with NULL-as-zero (reference
    //    HSL01..HSL16 period buckets, trial_balance template) ─────────────
    Q(
      "q_agg_horizontal",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val perRow = horizontalSum(Seq(
          col("l_quantity").cast(DecimalType(18, 3)),
          col("l_discount").cast(DecimalType(18, 3)),
          col("l_tax").cast(DecimalType(18, 3))))
        l.groupBy(col("l_returnflag"))
          .agg(sum(perRow).cast("double").as("period_activity"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        CAST(SUM(COALESCE(CAST(l_quantity AS DECIMAL(18,3)),0) + COALESCE(CAST(l_discount AS DECIMAL(18,3)),0) + COALESCE(CAST(l_tax AS DECIMAL(18,3)),0)) AS DOUBLE) AS period_activity,
        COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── §2.4 STDDEV/VARIANCE (the reference's translator strips these;
    //    we support them — documented deviation). Computed via exact
    //    decimal power sums → IEEE double → round, so the result is
    //    order-independent and hash-stable on both engines ─────────────────
    Q(
      "q_agg_stddev",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(qty(col("l_quantity"))).as("s1"),
            sum((qty(col("l_quantity")) * qty(col("l_quantity")))
              .cast(DecimalType(18, 6))).as("s2"))
          .select(col("l_returnflag"), col("n"),
            round((col("s2").cast("double") * col("n").cast("double") -
              col("s1").cast("double") * col("s1").cast("double")) /
              (col("n").cast("double") * (col("n").cast("double") - 1)), 4)
              .as("var_samp"),
            round(sqrt((col("s2").cast("double") * col("n").cast("double") -
              col("s1").cast("double") * col("s1").cast("double")) /
              (col("n").cast("double") * (col("n").cast("double") - 1))), 4)
              .as("stddev_samp"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, n,
        ROUND((CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 4) AS var_samp,
        ROUND(SQRT((CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 4) AS stddev_samp
        FROM (
          SELECT l_returnflag, COUNT(*) AS n,
            SUM(CAST(l_quantity AS DECIMAL(18,3))) AS s1,
            SUM(CAST(CAST(l_quantity AS DECIMAL(18,3)) * CAST(l_quantity AS DECIMAL(18,3)) AS DECIMAL(18,6))) AS s2
          FROM lineitem GROUP BY l_returnflag)
        ORDER BY l_returnflag""")),

    // ── §2.6 date-function catalog: EXTRACT, ADD_MONTHS/ADD_DAYS,
    //    DATEDIFF, TRUNC — the dialect translator's date surface ───────────
    Q(
      "q_fn_dates",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(year(col("o_orderdate")) === 1997)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("d"),
            date_add(to_date(col("o_orderdate")), 30).as("plus_30d"),
            add_months(to_date(col("o_orderdate")), 3).as("plus_3m"),
            trunc(to_date(col("o_orderdate")), "MM").as("month_start"),
            datediff(lit(AsOf).cast("date"), to_date(col("o_orderdate")))
              .cast("long").as("days_to_asof"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey,
        CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
        CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') AS BIGINT) AS days_to_asof
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        ORDER BY o_orderkey""")),

    // ── §2.6 string-function catalog: CONCAT, LPAD (NUMC zero-padding!),
    //    SUBSTR, UPPER/LOWER, REPLACE, LENGTH, TRIM ───────────────────────
    Q(
      "q_fn_strings",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.select(col("p_partkey"),
            concat(col("p_brand"), lit("-"), col("p_name")).as("label"),
            lpad(col("p_partkey").cast("string"), 10, "0").as("padded_id"),
            substring(col("p_name"), 1, 5).as("prefix"),
            upper(col("p_name")).as("uname"),
            lower(col("p_brand")).as("lbrand"),
            regexp_replace(col("p_name"), " ", "_").as("slug"),
            length(col("p_name")).cast("long").as("name_len"),
            trim(concat(lit("  "), col("p_type"), lit("  "))).as("trimmed"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        CONCAT(p_brand, '-', p_name) AS label,
        LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_id,
        SUBSTR(p_name, 1, 5) AS prefix,
        UPPER(p_name) AS uname,
        LOWER(p_brand) AS lbrand,
        REPLACE(p_name, ' ', '_') AS slug,
        CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        TRIM(CONCAT('  ', p_type, '  ')) AS trimmed
        FROM part ORDER BY p_partkey""")),

    // ── §2.6 conditional functions: COALESCE/IFNULL/NULLIF + nested CASE ─
    Q(
      "q_fn_cond",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(col("o_orderkey"),
            coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
              lit("UNSPECIFIED")).as("priority"),
            when(col("o_orderstatus") === "O",
              when(money(col("o_totalprice")) > lit(300000).cast(DecimalType(18, 2)),
                "open-large").otherwise("open-small"))
              .when(col("o_orderstatus") === "P", "partial")
              .otherwise("closed").as("bucket"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
        COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'UNSPECIFIED') AS priority,
        CASE WHEN o_orderstatus = 'O' THEN
               CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) > CAST(300000 AS DECIMAL(18,2))
                    THEN 'open-large' ELSE 'open-small' END
             WHEN o_orderstatus = 'P' THEN 'partial'
             ELSE 'closed' END AS bucket
        FROM orders ORDER BY o_orderkey""")),

    // ── window: running total (rows unbounded preceding) ─────────────────
    Q(
      "q_window_running",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_custkey") <= 20)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(to_date(col("o_orderdate")), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            sum(money(col("o_totalprice"))).over(w)
              .cast("double").as("running_total"))
          .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders WHERE o_custkey <= 20
        ORDER BY o_custkey, order_date, o_orderkey""")),

    // ── window: LAG month-over-month delta ───────────────────────────────
    Q(
      "q_window_lag",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val monthly = l.groupBy(trunc(to_date(col("l_shipdate")), "MM").as("ship_month"))
          .agg(sum(money(col("l_extendedprice"))).as("rev_dec"))
        // global window is safe here: input is the month-grain AGGREGATE
        // (bounded by calendar months in the corpus, not by corpus size)
        val w = Window.orderBy(col("ship_month"))
        monthly.select(col("ship_month"),
            col("rev_dec").cast("double").as("revenue"),
            (col("rev_dec") - lag(col("rev_dec"), 1).over(w))
              .cast("double").as("delta"))
          .orderBy(col("ship_month"))
      },
      Some("""SELECT ship_month, CAST(rev_dec AS DOUBLE) AS revenue,
        CAST(rev_dec - LAG(rev_dec, 1) OVER (ORDER BY ship_month) AS DOUBLE) AS delta
        FROM (
          SELECT CAST(DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS DATE) AS ship_month,
            SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
          FROM lineitem GROUP BY 1)
        ORDER BY ship_month""")),

    // ── pivot: DataFrame .pivot() with pinned value set (the reference
    //    emulates this with CASE; both forms supported here) ────────────────
    Q(
      "q_pivot",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(col("l_suppkey"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(money(col("l_extendedprice"))))
          .select(col("l_suppkey"),
            col("A").cast("double").as("amt_a"),
            col("N").cast("double").as("amt_n"),
            col("R").cast("double").as("amt_r"))
          .orderBy(col("l_suppkey"))
      },
      Some("""SELECT l_suppkey,
          CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS amt_a,
          CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS amt_n,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS amt_r
        FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // ── HLL sketch: approx_count_distinct next to the exact count, reduced
    //    to an oracle-checkable face — the estimate itself is sketch-
    //    implementation-specific, so the row carries the EXACT count plus an
    //    in-query error-bound check (|approx − exact| ≤ 5%·exact, well above
    //    the 2% rsd the sketch is configured for); the oracle reproduces the
    //    exact count and asserts the bound held (TRUE) ──────────────────────
    Q(
      "q_approx_distinct",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("__approx"),
            countDistinct(col("l_orderkey")).as("exact_orders"))
          .select(col("l_returnflag"), col("exact_orders"),
            (abs(col("__approx") - col("exact_orders")).cast("double") <=
              lit(0.05) * col("exact_orders").cast("double")).as("within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
          TRUE AS within_5pct
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ── KLL-style quantile sketch: approx_percentile next to the exact
    //    rank-based quantiles, reduced to an oracle-checkable face — the
    //    sketch values are implementation-specific, so each row carries the
    //    EXACT percentiles plus in-query relative-error checks (≤ 2% each;
    //    accuracy 1000 ⇒ rank error ≤ N/1000, far tighter on this price
    //    distribution); the oracle reproduces the exact values (DuckDB
    //    quantile_cont interpolates at p·(n−1), same as Spark percentile)
    //    and asserts each bound held ─────────────────────────────────────────
    Q(
      "q_approx_quantiles",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        def ok(a: Column, e: Column): Column =
          abs(a - e) <= lit(0.02) * abs(e)
        l.groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)")
              .as("aq"),
            expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("eq"))
          .select(col("l_returnflag"),
            round(element_at(col("eq"), 1), 4).as("exact_p50"),
            round(element_at(col("eq"), 2), 4).as("exact_p90"),
            round(element_at(col("eq"), 3), 4).as("exact_p99"),
            ok(element_at(col("aq"), 1), element_at(col("eq"), 1)).as("p50_within_2pct"),
            ok(element_at(col("aq"), 2), element_at(col("eq"), 2)).as("p90_within_2pct"),
            ok(element_at(col("aq"), 3), element_at(col("eq"), 3)).as("p99_within_2pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
          ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
          ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
          ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
          TRUE AS p50_within_2pct, TRUE AS p90_within_2pct,
          TRUE AS p99_within_2pct
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ── exact rank-based quantiles with linear interpolation (the oracle-
    //    checkable face of the sketch above): percentile ↔ quantile_cont,
    //    both interpolating at p·(n−1). Inputs are 2-decimal prices and the
    //    probe fractions have ≤2 decimals, so the true quantile has ≤4
    //    decimals — round(4) absorbs engine ulp differences ─────────────────
    Q(
      "q_quantiles_exact",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("eq"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            (round(element_at(col("eq"), 1), 4) + lit(0.0)).as("p50"),
            (round(element_at(col("eq"), 2), 4) + lit(0.0)).as("p90"),
            (round(element_at(col("eq"), 3), 4) + lit(0.0)).as("p99"),
            col("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
          ROUND(quantile_cont(l_extendedprice, 0.5), 4) + 0 AS p50,
          ROUND(quantile_cont(l_extendedprice, 0.9), 4) + 0 AS p90,
          ROUND(quantile_cont(l_extendedprice, 0.99), 4) + 0 AS p99,
          COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── OLAP breadth (beyond reference): ROLLUP subtotals ────────────────
    Q(
      "q_rollup",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.rollup(year(col("o_orderdate")).cast("long").as("y"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(money(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(asc_nulls_first("y"), asc_nulls_first("o_orderstatus"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
          o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP(1, o_orderstatus)
        ORDER BY y NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // ── OLAP breadth: CUBE — all 2^k grouping combinations ───────────────
    Q(
      "q_cube",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(money(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // ── UNPIVOT: wide period columns → long (stage, value) rows — the
    //    inverse of the pivot-by-CASE operator, via Spark's stack() ─────────
    Q(
      "q_unpivot",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val one = lit(1).cast(DecimalType(18, 2))
        val wide = l.groupBy(col("l_returnflag"))
          .agg(sum(money(col("l_extendedprice"))).cast("double").as("gross"),
            sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
              .cast("double").as("discounted"),
            sum(money(col("l_extendedprice")) * (one - money(col("l_discount")))
              * (one + money(col("l_tax")))).cast("double").as("charged"))
        wide.select(col("l_returnflag"),
            expr("""stack(3, 'gross', gross, 'discounted', discounted,
              'charged', charged) AS (measure, amount)"""))
          .orderBy(col("l_returnflag"), col("measure"))
      },
      Some("""WITH wide AS (SELECT l_returnflag,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              AS DOUBLE) AS discounted,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
              (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
              AS DOUBLE) AS charged
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag, measure, amount
        FROM wide UNPIVOT (amount FOR measure IN (gross, discounted, charged))
        ORDER BY l_returnflag, measure""")),

    // ── OLAP breadth: GROUPING SETS through spark.sql ────────────────────
    Q(
      "q_grouping_sets",
      (s, dir) => {
        graft.Tables.register(s, dir)
        s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ── set operations: INTERSECT / EXCEPT (absent in reference; native
    //    here) — repeat vs churned customers across years ──────────────────
    Q(
      "q_intersect_except",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def custsIn(y: Int) = o.filter(year(col("o_orderdate")) === y)
          .select(col("o_custkey")).distinct()
        val repeat = custsIn(1996).intersect(custsIn(1997))
          .select(lit("repeat").as("kind"), col("o_custkey"))
        val churned = custsIn(1996).except(custsIn(1997))
          .select(lit("churned").as("kind"), col("o_custkey"))
        repeat.unionAll(churned).orderBy(col("kind"), col("o_custkey"))
      },
      Some("""SELECT kind, o_custkey FROM (
          SELECT 'repeat' AS kind, o_custkey FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate)=1996
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate)=1997)
          UNION ALL
          SELECT 'churned', o_custkey FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate)=1996
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate)=1997))
        ORDER BY kind, o_custkey""")),

    // ── §2.3 EXISTS predicate at the SQL level (Catalyst → left semi) ────
    Q(
      "q_exists_sql",
      (s, dir) => {
        graft.Tables.register(s, dir)
        s.sql("""SELECT s_suppkey, s_name FROM supplier s
          WHERE EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
          ORDER BY s_suppkey""")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
        ORDER BY s_suppkey""")),

    // ── exact median per group via window rank (portable, no float
    //    interpolation): lower median = element at rank (n+1) div 2 ────────
    Q(
      "q_median_window",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("total"), col("o_orderkey"))
        o.select(col("o_orderstatus"), col("o_orderkey"),
            money(col("o_totalprice")).as("total"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cnt", count(lit(1))
            .over(Window.partitionBy(col("o_orderstatus"))).cast("long"))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("o_orderstatus"), col("total").cast("double").as("median_total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, CAST(total AS DOUBLE) AS median_total FROM (
          SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS total,
            CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
              ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS BIGINT) AS rn,
            CAST(COUNT(*) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS cnt
          FROM orders)
        WHERE rn = (cnt + 1) // 2
        ORDER BY o_orderstatus""")),

    // ── §2.6 the HANA dialect front end itself: TOP-n syntax, ADD_DAYS,
    //    DAYS_BETWEEN, TO_VARCHAR fmt tokens, IFNULL — parsed by the
    //    pre-rewriter + registered functions, then Catalyst ────────────────
    Q(
      "q_dialect_hana",
      (s, dir) => {
        graft.Tables.register(s, dir)
        graft.Engine.sql(s,
          """SELECT TOP 20 o_orderkey,
               ADD_DAYS(o_orderdate, 30) AS due_date,
               TO_VARCHAR(o_orderdate, 'YYYY-MM') AS order_month,
               IFNULL(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status,
               DAYS_BETWEEN(DATE '2001-06-01', o_orderdate) AS age_days
             FROM orders
             WHERE o_orderdate >= DATE '1997-01-01' -- dialect comment test
             ORDER BY o_orderkey""")
          .withColumn("age_days", col("age_days").cast("long"))
      },
      Some("""SELECT o_orderkey,
          CAST(o_orderdate AS DATE) + 30 AS due_date,
          STRFTIME(o_orderdate, '%Y-%m') AS order_month,
          COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status,
          CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2001-06-01') AS BIGINT) AS age_days
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        ORDER BY o_orderkey LIMIT 20""")),

    // ── §2.6 SQLite-ism surface: strftime / TO_CHAR / IFNULL / printf —
    //    the translator's remaining dialect row, through the front end ──────
    Q(
      "q_dialect_sqlite",
      (s, dir) => {
        graft.Tables.register(s, dir)
        graft.Engine.sql(s,
          """SELECT o_orderkey,
               strftime('%Y-%m', o_orderdate) AS order_month,
               TO_CHAR(o_orderdate, 'YYYY-MM-DD') AS order_day,
               IFNULL(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'NONE') AS prio,
               printf('%08d', o_orderkey) AS padded
             FROM orders
             WHERE o_orderdate >= DATE '1998-01-01'
             ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
          STRFTIME(o_orderdate, '%Y-%m') AS order_month,
          STRFTIME(o_orderdate, '%Y-%m-%d') AS order_day,
          COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'NONE') AS prio,
          PRINTF('%08d', o_orderkey) AS padded
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        ORDER BY o_orderkey""")),

    // ── window: rank-per-group (row_number, deterministic tie-break) ─────
    Q(
      "q_window_rank",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val rev = l.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("s_suppkey"), col("s_name"))
          .agg(sum(money(col("l_extendedprice"))).cast("double").as("revenue"))
        val w = Window.partitionBy(col("n_name"))
          .orderBy(desc("revenue"), col("s_suppkey"))
        rev.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 2)
          .select(col("n_name"), col("rk"), col("s_suppkey"), col("s_name"), col("revenue"))
          .orderBy(col("n_name"), col("rk"))
      },
      Some("""SELECT n_name, rk, s_suppkey, s_name, revenue FROM (
        SELECT n_name, s_suppkey, s_name, revenue,
          CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS BIGINT) AS rk
        FROM (
          SELECT n_name, s_suppkey, s_name,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name, s_suppkey, s_name))
        WHERE rk <= 2 ORDER BY n_name, rk"""),
      bench = true),

    // ── RFM segmentation (beyond reference): customers bucketed by
    //    recency/frequency/monetary QUARTILE THRESHOLDS, not NTILE — a
    //    global NTILE is a single-partition sort over every customer, while
    //    three interpolated percentiles are one tiny aggregate broadcast
    //    back, so the segmentation scales. Monetary sums stay decimal until
    //    the final double cast; segment output is ≤64 rows ─────────────────
    Q(
      "q_rfm_segments",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val cust = o.groupBy(col("o_custkey"))
          .agg(datediff(to_date(lit("1999-01-01")),
              max(to_date(col("o_orderdate")))).cast("long").as("r_days"),
            count(lit(1)).as("f"),
            sum(money(col("o_totalprice"))).as("m_dec"))
          .withColumn("m", col("m_dec").cast("double"))
        val th = cust.agg(
          percentile(col("r_days").cast("double"), lit(0.25)).as("r1"),
          percentile(col("r_days").cast("double"), lit(0.5)).as("r2"),
          percentile(col("r_days").cast("double"), lit(0.75)).as("r3"),
          percentile(col("f").cast("double"), lit(0.25)).as("f1"),
          percentile(col("f").cast("double"), lit(0.5)).as("f2"),
          percentile(col("f").cast("double"), lit(0.75)).as("f3"),
          percentile(col("m"), lit(0.25)).as("m1"),
          percentile(col("m"), lit(0.5)).as("m2"),
          percentile(col("m"), lit(0.75)).as("m3"))
        def quart(c: org.apache.spark.sql.Column, t1: String, t2: String,
            t3: String) =
          lit(1L) + (c > col(t1)).cast("long") + (c > col(t2)).cast("long") +
            (c > col(t3)).cast("long")
        cust.crossJoin(broadcast(th))
          .select(
            quart(col("r_days").cast("double"), "r1", "r2", "r3").as("r_q"),
            quart(col("f").cast("double"), "f1", "f2", "f3").as("f_q"),
            quart(col("m"), "m1", "m2", "m3").as("m_q"),
            col("m_dec"))
          .groupBy(col("r_q"), col("f_q"), col("m_q"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(col("m_dec")).cast("double") / count(lit(1)), 2).as("avg_m"))
          .orderBy(col("r_q"), col("f_q"), col("m_q"))
      },
      Some("""WITH cust AS (SELECT o_custkey,
            CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
              DATE '1999-01-01') AS BIGINT) AS r_days,
            COUNT(*) AS f,
            SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m_dec,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m
          FROM orders GROUP BY 1),
        th AS (SELECT
            quantile_cont(CAST(r_days AS DOUBLE), 0.25) AS r1,
            quantile_cont(CAST(r_days AS DOUBLE), 0.5) AS r2,
            quantile_cont(CAST(r_days AS DOUBLE), 0.75) AS r3,
            quantile_cont(CAST(f AS DOUBLE), 0.25) AS f1,
            quantile_cont(CAST(f AS DOUBLE), 0.5) AS f2,
            quantile_cont(CAST(f AS DOUBLE), 0.75) AS f3,
            quantile_cont(m, 0.25) AS m1,
            quantile_cont(m, 0.5) AS m2,
            quantile_cont(m, 0.75) AS m3
          FROM cust),
        b AS (SELECT
            1 + CAST(CAST(r_days AS DOUBLE) > r1 AS BIGINT)
              + CAST(CAST(r_days AS DOUBLE) > r2 AS BIGINT)
              + CAST(CAST(r_days AS DOUBLE) > r3 AS BIGINT) AS r_q,
            1 + CAST(CAST(f AS DOUBLE) > f1 AS BIGINT)
              + CAST(CAST(f AS DOUBLE) > f2 AS BIGINT)
              + CAST(CAST(f AS DOUBLE) > f3 AS BIGINT) AS f_q,
            1 + CAST(m > m1 AS BIGINT) + CAST(m > m2 AS BIGINT)
              + CAST(m > m3 AS BIGINT) AS m_q,
            m_dec
          FROM cust CROSS JOIN th)
        SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
          ROUND(CAST(SUM(m_dec) AS DOUBLE) / COUNT(*), 2) AS avg_m
        FROM b GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""")),

    // ── market-basket pair co-occurrence (beyond reference): parts bought
    //    together in one order. The self-join is keyed on the ORDER (never a
    //    part×part cross): fan-out per order is items², bounded by the
    //    line-count cap per order (7 in TPC-H shapes) — at 100 TB a wide-
    //    basket corpus would pre-cap items per basket before pairing. Global
    //    top-k compiles to TakeOrderedAndProject, no full sort ──────────────
    Q(
      "q_basket_pairs",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val a = li.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        val b = li.select(col("l_orderkey"), col("l_partkey").as("part_b"))
        a.join(b, Seq("l_orderkey"))
          .filter(col("part_a") < col("part_b"))
          .groupBy(col("part_a"), col("part_b"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(desc("n_orders"), col("part_a"), col("part_b"))
          .limit(25)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
              COUNT(*) AS n_orders
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2)
        SELECT part_a, part_b, n_orders FROM p
        ORDER BY n_orders DESC, part_a, part_b LIMIT 25""")),

    // ── deterministic list aggregation: top-5 customers per nation by
    //    spend, folded into one ordered CSV per nation. collect_list has no
    //    cross-partition order, so the list is sorted by an explicit
    //    (rank) key before joining — never by arrival order. Spend in
    //    integer cents from a decimal sum; ranks resolve ties by key ────────
    Q(
      "q_string_agg",
      (s, dir) => {
        val spend = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_custkey"), col("c_name"))
          .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
            .cast("long").as("cents"))
        val w = Window.partitionBy(col("n_name"))
          .orderBy(desc("cents"), col("c_custkey"))
        spend.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_top"),
            sum(col("cents")).as("top_cents"),
            array_join(expr("transform(array_sort(collect_list(struct(rk, c_name))), x -> x.c_name)"), ",")
              .as("top_customers"))
          .orderBy(col("n_name"))
      },
      Some("""WITH spend AS (SELECT n_name, c_custkey, c_name,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2, 3),
          ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
              ORDER BY cents DESC, c_custkey) AS rk FROM spend)
        SELECT n_name, COUNT(*) AS n_top, CAST(SUM(cents) AS BIGINT) AS top_cents,
          string_agg(c_name, ',' ORDER BY rk) AS top_customers
        FROM ranked WHERE rk <= 5 GROUP BY n_name ORDER BY n_name""")),

    // ── equi-width value histogram: 20 bins over the global [min,max],
    //    bounds from a ONE-ROW aggregate broadcast back — one scan for
    //    bounds, one for binning (swap in fixed bounds to make it a single
    //    pass at scale). Bin edges are the same IEEE expression on both
    //    engines ─────────────────────────────────────────────────────────────
    Q(
      "q_value_histogram",
      (s, dir) => {
        val e = t(s, dir, "events")
        val bounds = e.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        e.select(col("value")).crossJoin(broadcast(bounds))
          .select(
            // hi == lo (all values identical) would make the ratio NaN; a
            // degenerate range is one bin by definition. NULL values keep
            // their own NULL bin in BOTH regimes
            when(col("value").isNull, lit(null))
              .when(col("hi") === col("lo"), 0L)
              .otherwise(least(lit(19L),
                floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 20)
                  .cast("long"))).as("bin"),
            col("lo"), col("hi"))
          .groupBy(col("bin"), col("lo"), col("hi"))
          .agg(count(lit(1)).as("n"))
          .select(col("bin"), col("n"),
            round(col("lo") + (col("hi") - col("lo")) / 20 * col("bin"), 6)
              .as("lo_edge"),
            round(col("lo") + (col("hi") - col("lo")) / 20 * (col("bin") + 1), 6)
              .as("hi_edge"))
          .orderBy(col("bin"))
      },
      Some("""WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
          binned AS (SELECT CASE WHEN value IS NULL THEN NULL
              WHEN hi = lo THEN 0
              ELSE LEAST(19, CAST(FLOOR((value - lo) / (hi - lo) * 20)
                AS BIGINT)) END AS bin, lo, hi
            FROM events CROSS JOIN b)
        SELECT bin, COUNT(*) AS n,
          ROUND(lo + (hi - lo) / 20 * bin, 6) AS lo_edge,
          ROUND(lo + (hi - lo) / 20 * (bin + 1), 6) AS hi_edge
        FROM binned GROUP BY bin, lo, hi ORDER BY bin""")),

    // ── triangle census of the co-purchase graph: edges are part pairs
    //    sharing an order (basket-bounded fan-out). Round-9 rework
    //    (documented since round 4): [[graft.ext.GraphOps.triangleCount]] —
    //    degree-ordered orientation (each edge points from its
    //    (degree, id)-smaller endpoint, so a triangle is one out-wedge of
    //    its lowest-degree node, per-key fan-out ≤ O(√m) on hubs), wedges
    //    emitted once in oriented order, and a broadcast BLOOM prefilter
    //    over the oriented edges that drops non-closing wedges map-side —
    //    wedge volume is the inherent cost (~4.1B rows ≈ 60 GB shuffled at
    //    sf10) while triangles are ~4.6% of wedges, so the exact semi-join
    //    only sees candidates. Same count by construction; sf10 wall-clock
    //    in BASELINE.md. Global clustering = 3·triangles / wedges ───────────
    Q(
      "q_graph_triangles",
      (s, dir) => {
        // one cached edge table feeds the census aggregates AND the count
        // (the co-purchase derivation — lineitem self-join + distinct — is
        // the face's second-biggest cost; uncached it ran once per
        // consumer); the 1-row aggregates checkpoint eagerly so the cache
        // can be released before the composed result returns
        val e = coPurchaseEdges(s, dir).cache()
        try {
          val deg = e.select(col("u").as("node"))
            .union(e.select(col("v").as("node")))
            .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          val wedges = deg.agg(sum(col("deg") * (col("deg") - 1) / 2)
            .cast("long").as("n_wedges"),
            count(lit(1)).as("n_nodes")).localCheckpoint(true)
          val edges = e.agg(count(lit(1)).as("n_edges")).localCheckpoint(true)
          val tri = graft.ext.GraphOps.triangleCount(e)
          wedges.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
            .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
              round(col("n_triangles").cast("double") * 3 /
                col("n_wedges").cast("double"), 6).as("clustering"))
        } finally e.unpersist()
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey),
          deg AS (SELECT node, COUNT(*) AS deg FROM
            (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
          wd AS (SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
              COUNT(*) AS n_nodes FROM deg),
          tri AS (SELECT COUNT(*) AS n_triangles
            FROM e e1 JOIN e e2 ON e1.v = e2.u
            WHERE EXISTS (SELECT 1 FROM e e3
              WHERE e3.u = e1.u AND e3.v = e2.v)),
          ec AS (SELECT COUNT(*) AS n_edges FROM e)
        SELECT wd.n_nodes, ec.n_edges, tri.n_triangles,
          ROUND(CAST(tri.n_triangles AS DOUBLE) * 3
            / CAST(wd.n_wedges AS DOUBLE), 6) AS clustering
        FROM wd CROSS JOIN ec CROSS JOIN tri""")),

    // ── relative-rank windows: percent_rank and cume_dist of customer
    //    balance within each market segment — the remaining rank-family
    //    window functions (row_number/rank/ntile are covered elsewhere).
    //    Ties share a rank in both engines by definition, so double order
    //    keys are safe here ─────────────────────────────────────────────────
    Q(
      "q_percent_rank",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
        c.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
          ROUND(percent_rank() OVER w, 6) AS pct_rank,
          ROUND(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        ORDER BY c_mktsegment, c_acctbal, c_custkey""")),

    // ── value-extraction windows: first/last/nth event type per user over
    //    the full-partition frame (last_value needs the UNBOUNDED FOLLOWING
    //    frame — the default frame stops at CURRENT ROW and silently returns
    //    the current row's value). One row per user via row_number ──────────
    Q(
      "q_window_firstlast",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        e.withColumn("first_type", first(col("event_type")).over(full))
          .withColumn("last_type", last(col("event_type")).over(full))
          .withColumn("second_type", nth_value(col("event_type"), 2).over(full))
          .withColumn("rn", row_number().over(ord))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("first_type"), col("second_type"),
            col("last_type"))
          .orderBy(col("user_id"))
      },
      Some("""WITH v AS (SELECT user_id,
            first_value(event_type) OVER w AS first_type,
            nth_value(event_type, 2) OVER w AS second_type,
            last_value(event_type) OVER w AS last_type,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS rn
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        SELECT user_id, first_type, second_type, last_type
        FROM v WHERE rn = 1 ORDER BY user_id""")),

    // ── degree distribution of the co-purchase graph: power-of-two degree
    //    buckets (the q_length_histogram integer-log2 idiom) — the shape
    //    check run before choosing a graph partitioning strategy ────────────
    Q(
      "q_graph_degree_dist",
      (s, dir) => {
        val e = coPurchaseEdges(s, dir)
        e.select(col("u").as("node")).union(e.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          .withColumn("bucket", (length(bin(col("deg"))) - 1).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
          .orderBy(col("bucket"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey),
          deg AS (SELECT node, COUNT(*) AS deg FROM
            (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1)
        SELECT CAST(LENGTH(BIN(deg)) - 1 AS BIGINT) AS bucket,
          COUNT(*) AS n_nodes, MIN(deg) AS min_deg, MAX(deg) AS max_deg
        FROM deg GROUP BY 1 ORDER BY bucket""")),

    // ── relational division: customers whose orders cover EVERY priority
    //    class — the "for all" query shape (suppliers stocking every part
    //    type, users hitting every feature). Expressed as count-distinct
    //    equality against the ONE-ROW universe size, not nested NOT EXISTS
    //    — one aggregate per side, no correlated subquery ───────────────────
    Q(
      "q_relational_division",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val universe = o.select(col("o_orderpriority")).distinct()
          .agg(count(lit(1)).as("n_priorities"))
        val perCust = o.groupBy(col("o_custkey"))
          .agg(countDistinct(col("o_orderpriority")).as("n_pr"))
        perCust.crossJoin(broadcast(universe))
          .agg(max(col("n_priorities")).as("n_priorities"),
            count(lit(1)).as("n_customers_with_orders"),
            sum(when(col("n_pr") === col("n_priorities"), 1L).otherwise(0L))
              .as("n_covering"))
      },
      Some("""WITH u AS (SELECT COUNT(DISTINCT o_orderpriority) AS n_priorities
            FROM orders),
          pc AS (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_pr
            FROM orders GROUP BY 1)
        SELECT MAX(u.n_priorities) AS n_priorities,
          COUNT(*) AS n_customers_with_orders,
          CAST(SUM(CASE WHEN n_pr = u.n_priorities THEN 1 ELSE 0 END) AS BIGINT)
            AS n_covering
        FROM pc CROSS JOIN u"""))
  )
}

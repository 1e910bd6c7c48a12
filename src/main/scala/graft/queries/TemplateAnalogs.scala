package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Helpers._

/** Oracle-checked analogs of representative SAP templates (SURVEY §2 /
  * `SapTemplates`), promoted onto the TPC-H-ish corpus so the driver's
  * DuckDB compare verifies the template *shapes* end-to-end:
  *
  *   - trial balance (opening + signed activity + ending, text lookup)
  *   - FBL1N open ∪ cleared with status markers
  *   - FBL5N overdue-by-partner rollup
  *   - IW49N cancelled-operations listing
  *   - R2R header↔lines reconciliation (join against pre-aggregated side)
  *   - three-way match (ordered vs shipped vs kept quantities)
  *   - ME2M by-material rollup
  *
  * Scale notes: every query is one shuffle (the groupBy/join key) with dims
  * broadcast; reconciliation pre-aggregates the big side before joining, so
  * no row explosion. Outputs are BIGINT/DOUBLE/STRING/DATE with exact
  * decimal math internally (oracle-parity policy in Helpers).
  */
object TemplateAnalogs {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(
    // ── trial balance: per "account" (supplier) opening balance + signed
    //    period activity + ending balance + text lookup (GLT0/SKA1/SKAT) ────
    Q(
      "q_tmpl_trial_balance",
      (s, dir) => {
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val l = t(s, dir, "lineitem")
        val activity = l.groupBy(col("l_suppkey"))
          .agg(sum(signedAmount(col("l_returnflag"), money(col("l_extendedprice")), "R"))
            .as("act_dec"))
        su.join(activity, col("s_suppkey") === col("l_suppkey"), "left")
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name").as("region_text"),
            money(col("s_acctbal")).cast("double").as("opening_balance"),
            coalesce(col("act_dec"), lit(0)).cast("double").as("period_activity"),
            (money(col("s_acctbal")) + coalesce(col("act_dec"), lit(0)))
              .cast("double").as("ending_balance"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, n_name AS region_text,
          CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS opening_balance,
          CAST(COALESCE(a.act_dec, 0) AS DOUBLE) AS period_activity,
          CAST(CAST(s_acctbal AS DECIMAL(18,2)) + COALESCE(a.act_dec, 0) AS DOUBLE) AS ending_balance
        FROM supplier
        LEFT JOIN (SELECT l_suppkey,
              SUM(CASE WHEN l_returnflag = 'R' THEN -CAST(l_extendedprice AS DECIMAL(18,2))
                       ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END) AS act_dec
            FROM lineitem GROUP BY l_suppkey) a ON s_suppkey = a.l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        ORDER BY s_suppkey""")),

    // ── FBL1N: open ∪ cleared line items with status markers + partner ─────
    Q(
      "q_tmpl_open_cleared_union",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        def side(status: String, label: String) =
          o.filter(col("o_orderstatus") === status)
            .join(broadcast(c), col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), col("c_name"),
              to_date(col("o_orderdate")).as("order_date"),
              money(col("o_totalprice")).cast("double").as("amount"),
              lit(label).as("item_status"))
        side("O", "Open").unionAll(side("F", "Cleared"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, c_name, CAST(o_orderdate AS DATE) AS order_date,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
          CASE WHEN o_orderstatus = 'O' THEN 'Open' ELSE 'Cleared' END AS item_status
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus IN ('O', 'F')
        ORDER BY o_orderkey""")),

    // ── FBL5N overdue: per-partner rollup of overdue open items ────────────
    Q(
      "q_tmpl_overdue_by_partner",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.filter(col("o_orderstatus") === "O" &&
            col("o_orderdate") < lit("1997-01-01"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(count(lit(1)).as("n_overdue"),
            sum(money(col("o_totalprice"))).cast("double").as("overdue_amount"),
            min(to_date(col("o_orderdate"))).as("oldest_date"))
          .orderBy(desc("overdue_amount"), col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, COUNT(*) AS n_overdue,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS overdue_amount,
          MIN(CAST(o_orderdate AS DATE)) AS oldest_date
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name
        ORDER BY overdue_amount DESC, c_custkey""")),

    // ── IW49N cancelled operations: returned lines per order ───────────────
    Q(
      "q_tmpl_cancelled_operations",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_returnflag") === "R")
          .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
          .agg(count(lit(1)).as("n_cancelled"),
            sum(money(col("l_extendedprice"))).cast("double").as("cancelled_amount"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
          COUNT(*) AS n_cancelled,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS cancelled_amount
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY o_orderkey""")),

    // ── R2R reconciliation: header total vs pre-aggregated line total ──────
    Q(
      "q_tmpl_r2r_reconciliation",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val lines = l.groupBy(col("l_orderkey"))
          .agg(sum(money(col("l_extendedprice"))).as("line_dec"),
            count(lit(1)).as("n_lines"))
        o.join(lines, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"),
            money(col("o_totalprice")).cast("double").as("header_total"),
            coalesce(col("line_dec"), lit(0)).cast("double").as("line_total"),
            (money(col("o_totalprice")) - coalesce(col("line_dec"), lit(0)))
              .cast("double").as("variance"),
            coalesce(col("n_lines"), lit(0)).cast("long").as("n_lines"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS header_total,
          CAST(COALESCE(line_dec, 0) AS DOUBLE) AS line_total,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) - COALESCE(line_dec, 0) AS DOUBLE) AS variance,
          CAST(COALESCE(n_lines, 0) AS BIGINT) AS n_lines
        FROM orders
        LEFT JOIN (SELECT l_orderkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS line_dec,
              COUNT(*) AS n_lines
            FROM lineitem GROUP BY l_orderkey) l ON o_orderkey = l_orderkey
        ORDER BY o_orderkey""")),

    // ── three-way match: ordered vs shipped vs kept with mismatch filter ───
    Q(
      "q_tmpl_three_way_match",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(col("l_orderkey"))
          .agg(sum(qty(col("l_quantity"))).as("ordered_dec"),
            sum(when(col("l_linestatus") === "F", qty(col("l_quantity")))
              .otherwise(lit(0))).as("shipped_dec"),
            sum(when(col("l_returnflag") =!= "R", qty(col("l_quantity")))
              .otherwise(lit(0))).as("kept_dec"))
          .filter(col("shipped_dec") =!= col("ordered_dec") ||
            col("kept_dec") =!= col("ordered_dec"))
          .select(col("l_orderkey"),
            col("ordered_dec").cast("double").as("ordered_qty"),
            col("shipped_dec").cast("double").as("shipped_qty"),
            col("kept_dec").cast("double").as("kept_qty"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey,
          CAST(ordered_dec AS DOUBLE) AS ordered_qty,
          CAST(shipped_dec AS DOUBLE) AS shipped_qty,
          CAST(kept_dec AS DOUBLE) AS kept_qty
        FROM (SELECT l_orderkey,
            SUM(CAST(l_quantity AS DECIMAL(18,3))) AS ordered_dec,
            SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,3)) ELSE 0 END) AS shipped_dec,
            SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_quantity AS DECIMAL(18,3)) ELSE 0 END) AS kept_dec
          FROM lineitem GROUP BY l_orderkey)
        WHERE shipped_dec <> ordered_dec OR kept_dec <> ordered_dec
        ORDER BY l_orderkey""")),

    // ── top_vendors_by_spend: signed spend rollup + deterministic TOP-5 ────
    Q(
      "q_tmpl_top_vendors",
      (s, dir) => {
        val su = t(s, dir, "supplier")
        val l = t(s, dir, "lineitem")
        val spend = l.groupBy(col("l_suppkey"))
          .agg(sum(signedAmount(col("l_returnflag"),
            money(col("l_extendedprice")), "R")).as("spend_dec"))
        spend.join(su, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey").as("vendor_number"),
            col("s_name").as("vendor_name"),
            col("spend_dec").cast("double").as("total_spend"))
          .orderBy(desc("total_spend"), col("vendor_number"))
          .limit(5)
      },
      Some("""SELECT s_suppkey AS vendor_number, s_name AS vendor_name,
          CAST(SUM(CASE WHEN l_returnflag = 'R'
              THEN -CAST(l_extendedprice AS DECIMAL(18,2))
              ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_spend
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_suppkey, s_name
        ORDER BY total_spend DESC, vendor_number LIMIT 5""")),

    // ── cost_center_actual_vs_plan: two conditional measures + variance
    //    over one fact table (WRTTP='04' vs '01' transposed to the order-
    //    status axis; "cost center" = order priority class) ─────────────────
    Q(
      "q_tmpl_cost_center_variance",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupBy(col("o_orderpriority").as("cost_center"))
          .agg(sum(when(col("o_orderstatus") === "F",
              money(col("o_totalprice"))).otherwise(lit(0))).as("act_dec"),
            sum(when(col("o_orderstatus") === "O",
              money(col("o_totalprice"))).otherwise(lit(0))).as("plan_dec"))
          .select(col("cost_center"),
            col("act_dec").cast("double").as("actual_amount"),
            col("plan_dec").cast("double").as("plan_amount"),
            (col("act_dec") - col("plan_dec")).cast("double").as("variance"))
          .orderBy(col("cost_center"))
      },
      Some("""SELECT o_orderpriority AS cost_center,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS actual_amount,
          CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS plan_amount,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END)
             - SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS variance
        FROM orders GROUP BY o_orderpriority ORDER BY cost_center""")),

    // ── sales_orders_by_period: date-range listing with partner names ──────
    Q(
      "q_tmpl_orders_by_period",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1995-04-01"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey").as("sales_order"),
            to_date(col("o_orderdate")).as("created_on"),
            col("o_orderpriority").as("order_type"),
            col("c_custkey").as("customer_number"),
            col("c_name").as("customer_name"),
            money(col("o_totalprice")).cast("double").as("order_value"))
          .orderBy(col("created_on"), col("sales_order"))
      },
      Some("""SELECT o_orderkey AS sales_order, CAST(o_orderdate AS DATE) AS created_on,
          o_orderpriority AS order_type, c_custkey AS customer_number,
          c_name AS customer_name,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS order_value
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        ORDER BY created_on, sales_order""")),

    // ── ar_aging: per-partner aging buckets over open items (CASE bucket +
    //    count/sum; lexicographic bucket labels sort in age order) ───────────
    Q(
      "q_tmpl_aging_bucket",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val days = datediff(lit("1998-08-02").cast("date"),
          to_date(col("o_orderdate")))
        val bucket = when(days <= 30, "0-30 days")
          .when(days <= 60, "31-60 days")
          .when(days <= 90, "61-90 days")
          .otherwise("90+ days")
        o.filter(col("o_orderstatus") === "O")
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"),
            bucket.as("aging_bucket"))
          .agg(count(lit(1)).as("n_items"),
            sum(money(col("o_totalprice"))).cast("double").as("open_amount"))
          .orderBy(col("c_custkey"), col("aging_bucket"))
      },
      Some("""SELECT c_custkey, c_name,
          CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02') <= 30 THEN '0-30 days'
               WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02') <= 60 THEN '31-60 days'
               WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02') <= 90 THEN '61-90 days'
               ELSE '90+ days' END AS aging_bucket,
          COUNT(*) AS n_items,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_amount
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'O'
        GROUP BY 1, 2, 3 ORDER BY c_custkey, aging_bucket""")),

    // ── PO over threshold: per-document line rollup + HAVING + partner ─────
    Q(
      "q_tmpl_po_over_threshold",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val c = t(s, dir, "customer")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey").as("po_number"),
            col("c_custkey").as("vendor_number"),
            col("c_name").as("vendor_name"),
            to_date(col("o_orderdate")).as("po_date"))
          .agg(count(lit(1)).as("line_items"),
            sum(money(col("l_extendedprice"))).as("val_dec"))
          .filter(col("val_dec") > 300000)
          .select(col("po_number"), col("vendor_number"), col("vendor_name"),
            col("po_date"), col("line_items"),
            col("val_dec").cast("double").as("total_po_value"))
          .orderBy(desc("total_po_value"), col("po_number"))
      },
      Some("""SELECT o_orderkey AS po_number, c_custkey AS vendor_number,
          c_name AS vendor_name, CAST(o_orderdate AS DATE) AS po_date,
          COUNT(*) AS line_items,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_po_value
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2, 3, 4
        HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) > 300000
        ORDER BY total_po_value DESC, po_number""")),

    // ── employee_headcount: AGGREGATE-ONLY rollup (the governance-clean
    //    form — counts per org axis, no person-level rows) ───────────────────
    Q(
      "q_tmpl_headcount",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("org_unit"),
            col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("headcount"))
          .orderBy(col("org_unit"), col("segment"))
      },
      Some("""SELECT n_name AS org_unit, c_mktsegment AS segment,
          COUNT(*) AS headcount
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2 ORDER BY org_unit, segment""")),

    // ── ME2M: by-material rollup with master-text join ─────────────────────
    Q(
      "q_tmpl_by_material",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_partkey"), col("p_name"))
          .agg(countDistinct(col("l_orderkey")).as("n_orders"),
            sum(qty(col("l_quantity"))).cast("double").as("total_qty"),
            sum(money(col("l_extendedprice"))).cast("double").as("total_value"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, COUNT(DISTINCT l_orderkey) AS n_orders,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS total_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey, p_name
        ORDER BY p_partkey""")),

    // ── payroll_period_summary analog (round 12 — the YYYYMMDD date-format
    //    landmine, SURVEY §1.3): HR/PAY tables store dates as CHAR(8)
    //    'YYYYMMDD' strings (HRPY_RGDIR.FPBEG/FPEND), so every period query
    //    must round-trip string → real date for range logic and back for
    //    display. The analog ENCODES o_orderdate to the stored string form,
    //    PARSES it back for a real date-range filter, and groups by the raw
    //    string — a format-pattern slip (Spark 'yyyyMMdd'/'yyyy-MM' vs
    //    DuckDB '%Y%m%d'/'%Y-%m') or a lexicographic-vs-date compare flips
    //    the hash ─────────────────────────────────────────────────────────
    Q(
      "q_tmpl_payroll_period",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val stored = o.select(
          date_format(col("o_orderdate"), "yyyyMMdd").as("fpbeg"),
          col("o_custkey"))
        val parsed = stored
          .withColumn("d", to_date(col("fpbeg"), "yyyyMMdd"))
          .filter(col("d").between(lit("1994-01-01"), lit("1996-12-31")))
        parsed
          .groupBy(col("fpbeg"),
            date_format(col("d"), "yyyy-MM").as("period_month"))
          .agg(count(lit(1)).as("n_results"),
            countDistinct(col("o_custkey")).as("n_employees"))
          .orderBy(col("fpbeg"))
      },
      Some("""WITH stored AS (
          SELECT strftime(o_orderdate, '%Y%m%d') AS fpbeg, o_custkey
          FROM orders),
        parsed AS (
          SELECT fpbeg, o_custkey,
            CAST(strptime(fpbeg, '%Y%m%d') AS DATE) AS d
          FROM stored)
        SELECT fpbeg, strftime(d, '%Y-%m') AS period_month,
          COUNT(*) AS n_results,
          COUNT(DISTINCT o_custkey) AS n_employees
        FROM parsed
        WHERE d BETWEEN DATE '1994-01-01' AND DATE '1996-12-31'
        GROUP BY fpbeg, period_month
        ORDER BY fpbeg""")),

    // ── KSB1/COSP OBJNR-prefix analog (round 12 — the OBJNR encoding
    //    landmine, reference sap_semantic_model.json:7537-7547): CO object
    //    keys are 'KS' + 10-char zero-padded cost center, joined on the
    //    FULL key but reported via SUBSTR(OBJNR, 7) — 1-based, drops the
    //    2-char type tag plus the first 4 pad chars. The analog builds the
    //    same encoded key from customers, joins the fact side on the full
    //    key, and groups by the extracted suffix — an off-by-one in the
    //    1-based offset or a join on the suffix instead of the full key
    //    flips the hash ──────────────────────────────────────────────────
    Q(
      "q_tmpl_objnr_prefix",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val dim = c.select(
          concat(lit("KS"), lpad(col("c_custkey").cast("string"), 10, "0"))
            .as("objnr"),
          col("c_custkey"))
        o.join(broadcast(dim), col("o_custkey") === col("c_custkey"))
          .groupBy(substring(col("objnr"), 7, 6).as("cost_center"),
            col("o_orderpriority").as("cost_element"))
          .agg(count(lit(1)).as("n_postings"),
            sum(money(col("o_totalprice"))).cast("double").as("actual_amount"))
          .orderBy(col("cost_center"), col("cost_element"))
      },
      Some("""WITH dim AS (
          SELECT 'KS' || lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS objnr,
            c_custkey
          FROM customer)
        SELECT SUBSTR(objnr, 7) AS cost_center,
          o_orderpriority AS cost_element,
          COUNT(*) AS n_postings,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS actual_amount
        FROM orders JOIN dim ON o_custkey = c_custkey
        GROUP BY 1, 2
        ORDER BY cost_center, cost_element""")),

    // ── journal_entry_detail analog (round 12): the reference's loudest
    //    guideline — currency (WAERS) lives on the HEADER (BKPF), never the
    //    line items (BSEG); a line listing must attribute it through the
    //    header join. Analog: per-document listing where the CHAR status
    //    axis comes from the orders header while quantities roll up from
    //    lineitem — attributing the axis from the wrong side changes the
    //    grouping and flips the hash ─────────────────────────────────────
    Q(
      "q_tmpl_journal_detail",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"),
            col("o_orderstatus").as("doc_currency"))
          .agg(count(lit(1)).as("n_lines"),
            sum(money(col("l_extendedprice"))).cast("double").as("doc_total"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus AS doc_currency,
          COUNT(*) AS n_lines,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS doc_total
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderstatus
        ORDER BY o_orderkey""")),

    // ── benefits_enrollment_summary analog (round 12): aggregate-only
    //    enrollment rollup — distinct members and coverage totals per
    //    (plan, category) through a member⋈enrollment join ────────────────
    Q(
      "q_tmpl_enrollment",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment").as("benefit_plan"),
            col("o_orderpriority").as("category"))
          .agg(countDistinct(col("c_custkey")).as("n_enrolled"),
            sum(money(col("o_totalprice"))).cast("double").as("total_coverage"))
          .orderBy(col("benefit_plan"), col("category"))
      },
      Some("""SELECT c_mktsegment AS benefit_plan,
          o_orderpriority AS category,
          COUNT(DISTINCT c_custkey) AS n_enrolled,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS total_coverage
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY 1, 2
        ORDER BY benefit_plan, category""")),

    // ── value_chain_p2p_cycle_time analog (round 13, reference
    //    sap_semantic_model.json:7828-7840): anchor-header cycle-time chain
    //    — event rows filtered by a movement-type IN-list (BWART IN
    //    ('101','161')), MIN/MAX stage dates per document, then a datediff
    //    chain between consecutive stages plus the end-to-end total.
    //    Events are PRE-AGGREGATED per document before the join (MIN/MAX
    //    are duplication-immune, so this equals the reference's
    //    join-then-group shape while keeping the big side 1:1 — no row
    //    explosion at scale); documents with no qualifying events keep
    //    NULL stages through the left join, exactly like a PO with no
    //    goods receipt ─────────────────────────────────────────────────────
    Q(
      "q_tmpl_p2p_cycle_time",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        // three event stages from the one movement table, exactly the
        // reference's shape (EKBE receipts / RBKP invoices / BSIK postings
        // are three conditional date streams): IN-list gates which rows
        // are events at all, per-stage conditions pick each stage's dates
        val ev = l.filter(col("l_returnflag").isin("N", "R"))
          .groupBy(col("l_orderkey"))
          .agg(min(to_date(col("l_shipdate"))).as("first_receipt_date"),
            max(when(col("l_linestatus") === "F", to_date(col("l_shipdate"))))
              .as("invoice_date"),
            max(when(col("l_returnflag") === "R", to_date(col("l_shipdate"))))
              .as("ap_posting_date"))
        o.join(ev, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey").as("purchase_order"),
            to_date(col("o_orderdate")).as("po_date"),
            col("first_receipt_date"),
            datediff(col("first_receipt_date"), to_date(col("o_orderdate")))
              .cast("long").as("po_to_gr_days"),
            col("invoice_date"),
            datediff(col("invoice_date"), col("first_receipt_date"))
              .cast("long").as("gr_to_invoice_days"),
            col("ap_posting_date"),
            datediff(col("ap_posting_date"), col("invoice_date"))
              .cast("long").as("invoice_to_ap_days"),
            datediff(col("ap_posting_date"), to_date(col("o_orderdate")))
              .cast("long").as("total_p2p_days"))
          .orderBy(col("po_date").desc, col("purchase_order"))
      },
      Some("""WITH ev AS (SELECT l_orderkey,
            MIN(CAST(l_shipdate AS DATE)) AS first_receipt_date,
            MAX(CASE WHEN l_linestatus = 'F' THEN CAST(l_shipdate AS DATE)
                END) AS invoice_date,
            MAX(CASE WHEN l_returnflag = 'R' THEN CAST(l_shipdate AS DATE)
                END) AS ap_posting_date
          FROM lineitem WHERE l_returnflag IN ('N', 'R')
          GROUP BY l_orderkey)
        SELECT o_orderkey AS purchase_order,
          CAST(o_orderdate AS DATE) AS po_date,
          first_receipt_date,
          date_diff('day', CAST(o_orderdate AS DATE), first_receipt_date)
            AS po_to_gr_days,
          invoice_date,
          date_diff('day', first_receipt_date, invoice_date)
            AS gr_to_invoice_days,
          ap_posting_date,
          date_diff('day', invoice_date, ap_posting_date)
            AS invoice_to_ap_days,
          date_diff('day', CAST(o_orderdate AS DATE), ap_posting_date)
            AS total_p2p_days
        FROM orders LEFT JOIN ev ON o_orderkey = l_orderkey
        ORDER BY po_date DESC, purchase_order""")),

    // ── tcode_ksb1_cost_center_actual_line_items analog (round 13,
    //    reference sap_semantic_model.json:7679-7690): the LIKE-on-
    //    COMPUTED-prefix join idiom — the reference joins COEP to CSKS on
    //    the equi key and then requires e.OBJNR LIKE SUBSTR(s.OBJNR,1,8)
    //    || '%', a prefix computed from the joined ROW, not a literal —
    //    neither engine can constant-fold the pattern. Analog: the joined
    //    customer's name must match a prefix computed from the document
    //    key (~10% selective), on top of the equi joins; plus the KSB1
    //    listing shape — fiscal year / period derivation, signed amount,
    //    dim text, multi-key ORDER BY ─────────────────────────────────────
    Q(
      "q_tmpl_ksb1_line_items",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .filter(expr(
            "c_name LIKE 'Customer#00000' || CAST(o_orderkey % 10 AS STRING) || '%'"))
          .select(col("c_custkey").as("cost_center"),
            col("c_name").as("cost_center_name"),
            year(col("o_orderdate")).cast("long").as("fiscal_year"),
            month(col("o_orderdate")).cast("long").as("period"),
            col("o_orderkey").as("document_number"),
            signedAmount(col("o_orderstatus"), money(col("o_totalprice")), "O")
              .cast("double").as("amount"),
            col("n_name").as("currency_area"))
          .orderBy(col("fiscal_year"), col("period"), col("cost_center"),
            col("document_number"))
      },
      Some("""SELECT c_custkey AS cost_center, c_name AS cost_center_name,
          CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS fiscal_year,
          CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS period,
          o_orderkey AS document_number,
          CAST(CASE WHEN o_orderstatus = 'O'
               THEN -CAST(o_totalprice AS DECIMAL(18,2))
               ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS DOUBLE)
            AS amount,
          n_name AS currency_area
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_name LIKE 'Customer#00000' || CAST(o_orderkey % 10 AS VARCHAR)
          || '%'
        ORDER BY fiscal_year, period, cost_center, document_number""")),

    // ── value_chain_o2c_pipeline_summary analog (round 13): the FUNNEL
    //    shape — a UNION ALL of per-stage one-row aggregates where each
    //    stage's population is carved out by an ANTI-JOIN against the next
    //    stage's key set (the reference's `NOT IN (SELECT …)` per pipeline
    //    stage: orders with no delivery, deliveries with no invoice, …).
    //    Spark side uses left_anti (the NOT-IN rewrite that stays
    //    null-safe and broadcastable); stage labels carry an ordinal so
    //    the funnel orders deterministically. Empty stages still emit
    //    their row (global agg) with a zero total — the funnel never
    //    silently loses a stage ───────────────────────────────────────────
    Q(
      "q_tmpl_o2c_pipeline",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val shipped = l.filter(col("l_linestatus") === "F")
          .select(col("l_orderkey")).distinct()
        val returned = l.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")).distinct()
        def stage(label: String, df: DataFrame, key: String,
            amount: org.apache.spark.sql.Column) =
          df.agg(countDistinct(col(key)).as("n_docs"),
            coalesce(sum(amount), lit(0)).cast("double").as("total_value"))
            .select(lit(label).as("pipeline_stage"), col("n_docs"),
              col("total_value"))
        val s1 = stage("1 Unshipped Orders",
          o.join(shipped, o("o_orderkey") === shipped("l_orderkey"),
            "left_anti"),
          "o_orderkey", money(col("o_totalprice")))
        val s2 = stage("2 Shipped Unreturned",
          l.filter(col("l_linestatus") === "F")
            .join(returned, Seq("l_orderkey"), "left_anti"),
          "l_orderkey", money(col("l_extendedprice")))
        val s3 = stage("3 Returned",
          l.filter(col("l_returnflag") === "R"),
          "l_orderkey",
          signedAmount(col("l_linestatus"), money(col("l_extendedprice")), "O"))
        s1.unionAll(s2).unionAll(s3).orderBy(col("pipeline_stage"))
      },
      Some("""SELECT '1 Unshipped Orders' AS pipeline_stage,
          COUNT(DISTINCT o_orderkey) AS n_docs,
          CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0)
            AS DOUBLE) AS total_value
        FROM orders
        WHERE o_orderkey NOT IN
          (SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F')
        UNION ALL
        SELECT '2 Shipped Unreturned',
          COUNT(DISTINCT l_orderkey),
          CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0)
            AS DOUBLE)
        FROM lineitem WHERE l_linestatus = 'F'
          AND l_orderkey NOT IN
            (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        UNION ALL
        SELECT '3 Returned',
          COUNT(DISTINCT l_orderkey),
          CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
              THEN -CAST(l_extendedprice AS DECIMAL(18,2))
              ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END), 0)
            AS DOUBLE)
        FROM lineitem WHERE l_returnflag = 'R'
        ORDER BY pipeline_stage""")),

    // ── FBL3N: the GL LINE-ITEM DISPLAY shape (SapTemplates tcode_fbl3n,
    //    sap_semantic_model.json:7576-7583 — the account-axis detail
    //    listing none of the other analogs exercises): items joined to
    //    their header, a SIGNED amount CASE (the SHKZG axis), an
    //    open/cleared STATUS CASE derived per line, a header-attribute
    //    filter, and the display's multi-key (account, doc, line) order.
    //    Scale shape: one item↔header equi join (header side prunable by
    //    the filter before the join), no aggregation — the listing is the
    //    operator; the sort is the display contract ─────────────────────────
    Q(
      "q_tmpl_fbl3n_line_items",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("account"),
            col("o_orderkey").as("doc"),
            col("l_linenumber").cast("long").as("line"),
            col("o_orderdate").as("doc_date"),
            signedAmount(col("l_returnflag"),
              money(col("l_extendedprice")), "R")
              .cast("double").as("signed_amount"),
            when(col("l_linestatus") === "O", lit("Open"))
              .otherwise(lit("Cleared")).as("item_status"))
          .orderBy(col("account"), col("doc"), col("line"))
      },
      Some("""SELECT l_suppkey AS account, o_orderkey AS doc,
          CAST(l_linenumber AS BIGINT) AS line, o_orderdate AS doc_date,
          CAST(CASE WHEN l_returnflag = 'R'
              THEN -CAST(l_extendedprice AS DECIMAL(18,2))
              ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END
            AS DOUBLE) AS signed_amount,
          CASE WHEN l_linestatus = 'O' THEN 'Open' ELSE 'Cleared' END
            AS item_status
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        ORDER BY account, doc, line""")),

    // ── R2R month-end close status (SapTemplates
    //    value_chain_record_to_report_close_status,
    //    sap_semantic_model.json:7843-7856): UNION ALL of per-component
    //    close indicators, each COUNT(DISTINCT doc) + MAX(date) over ONE
    //    period — the one template whose period axis is DERIVED from the
    //    date with format tokens (strftime in the reference; the middle
    //    branch keeps the reference's SUBSTR-on-date-string month
    //    extraction verbatim, the format-token map's hardest case) plus an
    //    unreconciled-open-items branch. Scale shape: three independent
    //    scans, each one partial-agg'd COUNT DISTINCT — no joins, the
    //    period filters prune at the scan ───────────────────────────────────
    Q(
      "q_tmpl_r2r_close_status",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val gl = o.filter(year(col("o_orderdate")) === 1995 &&
            month(col("o_orderdate")) === 3)
          .agg(countDistinct(col("o_orderkey")).as("n"),
            max(col("o_orderdate")).as("latest_date"))
          .select(lit("1 Orders posted").as("close_component"),
            col("n"), col("latest_date"))
        val co = l.filter(year(col("l_shipdate")) === 1995 &&
            substring(col("l_shipdate").cast("string"), 6, 2) === "03")
          .agg(countDistinct(col("l_orderkey")).as("n"),
            max(col("l_shipdate")).as("latest_date"))
          .select(lit("2 Lines shipped").as("close_component"),
            col("n"), col("latest_date"))
        // the reference's third branch is open items in the period
        // (BSID ... AUGDT IS NULL) — the open-marker analog is linestatus
        val recon = l.filter(year(col("l_shipdate")) === 1995 &&
            col("l_linestatus") === "O")
          .agg(countDistinct(col("l_orderkey")).as("n"),
            max(col("l_shipdate")).as("latest_date"))
          .select(lit("3 Open receivables").as("close_component"),
            col("n"), col("latest_date"))
        gl.unionByName(co).unionByName(recon)
          .orderBy(col("close_component"))
      },
      Some("""SELECT '1 Orders posted' AS close_component,
          COUNT(DISTINCT o_orderkey) AS n, MAX(o_orderdate) AS latest_date
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
          AND EXTRACT(MONTH FROM o_orderdate) = 3
        UNION ALL
        SELECT '2 Lines shipped',
          COUNT(DISTINCT l_orderkey), MAX(l_shipdate)
        FROM lineitem
        WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
          AND SUBSTR(CAST(l_shipdate AS VARCHAR), 6, 2) = '03'
        UNION ALL
        SELECT '3 Open receivables',
          COUNT(DISTINCT l_orderkey), MAX(l_shipdate)
        FROM lineitem
        WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
          AND l_linestatus = 'O'
        ORDER BY close_component""")),

    // ── GR/IR match (SapTemplates gr_ir_match, sap_semantic_model's
    //    EKPO⟕EKBE clearing report): expected-vs-received matching where the
    //    history side is constrained by CONSTANT FILTERS ON THE OUTER JOIN'S
    //    ON CLAUSE (BEWTP='E', BWART IN movement types — here linestatus +
    //    returnflag), so an item with NO qualifying receipts survives with
    //    IFNULL(SUM)=0 and its full value open — the idiom a WHERE would
    //    silently break (it would drop exactly the never-received items the
    //    report exists to surface; ~26% of orders here). open = key-column
    //    arithmetic against the aggregate. Scale: the history side is
    //    pre-aggregated per key BEFORE the left join (duplication-immune, no
    //    row explosion), the oracle keeps the reference's group-after-join
    //    form — same multiset by construction ──────────────────────────────
    Q(
      "q_tmpl_gr_ir_match",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val recv = l
          .filter(col("l_linestatus") === "F" &&
            col("l_returnflag").isin("N", "R"))
          .groupBy(col("l_orderkey"))
          .agg(sum(money(col("l_extendedprice"))).as("recv_dec"))
        o.join(recv, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"),
            money(col("o_totalprice")).cast("double").as("ordered_value"),
            coalesce(col("recv_dec"), lit(0)).cast("double")
              .as("received_value"),
            (money(col("o_totalprice")) - coalesce(col("recv_dec"), lit(0)))
              .cast("double").as("open_value"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o.o_orderkey,
          CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS ordered_value,
          CAST(IFNULL(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
            AS received_value,
          CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
            - IFNULL(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
            AS open_value
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          AND l.l_linestatus = 'F' AND l.l_returnflag IN ('N', 'R')
        GROUP BY o.o_orderkey, o.o_totalprice
        ORDER BY o.o_orderkey""")),

    // ── delivery status (SapTemplates delivery_status, LIKP⟕LIPS): per
    //    header a goods-issue status CASE plus COUNT(item column) over a
    //    FILTERED left join — COUNT of a nullable column skips the
    //    unmatched-header null row, so headers with no qualifying items
    //    report 0 (COUNT(*) would report 1 — the classic left-join-count
    //    trap this template's shape dodges). Same pre-aggregated Spark plan
    //    / faithful group-after-join oracle split as gr_ir_match ────────────
    Q(
      "q_tmpl_delivery_status",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val items = l.filter(col("l_returnflag") === "R")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        o.join(items, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            when(col("o_orderstatus") === "O", "Pending goods issue")
              .otherwise("Goods issued").as("status"),
            coalesce(col("cnt"), lit(0L)).as("n_items"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
          CASE WHEN o.o_orderstatus = 'O' THEN 'Pending goods issue'
               ELSE 'Goods issued' END AS status,
          COUNT(l.l_linenumber) AS n_items
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          AND l.l_returnflag = 'R'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
        ORDER BY o.o_orderkey""")),

    // ── sales-order backlog (SapTemplates sales_order_backlog, VBAK⋈VBAP
    //    with NOT EXISTS on the VBFA doc flow): the three-filter backlog
    //    composition — header gate (not soft-deleted), item gate (not
    //    rejected), and a CORRELATED NOT EXISTS against the successor
    //    document flow (no delivery yet). The oracle keeps the correlated
    //    form verbatim; the Spark plan expresses it as a left_anti against
    //    the distinct successor keys BEFORE the item join fans out — the
    //    anti-join runs on the small header side, never on header×items ───
    Q(
      "q_tmpl_so_backlog",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val shipped = l.filter(col("l_linestatus") === "F")
          .select(col("l_orderkey").as("__sk")).distinct()
        o.filter(col("o_orderstatus") =!= "F")
          .join(shipped, col("o_orderkey") === col("__sk"), "left_anti")
          .join(l.filter(col("l_returnflag") =!= "R"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            col("l_linenumber"),
            col("l_partkey"),
            money(col("l_quantity")).cast("double").as("qty"),
            money(col("l_extendedprice")).cast("double").as("line_value"))
          .orderBy(col("o_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
          l.l_linenumber, l.l_partkey,
          CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty,
          CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS line_value
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          AND l.l_returnflag <> 'R'
        WHERE o.o_orderstatus <> 'F'
          AND NOT EXISTS (SELECT 1 FROM lineitem f
                          WHERE f.l_orderkey = o.o_orderkey
                            AND f.l_linestatus = 'F')
        ORDER BY o.o_orderkey, l.l_linenumber""")),

    // ── inventory on hand (SapTemplates inventory_on_hand, the
    //    MARD⋈MARC⋈MARA⟕MAKT master chain): a big stock fact joined up a
    //    master-data chain with (a) a master-record soft-delete gate
    //    (LVORM='') and (b) a LANGUAGE-FILTERED left text join (MAKT with
    //    SPRAS='E' in the ON clause — a WHERE would drop untranslated
    //    materials; here some suppliers have no region-2 text row and must
    //    survive with a NULL text GROUP), aggregated over mixed fact/master
    //    keys including the nullable text column. Dims broadcast; one
    //    shuffle on the group keys ────────────────────────────────────────
    Q(
      "q_tmpl_inventory_on_hand",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val text = n.filter(col("n_regionkey") === 2)
          .select(col("n_nationkey").as("__tk"), col("n_name").as("text"))
        l.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(p.filter(col("p_size") < 48)),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(text), col("s_nationkey") === col("__tk"), "left")
          .groupBy(col("l_partkey"), col("p_type"), col("text"),
            col("s_nationkey"))
          .agg(sum(money(col("l_quantity"))).cast("double")
            .as("unrestricted_stock"))
          .orderBy(col("l_partkey"), col("s_nationkey"))
      },
      Some("""SELECT d.l_partkey, a.p_type, t.n_name AS text, c.s_nationkey,
          CAST(SUM(CAST(d.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            AS unrestricted_stock
        FROM lineitem d
        JOIN supplier c ON c.s_suppkey = d.l_suppkey
        JOIN part a ON a.p_partkey = d.l_partkey
        LEFT JOIN nation t ON t.n_nationkey = c.s_nationkey
          AND t.n_regionkey = 2
        WHERE a.p_size < 48
        GROUP BY d.l_partkey, a.p_type, t.n_name, c.s_nationkey
        ORDER BY d.l_partkey, c.s_nationkey""")),

    // ── equipment maintenance history (SapTemplates
    //    equipment_maintenance_history, AUFK⋈AFIH⟕AFRU): the PM LISTING
    //    variant of the ON-side-filtered left join — order header ⋈ its
    //    1:1 header extension, LEFT JOIN confirmations with the
    //    cancellation flag in the ON clause (STOKZ='' ≈ returnflag<>'A'),
    //    so an order with ONLY cancelled confirmations still lists with
    //    NULL confirmation columns instead of vanishing; three-level
    //    display ordering across both sides of the outer join ─────────────
    Q(
      "q_tmpl_equipment_history",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val l = t(s, dir, "lineitem")
        val conf = l.filter(col("l_returnflag") =!= "A")
          .select(col("l_orderkey").as("__ck"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("confirm_date"),
            money(col("l_quantity")).cast("double").as("actual_qty"))
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(conf, col("o_orderkey") === col("__ck"), "left")
          .select(col("c_custkey").as("equipment"), col("o_orderkey"),
            col("o_orderpriority"), col("l_linenumber"),
            col("confirm_date"), col("actual_qty"))
          .orderBy(col("equipment"), col("o_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT c.c_custkey AS equipment, a.o_orderkey,
          a.o_orderpriority, r.l_linenumber,
          CAST(r.l_shipdate AS DATE) AS confirm_date,
          CAST(CAST(r.l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS actual_qty
        FROM orders a
        JOIN customer c ON c.c_custkey = a.o_custkey
        LEFT JOIN lineitem r ON r.l_orderkey = a.o_orderkey
          AND r.l_returnflag <> 'A'
        ORDER BY equipment, a.o_orderkey, r.l_linenumber""")),

    // ── billing summary (SapTemplates billing_summary, VBRK⟕VBRP): the
    //    period-filtered invoice listing carrying the HEADER value next to
    //    SUM(item value) + COUNT(items) from the left-joined lines —
    //    header-vs-lines on the same row (the reconciliation family's
    //    DISPLAY shape, date-gated). Item side pre-aggregated; the oracle
    //    keeps the reference's group-after-join form ────────────────────────
    Q(
      "q_tmpl_billing_summary",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val items = l.groupBy(col("l_orderkey"))
          .agg(sum(money(col("l_extendedprice"))).as("item_dec"),
            count(lit(1)).as("cnt"))
        o.filter(col("o_orderdate") >= lit("1997-01-01"))
          .join(items, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("billing_date"),
            money(col("o_totalprice")).cast("double").as("header_value"),
            coalesce(col("item_dec"), lit(0)).cast("double").as("item_value"),
            coalesce(col("cnt"), lit(0L)).as("n_items"))
          .orderBy(col("billing_date"), col("o_orderkey"))
      },
      Some("""SELECT b.o_orderkey, b.o_custkey,
          CAST(b.o_orderdate AS DATE) AS billing_date,
          CAST(CAST(b.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS header_value,
          CAST(IFNULL(SUM(CAST(i.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
            AS item_value,
          COUNT(i.l_linenumber) AS n_items
        FROM orders b
        LEFT JOIN lineitem i ON i.l_orderkey = b.o_orderkey
        WHERE b.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY b.o_orderkey, b.o_custkey, b.o_orderdate, b.o_totalprice
        ORDER BY billing_date, b.o_orderkey""")),

    // ── wage-type catalog (SapTemplates wage_type_catalog, T511⟕T512T):
    //    the protected-table AGGREGATE-ONLY dictionary rollup — a left join
    //    on a COMPOSITE key with a language filter in the ON clause,
    //    COUNT(*) vs COUNT(text column) on one row exposing translation
    //    coverage (the count-skips-null idiom as a COVERAGE measure).
    //    Mapped: supplier per nation ⟕ region-gated nation text ────────────
    Q(
      "q_tmpl_wage_type_catalog",
      (s, dir) => {
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val text = n.filter(col("n_regionkey") === 2)
          .select(col("n_nationkey").as("__tk"), col("n_name").as("__txt"))
        su.join(broadcast(text), col("s_nationkey") === col("__tk"), "left")
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_entries"),
            count(col("__txt")).as("n_with_text"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT w.s_nationkey, COUNT(*) AS n_entries,
          COUNT(t.n_name) AS n_with_text
        FROM supplier w
        LEFT JOIN nation t ON t.n_nationkey = w.s_nationkey
          AND t.n_regionkey = 2
        GROUP BY w.s_nationkey
        ORDER BY w.s_nationkey""")),

    // ── document audit by user (SapTemplates doc_audit_by_user, BKPF):
    //    the audit-trail rollup — postings per (user, transaction) with
    //    first/last posting dates; grouped MIN/MAX dates are the audit
    //    window. Mapped: orders per (clerk-ish custkey bucket, priority) ───
    Q(
      "q_tmpl_doc_audit",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupBy(pmod(col("o_custkey"), lit(100)).as("user_bucket"),
            col("o_orderpriority"))
          .agg(count(lit(1)).as("n_docs"),
            min(to_date(col("o_orderdate"))).as("first_posting"),
            max(to_date(col("o_orderdate"))).as("last_posting"))
          .orderBy(col("user_bucket"), col("o_orderpriority"))
      },
      Some("""SELECT o_custkey % 100 AS user_bucket, o_orderpriority,
          COUNT(*) AS n_docs,
          MIN(CAST(o_orderdate AS DATE)) AS first_posting,
          MAX(CAST(o_orderdate AS DATE)) AS last_posting
        FROM orders
        GROUP BY o_custkey % 100, o_orderpriority
        ORDER BY user_bucket, o_orderpriority""")),

    // ── vendor_spend_by_quarter (SapTemplates, RBKP/RSEG/LFA1): invoice
    //    receipts rolled to QUARTERS — the one date-bucketing axis (quarter
    //    derivation from the header posting date into a 'YYYY-Qn' label) no
    //    other analog exercises. Mapped: orders=invoice header (BUDAT →
    //    o_orderdate, STBLG reversal screen → status filter), lineitem=
    //    invoice items (DMBTR → l_extendedprice), supplier=LFA1. Plan: the
    //    item side pre-aggregates per (order, supplier) BEFORE the header
    //    join (shrinks the shuffle), quarters derive after the join, and
    //    the bounded supplier dim broadcasts in last for the name ─────────
    Q(
      "q_tmpl_vendor_spend_quarter",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val items = l.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(sum(money(col("l_extendedprice"))).as("amt_dec"))
        items
          .join(o.filter(col("o_orderstatus") =!= "P")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_suppkey"),
            concat(year(col("o_orderdate")).cast("string"), lit("-Q"),
              quarter(col("o_orderdate")).cast("string")).as("quarter"))
          .agg(sum(col("amt_dec")).cast("double").as("spend"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("quarter"), col("spend"))
          .orderBy(col("quarter"), col("spend").desc, col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name,
          CONCAT(CAST(year(o_orderdate) AS VARCHAR), '-Q',
                 CAST(quarter(o_orderdate) AS VARCHAR)) AS quarter,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE o_orderstatus <> 'P'
        GROUP BY s_suppkey, s_name, year(o_orderdate), quarter(o_orderdate)
        ORDER BY quarter, spend DESC, s_suppkey""")),

    // ── single-document display (SapTemplates tcode_va03 / tcode_fb03 /
    //    tcode_me23n): the highest-traffic interactive SAP shape — ONE
    //    document by key, fanned across header + items + partner dim +
    //    LEFT-joined text table, with the FB03 debit/credit CASE split on
    //    the indicator. Mapped: orders=VBAK header, lineitem=VBAP items,
    //    customer=KNA1, part=MAKT text (LEFT — a missing text must not drop
    //    the item). 100 TB shape: the document key pushes into BOTH scans
    //    (PushedFilters on o_orderkey and l_orderkey — a point lookup reads
    //    row-group-pruned slivers, never the tables), dims broadcast ──────
    Q(
      "q_tmpl_doc_display",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") === 1)
        val l = t(s, dir, "lineitem").filter(col("l_orderkey") === 1)
        val c = t(s, dir, "customer")
        val p = t(s, dir, "part")
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left")
          .select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            col("o_orderstatus"), col("c_name").as("customer_name"),
            col("l_linenumber").cast("long").as("line_no"), col("l_partkey"),
            col("p_name").as("material_text"),
            qty(col("l_quantity")).cast("double").as("quantity"),
            money(col("l_extendedprice")).cast("double").as("net_value"),
            when(col("l_returnflag") =!= "R", money(col("l_extendedprice")))
              .otherwise(lit(0)).cast("double").as("debit"),
            when(col("l_returnflag") === "R", money(col("l_extendedprice")))
              .otherwise(lit(0)).cast("double").as("credit"))
          .orderBy(col("line_no"))
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
          o_orderstatus, c_name AS customer_name,
          CAST(l_linenumber AS BIGINT) AS line_no, l_partkey,
          p_name AS material_text,
          CAST(CAST(l_quantity AS DECIMAL(18,3)) AS DOUBLE) AS quantity,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS net_value,
          CAST(CASE WHEN l_returnflag <> 'R'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END AS DOUBLE) AS debit,
          CAST(CASE WHEN l_returnflag = 'R'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END AS DOUBLE) AS credit
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        LEFT JOIN part ON l_partkey = p_partkey
        WHERE o_orderkey = 1
        ORDER BY line_no""")),

    // ── payroll_by_department (SapTemplates, HRPY_RGDIR/PA0001/PA0008):
    //    the PII aggregate axis DISTINCT from headcount — COUNT(DISTINCT
    //    employee) against a fanned payroll-results join, plus the salary
    //    SUM over the JOINED (multiplied) relation, exactly the template's
    //    own semantics (PA0008 multiplies per RGDIR row — reproduced, not
    //    'fixed'). Mapped: orders=RGDIR payroll results (several per
    //    person), customer=PA0001/PA0008 (salary → c_acctbal), nation=org
    //    unit. One shuffle (the custkey join); org dim broadcasts ─────────
    Q(
      "q_tmpl_payroll_dept",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("org_unit"))
          .agg(countDistinct(col("o_custkey")).as("n_employees"),
            sum(money(col("c_acctbal"))).cast("double")
              .as("total_annual_salary"))
          .orderBy(col("org_unit"))
      },
      Some("""SELECT n_name AS org_unit,
          COUNT(DISTINCT o_custkey) AS n_employees,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_annual_salary
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY org_unit""")),

    // ── order_to_cash_trace (SapTemplates, VBAK/VBFA/BSID): the document-
    //    flow TRACE — a CHAINED left-join walk where hop 2 joins on hop 1's
    //    OUTPUT key (f2.VBELV = f1.VBELN), each hop type-gated on the ON
    //    side, plus a sibling open-items left join off a root attribute,
    //    all collapsed per root document with COUNT(DISTINCT). Mapped:
    //    orders=VBAK root (soft-delete → status gate), hop 1 = lineitem
    //    type 'N', hop 2 = lineitem type 'R' keyed by hop 1's partkey,
    //    sibling = the customer's open orders. The ORACLE keeps the
    //    template's multiplied-join form; the Spark plan computes each
    //    COUNT(DISTINCT) independently and left-joins the three bounded
    //    aggregates to the root — identical by the multiplication-immunity
    //    of COUNT(DISTINCT), and the 100 TB shape: no 4-relation row
    //    explosion, three shuffles each keyed and pre-collapsed ──────────
    Q(
      "q_tmpl_doc_trace",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val root = o.filter(col("o_orderstatus") =!= "P")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_custkey"))
        val hop1 = l.filter(col("l_returnflag") === "N")
          .select(col("l_orderkey"), col("l_partkey"))
        val d1 = hop1.groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_partkey")).as("n_deliveries"))
        val d2 = hop1.select(col("l_orderkey"), col("l_partkey")).distinct()
          .join(l.filter(col("l_returnflag") === "R")
            .select(col("l_partkey"), col("l_orderkey").as("bill_key")),
            Seq("l_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(countDistinct(col("bill_key")).as("n_billings"))
        val ar = o.filter(col("o_orderstatus") === "O")
          .groupBy(col("o_custkey"))
          .agg(countDistinct(col("o_orderkey")).as("n_open_ar"))
        root
          .join(d1, col("o_orderkey") === d1("l_orderkey"), "left").drop("l_orderkey")
          .join(d2, col("o_orderkey") === d2("l_orderkey"), "left").drop("l_orderkey")
          .join(ar, Seq("o_custkey"), "left")
          .select(col("o_orderkey").as("sales_order"),
            to_date(col("o_orderdate")).as("order_date"),
            coalesce(col("n_deliveries"), lit(0L)).as("n_deliveries"),
            coalesce(col("n_billings"), lit(0L)).as("n_billings"),
            coalesce(col("n_open_ar"), lit(0L)).as("n_open_ar"))
          .orderBy(col("sales_order"))
      },
      Some("""SELECT v.o_orderkey AS sales_order,
          CAST(v.o_orderdate AS DATE) AS order_date,
          COUNT(DISTINCT f1.l_partkey) AS n_deliveries,
          COUNT(DISTINCT f2.l_orderkey) AS n_billings,
          COUNT(DISTINCT ar.o_orderkey) AS n_open_ar
        FROM orders v
        LEFT JOIN lineitem f1 ON f1.l_orderkey = v.o_orderkey
          AND f1.l_returnflag = 'N'
        LEFT JOIN lineitem f2 ON f2.l_partkey = f1.l_partkey
          AND f2.l_returnflag = 'R'
        LEFT JOIN orders ar ON ar.o_custkey = v.o_custkey
          AND ar.o_orderstatus = 'O'
        WHERE v.o_orderstatus <> 'P'
        GROUP BY v.o_orderkey, v.o_orderdate
        ORDER BY sales_order""")),

    // ── journal_balance_check (SapTemplates, BSEG): the consistency audit
    //    — per-document signed net (debits minus credits) with a balance
    //    verdict. Exact decimal internally; net cast to double at the edge ─
    Q(
      "q_tmpl_balance_check",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val net = l.groupBy(col("l_orderkey"))
          .agg(sum(signedAmount(col("l_returnflag"),
            money(col("l_extendedprice")), "R")).as("net_dec"))
        net.select(col("l_orderkey"),
            col("net_dec").cast("double").as("net"),
            when(col("net_dec") === 0, "Balanced").otherwise("Unbalanced")
              .as("status"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, CAST(net_dec AS DOUBLE) AS net,
          CASE WHEN net_dec = 0 THEN 'Balanced' ELSE 'Unbalanced' END AS status
        FROM (SELECT l_orderkey,
            SUM(CASE WHEN l_returnflag = 'R'
              THEN -CAST(l_extendedprice AS DECIMAL(18,2))
              ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END) AS net_dec
          FROM lineitem GROUP BY l_orderkey)
        ORDER BY l_orderkey""")),

    // ── customer_master_search (SapTemplates, KNA1): case-insensitive
    //    master-data name search — UPPER-LIKE on both sides plus the
    //    soft-delete gate, the interactive lookup every master table
    //    serves. The pattern pushes as a Contains filter into the scan ────
    Q(
      "q_tmpl_master_search",
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.filter(upper(col("c_name")).like("%0000001%".toUpperCase) &&
            col("c_mktsegment") =!= "MACHINERY")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE UPPER(c_name) LIKE UPPER('%0000001%')
          AND c_mktsegment <> 'MACHINERY'
        ORDER BY c_custkey""")),

    // ── goods_receipt_history (SapTemplates, EKBE/EKPO/MARA/MAKT): the
    //    movement-type-keyed HISTORY LISTING — event rows gated by movement
    //    type AND a posting-date range, joined through the item to the
    //    material master (soft-delete gate), with the text lookup as a
    //    LEFT JOIN whose ON carries a literal language filter (SPRAS='E')
    //    — key + literal in ON, which keeps non-English rows as NULL text
    //    instead of dropping the history row. Mapped: lineitem=EKBE
    //    (returnflag 'N' = BWART '101', shipdate = BUDAT), part=MARA
    //    (p_size gate = LVORM=''), supplier=MAKT (s_nationkey=5 = SPRAS).
    //    100 TB shape: movement + date filters push into the lineitem scan
    //    (PushedFilters), the text dim broadcasts, output is a raw listing
    //    — no aggregation to drift ─────────────────────────────────────────
    Q(
      "q_tmpl_goods_receipt",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        val su = t(s, dir, "supplier")
        l.filter(col("l_returnflag") === "N" &&
            to_date(col("l_shipdate"))
              .between(lit("1996-01-01"), lit("1996-12-31")))
          .join(p, col("p_partkey") === col("l_partkey"))
          .filter(col("p_size") <= 40)
          .join(broadcast(su),
            col("s_suppkey") === col("l_suppkey") &&
              col("s_nationkey") === 5, "left")
          .select(to_date(col("l_shipdate")).as("posting_date"),
            col("l_orderkey").as("po_number"),
            col("l_linenumber").cast("long").as("po_item"),
            col("l_quantity").cast("double").as("quantity"),
            money(col("l_extendedprice")).cast("double").as("amount"),
            col("s_name").as("partner_text"))
          .orderBy(col("posting_date"), col("po_number"), col("po_item"))
      },
      Some("""SELECT CAST(l_shipdate AS DATE) AS posting_date,
          l_orderkey AS po_number, CAST(l_linenumber AS BIGINT) AS po_item,
          CAST(l_quantity AS DOUBLE) AS quantity,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
          s_name AS partner_text
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        LEFT JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = 5
        WHERE l_returnflag = 'N' AND p_size <= 40
          AND CAST(l_shipdate AS DATE)
            BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        ORDER BY posting_date, po_number, po_item""")),

    // ── value_chain_o2c_cycle_time (SapTemplates, VBAK/VBFA/LIKP/VBRK):
    //    the SALES-side stage-gap chain — a two-hop doc-flow walk (hop 2
    //    joins on hop 1's OUTPUT key, each hop type-gated in ON), MIN/MAX
    //    stage dates per root order, then a datediff chain between
    //    consecutive stages plus the end-to-end total. The p2p analog
    //    covers the one-relation conditional-stage shape; this one covers
    //    the CHAINED-hop shape the reference walks on the sales side.
    //    Mapped per q_tmpl_doc_trace: orders=VBAK root (status gate),
    //    hop 1 = lineitem 'N' (delivery, shipdate=WADAT_IST), hop 2 =
    //    lineitem 'R' keyed by hop 1's partkey (billing, its
    //    shipdate=FKDAT). The ORACLE keeps the template's multiplied
    //    two-hop join; the Spark plan pre-collapses each stage to one row
    //    per order BEFORE the left joins — identical because MIN/MAX are
    //    multiplication-immune, and the 100 TB shape: no two-hop row
    //    explosion, every shuffle pre-aggregated on the root key ──────────
    Q(
      "q_tmpl_o2c_cycle_time",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val hop1 = l.filter(col("l_returnflag") === "N")
          .select(col("l_orderkey"), col("l_partkey"),
            to_date(col("l_shipdate")).as("gi_date"))
        val d1 = hop1.groupBy(col("l_orderkey"))
          .agg(min(col("gi_date")).as("goods_issue_date"))
        val d2 = hop1.select(col("l_orderkey"), col("l_partkey")).distinct()
          .join(l.filter(col("l_returnflag") === "R")
            .select(col("l_partkey"),
              to_date(col("l_shipdate")).as("bill_date")),
            Seq("l_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(max(col("bill_date")).as("billing_date"))
        o.filter(col("o_orderstatus") =!= "P")
          .join(d1, col("o_orderkey") === d1("l_orderkey"), "left")
          .drop("l_orderkey")
          .join(d2, col("o_orderkey") === d2("l_orderkey"), "left")
          .drop("l_orderkey")
          .select(col("o_orderkey").as("sales_order"),
            to_date(col("o_orderdate")).as("order_date"),
            col("goods_issue_date"),
            datediff(col("goods_issue_date"), to_date(col("o_orderdate")))
              .cast("long").as("order_to_delivery_days"),
            col("billing_date"),
            datediff(col("billing_date"), col("goods_issue_date"))
              .cast("long").as("delivery_to_billing_days"),
            datediff(col("billing_date"), to_date(col("o_orderdate")))
              .cast("long").as("total_o2c_days"))
          .orderBy(col("sales_order"))
      },
      Some("""SELECT v.o_orderkey AS sales_order,
          CAST(v.o_orderdate AS DATE) AS order_date,
          MIN(CAST(f1.l_shipdate AS DATE)) AS goods_issue_date,
          date_diff('day', CAST(v.o_orderdate AS DATE),
            MIN(CAST(f1.l_shipdate AS DATE))) AS order_to_delivery_days,
          MAX(CAST(f2.l_shipdate AS DATE)) AS billing_date,
          date_diff('day', MIN(CAST(f1.l_shipdate AS DATE)),
            MAX(CAST(f2.l_shipdate AS DATE))) AS delivery_to_billing_days,
          date_diff('day', CAST(v.o_orderdate AS DATE),
            MAX(CAST(f2.l_shipdate AS DATE))) AS total_o2c_days
        FROM orders v
        LEFT JOIN lineitem f1 ON f1.l_orderkey = v.o_orderkey
          AND f1.l_returnflag = 'N'
        LEFT JOIN lineitem f2 ON f2.l_partkey = f1.l_partkey
          AND f2.l_returnflag = 'R'
        WHERE v.o_orderstatus <> 'P'
        GROUP BY v.o_orderkey, v.o_orderdate
        ORDER BY sales_order""")),

    // ── customer_sales_summary (template 7, round 17): header+item rollup
    //    per customer with BOTH lifecycle gates — the header deletion flag
    //    (VBAK.LOEKZ<>'X' → order status not pending) and the ITEM
    //    rejection reason (VBAP.ABGRU='' → line not returned) — plus a
    //    COUNT(DISTINCT header) next to an item-level SUM: the aggregate
    //    pair a naive per-item rollup gets wrong (each order counts once
    //    however many lines survive). One shuffle on the customer key;
    //    the partner dim broadcasts ──────────────────────────────────────
    Q(
      "q_tmpl_customer_sales",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val c = t(s, dir, "customer")
        o.filter(col("o_orderstatus") =!= "P")
          .join(l.filter(col("l_returnflag") =!= "R"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(countDistinct(col("o_orderkey")).as("n_orders"),
            sum(money(col("l_extendedprice"))).cast("double")
              .as("total_sales"))
          .orderBy(desc("total_sales"), col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, COUNT(DISTINCT o_orderkey) AS n_orders,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus <> 'P' AND l_returnflag <> 'R'
        GROUP BY c_custkey, c_name
        ORDER BY total_sales DESC, c_custkey""")),

    // ── tcode_fbl5n_customer_open_items (template 38, round 17): the
    //    LINE-LEVEL aging detail listing — per open item the aging bucket,
    //    days overdue, and the SIGNED amount (debit/credit indicator →
    //    returnflag sign), ordered by partner then due date. Distinct
    //    from the grouped q_tmpl_aging_bucket / rolled-up
    //    q_tmpl_overdue_by_partner: the bucket expression rides every
    //    detail row next to its raw inputs. Filters push to the scan;
    //    partner dim broadcasts; the sort key is the template's
    //    (customer, due date, document) ─────────────────────────────────
    Q(
      "q_tmpl_fbl5n_open_item_aging",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val asOf = lit("1998-08-02").cast("date")
        val days = datediff(asOf, to_date(col("l_shipdate")))
        val bucket = when(days <= 30, "0-30 days")
          .when(days <= 60, "31-60 days")
          .when(days <= 90, "61-90 days")
          .otherwise("90+ days")
        l.filter(col("l_linestatus") === "O")
          .join(o.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey").as("customer_number"),
            col("c_name").as("customer_name"),
            col("l_orderkey").as("invoice_number"),
            col("l_linenumber").as("line_number"),
            to_date(col("l_shipdate")).as("due_date"),
            bucket.as("aging_bucket"),
            days.cast("long").as("days_overdue"),
            signedAmount(col("l_returnflag"), money(col("l_extendedprice")),
              "R").cast("double").as("open_amount"))
          .orderBy(col("customer_number"), col("due_date"),
            col("invoice_number"), col("line_number"))
      },
      Some("""SELECT c_custkey AS customer_number, c_name AS customer_name,
          l_orderkey AS invoice_number, l_linenumber AS line_number,
          CAST(l_shipdate AS DATE) AS due_date,
          CASE WHEN date_diff('day', CAST(l_shipdate AS DATE), DATE '1998-08-02') <= 30 THEN '0-30 days'
               WHEN date_diff('day', CAST(l_shipdate AS DATE), DATE '1998-08-02') <= 60 THEN '31-60 days'
               WHEN date_diff('day', CAST(l_shipdate AS DATE), DATE '1998-08-02') <= 90 THEN '61-90 days'
               ELSE '90+ days' END AS aging_bucket,
          date_diff('day', CAST(l_shipdate AS DATE), DATE '1998-08-02') AS days_overdue,
          CAST(CASE WHEN l_returnflag = 'R' THEN -CAST(l_extendedprice AS DECIMAL(18,2))
               ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END AS DOUBLE) AS open_amount
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_linestatus = 'O'
        ORDER BY customer_number, due_date, invoice_number, line_number""")))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Engine

/** Representative SAP query templates (reference "validated BOKG patterns",
  * sap_semantic_model.json:7209-7879) re-expressed for Spark over the
  * SAP-shaped fixture views. Each runs through the full engine path
  * (dialect rewrite → Catalyst → PII gate). HANA-isms (TOP, ADD_DAYS,
  * julianday-free aging, IFNULL) are kept where the original templates used
  * them to exercise the front end.
  *
  * The as-of date is injected (reference pins 'now' for determinism,
  * expand_sap_test_db.py:102).
  */
object SapTemplates {

  val AsOf = "2025-06-15"

  val templates: Map[String, String] = Map(
    // trial_balance (sap_semantic_model.json:7211-7221): 3-way join + left
    // text lookup + horizontal COALESCE sums + soft filters
    "trial_balance" ->
      s"""SELECT g.RACCT AS gl_account, t.TXT50 AS account_name, g.DRCRK,
            g.HSLVT AS carryforward,
            COALESCE(g.HSL01,0)+COALESCE(g.HSL02,0)+COALESCE(g.HSL03,0)+
            COALESCE(g.HSL04,0)+COALESCE(g.HSL05,0)+COALESCE(g.HSL06,0)+
            COALESCE(g.HSL07,0)+COALESCE(g.HSL08,0)+COALESCE(g.HSL09,0)+
            COALESCE(g.HSL10,0)+COALESCE(g.HSL11,0)+COALESCE(g.HSL12,0) AS period_activity
          FROM GLT0 g
          JOIN SKA1 a ON g.RACCT = a.SAKNR
          LEFT JOIN SKAT t ON t.SAKNR = a.SAKNR AND t.KTOPL = a.KTOPL AND t.SPRAS = 'E'
          WHERE g.BUKRS = '1000' AND g.RLDNR = '00'
          ORDER BY g.RACCT, g.DRCRK""",

    // top_vendors_by_spend (7525-7536): signed aggregation + open∪cleared
    // UNION ALL + TOP-K through the dialect front end
    "top_vendors_by_spend" ->
      s"""SELECT TOP 5 v.LIFNR, v.NAME1,
            SUM(CASE WHEN i.SHKZG = 'S' THEN -i.DMBTR ELSE i.DMBTR END) AS total_spend
          FROM (SELECT LIFNR, SHKZG, DMBTR FROM BSIK
                UNION ALL
                SELECT LIFNR, SHKZG, DMBTR FROM BSAK) i
          JOIN LFA1 v ON i.LIFNR = v.LIFNR
          WHERE v.LOEKZ <> 'X'
          GROUP BY v.LIFNR, v.NAME1
          ORDER BY total_spend DESC""",

    // tcode_fbl5n_customer_aging_bucket (7635-7645): open items + aging
    // buckets + ORDER BY CASE
    "customer_aging" ->
      s"""SELECT c.KUNNR, c.NAME1,
            CASE WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) <= 0 THEN 'Not yet due'
                 WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) BETWEEN 1 AND 30 THEN '1-30 days'
                 WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) BETWEEN 31 AND 60 THEN '31-60 days'
                 WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) BETWEEN 61 AND 90 THEN '61-90 days'
                 ELSE 'Over 90 days' END AS aging_bucket,
            COUNT(*) AS n_items, SUM(b.DMBTR) AS open_amount
          FROM BSID b
          JOIN KNA1 c ON b.KUNNR = c.KUNNR
          WHERE (b.AUGDT IS NULL OR b.AUGDT = '') AND c.LOEKZ <> 'X'
          GROUP BY c.KUNNR, c.NAME1,
            CASE WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) <= 0 THEN 'Not yet due'
                 WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) BETWEEN 1 AND 30 THEN '1-30 days'
                 WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) BETWEEN 31 AND 60 THEN '31-60 days'
                 WHEN DAYS_BETWEEN(DATE '$AsOf', b.ZFBDT) BETWEEN 61 AND 90 THEN '61-90 days'
                 ELSE 'Over 90 days' END
          ORDER BY c.KUNNR,
            CASE aging_bucket WHEN 'Not yet due' THEN 0 WHEN '1-30 days' THEN 1
                 WHEN '31-60 days' THEN 2 WHEN '61-90 days' THEN 3 ELSE 4 END""",

    // cost_center_actual_vs_plan (7537-7547): conditional aggregation pivot
    // + OBJNR prefix extraction via SUBSTRING
    "cost_center_actual_vs_plan" ->
      """SELECT SUBSTRING(e.OBJNR, 7) AS cost_center, e.KSTAR,
            SUM(CASE WHEN e.WRTTP = '04' THEN e.WKGBTR ELSE 0 END) AS actual_amount,
            SUM(CASE WHEN e.WRTTP = '01' THEN e.WKGBTR ELSE 0 END) AS plan_amount,
            SUM(CASE WHEN e.WRTTP = '04' THEN e.WKGBTR ELSE 0 END) -
            SUM(CASE WHEN e.WRTTP = '01' THEN e.WKGBTR ELSE 0 END) AS variance
          FROM COEP e
          GROUP BY SUBSTRING(e.OBJNR, 7), e.KSTAR
          ORDER BY cost_center, e.KSTAR""",

    // value_chain_order_to_cash_trace (7760-7773): the EXISTS-in-ON rewrite —
    // the document-flow hop (VBFA) is materialized as explicit joins
    "o2c_trace" ->
      """SELECT v.VBELN AS order_no, v.ERDAT AS order_date,
            l.VBELN AS delivery_no, l.WADAT_IST AS goods_issue,
            b.VBELN AS invoice_no, b.FKDAT AS billing_date
          FROM VBAK v
          LEFT JOIN VBFA f1 ON f1.VBELV = v.VBELN AND f1.VBTYP_N = 'J'
          LEFT JOIN LIKP l ON l.VBELN = f1.VBELN
          LEFT JOIN VBFA f2 ON f2.VBELV = l.VBELN AND f2.VBTYP_N = 'M'
          LEFT JOIN VBRK b ON b.VBELN = f2.VBELN
          WHERE v.LOEKZ <> 'X'
          ORDER BY v.VBELN""",

    // value_chain_o2c_pipeline_summary (7774-7786): anti-join stages with
    // literal labels stacked by UNION ALL
    "o2c_pipeline_summary" ->
      """SELECT '1. Ordered, not delivered' AS stage, COUNT(*) AS n
          FROM VBAK v
          WHERE v.LOEKZ <> 'X' AND v.VBELN NOT IN (SELECT f.VBELV FROM VBFA f WHERE f.VBTYP_N = 'J')
          UNION ALL
          SELECT '2. Delivered, not billed', COUNT(*)
          FROM LIKP l
          WHERE l.VBELN NOT IN (SELECT f.VBELV FROM VBFA f WHERE f.VBTYP_N = 'M')
          UNION ALL
          SELECT '3. Billed', COUNT(*) FROM VBRK
          ORDER BY stage""",

    // open vendor items (FBL1N shape): IFNULL + open-item filter
    "vendor_open_items" ->
      """SELECT i.LIFNR, v.NAME1, i.BELNR, i.DMBTR, IFNULL(i.AUGDT, '') AS clearing
          FROM BSIK i JOIN LFA1 v ON i.LIFNR = v.LIFNR
          WHERE i.AUGDT IS NULL OR i.AUGDT = ''
          ORDER BY i.LIFNR, i.BELNR""",

    // balanced-journal check (reference DB invariant): signed sum per doc = 0
    "journal_balance_check" ->
      """SELECT b.BELNR,
            SUM(CASE WHEN b.SHKZG = 'H' THEN -b.DMBTR ELSE b.DMBTR END) AS net
          FROM BSEG b
          GROUP BY b.BELNR
          ORDER BY b.BELNR""",

    // employee_headcount (7374-7385): aggregate-only HR query — must PASS
    // the PII gate (aggregation, no naked PII)
    "employee_headcount" ->
      """SELECT p.ORGEH AS org_unit, COUNT(*) AS headcount
          FROM PA0001 p
          GROUP BY p.ORGEH
          ORDER BY p.ORGEH""",

    // sales_orders_by_period (7548-7559): date-range + soft-delete filter
    "sales_orders_by_period" ->
      """SELECT v.VBELN, v.KUNNR, v.ERDAT, v.NETWR
          FROM VBAK v
          WHERE v.ERDAT >= '2025-01-01' AND v.ERDAT <= '2025-03-31'
            AND v.LOEKZ = ''
          ORDER BY v.ERDAT, v.VBELN""",

    // customer master with case-insensitive search (rule 6 UPPER())
    "customer_master_search" ->
      """SELECT c.KUNNR, c.NAME1, c.LAND1
          FROM KNA1 c
          WHERE UPPER(c.NAME1) LIKE UPPER('%customer%') AND c.LOEKZ <> 'X'
          ORDER BY c.KUNNR""",

    // audit: postings by user and transaction code
    "doc_audit_by_user" ->
      """SELECT h.USNAM, h.TCODE, COUNT(*) AS n_docs,
            MIN(h.BUDAT) AS first_posting, MAX(h.BUDAT) AS last_posting
          FROM BKPF h
          GROUP BY h.USNAM, h.TCODE
          ORDER BY h.USNAM, h.TCODE""",

    // payroll periods — second protected table exercising the PII gate's
    // aggregate-only path
    "payroll_period_summary" ->
      """SELECT r.FPBEG, r.FPEND, COUNT(*) AS n_results,
            COUNT(DISTINCT r.PERNR) AS n_employees
          FROM HRPY_RGDIR r
          GROUP BY r.FPBEG, r.FPEND
          ORDER BY r.FPBEG""",

    // FBL3N G/L line items: header join + signed amounts + doc-type filter
    "gl_line_items_fbl3n" ->
      """SELECT b.HKONT, h.BELNR, h.BLART, h.BUDAT,
            CASE WHEN b.SHKZG = 'H' THEN -b.DMBTR ELSE b.DMBTR END AS signed_amount
          FROM BSEG b
          JOIN BKPF h ON h.BUKRS = b.BUKRS AND h.BELNR = b.BELNR AND h.GJAHR = b.GJAHR
          WHERE h.BUKRS = '1000'
          ORDER BY b.HKONT, h.BELNR, b.BUZEI""",

    // FBL1N vendor line items: open ∪ cleared with status marker
    "vendor_line_items_fbl1n" ->
      """SELECT i.LIFNR, i.BELNR, i.BUDAT, i.DMBTR, 'Open' AS item_status
          FROM BSIK i WHERE i.AUGDT IS NULL OR i.AUGDT = ''
          UNION ALL
          SELECT a.LIFNR, a.BELNR, a.BUDAT, a.DMBTR, 'Cleared'
          FROM BSAK a WHERE a.AUGDT IS NOT NULL AND a.AUGDT <> ''
          ORDER BY LIFNR, BELNR""",

    // R2R close status (7841-7854): stage-stacked posting-period dashboard
    // via TO_VARCHAR period extraction
    "r2r_close_status" ->
      """SELECT TO_VARCHAR(h.BUDAT, 'YYYY-MM') AS period,
            COUNT(*) AS n_documents,
            COUNT(DISTINCT h.USNAM) AS n_users
          FROM BKPF h
          WHERE h.BUKRS = '1000'
          GROUP BY TO_VARCHAR(h.BUDAT, 'YYYY-MM')
          ORDER BY period""",

    // GR/IR-style match: ordered vs received quantity per PO item
    "gr_ir_match" ->
      """SELECT p.EBELN, p.EBELP, p.MENGE AS ordered_qty,
            IFNULL(SUM(h.MENGE), 0) AS received_qty,
            p.MENGE - IFNULL(SUM(h.MENGE), 0) AS open_qty
          FROM EKPO p
          LEFT JOIN EKBE h ON h.EBELN = p.EBELN AND h.EBELP = p.EBELP
            AND h.BEWTP = 'E' AND h.BWART IN ('101','161')
          GROUP BY p.EBELN, p.EBELP, p.MENGE
          ORDER BY p.EBELN, p.EBELP""",

    // POs over threshold (7513-7524): HAVING on summed item value
    "po_over_threshold" ->
      """SELECT k.EBELN, k.LIFNR, SUM(p.NETWR) AS po_value
          FROM EKKO k JOIN EKPO p ON p.EBELN = k.EBELN
          WHERE k.LOEKZ <> 'X'
          GROUP BY k.EBELN, k.LIFNR
          HAVING SUM(p.NETWR) > 1000
          ORDER BY po_value DESC, k.EBELN""",

    // p2p cycle time (7828-7840): PO → goods receipt via date math through
    // the dialect functions
    "p2p_cycle_time" ->
      """SELECT k.EBELN, k.BEDAT AS po_date, MIN(h.BUDAT) AS first_gr,
            DAYS_BETWEEN(MIN(h.BUDAT), k.BEDAT) AS days_to_gr
          FROM EKKO k
          JOIN EKBE h ON h.EBELN = k.EBELN AND h.BEWTP = 'E' AND h.BWART IN ('101','161')
          WHERE k.LOEKZ <> 'X'
          GROUP BY k.EBELN, k.BEDAT
          ORDER BY k.EBELN""")

  def run(spark: SparkSession, name: String): DataFrame =
    Engine.sql(spark, templates(name))
}

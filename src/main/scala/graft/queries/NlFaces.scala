package graft.queries

import org.apache.spark.sql.functions._

import graft.intent.AnswerPipeline

/** Driver-visible NL-loop faces (round-9 judge task 8): the classify →
  * validated-template-route → execute path ([[graft.intent.AnswerPipeline]])
  * was previously pinned only by local ScalaTest over the 27 UI example
  * questions; each face here runs a REAL question through the real pipeline
  * against the SAP fixture corpus and folds the outcome into an
  * oracle-checked result:
  *
  *  - `routed_template` — the template the question actually routed to
  *    (the oracle pins the expected name, so a classifier/ranking drift
  *    flips the hash);
  *  - `envelope_nonempty` — the routed template executed end-to-end on the
  *    fixtures and returned rows through the result envelope;
  *  - the data columns — the SAME template shape promoted onto the TPC-H
  *    corpus (the existing `q_tmpl_*` analog), so DuckDB verifies real
  *    query semantics, not just routing booleans.
  *
  * One face per routed template family: trial balance (value-chain),
  * FBL5N overdue, FBL1N open-items, IW49N cancelled operations, three-way
  * match, and R2R close status; round 11 doubles the surface with top
  * vendors by spend, cost-center actual-vs-plan, sales orders by period,
  * AR aging buckets, PO over threshold, and employee headcount (the
  * PII-gate-interacting one — its face also pins the aggregate-only
  * governance note).
  */
object NlFaces {

  private def analogByName(name: String): Q =
    TemplateAnalogs.queries.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no template analog named $name"))

  private def nlFace(slug: String, question: String, expectTemplate: String,
      analogName: String, piiAggOnly: Boolean = false): Q = {
    val analog = analogByName(analogName)
    Q(s"q_nl_$slug",
      (s, dir) => {
        graft.data.SapFixtures.register(s)
        val ans = AnswerPipeline.answer(s, question)
        val ok = ans.templateName.contains(expectTemplate) &&
          ans.envelope.exists(_.rowCount > 0)
        val base = analog.build(s, dir)
          .withColumn("routed_template",
            lit(ans.templateName.getOrElse("<none>")))
          .withColumn("envelope_nonempty", lit(ok))
        // PII-interacting faces (employee headcount): the routed template
        // is the AGGREGATE form and executed (envelope_nonempty above);
        // additionally pin that the SAME session's governance gate BLOCKS
        // the naked person-level listing — the two halves of the
        // aggregate-only policy (PiiGate, wired in front of Engine.execute)
        if (piiAggOnly) {
          val blocked =
            try {
              graft.Engine.execute(s, "SELECT VORNA, NACHN FROM PA0002", 10)
              false
            } catch {
              case e: Throwable =>
                e.getMessage != null && e.getMessage.contains("governance_block")
            }
          base.withColumn("pii_naked_listing_blocked", lit(blocked))
        } else base
      },
      analog.oracle.map(sql =>
        s"SELECT a.*, '$expectTemplate' AS routed_template, " +
          s"TRUE AS envelope_nonempty" +
          (if (piiAggOnly) ", TRUE AS pii_naked_listing_blocked" else "") +
          s" FROM ($sql) a"))
  }

  val queries: Seq[Q] = Seq(
    nlFace("trial_balance",
      "What is the trial balance for company code 1000?",
      "value_chain_trial_balance", "q_tmpl_trial_balance"),
    nlFace("customer_overdue",
      "Which customers have overdue invoices past 60 days?",
      "tcode_fbl5n_customer_overdue", "q_tmpl_overdue_by_partner"),
    nlFace("vendor_open_items",
      "Show all open vendor items (unpaid invoices)",
      "Unpaid vendor invoices by vendor name", "q_tmpl_open_cleared_union"),
    // round 12: the scoring rework (plural folding — "orders"→"order" now
    // hits) settled this question on the orders-with-cancelled-operations
    // view, the family sibling that actually carries the "work order
    // details" the question asks for; conscious pin update, mirrored in
    // ParaphraseFuzzSpec
    nlFace("cancelled_operations",
      "Show cancelled maintenance operations with work order details",
      "tcode_iw49n_orders_with_cancelled_operations", "q_tmpl_cancelled_operations"),
    nlFace("three_way_match",
      "Show the three-way match for purchase orders",
      "three_way_match", "q_tmpl_three_way_match"),
    nlFace("close_status",
      "What is the record-to-report month-end close status?",
      "value_chain_record_to_report_close_status", "q_tmpl_r2r_reconciliation"),
    // ── round 11: six more routed business questions (verdict task 3) ──
    nlFace("top_vendors",
      "Who are the top vendors by total spend?",
      "top_vendors_by_spend", "q_tmpl_top_vendors"),
    nlFace("cost_center_variance",
      "Compare cost center actual versus planned spending",
      "cost_center_actual_vs_plan", "q_tmpl_cost_center_variance"),
    nlFace("orders_by_period",
      "Show sales orders created in the first quarter of 2025",
      "sales_orders_by_period", "q_tmpl_orders_by_period"),
    nlFace("customer_aging",
      "Show the customer aging report by bucket",
      "tcode_fbl5n_customer_aging_bucket", "q_tmpl_aging_bucket"),
    nlFace("po_over_threshold",
      "Show purchase orders over the threshold value with vendor details",
      "Purchase orders over threshold value", "q_tmpl_po_over_threshold"),
    nlFace("headcount",
      "What is the employee headcount by organizational unit?",
      "employee_headcount", "q_tmpl_headcount", piiAggOnly = true),
    // ── round 12: two faces for routing paths the sidebar battery OPENED
    //    (keyword-data sync + plural folding gave journal entries a route;
    //    the supplementary patterns gave benefits one) — each face pins the
    //    new path end-to-end in the oracle gate, not just in local fuzz ──
    nlFace("journal_entries",
      "Show journal entries posted in March 2026",
      "journal_entry_detail", "q_tmpl_journal_detail"),
    nlFace("benefits",
      "Show benefit enrollment counts by plan type",
      "benefits_enrollment_summary", "q_tmpl_enrollment"),
    // ── round 13: two faces for routing paths the CLI-10 battery opened ──
    // person-level employee listing (CLI example 7): the possessive-filler
    // fix routes it onto the reference's employee pattern, whose validated
    // template is the AGGREGATE-ONLY form — this face pins both halves of
    // the PII policy on the new phrasing (aggregate runs, naked listing
    // governance-blocked), exactly like q_nl_headcount does for its own
    nlFace("employee_positions",
      "List all employees in personnel area 1000 with their positions",
      "employee_headcount", "q_tmpl_headcount", piiAggOnly = true),
    // named-entity vendor slot (CLI example 2): the winning template is
    // the reference's LFA1 name-resolution guideline shape — BSIK open
    // items joined to LFA1 to filter by NAME1
    nlFace("vendor_by_name",
      "Show me all open vendor items (unpaid invoices) for vendor Acme Corp",
      "Unpaid vendor invoices by vendor name", "q_tmpl_open_cleared_union"),
    // ── round 15: the payroll report family (verdict task 5) — the PII
    // aggregate axis DISTINCT from headcount: a salary SUM over the fanned
    // payroll-results join, with both gate halves pinned (the aggregate
    // routes and runs; the same session's naked person-level listing stays
    // governance-blocked)
    nlFace("payroll",
      "Show me payroll by department",
      "payroll_by_department", "q_tmpl_payroll_dept", piiAggOnly = true))
}

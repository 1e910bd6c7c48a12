package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.intent.{AnswerPipeline, HeuristicClassifier}

/** NL-routing paraphrase fuzz (round-10 task 5, the DialectFuzzSpec pattern
  * applied to questions): the twelve q_nl_* faces pin ONE phrasing each, but
  * users ask the same question many ways. Every seeded meaning-preserving
  * mutation of a routed question must either still route to the SAME
  * validated template or degrade to disambiguation (no template) — NEVER
  * route to a wrong template, which would silently answer a different
  * question. Pure routing decision (classify + bestPattern), no execution:
  * that's the exact gate AnswerPipeline.answer applies before running a
  * template. */
class ParaphraseFuzzSpec extends AnyFunSuite {

  /** The routing decision AnswerPipeline.answer makes before execution —
    * the production gate itself (routeDecision), not a re-derivation. */
  private def route(q: String): Option[String] =
    AnswerPipeline.routeDecision(q, HeuristicClassifier.classify(q))

  private def lcFirst(s: String): String =
    if (s.isEmpty) s else s.head.toLower +: s.tail

  /** Deterministic paraphrase battery: politeness wrappers, case, spacing,
    * punctuation, verb synonyms, embedding clauses. All meaning-preserving
    * by construction. */
  private def mutations(q: String): Seq[(String, String)] = Seq(
    "politeness-prefix" -> s"Please ${lcFirst(q)}",
    "could-you" -> s"Could you tell me ${lcFirst(q).stripSuffix("?")}?",
    "hey-casual" -> s"hey, ${lcFirst(q)}",
    "thanks-suffix" -> s"${q.stripSuffix("?")} please, thanks",
    "all-upper" -> q.toUpperCase,
    "all-lower" -> q.toLowerCase,
    "double-space" -> q.replace(" ", "  "),
    "no-punctuation" -> q.replaceAll("[?.!]", ""),
    "show-to-list" -> q.replaceAll("^Show", "List"),
    "show-to-display" -> q.replaceAll("^Show", "Display"),
    "what-to-give" -> q.replaceAll("^What is", "Give me"),
    "i-need" -> s"I need to know ${lcFirst(q).stripSuffix("?")}",
    "wondering" -> s"I was wondering, ${lcFirst(q)}",
    "for-report" -> s"${q.stripSuffix("?")} for my report")

  // (question, expected template, acceptable same-answer siblings) — the
  // exact twelve pairs the q_nl_* oracle faces pin; a drift here must update
  // both places consciously. `acceptable` covers catalog template FAMILIES
  // that answer the SAME business question at different granularity (the
  // three IW49N cancelled-operations views): paraphrase drift inside such a
  // family is a sibling phrasing of one answer, not a wrong answer — the
  // invariant this spec enforces is that drift NEVER crosses to a different
  // business question (the AR/AP axis veto in AnswerPipeline.bestPattern
  // exists because this spec caught exactly that).
  private val faces = Seq(
    ("What is the trial balance for company code 1000?",
      "value_chain_trial_balance", Set.empty[String]),
    ("Which customers have overdue invoices past 60 days?",
      "tcode_fbl5n_customer_overdue", Set.empty[String]),
    ("Show all open vendor items (unpaid invoices)",
      "Unpaid vendor invoices by vendor name", Set.empty[String]),
    // round 12: plural folding settled this on the orders-with-cancelled-
    // operations sibling (it carries the asked-for work order details);
    // NlFaces pins the same name
    ("Show cancelled maintenance operations with work order details",
      "tcode_iw49n_orders_with_cancelled_operations",
      Set("tcode_iw49n_cancelled_operations",
        "cancelled_operations_iw49n")),
    ("Show the three-way match for purchase orders",
      "three_way_match", Set.empty[String]),
    ("What is the record-to-report month-end close status?",
      "value_chain_record_to_report_close_status", Set.empty[String]),
    // round 11: the six new q_nl_* faces
    ("Who are the top vendors by total spend?",
      "top_vendors_by_spend", Set.empty[String]),
    ("Compare cost center actual versus planned spending",
      "cost_center_actual_vs_plan", Set.empty[String]),
    ("Show sales orders created in the first quarter of 2025",
      "sales_orders_by_period", Set.empty[String]),
    // the FBL5N bucket summary and ar_aging are the same business question
    // (AR aging by bucket) at different granularity — a declared family,
    // like the IW49N trio above
    ("Show the customer aging report by bucket",
      "tcode_fbl5n_customer_aging_bucket", Set("ar_aging")),
    ("Show purchase orders over the threshold value with vendor details",
      "Purchase orders over threshold value", Set.empty[String]),
    ("What is the employee headcount by organizational unit?",
      "employee_headcount", Set.empty[String]),
    // round 12: the two faces pinned on routing paths the sidebar battery
    // opened (q_nl_journal_entries, q_nl_benefits)
    ("Show journal entries posted in March 2026",
      "journal_entry_detail", Set("tcode_fb03")),
    ("Show benefit enrollment counts by plan type",
      "benefits_enrollment_summary", Set.empty[String]),
    // round 13: the two faces pinned on routing paths the CLI-10 battery
    // opened (q_nl_employee_positions — possessive-filler fix routed the
    // person-level listing onto the aggregate-safe reference pattern;
    // q_nl_vendor_by_name — the named-entity vendor shape)
    ("List all employees in personnel area 1000 with their positions",
      "employee_headcount", Set.empty[String]),
    ("Show me all open vendor items (unpaid invoices) for vendor Acme Corp",
      "Unpaid vendor invoices by vendor name", Set.empty[String]))

  for ((question, expected, siblings) <- faces)
    test(s"routing stable under paraphrase: $expected <- '${question.take(32)}'") {
      val ok = siblings + expected
      // the pinned phrasing itself must route (guards a vacuous pass where
      // every mutation "degrades" because the base question stopped routing)
      assert(route(question).contains(expected),
        s"base phrasing no longer routes to $expected")
      val ms = mutations(question)
      val outcomes = ms.map { case (label, m) => (label, m, route(m)) }
      // invariant: same answer (template or declared sibling) or no
      // template — never a different business question
      for ((label, m, got) <- outcomes)
        assert(got.forall(ok.contains),
          s"[$label] '$m' routed to $got — wrong template (want one of $ok or none)")
      // robustness floor: a majority of paraphrases must STILL route — if
      // most degrade to disambiguation the invariant holds vacuously and
      // the routing is too brittle to call stable
      val stillRouted = outcomes.count(_._3.exists(ok.contains))
      assert(stillRouted * 2 >= ms.size,
        s"only $stillRouted/${ms.size} paraphrases still route to $expected: " +
          outcomes.collect { case (l, _, None) => l }.mkString(", "))
    }

  // ── round-12 task 5: the FULL 27-button sidebar surface ──────────────────
  // Every example question the reference UI ships
  // (/root/reference/sap_sql_ui.html:1693-1734), verbatim, with its declared
  // routing outcome: the expected template, the template FAMILY whose members
  // answer the same business question at different granularity, or None for
  // questions no validated template covers (the reference hands those to its
  // LLM; our deterministic router must disambiguate, never guess). The
  // invariant for every question AND every paraphrase mutation: route inside
  // the declared family or not at all — never to a different business
  // question.
  private val sidebar: Seq[(String, Option[String], Set[String])] = {
    val iw49nFamily = Set("cancelled_operations_iw49n",
      "tcode_iw49n_cancelled_operations",
      "tcode_iw49n_orders_with_cancelled_operations",
      "tcode_iw49n_cancelled_by_equipment", "order_operations_iw49n")
    val fbl5nOpenFamily = Set("tcode_fbl5n", "tcode_fbl5n_customer_open_items",
      "tcode_fbl5n_open_items_by_customer", "open_ar_items",
      "tcode_fbl5n_customer_aging_bucket", "ar_aging")
    val ksb1Family = Set("tcode_ksb1_cost_center_actual_line_items",
      "tcode_ksb1_cost_center_postings_by_year",
      "tcode_ksb1_cost_center_by_cost_element", "cost_center_spend")
    val o2cFamily = Set("order_to_cash_trace", "value_chain_order_to_cash_trace",
      "value_chain_o2c_pipeline_summary", "value_chain_o2c_cycle_time")
    val p2pFamily = Set("procure_to_pay_trace", "value_chain_procure_to_pay_trace",
      "value_chain_p2p_pipeline_summary", "value_chain_p2p_cycle_time")
    Seq(
      // FI_GL
      ("What is the trial balance for company code 1000?",
        Some("value_chain_trial_balance"), Set("trial_balance")),
      ("Show journal entries posted in March 2026",
        Some("journal_entry_detail"), Set("tcode_fb03")),
      // FI_AP
      ("Who are our top 10 vendors by total spend?",
        Some("top_vendors_by_spend"), Set("vendor_spend_by_quarter")),
      ("Show all open vendor items (unpaid invoices)",
        Some("Unpaid vendor invoices by vendor name"),
        Set("open_ap_items", "tcode_fbl1n")),
      // FI_AR — FBL5N
      ("Show customer open items with aging buckets",
        Some("tcode_fbl5n_customer_open_items"), fbl5nOpenFamily),
      ("Which customers have overdue invoices past 60 days?",
        Some("tcode_fbl5n_customer_overdue"), Set.empty),
      ("What is the total outstanding receivables by customer?",
        Some("tcode_fbl5n_customer_outstanding_receivables"), Set.empty),
      ("Show open items for customer 1001 with document dates",
        Some("open_ar_items"), fbl5nOpenFamily),
      // CO — KSB1
      ("Show cost center actual vs plan variance",
        Some("tcode_ksb1_actual_vs_plan_variance"),
        Set("cost_center_actual_vs_plan")),
      ("What are the actual line items for cost center 1000?",
        Some("tcode_ksb1_cost_center_actual_line_items"), ksb1Family),
      ("Show actual postings to cost center 4100 in 2026",
        Some("tcode_ksb1_cost_center_actual_line_items"), ksb1Family),
      ("Show cost center spending by cost element",
        Some("tcode_ksb1_cost_center_by_cost_element"), ksb1Family),
      // MM
      ("Show purchase orders over $50,000 that are still open",
        Some("Purchase orders over threshold value"),
        Set("purchase_order_status", "tcode_me2m", "tcode_me23n")),
      ("What materials are below reorder point?", None, Set.empty),
      // SD
      ("What sales orders were created in Q1 2026?",
        Some("sales_orders_by_period"), Set.empty),
      ("Show the order-to-cash pipeline status",
        Some("order_to_cash_trace"), o2cFamily),
      ("Trace the O2C cycle for a sales order",
        Some("value_chain_order_to_cash_trace"), o2cFamily),
      // PM — IW49N
      ("Show cancelled maintenance operations with work order details",
        Some("tcode_iw49n_orders_with_cancelled_operations"), iw49nFamily),
      ("Which work orders have cancelled operations and why?",
        Some("tcode_iw49n_orders_with_cancelled_operations"), iw49nFamily),
      ("List cancelled operations for plant 1000 with cancellation reasons",
        Some("tcode_iw49n_cancelled_by_equipment"), iw49nFamily),
      ("Show equipment maintenance history",
        Some("equipment_maintenance_history"), Set.empty),
      // HR / PAY / BEN
      ("Show headcount by organizational unit",
        Some("employee_headcount"), Set.empty),
      ("What is the total payroll cost by cost center?",
        Some("payroll_period_summary"), Set("payroll_by_department")),
      ("Show benefit enrollment counts by plan type",
        Some("benefits_enrollment_summary"), Set.empty),
      // Value chains
      ("Show the procure-to-pay pipeline",
        Some("procure_to_pay_trace"), p2pFamily),
      ("What is our order-to-cash cycle time?",
        Some("value_chain_o2c_cycle_time"), o2cFamily),
      ("Show the month-end close status",
        Some("value_chain_record_to_report_close_status"),
        Set("value_chain_r2r_co_reconciliation")))
  }

  test("sidebar battery covers all 27 reference UI questions") {
    assert(sidebar.size == 27)
  }

  for (((question, expected, family), i) <- sidebar.zipWithIndex)
    test(f"sidebar ${i + 1}%02d routes inside its family: " +
        question.take(48)) {
      val ok = family ++ expected
      expected match {
        case Some(e) =>
          assert(route(question).contains(e),
            s"base phrasing routes to ${route(question)}, declared $e")
        case None =>
          assert(route(question).isEmpty,
            s"no-template question routed to ${route(question)}")
      }
      val ms = mutations(question)
      val outcomes = ms.map { case (label, m) => (label, m, route(m)) }
      for ((label, m, got) <- outcomes)
        assert(got.forall(ok.contains),
          s"[$label] '$m' routed to $got — outside the declared family $ok")
      if (expected.isDefined) {
        val stillRouted = outcomes.count(_._3.exists(ok.contains))
        assert(stillRouted * 2 >= ms.size,
          s"only $stillRouted/${ms.size} paraphrases still route: " +
            outcomes.collect { case (l, _, None) => l }.mkString(", "))
      }
    }

  // ── round-13 task 3: the reference CLI's 10 example questions ───────────
  // (sap_sql_engine.py:1773-1783, verbatim) with declared routing outcomes.
  // Beyond the sidebar overlap these add three shapes: a named-entity vendor
  // slot ("for vendor Acme Corp" — must land on the LFA1 name-resolution
  // template), a person-level employee listing (must negotiate the PII
  // gate by routing to the AGGREGATE-safe reference pattern — the naked
  // listing stays governance-blocked, pinned in q_nl_employee_positions),
  // and materials-below-reorder-point. Same invariant as the sidebar: route
  // inside the declared family or not at all.
  private val cli10: Seq[(String, Option[String], Set[String])] = {
    val fbl5nFamily = Set("tcode_fbl5n", "tcode_fbl5n_customer_open_items",
      "tcode_fbl5n_open_items_by_customer", "open_ar_items",
      "tcode_fbl5n_customer_aging_bucket", "ar_aging",
      "tcode_fbl5n_customer_outstanding_receivables")
    val ksb1Family = Set("tcode_ksb1_actual_vs_plan_variance",
      "tcode_ksb1_cost_center_actual_line_items",
      "tcode_ksb1_cost_center_postings_by_year",
      "tcode_ksb1_cost_center_by_cost_element", "cost_center_spend")
    Seq(
      ("Who are our top 10 vendors by total spend in company code 1000?",
        Some("top_vendors_by_spend"), Set("vendor_spend_by_quarter")),
      // the named-entity shape: the winning template IS the reference's
      // LFA1-join guideline ("join LFA1 to filter by NAME1")
      ("Show me all open vendor items (unpaid invoices) for vendor Acme Corp",
        Some("Unpaid vendor invoices by vendor name"),
        Set("open_ap_items", "tcode_fbl1n")),
      ("What is the GL trial balance for company 1000 in fiscal year 2025?",
        Some("value_chain_trial_balance"), Set("trial_balance")),
      ("Show me all purchase orders over $50,000 that are still open",
        Some("Purchase orders over threshold value"),
        Set("purchase_order_status", "tcode_me2m", "tcode_me23n")),
      // compound question: the delivery-status clause is the asked-for
      // output; the period-listing siblings answer the same order set
      ("What sales orders were created in Q1 2025 and what is their delivery status?",
        Some("delivery_status"),
        Set("sales_orders_by_period", "sales_order_backlog",
          "order_to_cash_trace", "value_chain_order_to_cash_trace")),
      ("Show me cost center actual vs plan for cost center 1000 in 2025",
        Some("cost_center_actual_vs_plan"), ksb1Family),
      // person-level listing: routes to the reference's employee pattern,
      // whose validated template here is the aggregate-only form — the PII
      // gate blocks the naked listing (q_nl_employee_positions pins both)
      ("List all employees in personnel area 1000 with their positions",
        Some("employee_headcount"), Set.empty[String]),
      ("What journal entries were posted to account 400000 in January 2025?",
        Some("journal_entry_detail"), Set("tcode_fb03")),
      ("Show me customer open items (outstanding receivables) by aging bucket",
        Some("tcode_fbl5n_customer_open_items"), fbl5nFamily),
      // the reference catalog's MARC carries NO reorder-point column
      // (MINBE is absent from sap_semantic_model.json's MARC) — no
      // validated template can answer this without fabricating data, so
      // the deterministic router must disambiguate (the reference hands
      // it to its LLM, which would have to improvise the same way)
      ("What materials have inventory below reorder point?",
        None, Set.empty[String]))
  }

  test("CLI battery covers all 10 reference example questions") {
    assert(cli10.size == 10)
  }

  for (((question, expected, family), i) <- cli10.zipWithIndex)
    test(f"cli ${i + 1}%02d routes inside its family: " + question.take(48)) {
      val ok = family ++ expected
      expected match {
        case Some(e) =>
          assert(route(question).contains(e),
            s"base phrasing routes to ${route(question)}, declared $e")
        case None =>
          assert(route(question).isEmpty,
            s"no-template question routed to ${route(question)}")
      }
      val ms = mutations(question)
      val outcomes = ms.map { case (label, m) => (label, m, route(m)) }
      for ((label, m, got) <- outcomes)
        assert(got.forall(ok.contains),
          s"[$label] '$m' routed to $got — outside the declared family $ok")
      if (expected.isDefined) {
        val stillRouted = outcomes.count(_._3.exists(ok.contains))
        assert(stillRouted * 2 >= ms.size,
          s"only $stillRouted/${ms.size} paraphrases still route: " +
            outcomes.collect { case (l, _, None) => l }.mkString(", "))
      }
    }

  test("non-domain questions never route to a template") {
    val offTopic = Seq(
      "What is the meaning of life?",
      "How do I bake sourdough bread at home?",
      "Tell me a joke about databases",
      "What's the weather like tomorrow?",
      "Translate hello world into French please")
    for (q <- offTopic)
      assert(route(q).isEmpty, s"off-topic '$q' routed to ${route(q)}")
  }
}

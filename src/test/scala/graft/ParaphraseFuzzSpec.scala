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

  /** The routing decision AnswerPipeline.answer makes before execution. */
  private def route(q: String): Option[String] = {
    val c = HeuristicClassifier.classify(q)
    AnswerPipeline.bestPattern(q).filter(_ => c.confidence != "low")
  }

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
    ("Show cancelled maintenance operations with work order details",
      "cancelled_operations_iw49n",
      Set("tcode_iw49n_cancelled_operations",
        "tcode_iw49n_orders_with_cancelled_operations")),
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
      "employee_headcount", Set.empty[String]))

  for ((question, expected, siblings) <- faces)
    test(s"routing stable under paraphrase: $expected") {
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

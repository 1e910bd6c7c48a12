package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.intent.{Classification, HeuristicClassifier, IntentRenderer}

/** Intent classification over the reference UI's 27 sidebar example
  * questions (sap_sql_ui.html:1693-1734) plus edge cases from the
  * classifier's special-case rules. */
class IntentSpec extends AnyFunSuite {

  // the 27 sidebar examples, tagged with the module group the UI lists them under
  private val sidebar: Seq[(String, String)] = graft.intent.ExampleQuestions.all

  test("all 27 sidebar questions classify with a metric and render") {
    assert(sidebar.size == 27)
    for ((_, q) <- sidebar) {
      val c = HeuristicClassifier.classify(q)
      assert(c.slots("metric").status == "filled", s"metric missing for: $q")
      assert(Set("high", "medium", "low").contains(c.confidence), q)
      val rendered = IntentRenderer.render(c)
      assert(rendered.nonEmpty, q)
      if (c.confidence == "high") assert(rendered.contains("Ready to generate SQL"), q)
      else assert(rendered.contains("rephrase your question"), q)
    }
  }

  test("sidebar questions resolve their UI module group (or a sibling)") {
    // FI submodules and the value chains overlap on vocabulary; the expected
    // group must appear among the detected modules, not necessarily first
    val misses = sidebar.flatMap { case (group, q) =>
      val c = HeuristicClassifier.classify(q)
      if (c.modules.contains(group)) None else Some(s"$group <- $q got ${c.modules}")
    }
    // allow a small number of cross-module calls (the reference's LLM hedges
    // on these too), but the bulk must land in the listed group
    assert(misses.size <= 4, misses.mkString("\n"))
  }

  test("slot extraction: top-N, time, entity, scope") {
    val c = HeuristicClassifier.classify("Who are our top 10 vendors by total spend?")
    assert(c.confidence == "high")
    assert(c.modules.head == "FI_AP")
    assert(c.slots("output_format").value.toLowerCase == "top 10")
    assert(c.slots("metric").status == "filled")

    val t = HeuristicClassifier.classify("What sales orders were created in Q1 2026?")
    assert(t.slots("time_period").status == "filled")

    val e = HeuristicClassifier.classify("Show open items for customer 1001 with document dates")
    assert(e.slots("entity").status == "filled" &&
      e.slots("entity").value.toLowerCase.contains("customer 1001"))

    val s = HeuristicClassifier.classify("What is the trial balance for company code 1000?")
    assert(s.slots("scope").status == "filled")
  }

  test("vague question → low/medium confidence with slot questions") {
    val c = HeuristicClassifier.classify("show me data")
    assert(c.confidence != "high")
    assert(c.disambiguationNeeded)
    assert(c.slotQuestions.exists(_.slot == "metric"))
    val msg = IntentRenderer.disambiguation(c)
    assert(msg.contains("What would you like to measure?"))
  }

  test("out-of-scope question → low confidence with reason") {
    val c = HeuristicClassifier.classify("what is the weather tomorrow")
    assert(c.confidence == "low")
    assert(c.disambiguationReason.contains("does not map"))
  }

  test("PII question → high confidence with aggregate-only note") {
    val c = HeuristicClassifier.classify("Show me the salaries of all employees")
    assert(c.confidence == "high")
    assert(c.interpretation.contains("PII"))
    assert(c.interpretation.contains("aggregate-only"))
  }

  test("interpretation cleaner strips classifier meta-language") {
    assert(IntentRenderer.cleanInterpretation("User wants to see vendor data")
      == "vendor data")
    assert(IntentRenderer.cleanInterpretation("The user is asking about open invoices")
      == "open invoices")
    assert(IntentRenderer.cleanInterpretation("FI_AP open items")
      == "FI_AP open items")
  }

  test("suggestions are grounded in the catalog pool") {
    val c = HeuristicClassifier.classify("Show customer open items with aging buckets")
    assert(c.suggestions.nonEmpty)
    val allPrompts = (graft.model.Catalog.BusinessObjects.flatMap(_.businessQuestions) ++
      graft.model.CatalogData.QueryPatterns.map(_.description)).toSet
    assert(c.suggestions.forall(s => allPrompts.contains(s.prompt)))
  }
}

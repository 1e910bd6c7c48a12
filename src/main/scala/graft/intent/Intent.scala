package graft.intent

import graft.model.{Catalog, CatalogData}
import graft.pipeline.ModuleDetector

/** Intent classification / disambiguation layer (SURVEY §2.10) — the Spark
  * library's realization of the reference's classifier pipeline
  * (`build_classification_prompt` / `classify_intent` /
  * `build_confirmation_prompt` / `build_disambiguation_message`,
  * sap_sql_engine.py:245-550).
  *
  * The reference delegates the judgment itself to an LLM; the SLOT SCHEMA
  * (metric/entity/time_period/scope/output_format with
  * filled/ambiguous/missing), the confidence policy (high/medium/low →
  * disambiguate or confirm), the BOKG-grounded suggestion ranking, and the
  * confirmation/disambiguation rendering are reference behavior and are
  * implemented here deterministically from the semantic catalog. An
  * LLM-backed [[IntentClassifier]] can be substituted without touching the
  * pipeline — the call is exchangeable (SURVEY §2.10).
  */
final case class SlotValue(value: String, status: String) // filled|ambiguous|missing

final case class Suggestion(
    prompt: String, module: String, obj: String, matchQuality: String)

final case class SlotQuestion(slot: String, question: String, options: Seq[String])

final case class Classification(
    confidence: String, // high | medium | low
    modules: Seq[String],
    objects: Seq[String],
    slots: Map[String, SlotValue],
    interpretation: String,
    disambiguationNeeded: Boolean,
    disambiguationReason: String,
    suggestions: Seq[Suggestion],
    slotQuestions: Seq[SlotQuestion])

trait IntentClassifier {
  def classify(question: String, history: Seq[String] = Nil): Classification
}

object HeuristicClassifier extends IntentClassifier {

  private val metricWords = Seq("total", "sum", "count", "how many", "average",
    "avg", "spend", "balance", "variance", "headcount", "cycle time", "aging",
    "value", "amount", "cost", "revenue", "top", "outstanding", "overdue",
    "history", "status", "pipeline", "trace", "list", "open items", "backlog",
    "enrollment", "receivables", "line items", "postings", "operations",
    "trial balance", "orders", "entries", "items", "invoices", "materials",
    "stock", "reorder")

  private val vagueMetric = Seq("show me data", "show data", "information",
    "tell me about", "what about", "everything")

  private val timeExplicit =
    ("""(?i)\b(19|20)\d{2}\b|\bq[1-4]\b|\blast\s+\d+\s+(day|week|month|year)s?\b|""" +
      """\byear\s+to\s+date\b|\bytd\b|\b(january|february|march|april|may|june|july|""" +
      """august|september|october|november|december)\b|\blast\s+(month|quarter|year|week)\b|""" +
      """\bthis\s+(month|quarter|year|week)\b|\bmonth-end\b""").r

  private val timeVague = """(?i)\b(recent|recently|lately|current|latest|nowadays)\b""".r

  private val entityPattern =
    ("""(?i)\b(vendor|customer|supplier|cost center|company code|plant|material|""" +
      """equipment|account|org(?:anizational)? unit|employee|order|po)\s+([A-Z0-9][\w-]*)""").r

  private val scopePattern =
    """(?i)\b(company code|plant|warehouse|controlling area|org unit)\s*\w*""".r

  private val outputPattern =
    ("""(?i)\btop\s+\d+\b|\bby\s+(month|quarter|year|customer|vendor|cost center|""" +
      """cost element|org(?:anizational)? unit|plan type|plant|department|material)\b|""" +
      """\bsummary\b|\bdetail(?:s|ed)?\b|\bbuckets?\b|\bgrouped\b""").r

  private val piiPattern =
    """(?i)\b(salar(?:y|ies)|names? of employees?|employee names?|birth date|ssn|address(?:es)? of)\b""".r

  private def tokens(s: String): Set[String] =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split("\\s+")
      .filter(_.length > 2).toSet

  /** Suggestion pool: every business question in the catalog plus each
    * validated query pattern's description — the same grounding the
    * reference lists in its classification prompt. */
  private lazy val pool: Seq[(String, String, String)] = {
    val bq = Catalog.BusinessObjects.flatMap(bo =>
      bo.businessQuestions.map(q => (q, bo.module, bo.name)))
    val pat = CatalogData.QueryPatterns.map(p => (p.description, p.module, p.name))
    bq ++ pat
  }

  def classify(question: String, history: Seq[String] = Nil): Classification = {
    val q = question.trim
    val ql = q.toLowerCase
    val qTok = tokens(q)

    // multi-turn slot ACCUMULATION (reference sap_sql_engine.py:1437-1478 +
    // the UI's slot handling): the current turn wins, but slots/modules the
    // turn leaves open are filled from prior turns, newest first — so
    // "last quarter" after "show vendor spend" classifies as the combined
    // intent instead of restarting from nothing
    def fromHistory[A](extract: String => Option[A]): Option[A] =
      history.reverseIterator.map(extract).collectFirst { case Some(a) => a }

    val modules = {
      def detected(s: String): Seq[String] = {
        val m = ModuleDetector.detect(s)
        if (m.size == Catalog.Modules.size) Nil else m // all-modules fallback = no hit
      }
      val own = detected(q)
      if (own.nonEmpty) own
      else fromHistory(h => Some(detected(h)).filter(_.nonEmpty)).getOrElse(Nil)
    }
    val objects = Catalog.BusinessObjects
      .filter(bo => bo.nlAliases.exists(a => ql.contains(a.toLowerCase)))
      .map(_.name).distinct

    // ── slots (each falls back to history when this turn leaves it open) ──
    def metricOf(s: String): Option[String] = {
      val sl = s.toLowerCase
      if (vagueMetric.exists(sl.contains)) None
      else metricWords.filter(sl.contains) match {
        case Seq() => None
        case hits => Some(hits.maxBy(_.length))
      }
    }
    val metric = metricOf(q).orElse(fromHistory(metricOf)) match {
      case Some(m) => SlotValue(m, "filled")
      case None => SlotValue("", "missing")
    }
    val time = timeExplicit.findFirstIn(q)
      .orElse(fromHistory(timeExplicit.findFirstIn(_))) match {
      case Some(t) => SlotValue(t.trim, "filled")
      case None => timeVague.findFirstIn(q) match {
        case Some(t) => SlotValue(t.trim, "ambiguous")
        case None => SlotValue("", "missing")
      }
    }
    val entity = entityPattern.findFirstMatchIn(q)
      .orElse(fromHistory(entityPattern.findFirstMatchIn(_))) match {
      case Some(m) => SlotValue(s"${m.group(1)} ${m.group(2)}", "filled")
      case None => SlotValue("", "missing")
    }
    val scope = scopePattern.findFirstIn(q)
      .orElse(fromHistory(scopePattern.findFirstIn(_))) match {
      case Some(s) => SlotValue(s.trim, "filled")
      case None => SlotValue("", "missing")
    }
    val output = outputPattern.findFirstIn(q)
      .orElse(fromHistory(outputPattern.findFirstIn(_))) match {
      case Some(o) => SlotValue(o.trim, "filled")
      case None => SlotValue("", "missing")
    }
    val slots = Map("metric" -> metric, "entity" -> entity,
      "time_period" -> time, "scope" -> scope, "output_format" -> output)

    // ── suggestions: token-overlap ranking over the BOKG pool. With
    //    history, the ranking context is the accumulated conversation (a
    //    bare slot answer like "last quarter" has no rankable tokens of its
    //    own) ────────────────────────────────────────────────────────────────
    val ctxTok =
      if (history.isEmpty) qTok
      else qTok ++ tokens(history.takeRight(2).mkString(" "))
    val ranked = pool.map { case (prompt, module, obj) =>
      val pTok = tokens(prompt)
      val overlap =
        if (pTok.isEmpty || ctxTok.isEmpty) 0.0
        else (ctxTok & pTok).size.toDouble / math.min(ctxTok.size, pTok.size)
      (prompt, module, obj, overlap)
    }.sortBy { case (p, _, _, o) => (-o, p) }
    val suggestions = ranked.takeWhile(_._4 > 0).take(4).map {
      case (prompt, module, obj, overlap) =>
        val quality =
          if (overlap >= 0.9) "exact"
          else if (overlap >= 0.5) "close"
          else "related"
        Suggestion(prompt, module, obj, quality)
    }

    // ── confidence policy (reference RULES 1 + 5) ────────────────────────
    val pii = piiPattern.findFirstIn(q).isDefined
    val confidence =
      if (pii) "high"
      else if (modules.isEmpty) "low"
      else if (metric.status == "filled" &&
        (modules.size == 1 || suggestions.exists(_.matchQuality != "related"))) "high"
      else "medium"

    val interpretation = {
      val what = if (metric.value.nonEmpty) metric.value else "data"
      val where = modules.headOption.map(m => s" in $m").getOrElse("")
      val when = if (time.status == "filled") s" for ${time.value}" else ""
      val piiNote = if (pii)
        " (PII rules apply: HR/PAY/BEN data is aggregate-only; naked employee-level detail is blocked)"
      else ""
      s"$what$where$when$piiNote"
    }

    val disambiguationNeeded = confidence != "high"
    val reason =
      if (!disambiguationNeeded) ""
      else if (modules.isEmpty)
        "the question does not map to any SAP module in the catalog"
      else {
        val gaps = slots.collect {
          case (n, v) if v.status != "filled" &&
            (n == "metric" || n == "time_period") => s"$n is ${v.status}"
        }
        if (gaps.nonEmpty) gaps.mkString("; ")
        else "several modules could answer this"
      }

    // slot questions only where the answer changes the generated query
    // (reference RULE 4: skip scope/output_format unless clearly implied)
    val slotQs = Seq(
      (metric.status != "filled" && !pii) -> SlotQuestion("metric",
        "What would you like to measure?",
        Seq("Total amount", "Count of documents", "Aging buckets", "Actual vs plan variance")),
      (time.status == "ambiguous" || (time.status == "missing" && confidence == "medium")) ->
        SlotQuestion("time_period", "What time period are you interested in?",
          Seq("Last 30 days", "Last quarter", "Year to date", "Last 12 months")))
      .collect { case (true, sq) => sq }

    Classification(confidence, modules, objects, slots, interpretation,
      disambiguationNeeded, reason, suggestions,
      if (disambiguationNeeded) slotQs else Nil)
  }
}

/** Markdown rendering of classification results — mirrors the reference's
  * `build_confirmation_prompt` / `build_disambiguation_message`
  * (sap_sql_engine.py:474-550). */
object IntentRenderer {

  /** Strip classifier meta-language ("User wants to see …") — reference
    * `_clean_interpretation`. */
  def cleanInterpretation(raw: String): String = {
    val stripped = raw.trim.replaceAll(
      "^(?:The\\s+)?[Uu]ser\\s+(?:is\\s+)?(?:asking\\s+(?:about|for|to)|wants?\\s+to\\s+(?:see|view|know|get|find|show|list|retrieve))\\s+",
      "")
    if (stripped.nonEmpty && stripped.head.isUpper &&
      !Catalog.Modules.exists(m => stripped.startsWith(m + " ")))
      stripped.head.toLower + stripped.tail
    else stripped
  }

  def confirmation(c: Classification): String = {
    val parts = Seq.newBuilder[String]
    val interp = cleanInterpretation(c.interpretation)
    if (interp.nonEmpty) parts += s"**I understand you're asking about** $interp"
    val filled = c.slots.toSeq.sortBy(_._1).collect {
      case (name, SlotValue(v, "filled")) if v.nonEmpty =>
        s"  - **${name.split('_').map(_.capitalize).mkString(" ")}:** $v"
    }
    if (filled.nonEmpty) {
      parts += "\n**Query parameters:**"
      filled.foreach(parts += _)
    }
    if (c.suggestions.exists(_.matchQuality == "exact"))
      parts += "\nThis matches a validated BOKG query pattern. I can run this with high accuracy."
    else if (c.suggestions.exists(_.matchQuality == "close"))
      parts += "\nThis is close to a validated pattern — I should be able to answer accurately."
    parts += "\n**Ready to generate SQL?** Reply 'yes' to proceed, or refine your question."
    parts.result().mkString("\n")
  }

  def disambiguation(c: Classification): String = {
    val parts = Seq.newBuilder[String]
    val interp = cleanInterpretation(c.interpretation)
    if (interp.nonEmpty) parts += s"I think you're asking about **$interp**"
    if (c.disambiguationReason.nonEmpty) parts += s"\nHowever, ${c.disambiguationReason}"
    if (c.slotQuestions.nonEmpty) {
      parts += "\nTo give you the most accurate answer, I need a bit more detail:"
      c.slotQuestions.foreach { sq =>
        parts += s"\n**${sq.question}**"
        sq.options.zipWithIndex.foreach { case (opt, i) =>
          parts += s"  (${('a' + i).toChar}) $opt"
        }
      }
    }
    if (c.suggestions.nonEmpty) {
      parts += "\n**Or, here are specific questions I can answer with high accuracy** (powered by the BOKG):"
      c.suggestions.take(4).zipWithIndex.foreach { case (s, i) =>
        val modTag = if (s.module.nonEmpty) s"[${s.module}] " else ""
        val check = if (s.matchQuality == "exact") " ✓ validated" else ""
        parts += s"""  **${i + 1}.** $modTag*"${s.prompt}"*$check"""
      }
    }
    parts += "\nYou can pick a number, answer the questions above, or rephrase your question."
    parts.result().mkString("\n")
  }

  /** One entry point: confirmation for high confidence, disambiguation
    * otherwise (the reference's routing). */
  def render(c: Classification): String =
    if (c.confidence == "high") confirmation(c) else disambiguation(c)
}

package graft.intent

import org.apache.spark.sql.SparkSession

import graft.Engine
import graft.model.CatalogData
import graft.pipeline.ResultEnvelope
import graft.queries.SapTemplates

/** End-to-end NL answer pipeline: question → intent classification →
  * validated-template routing → execution envelope. The deterministic
  * closing of the reference's loop (classify → generate SQL → execute): when
  * a question matches a validated BOKG pattern, the engine runs the
  * corresponding template directly — no LLM call needed; otherwise it
  * returns the classifier's confirmation/disambiguation message (the
  * reference would hand off to its LLM SQL generator here, which remains
  * pluggable via [[IntentClassifier]]).
  */
final case class Answer(
    classification: Classification,
    templateName: Option[String],
    envelope: Option[ResultEnvelope],
    message: String)

object AnswerPipeline {

  /** Tokenize with LIGHT PLURAL FOLDING (round 12): "entries"→"entry",
    * "vendors"→"vendor" — the sidebar battery caught "journal entries"
    * scoring zero against a "journal entry detail" pattern because the
    * overlap was exact-string. Folding applies symmetrically to question
    * and pattern tokens, so it can only align, never skew. */
  private def tokens(s: String): Set[String] =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split("\\s+")
      .filter(_.length > 2).map(fold).toSet

  private def fold(t: String): String =
    if (t.length > 4 && t.endsWith("ies")) t.dropRight(3) + "y"
    else if (t.length > 3 && t.endsWith("s") && !t.endsWith("ss")) t.dropRight(1)
    else t

  /** Discourse fillers stripped from QUESTION tokens before ranking:
    * politeness wrappers and meta-words ("could you tell me …", "… for my
    * report") carry zero SAP meaning but inflate the question token set,
    * and the min-normalized overlap is sensitive to that inflation — the
    * paraphrase fuzz (ParaphraseFuzzSpec) showed a politeness prefix
    * flipping which template ranks first. Stripped from BOTH question and
    * pattern token sets (round-10 ADVICE): "report"/"data" can appear in
    * legitimate SAP phrasings ("month-end close report", "master data"),
    * and a question-side-only strip lowered the min-normalized overlap
    * asymmetrically — symmetric stripping means a filler word can neither
    * inflate a match nor starve one. Round 12 added the interrogative /
    * imperative frame words (show, list, what, which, the, …): the sidebar
    * battery showed them costing real matches ("Show headcount by
    * organizational unit" scored 0.33 — one filler short of the 0.34
    * threshold its faced sibling cleared). Entries are PRE-FOLD surface
    * forms; membership is tested on folded tokens, so both forms appear
    * where folding changes the word. */
  private val discourseFillers = Set(
    "could", "would", "should", "you", "your", "please", "tell", "hey",
    "thanks", "thank", "wondering", "wonder", "need", "know", "give",
    "want", "like", "just", "really", "basically", "kindly", "report",
    "question", "answer", "info", "data",
    "the", "show", "shows", "list", "lists", "display", "displays",
    "find", "see", "get", "what", "whats", "which", "who", "how",
    "are", "our", "all", "with", "about", "many", "much", "for",
    // auxiliaries/demonstratives: "I was wondering, show the …" must score
    // exactly like the bare question (the sidebar battery caught "was"
    // diluting an o2c question into an IW49N tie)
    "was", "were", "has", "have", "had", "does", "did", "will", "can",
    "this", "that", "these", "those",
    // possessive pronouns (round 13, the CLI-10 battery): "employees with
    // THEIR positions" / "orders and THEIR delivery status" — zero SAP
    // meaning, and the employee-positions question scored 0.333 (one
    // filler short of the 0.34 threshold) against the reference's
    // employee listing pattern purely because of "their"
    "their", "theirs", "its"
  ).map(fold)

  // receivable/payable axis words: a question asking about CUSTOMERS must
  // never route to a vendor-side template (and vice versa) — the one
  // paraphrase-fuzz failure class that silently answers a DIFFERENT
  // business question rather than a sibling phrasing of the same one
  private val arWords = Set("customer", "customers", "receivable",
    "receivables", "debtor", "debtors", "fbl5n")
  private val apWords = Set("vendor", "vendors", "supplier", "suppliers",
    "payable", "payables", "creditor", "creditors", "fbl1n")
  private def axis(tok: Set[String]): Int = {
    val ar = (tok & arWords).nonEmpty
    val ap = (tok & apWords).nonEmpty
    if (ar && !ap) 1 else if (ap && !ar) -1 else 0
  }

  /** Validated patterns beyond the reference catalog's 58: templates this
    * engine ships with full oracle coverage whose business questions the
    * reference UI asks but whose catalog has no pattern entry (the
    * reference answers them through its LLM path). Scored identically to
    * catalog patterns; listed here, not in the generated CatalogData,
    * because the catalog is reference DATA and must stay parity-exact. */
  private val supplementaryPatterns: Seq[graft.model.QueryPattern] = Seq(
    graft.model.QueryPattern("benefits_enrollment_summary",
      "Benefit enrollment counts by plan type", "BEN",
      Seq("PA0167", "PA0168"),
      "Aggregate-only benefits enrollment: count enrollments per benefit plan and plan category."),
    graft.model.QueryPattern("payroll_period_summary",
      "Payroll totals by pay period", "PAY",
      Seq("HRPY_RGDIR"),
      "Aggregate-only payroll cost per payroll period from the payroll results directory."))

  /** Best validated pattern for a question: token-overlap ranking over
    * pattern name + description + business context, requiring a minimum
    * overlap so unrelated questions do not route to a random template.
    * Both token sets are filler-stripped (symmetrically — see
    * [[discourseFillers]]) and cross-axis (AR vs AP) matches are vetoed —
    * both paraphrase-fuzz hardenings. */
  def bestPattern(question: String, minOverlap: Double = 0.34): Option[String] =
    bestPatternFull(question, minOverlap).map(_._1)

  /** [[bestPattern]] plus its winning overlap score — the score doubles as
    * routing confidence ([[routeDecision]]'s strong-match override). */
  def bestPatternScored(question: String,
      minOverlap: Double = 0.34): Option[(String, Double)] =
    bestPatternFull(question, minOverlap).map(t => (t._1, t._2))

  /** (name, score, matched-token count) — the hit count gates the strong
    * override: a one-token hit can min-normalize to 0.5 on a two-token
    * question ("count of documents" → a summary pattern's "count"), which
    * is not module evidence, just a short question. */
  private def bestPatternFull(question: String,
      minOverlap: Double = 0.34): Option[(String, Double, Int)] = {
    val qTok = tokens(question) -- discourseFillers
    if (qTok.isEmpty) return None
    val qAxis = axis(qTok)
    val scored = (CatalogData.QueryPatterns ++ supplementaryPatterns)
      .filter(p => SapTemplates.templates.contains(p.name))
      .map { p =>
        val ndTok =
          tokens(s"${p.name.replace('_', ' ')} ${p.description}") --
            discourseFillers
        // business context CONTRIBUTES to the scoring text (it holds the
        // axis words the terse descriptions drop — "org unit", "plan type")
        // but its lift is CAPPED below the strong-evidence bar: contexts
        // are verbose instructions, and with min-normalization an uncapped
        // context let top_vendors' context tie the trial-balance question
        // at 0.667 and win alphabetically (round-12 sidebar battery). The
        // name+description overlap is the authoritative score; context can
        // clear the routing threshold, never outrank a real nd match.
        val ctxTok = tokens(p.businessContext) -- discourseFillers
        // the catalog MODULE is the authoritative AR/AP axis — token
        // sniffing missed patterns like ap_aging whose only payable-side
        // marker is the 2-char "AP" the tokenizer drops (round 11: that
        // let "customer aging" route to the vendor-side aging report)
        val pAxis = p.module match {
          case "FI_AR" => 1
          case "FI_AP" => -1
          case _ => axis(ndTok ++ ctxTok)
        }
        // min-normalized overlap with a FLOOR of 2 on the denominator: a
        // one-token pattern (ar_aging ≈ {aging}) would otherwise score a
        // perfect 1.0 on any question containing its single token and
        // shadow every more-specific template (round 11 — "customer open
        // items with aging buckets" must rank the open-items view above
        // the bare aging rollup)
        def ov(pt: Set[String]): Double =
          if (pt.isEmpty) 0.0
          else if (qAxis != 0 && pAxis != 0 && qAxis != pAxis) 0.0
          else (qTok & pt).size.toDouble /
            math.max(2, math.min(qTok.size, pt.size))
        val nd = ov(ndTok)
        val full = ov(ndTok ++ ctxTok)
        (p.name, math.max(nd, math.min(full, contextCap)), full,
          (qTok & (ndTok ++ ctxTok)).size)
      }
      // tiebreak capped-equal scores by the uncapped overlap, then name
      .sortBy { case (n, o, f, _) => (-o, -f, n) }
    scored.headOption.collect {
      case (name, o, _, hits) if o >= minOverlap => (name, o, hits)
    }
  }

  /** Ceiling on what business-context tokens alone can score (kept below
    * [[strongOverlap]], so context can never be its own module evidence). */
  private val contextCap = 0.45

  /** Overlap at which a pattern match is module evidence in its own right:
    * module detection (reference keyword data) misses some legitimate
    * phrasings ("Show the month-end close status" names no module keyword),
    * and the reference handles that by proceeding with ALL modules into its
    * LLM. The deterministic analog: a match this strong routes even when
    * the classifier's module slot came up empty (low confidence); weaker
    * matches still require module corroboration. */
  private val strongOverlap = 0.5

  /** THE routing gate — the one decision both [[answer]] and the routing
    * fuzz batteries test: route to a validated template iff a pattern
    * matches AND (the classifier has module evidence OR the match is strong
    * enough — score AND matched-token substance — to be its own evidence;
    * a bare disambiguation slot answer like "count of documents" hits one
    * generic token and must keep waiting for history). */
  def routeDecision(question: String, c: Classification): Option[String] =
    bestPatternFull(question).collect {
      case (name, score, hits)
        if c.confidence != "low" || (score >= strongOverlap && hits >= 2) =>
        name
    }

  /** Answer a question end-to-end. Raw SQL (SELECT/WITH) skips
    * classification and executes directly, like the reference's dev path.
    * `history` carries prior user turns for the disambiguation loop: a bare
    * slot answer ("last quarter") classifies and template-routes as the
    * ACCUMULATED intent (reference sap_sql_engine.py:1437-1478 + the UI's
    * multi-turn slot handling). */
  def answer(spark: SparkSession, question: String, maxRows: Int = 200,
      history: Seq[String] = Nil): Answer = {
    val trimmed = question.trim
    val upper = trimmed.toUpperCase
    if (upper.startsWith("SELECT") || upper.startsWith("WITH")) {
      val env = Engine.execute(spark, trimmed, maxRows)
      return Answer(HeuristicClassifier.classify(trimmed), None, Some(env),
        s"Executed as SQL (${env.rowCount} rows${if (env.hasMore) ", more available" else ""}).")
    }
    val c = HeuristicClassifier.classify(trimmed, history)
    routeDecision(trimmed, c)
      .orElse(if (history.isEmpty) None
        else routeDecision(
          (history.takeRight(2) :+ trimmed).mkString(" "), c)) match {
      case Some(name) =>
        val df = SapTemplates.run(spark, name)
        val env = ResultEnvelope.fromDataFrame(df, maxRows,
          Some(SapTemplates.templates(name)))
        Answer(c, Some(name), Some(env),
          s"Matched validated pattern `$name` — ${env.rowCount} rows" +
            (if (env.hasMore) " (more available)." else "."))
      case _ =>
        Answer(c, None, None, IntentRenderer.render(c))
    }
  }
}

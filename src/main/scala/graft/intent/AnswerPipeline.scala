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

  private def tokens(s: String): Set[String] =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split("\\s+")
      .filter(_.length > 2).toSet

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
    * inflate a match nor starve one. */
  private val discourseFillers = Set(
    "could", "would", "should", "you", "your", "please", "tell", "hey",
    "thanks", "thank", "wondering", "wonder", "need", "know", "give",
    "want", "like", "just", "really", "basically", "kindly", "report",
    "question", "answer", "info", "data")

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

  /** Best validated pattern for a question: token-overlap ranking over
    * pattern name + description + business context, requiring a minimum
    * overlap so unrelated questions do not route to a random template.
    * Both token sets are filler-stripped (symmetrically — see
    * [[discourseFillers]]) and cross-axis (AR vs AP) matches are vetoed —
    * both paraphrase-fuzz hardenings. */
  def bestPattern(question: String, minOverlap: Double = 0.34): Option[String] = {
    val qTok = tokens(question) -- discourseFillers
    if (qTok.isEmpty) return None
    val qAxis = axis(qTok)
    val scored = CatalogData.QueryPatterns
      .filter(p => SapTemplates.templates.contains(p.name))
      .map { p =>
        val pTok =
          tokens(s"${p.name.replace('_', ' ')} ${p.description}") --
            discourseFillers
        // the catalog MODULE is the authoritative AR/AP axis — token
        // sniffing missed patterns like ap_aging whose only payable-side
        // marker is the 2-char "AP" the tokenizer drops (round 11: that
        // let "customer aging" route to the vendor-side aging report)
        val pAxis = p.module match {
          case "FI_AR" => 1
          case "FI_AP" => -1
          case _ => axis(pTok)
        }
        // min-normalized overlap with a FLOOR of 2 on the denominator: a
        // one-token pattern (ar_aging ≈ {aging}) would otherwise score a
        // perfect 1.0 on any question containing its single token and
        // shadow every more-specific template (round 11 — "customer open
        // items with aging buckets" must rank the open-items view above
        // the bare aging rollup)
        val overlap =
          if (pTok.isEmpty) 0.0
          else if (qAxis != 0 && pAxis != 0 && qAxis != pAxis) 0.0
          else (qTok & pTok).size.toDouble /
            math.max(2, math.min(qTok.size, pTok.size))
        p.name -> overlap
      }
      .sortBy { case (n, o) => (-o, n) }
    scored.headOption.collect { case (name, o) if o >= minOverlap => name }
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
    bestPattern(trimmed)
      .orElse(if (history.isEmpty) None
        else bestPattern((history.takeRight(2) :+ trimmed).mkString(" "))) match {
      case Some(name) if c.confidence != "low" =>
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

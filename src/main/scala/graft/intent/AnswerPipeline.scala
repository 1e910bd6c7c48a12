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

  /** Best validated pattern for a question: token-overlap ranking over
    * pattern name + description + business context, requiring a minimum
    * overlap so unrelated questions do not route to a random template. */
  def bestPattern(question: String, minOverlap: Double = 0.34): Option[String] = {
    val qTok = tokens(question)
    if (qTok.isEmpty) return None
    val scored = CatalogData.QueryPatterns
      .filter(p => SapTemplates.templates.contains(p.name))
      .map { p =>
        val pTok = tokens(s"${p.name.replace('_', ' ')} ${p.description}")
        val overlap =
          if (pTok.isEmpty) 0.0
          else (qTok & pTok).size.toDouble / math.min(qTok.size, pTok.size)
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.governance.PiiGate
import graft.pipeline.{ModuleDetector, PromptRenderer, ResultEnvelope}
import graft.sql.HanaDialect

/** The engine façade — the Spark rebuild of the reference's execution entry
  * point (`/api/execute`, SURVEY §3.3): HANA-dialect SQL in → pre-rewrite →
  * Catalyst parse/analyze → PII gate on the analyzed plan → execute →
  * capped result envelope. No LLM required; the deterministic layers are the
  * engine.
  */
object Engine {

  /** Parse and run a HANA-dialect SQL string with governance enforcement. */
  def sql(spark: SparkSession, hanaSql: String): DataFrame =
    PiiGate.check(HanaDialect.sql(spark, hanaSql))

  /** Full execute path returning the reference's JSON envelope shape. */
  def execute(spark: SparkSession, hanaSql: String,
      maxRows: Int = 200): ResultEnvelope = {
    val rewritten = HanaDialect.rewrite(hanaSql)
    val df = PiiGate.check(HanaDialect.sql(spark, hanaSql))
    ResultEnvelope.fromDataFrame(df, maxRows, Some(rewritten))
  }

  /** Module RAG-filter + prompt rendering (the deterministic prompt side of
    * the reference's NL pipeline; any LLM client can consume this). */
  def promptFor(question: String): (Seq[String], String) = {
    val modules = ModuleDetector.detect(question)
    (modules, PromptRenderer.render(graft.model.Catalog.Model, modules))
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.model.{Catalog, SemanticModel}

/** Deterministic NL-pipeline operators (SURVEY §2.10): module detection
  * (the RAG filter deciding which schemas enter an LLM prompt), catalog →
  * prompt rendering, and the result envelope. The LLM call itself is out of
  * scope (network-bound, exchangeable); everything deterministic around it
  * is implemented.
  */
object ModuleDetector {

  /** Keyword map per module — the reference's FULL MODULE_KEYWORDS data
    * (sap_sql_engine.py:105-168; declared keyword DATA, synced verbatim for
    * detection parity — round 12 closed the gap where a trimmed list missed
    * the reference UI's own sidebar phrasings, e.g. "journal entries",
    * "organizational unit", "payroll cost", "enrollment"). Keywords like
    * "gl "/"ap " carry the reference's trailing-space word-boundary hack. */
  val keywords: Map[String, Seq[String]] = Map(
    "FI_GL" -> Seq(
      "general ledger", "gl ", "g/l", "journal entry", "journal entries",
      "posting", "document number", "bkpf", "bseg", "chart of accounts",
      "account balance", "trial balance", "fb03", "fbl3n", "fiscal year",
      "ledger", "glt0", "ska1", "skat", "skb1", "period balance",
      "financial statement", "account group", "reconciliation",
      "faglflext", "faglflexa", "asset", "anla", "depreciation"),
    "FI_AP" -> Seq(
      "accounts payable", "ap ", "a/p", "vendor", "supplier",
      "invoice", "payment", "payable", "lfa1", "bsik", "bsak",
      "fk03", "fbl1n", "rbkp", "rseg", "aging", "overdue",
      "procure to pay", "vendor master", "xk03"),
    "FI_AR" -> Seq(
      "accounts receivable", "fi-ar", "a/r", "customer", "receivable",
      "bsid", "bsad", "kna1", "knb1", "knvk", "fbl5n",
      "customer master", "xd03", "collections", "credit memo",
      "contact person", "customer balance"),
    "CO" -> Seq(
      "controlling", "cost center", "cost element", "internal order",
      "csks", "cosp", "coss", "coep", "cobk", "aufk", "cepc",
      "ksb1", "kob1", "actual vs plan", "budget", "variance",
      "overhead", "profit center"),
    "MM" -> Seq(
      "material", "purchase order", "procurement", "inventory",
      "stock", "requisition", "goods receipt", "vendor evaluation",
      "mara", "makt", "marc", "mard", "ekko", "ekpo", "eban",
      "me23n", "me2m", "me5a", "mb51", "mbew", "warehouse",
      "storage location", "bom", "bill of material",
      "three way match", "3-way match"),
    "SD" -> Seq(
      "sales", "sales order", "delivery", "billing", "revenue",
      "vbak", "vbap", "likp", "lips", "vbrk", "vbrp",
      "va03", "vf03", "backlog", "order to cash",
      "shipping", "customer sales"),
    "PM" -> Seq(
      "maintenance", "equipment", "work order", "plant maintenance",
      "aufk", "afih", "afko", "afvc", "afru", "equi", "eqkt",
      "iw49n", "functional location", "breakdown", "preventive",
      "maintenance plan", "ip03", "notification"),
    "HR" -> Seq(
      "human resources", "employee", "headcount", "personnel",
      "pa0001", "pa0002", "pa0006", "pa0008", "pa0014",
      "organizational unit", "personnel area", "hire date",
      "employee group", "employee subgroup"),
    "PAY" -> Seq(
      "payroll", "salary", "wage", "compensation", "pay scale",
      "hrpy_rgdir", "t511", "t512t", "earnings",
      "payroll cost", "wage type"),
    "BEN" -> Seq(
      "benefit", "enrollment", "health plan", "insurance",
      "pa0167", "pa0168", "pa0169", "benefit plan",
      "savings plan", "benefit option"))

  /** Score modules by keyword hits, ranked desc; empty → all modules
    * (reference fallback). Hyphens normalize to spaces first so the
    * reference UI's own "order-to-cash" / "procure-to-pay" phrasings hit
    * the space-separated keywords ("month-end" similarly tokenizes).
    * Keywords normalize the same way at match time — the reference list
    * itself carries hyphens ("fi-ar", "3-way match") which could never
    * match a question whose hyphens were already folded to spaces. */
  // normalized once at construction, not per detect() call per keyword
  private val normalizedKeywords: Seq[(String, Seq[String])] =
    keywords.toSeq.map { case (m, kws) => m -> kws.map(_.replace('-', ' ')) }

  def detect(question: String): Seq[String] = {
    val q = question.toLowerCase.replace('-', ' ')
    val scored = normalizedKeywords
      .map { case (m, kws) => m -> kws.count(q.contains) }
      .filter(_._2 > 0)
      .sortBy { case (m, s) => (-s, m) }
      .map(_._1)
    if (scored.nonEmpty) scored else Catalog.Modules
  }
}

/** Catalog → system-prompt rendering (reference build_system_prompt,
  * sap_sql_engine.py:556-831): rules, filtered schemas, FKs, relationships,
  * guidelines. Deterministic string assembly; feeds any LLM client. */
object PromptRenderer {
  def render(model: SemanticModel, modules: Seq[String]): String = {
    val tables = model.tablesOf(modules)
    val tableNames = tables.map(_.name).toSet
    val rels = model.relationships.filter(r =>
      tableNames.contains(r.fromTable) && tableNames.contains(r.toTable))
    val sb = new StringBuilder
    sb ++= "You are an SAP ECC SQL analyst. Use ONLY tables and columns defined below.\n"
    sb ++= "Rules:\n"
    model.guidelines.foreach(g => sb ++= s"- ${g.title}: ${g.text}\n")
    sb ++= "\nSchemas:\n"
    tables.foreach { t =>
      sb ++= s"TABLE ${t.name} (${t.module}) — ${t.description}; PK: ${t.primaryKey.mkString(", ")}\n"
      t.columns.foreach { col =>
        sb ++= s"  ${col.name} ${col.sapType}"
        if (col.description.nonEmpty) sb ++= s" — ${col.description}"
        if (col.pii) sb ++= " [PII]"
        sb ++= "\n"
      }
    }
    sb ++= "\nJoin relationships:\n"
    rels.foreach(r => sb ++= s"- ${r.conditionSql}\n")
    sb.toString
  }
}

/** Result envelope (reference §2.7: {columns, column_types, rows, row_count,
  * has_more, sql}); row cap + 1-row lookahead exactly like
  * sap_sql_engine.py:1284-1287. */
final case class ResultEnvelope(
    columns: Seq[String],
    columnTypes: Seq[String],
    rows: Seq[Seq[Any]],
    rowCount: Int,
    hasMore: Boolean,
    sql: Option[String]) {

  def toJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
      case ch => ch.toString
    } + "\""
    def v(a: Any): String = a match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Byte => n.toString
      case n: Short => n.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Float => n.toString
      case n: Double => n.toString
      case d: java.math.BigDecimal => d.toPlainString
      case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
      case other => q(other.toString)
    }
    s"""{"columns":[${columns.map(q).mkString(",")}],""" +
      s""""column_types":[${columnTypes.map(q).mkString(",")}],""" +
      s""""rows":[${rows.map(r => "[" + r.map(v).mkString(",") + "]").mkString(",")}],""" +
      s""""row_count":$rowCount,"has_more":$hasMore""" +
      sql.map(s => s""","sql":${q(s)}""").getOrElse("") + "}"
  }
}

/** File sinks (reference §2.1: CSV/TSV export, JSON result sink). Thin
  * wrappers over Spark's distributed writers — export happens on executors,
  * never through the driver. */
object ResultSink {
  def writeCsv(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", sep).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

object ResultEnvelope {

  /** Spark type → the reference's int/float/str display classification
    * (sap_sql_engine.py:1290-1311 — free here from df.schema). */
  def classify(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType | _: DecimalType => "float"
    case _ => "str"
  }

  def fromDataFrame(df: DataFrame, maxRows: Int = 200,
      sql: Option[String] = None): ResultEnvelope = {
    val taken = df.limit(maxRows + 1).collect()
    val hasMore = taken.length > maxRows
    val rows = taken.take(maxRows).map(_.toSeq).toSeq
    ResultEnvelope(
      df.schema.fieldNames.toSeq,
      df.schema.fields.map(f => classify(f.dataType)).toSeq,
      rows, rows.size, hasMore, sql)
  }
}

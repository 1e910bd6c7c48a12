package graft.model

import org.apache.spark.sql.types._

/** Semantic catalog — the Spark-native realization of the reference's
  * `sap_semantic_model.json` (SURVEY §1): typed table schemas, NL aliases,
  * cross-table join relationships, governance metadata. Pure Scala data; the
  * Spark runtime consumes it through schema mapping, view registration, the
  * knowledge graph, and the PII gate.
  *
  * The full inventory (58 tables / 699 columns / 145 cross-module
  * relationships / 29 guidelines / 58 query patterns) lives in the generated
  * [[CatalogData]]; this object merges in fixture-measured supplemental
  * columns and exposes the combined [[SemanticModel]].
  */
final case class SapColumn(
    name: String,
    sapType: String,
    description: String = "",
    nlAliases: Seq[String] = Nil,
    commonValues: Seq[String] = Nil,
    pii: Boolean = false)

/** Module descriptor (reference module_name/description per module JSON). */
final case class SapModule(key: String, name: String, description: String)

final case class SapTable(
    name: String,
    module: String,
    description: String,
    primaryKey: Seq[String],
    columns: Seq[SapColumn],
    nlAliases: Seq[String] = Nil) {
  def sparkSchema: StructType =
    StructType(columns.map(c => StructField(c.name, SapTypes.toSpark(c.sapType))))
}

/** One declared join relationship (reference `cross_module_relationships`,
  * sap_model_shared.json:21-1280, plus per-object intra relationships).
  * Pure equi-joins carry parsed column pairs; conditions with literals,
  * OR branches, or client columns keep the raw SQL text in [[condition]]. */
final case class Relationship(
    fromTable: String,
    toTable: String,
    joinColumns: Seq[(String, String)],
    description: String = "",
    condition: Option[String] = None) {
  def conditionSql: String = condition.getOrElse(joinColumns
    .map { case (a, b) => s"$fromTable.$a = $toTable.$b" }.mkString(" AND "))
}

final case class BusinessObject(
    name: String,
    module: String,
    tables: Seq[String],
    nlAliases: Seq[String],
    description: String = "",
    primaryTable: String = "",
    businessQuestions: Seq[String] = Nil)

final case class Guideline(
    title: String, text: String, module: String = "GENERAL", example: String = "")

/** NL query-pattern descriptor (reference `nl_query_patterns`); the SQL
  * itself is re-expressed in graft.queries.SapTemplates. */
final case class QueryPattern(
    name: String,
    description: String,
    module: String,
    tables: Seq[String],
    businessContext: String = "")

final case class SemanticModel(
    modules: Seq[String],
    tables: Seq[SapTable],
    relationships: Seq[Relationship],
    businessObjects: Seq[BusinessObject],
    guidelines: Seq[Guideline],
    moduleDetails: Seq[SapModule] = Nil,
    crossRelationships: Seq[Relationship] = Nil,
    queryPatterns: Seq[QueryPattern] = Nil) {
  lazy val tableByName: Map[String, SapTable] =
    tables.map(t => t.name.toUpperCase -> t).toMap
  def tablesOf(modules: Seq[String]): Seq[SapTable] =
    if (modules.isEmpty) tables else tables.filter(t => modules.contains(t.module))
}

/** SAP type string → Spark DataType (SURVEY §1.3). NUMC stays string to
  * preserve zero padding; DATE stays string at the storage boundary (dual
  * ISO / YYYYMMDD formats are normalized in views); amounts become exact
  * decimals (improvement over the reference's REAL). */
object SapTypes {
  private val Parens = """(\w+)\((\d+)(?:\s*,\s*(\d+))?\)""".r
  def toSpark(sapType: String): DataType = sapType.trim.toUpperCase match {
    case Parens(base, p, s) => base match {
      case "CHAR" | "VARCHAR" | "NUMC" => StringType
      case "CURR" | "QUAN" | "DEC" | "DECIMAL" =>
        DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0))
      case _ => StringType
    }
    case "DATE" | "DATS" | "TIMS" => StringType
    case "INT" | "INT4" | "INTEGER" => IntegerType
    case "CURR" | "QUAN" | "DEC" | "DECIMAL" => DecimalType(13, 2)
    case _ => StringType
  }
}

object Catalog {

  val Modules: Seq[String] = CatalogData.Modules.map(_.key)

  // Fixture-measured schemas for the core FI/MM/SD/CO/HR spine (per
  // FIXTURES.md §1, measured from the reference's sap_test.db). These define
  // the COLUMN ORDER SapFixtures seeds positionally, and contribute columns
  // the semantic model's business_columns subset omits (AUGDT, LOEKZ, ...).
  private def c(n: String, t: String, d: String = "", al: Seq[String] = Nil,
      pii: Boolean = false) = SapColumn(n, t, d, al, pii = pii)

  val FixtureTables: Seq[SapTable] = Seq(
    SapTable("BKPF", "FI_GL", "Accounting document header",
      Seq("BUKRS", "BELNR", "GJAHR"),
      Seq(c("BUKRS", "CHAR(4)", "company code"), c("BELNR", "NUMC(10)", "document number"),
        c("GJAHR", "NUMC(4)", "fiscal year"), c("BLART", "CHAR(2)", "document type"),
        c("BLDAT", "DATE", "document date"), c("BUDAT", "DATE", "posting date"),
        c("MONAT", "NUMC(2)", "fiscal period"), c("WAERS", "CHAR(5)", "currency"),
        c("USNAM", "CHAR(12)", "user name"), c("TCODE", "CHAR(20)", "transaction code")),
      Seq("journal entry header", "accounting document")),
    SapTable("BSEG", "FI_GL", "Accounting document line item",
      Seq("BUKRS", "BELNR", "GJAHR", "BUZEI"),
      Seq(c("BUKRS", "CHAR(4)"), c("BELNR", "NUMC(10)"), c("GJAHR", "NUMC(4)"),
        c("BUZEI", "NUMC(3)", "line number"), c("SHKZG", "CHAR(1)", "debit/credit S/H"),
        c("DMBTR", "CURR(13,2)", "amount local currency", Seq("amount")),
        c("HKONT", "CHAR(10)", "G/L account"), c("KOSTL", "CHAR(10)", "cost center"),
        c("LIFNR", "CHAR(10)", "vendor"), c("KUNNR", "CHAR(10)", "customer"),
        c("KOART", "CHAR(1)", "account type S/D/K/M/A"),
        c("AUGDT", "DATE", "clearing date (empty = open)")),
      Seq("journal entry line", "line item")),
    SapTable("GLT0", "FI_GL", "G/L account period balances",
      Seq("RLDNR", "BUKRS", "RACCT", "GJAHR", "DRCRK"),
      c("RLDNR", "CHAR(2)", "ledger") +: c("BUKRS", "CHAR(4)") +:
        c("RACCT", "CHAR(10)", "account number") +: c("GJAHR", "NUMC(4)") +:
        c("DRCRK", "CHAR(1)", "debit/credit") +: c("HSLVT", "CURR(13,2)", "balance carryforward") +:
        (1 to 16).map(i => c(f"HSL$i%02d", "CURR(13,2)", s"period $i amount")),
      Seq("trial balance", "account balances")),
    SapTable("SKA1", "FI_GL", "G/L account master (chart of accounts)", Seq("KTOPL", "SAKNR"),
      Seq(c("KTOPL", "CHAR(4)", "chart of accounts"), c("SAKNR", "CHAR(10)", "account"),
        c("XBILK", "CHAR(1)", "balance sheet flag"))),
    SapTable("SKAT", "FI_GL", "G/L account texts", Seq("SPRAS", "KTOPL", "SAKNR"),
      Seq(c("SPRAS", "CHAR(1)", "language"), c("KTOPL", "CHAR(4)"), c("SAKNR", "CHAR(10)"),
        c("TXT20", "CHAR(20)"), c("TXT50", "CHAR(50)"))),
    SapTable("LFA1", "FI_AP", "Vendor master", Seq("LIFNR"),
      Seq(c("LIFNR", "CHAR(10)", "vendor number"), c("NAME1", "CHAR(35)", "vendor name"),
        c("LAND1", "CHAR(3)", "country"), c("LOEKZ", "CHAR(1)", "deletion flag")),
      Seq("vendor", "supplier")),
    SapTable("BSIK", "FI_AP", "Vendor open items", Seq("BUKRS", "LIFNR", "GJAHR", "BELNR", "BUZEI"),
      Seq(c("BUKRS", "CHAR(4)"), c("LIFNR", "CHAR(10)"), c("GJAHR", "NUMC(4)"),
        c("BELNR", "NUMC(10)"), c("BUZEI", "NUMC(3)"), c("SHKZG", "CHAR(1)"),
        c("DMBTR", "CURR(13,2)"), c("WAERS", "CHAR(5)"), c("BUDAT", "DATE"),
        c("ZFBDT", "DATE", "baseline due date"), c("AUGDT", "DATE", "clearing date")),
      Seq("accounts payable open items", "vendor invoices")),
    SapTable("BSAK", "FI_AP", "Vendor cleared items", Seq("BUKRS", "LIFNR", "GJAHR", "BELNR", "BUZEI"),
      Seq(c("BUKRS", "CHAR(4)"), c("LIFNR", "CHAR(10)"), c("GJAHR", "NUMC(4)"),
        c("BELNR", "NUMC(10)"), c("BUZEI", "NUMC(3)"), c("SHKZG", "CHAR(1)"),
        c("DMBTR", "CURR(13,2)"), c("WAERS", "CHAR(5)"), c("BUDAT", "DATE"),
        c("ZFBDT", "DATE"), c("AUGDT", "DATE"))),
    SapTable("KNA1", "FI_AR", "Customer master", Seq("KUNNR"),
      Seq(c("KUNNR", "CHAR(10)", "customer number"), c("NAME1", "CHAR(35)"),
        c("LAND1", "CHAR(3)"), c("LOEKZ", "CHAR(1)")),
      Seq("customer")),
    SapTable("BSID", "FI_AR", "Customer open items", Seq("BUKRS", "KUNNR", "GJAHR", "BELNR", "BUZEI"),
      Seq(c("BUKRS", "CHAR(4)"), c("KUNNR", "CHAR(10)"), c("GJAHR", "NUMC(4)"),
        c("BELNR", "NUMC(10)"), c("BUZEI", "NUMC(3)"), c("SHKZG", "CHAR(1)"),
        c("DMBTR", "CURR(13,2)"), c("ZFBDT", "DATE"), c("AUGDT", "DATE")),
      Seq("accounts receivable open items", "customer invoices")),
    SapTable("EKKO", "MM", "Purchase order header", Seq("EBELN"),
      Seq(c("EBELN", "NUMC(10)", "PO number"), c("LIFNR", "CHAR(10)"), c("BUKRS", "CHAR(4)"),
        c("BEDAT", "DATE", "PO date"), c("BSART", "CHAR(4)", "PO type"),
        c("LOEKZ", "CHAR(1)"), c("WAERS", "CHAR(5)")),
      Seq("purchase order")),
    SapTable("EKPO", "MM", "Purchase order item", Seq("EBELN", "EBELP"),
      Seq(c("EBELN", "NUMC(10)"), c("EBELP", "NUMC(5)"), c("MATNR", "CHAR(18)"),
        c("MENGE", "QUAN(13,3)", "quantity"), c("NETPR", "CURR(13,2)", "net price"),
        c("NETWR", "CURR(13,2)", "net value"))),
    SapTable("EKBE", "MM", "PO history (goods/invoice receipts)", Seq("EBELN", "EBELP", "VGABE"),
      Seq(c("EBELN", "NUMC(10)"), c("EBELP", "NUMC(5)"), c("VGABE", "CHAR(1)"),
        c("BEWTP", "CHAR(1)", "history type E=GR"), c("BWART", "CHAR(3)", "movement type"),
        c("BUDAT", "DATE"), c("MENGE", "QUAN(13,3)"), c("DMBTR", "CURR(13,2)"),
        c("SHKZG", "CHAR(1)"))),
    SapTable("VBAK", "SD", "Sales order header", Seq("VBELN"),
      Seq(c("VBELN", "NUMC(10)", "sales document"), c("KUNNR", "CHAR(10)"),
        c("ERDAT", "DATE", "created on"), c("AUART", "CHAR(4)", "order type"),
        c("VBTYP", "CHAR(1)"), c("NETWR", "CURR(13,2)"), c("WAERK", "CHAR(5)"),
        c("LOEKZ", "CHAR(1)")),
      Seq("sales order")),
    SapTable("LIKP", "SD", "Delivery header", Seq("VBELN"),
      Seq(c("VBELN", "NUMC(10)"), c("KUNNR", "CHAR(10)"), c("ERDAT", "DATE"),
        c("WADAT_IST", "DATE", "actual goods movement date"), c("LFART", "CHAR(4)")),
      Seq("delivery")),
    SapTable("VBRK", "SD", "Billing document header", Seq("VBELN"),
      Seq(c("VBELN", "NUMC(10)"), c("KUNAG", "CHAR(10)", "sold-to party"),
        c("FKDAT", "DATE", "billing date"), c("NETWR", "CURR(13,2)"),
        c("WAERK", "CHAR(5)"), c("VBTYP", "CHAR(1)")),
      Seq("invoice", "billing document")),
    SapTable("VBFA", "SD", "Sales document flow", Seq("VBELV", "POSNV", "VBELN", "POSNN"),
      Seq(c("VBELV", "NUMC(10)", "preceding document"), c("POSNV", "NUMC(6)"),
        c("VBELN", "NUMC(10)", "subsequent document"), c("POSNN", "NUMC(6)"),
        c("VBTYP_N", "CHAR(1)", "subsequent category J=delivery M=invoice"),
        c("RFMNG", "QUAN(13,3)")),
      Seq("document flow")),
    SapTable("CSKS", "CO", "Cost center master", Seq("KOKRS", "KOSTL", "DATBI"),
      Seq(c("KOKRS", "CHAR(4)", "controlling area"), c("KOSTL", "CHAR(10)", "cost center"),
        c("DATBI", "DATE", "valid to"), c("DATAB", "DATE", "valid from"),
        c("OBJNR", "CHAR(22)", "object number KS+area+cost center")),
      Seq("cost center")),
    SapTable("COEP", "CO", "CO line items", Seq("KOKRS", "BELNR", "BUZEI"),
      Seq(c("KOKRS", "CHAR(4)"), c("BELNR", "NUMC(10)"), c("BUZEI", "NUMC(3)"),
        c("OBJNR", "CHAR(22)"), c("KSTAR", "CHAR(10)", "cost element"),
        c("WRTTP", "CHAR(2)", "value type 04=actual 01=plan"),
        c("WKGBTR", "CURR(13,2)", "amount"), c("GJAHR", "NUMC(4)"), c("PERIO", "NUMC(3)"))),
    SapTable("COSP", "CO", "CO external cost totals", Seq("OBJNR", "GJAHR", "WRTTP", "KSTAR"),
      c("OBJNR", "CHAR(22)") +: c("GJAHR", "NUMC(4)") +: c("WRTTP", "CHAR(2)") +:
        c("KSTAR", "CHAR(10)") +: (1 to 12).map(i => c(f"WKG$i%03d", "CURR(13,2)"))),
    SapTable("PA0001", "HR", "HR org assignment", Seq("PERNR", "BEGDA"),
      Seq(c("PERNR", "NUMC(8)", "personnel number", pii = true),
        c("ENAME", "CHAR(40)", "employee name", pii = true),
        c("BEGDA", "DATE"), c("ENDDA", "DATE"), c("ORGEH", "NUMC(8)", "org unit"),
        c("PLANS", "NUMC(8)", "position"), c("BUKRS", "CHAR(4)")),
      Seq("employee assignment")),
    SapTable("PA0002", "HR", "HR personal data", Seq("PERNR", "BEGDA"),
      Seq(c("PERNR", "NUMC(8)", pii = true), c("NACHN", "CHAR(40)", "last name", pii = true),
        c("VORNA", "CHAR(40)", "first name", pii = true),
        c("GBDAT", "DATE", "birth date", pii = true), c("BEGDA", "DATE"), c("ENDDA", "DATE")),
      Seq("employee personal data")),
    SapTable("HRPY_RGDIR", "PAY", "Payroll results directory", Seq("PERNR", "SEQNR"),
      Seq(c("PERNR", "NUMC(8)", pii = true), c("SEQNR", "NUMC(5)"),
        c("FPBEG", "DATE"), c("FPEND", "DATE"), c("WAERS", "CHAR(5)"))))

  /** Full table inventory: the generated model tables, with fixture-measured
    * columns taking the FIRST positions (SapFixtures seeds rows positionally
    * against them) and model-only business columns appended. Where both
    * define a column, the fixture type wins and model descriptions/aliases
    * enrich it. */
  val Tables: Seq[SapTable] = {
    val fixture = FixtureTables.map(t => t.name -> t).toMap
    CatalogData.Tables.map { g =>
      fixture.get(g.name) match {
        case None => g
        case Some(h) =>
          val gByName = g.columns.map(col => col.name -> col).toMap
          val first = h.columns.map { col =>
            gByName.get(col.name).fold(col)(gc => col.copy(
              description = if (col.description.nonEmpty) col.description else gc.description,
              nlAliases = (col.nlAliases ++ gc.nlAliases).distinct,
              commonValues = gc.commonValues,
              pii = col.pii || gc.pii))
          }
          val rest = g.columns.filterNot(gc => h.columns.exists(_.name == gc.name))
          g.copy(
            primaryKey = if (h.primaryKey.nonEmpty) h.primaryKey else g.primaryKey,
            columns = first ++ rest,
            nlAliases = (h.nlAliases ++ g.nlAliases).distinct)
      }
    }
  }

  /** Hand-curated joins the reference's relationship list omits but its own
    * templates use (e.g. BSEG line items to vendor/customer masters). These
    * feed join-path discovery; the KG's reference-parity edge count uses
    * only the declared cross-module list. */
  val SupplementalRelationships: Seq[Relationship] = Seq(
    Relationship("BSEG", "LFA1", Seq("LIFNR" -> "LIFNR"), "line item vendor"),
    Relationship("BSEG", "KNA1", Seq("KUNNR" -> "KUNNR"), "line item customer"),
    Relationship("GLT0", "SKA1", Seq("RACCT" -> "SAKNR"), "balance to account master"),
    Relationship("VBAK", "VBFA", Seq("VBELN" -> "VBELV"), "order to document flow"),
    Relationship("VBFA", "LIKP", Seq("VBELN" -> "VBELN"), "flow to delivery"),
    Relationship("VBFA", "VBRK", Seq("VBELN" -> "VBELN"), "flow to billing"),
    Relationship("CSKS", "COEP", Seq("OBJNR" -> "OBJNR"), "cost center line items"),
    Relationship("CSKS", "COSP", Seq("OBJNR" -> "OBJNR"), "cost center totals"),
    Relationship("PA0001", "PA0002", Seq("PERNR" -> "PERNR"), "employee master"))

  /** Relationships usable for join-path discovery: intra-object header↔item
    * joins plus the cross-module relationships whose endpoint tables are in
    * the inventory (the reference KG applies the same filter), plus the
    * supplemental joins above (minus any the model already declares). */
  val Relationships: Seq[Relationship] = {
    val present = Tables.map(_.name).toSet
    val declared = CatalogData.IntraRelationships ++ CatalogData.CrossRelationships
      .filter(r => present.contains(r.fromTable) && present.contains(r.toTable))
    val pairs = declared.map(r => Set(r.fromTable, r.toTable)).toSet
    declared ++ SupplementalRelationships
      .filterNot(r => pairs.contains(Set(r.fromTable, r.toTable)))
  }

  val BusinessObjects: Seq[BusinessObject] = CatalogData.BusinessObjects

  val Guidelines: Seq[Guideline] = CatalogData.Guidelines

  val Model: SemanticModel = SemanticModel(
    Modules, Tables, Relationships, BusinessObjects, Guidelines,
    moduleDetails = CatalogData.Modules,
    crossRelationships = CatalogData.CrossRelationships,
    queryPatterns = CatalogData.QueryPatterns)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.SapFixtures
import graft.governance.PiiGate
import graft.graph.KnowledgeGraph
import graft.pipeline.{ModuleDetector, PromptRenderer, ResultEnvelope}
import graft.queries.SapTemplates
import graft.sql.HanaDialect

/** SAP engine components: dialect front end, PII gate, knowledge graph,
  * module detection, result envelope, and the template library over the
  * deterministic SAP-shaped fixtures. */
class EngineSpec extends AnyFunSuite {
  import SharedSpark._

  lazy val fixtures = SapFixtures.register(spark)

  // ── dialect pre-rewriter ────────────────────────────────────────────────

  test("dialect: TOP / FETCH FIRST / ROWNUM / comments / multi-statement") {
    assert(HanaDialect.rewrite("SELECT TOP 5 a FROM t ORDER BY a")
      == "SELECT a FROM t ORDER BY a LIMIT 5")
    assert(HanaDialect.rewrite(
      "WITH x AS (SELECT a FROM t) SELECT TOP 5 a FROM x ORDER BY a")
      == "WITH x AS (SELECT a FROM t) SELECT a FROM x ORDER BY a LIMIT 5")
    // a TOP inside the CTE body belongs to that scope — left untouched
    assert(HanaDialect.rewriteTop(
      "WITH x AS (SELECT TOP 3 a FROM t) SELECT a FROM x")
      == "WITH x AS (SELECT TOP 3 a FROM t) SELECT a FROM x")
    assert(HanaDialect.rewrite("SELECT a FROM t FETCH FIRST 3 ROWS ONLY")
      == "SELECT a FROM t LIMIT 3")
    assert(HanaDialect.rewrite("SELECT a FROM t WHERE ROWNUM <= 7").endsWith("LIMIT 7"))
    assert(HanaDialect.rewrite("-- c\nSELECT a /* x */ FROM t -- tail")
      .replaceAll("\\s+", " ").trim == "SELECT a FROM t")
    assert(HanaDialect.rewrite("DROP TABLE x; SELECT a FROM t;")
      == "SELECT a FROM t")
  }

  test("dialect: HANA functions run through spark.sql") {
    HanaDialect.install(spark)
    val r = spark.sql(
      """SELECT add_days(DATE '2025-01-31', 30) AS d1,
         days_between(DATE '2025-03-01', DATE '2025-01-30') AS n,
         datediff3('day', DATE '2025-01-01', DATE '2025-01-11') AS n3,
         to_varchar(DATE '2025-02-03', 'YYYY-MM') AS ym,
         to_number('12.5') AS num,
         julianday(DATE '1970-01-01') AS jd,
         to_char(DATE '2025-02-03', 'YYYY-MM-DD') AS tc,
         strftime('%Y-%m', DATE '2025-02-03') AS sft""").collect()(0)
    assert(r.getDate(0).toString == "2025-03-02")
    assert(r.getInt(1) == 30)
    assert(r.getInt(2) == 10)
    assert(r.getString(3) == "2025-02")
    assert(r.getDecimal(4).doubleValue() == 12.5)
    assert(r.getDouble(5) == 2440587.5)
    assert(r.getString(6) == "2025-02-03")
    assert(r.getString(7) == "2025-02")
  }

  // ── PII gate ────────────────────────────────────────────────────────────

  test("pii gate: naked select on protected table is blocked") {
    fixtures
    val bad = spark.sql("SELECT PERNR, ENAME FROM PA0001")
    assert(!PiiGate.isAllowed(bad))
    val alsoBad = spark.sql("SELECT * FROM PA0002 WHERE PERNR = '00000001'")
    assert(!PiiGate.isAllowed(alsoBad))
  }

  test("pii gate: aggregate-only HR queries pass") {
    fixtures
    val ok = spark.sql("SELECT ORGEH, COUNT(*) AS n FROM PA0001 GROUP BY ORGEH")
    assert(PiiGate.isAllowed(ok))
  }

  test("pii gate: PII column inside aggregate is fine, outside is not") {
    fixtures
    assert(PiiGate.isAllowed(
      spark.sql("SELECT COUNT(DISTINCT PERNR) AS n FROM PA0001 GROUP BY BUKRS")))
    assert(!PiiGate.isAllowed(
      spark.sql("SELECT PERNR, COUNT(*) AS n FROM PA0001 GROUP BY PERNR")))
  }

  test("pii gate: evasion via alias does not slip through") {
    fixtures
    val sneaky = spark.sql(
      "SELECT x AS harmless, COUNT(*) n FROM (SELECT ENAME AS x FROM PA0001) GROUP BY x")
    assert(!PiiGate.isAllowed(sneaky))
  }

  test("pii gate: non-protected tables unaffected") {
    fixtures
    assert(PiiGate.isAllowed(spark.sql("SELECT LIFNR, NAME1 FROM LFA1")))
  }

  // ── knowledge graph ─────────────────────────────────────────────────────

  test("knowledge graph: node/edge stats match the reference graph") {
    // ground truth from running the reference builder on its own model:
    // sap_knowledge_graph.py stats → 240 nodes / 336 edges
    // (10 modules, 58 tables, 36 concepts, 136 NL terms)
    val kg = KnowledgeGraph.default
    assert(kg.stats == Map(
      "total_nodes" -> 240, "total_edges" -> 336, "modules" -> 10,
      "tables" -> 58, "concepts" -> 36, "nl_terms" -> 136))
  }

  test("knowledge graph: shortest join paths are 2-hop and renderable") {
    // the full model offers several equally-short routes (e.g. BKPF→RBKP→LFA1
    // via invoice receipts) — assert length and renderability, not one route
    val kg = KnowledgeGraph.default
    val p1 = kg.findJoinPath("BKPF", "LFA1").get
    assert(p1.size == 3 && kg.joinChainSql(p1).isDefined)
    val p2 = kg.findJoinPath("VBAK", "VBRK").get
    assert(p2.size == 3 && kg.joinChainSql(p2).isDefined)
  }

  test("knowledge graph: all simple paths bounded by cutoff and max") {
    val kg = KnowledgeGraph.default
    val paths = kg.findAllJoinPaths("BKPF", "LFA1")
    assert(paths.nonEmpty && paths.size <= 5)
    assert(paths.forall(_.size <= 5))
  }

  test("knowledge graph: NL term and question resolution") {
    val kg = KnowledgeGraph.default
    assert(kg.resolveTerm("vendor").contains("LFA1"))
    assert(kg.resolveTerm("trial balance").contains("GLT0"))
    val tables = kg.resolveQuestion("Show me the top vendors by spend")
    assert(tables.contains("LFA1"))
  }

  test("knowledge graph: join chain SQL renders declared conditions") {
    val kg = KnowledgeGraph.default
    val sql = kg.joinChainSql(Seq("BKPF", "BSEG", "LFA1")).get
    assert(sql.contains("JOIN BSEG ON BKPF.BUKRS = BSEG.BUKRS"))
    assert(sql.contains("JOIN LFA1 ON BSEG.LIFNR = LFA1.LIFNR"))
  }

  // ── module detection + prompt rendering ─────────────────────────────────

  test("module detector: keyword scoring ranks the right module first") {
    assert(ModuleDetector.detect("top vendors by spend with open items").head == "FI_AP")
    assert(ModuleDetector.detect("cost center actual vs plan variance").head == "CO")
    assert(ModuleDetector.detect("employee headcount by org unit").head == "HR")
    // no hits → fallback to all modules
    assert(ModuleDetector.detect("xyzzy").size == 10)
  }

  test("prompt renderer: module filter limits schemas; PII marked") {
    val p = PromptRenderer.render(model.Catalog.Model, Seq("HR"))
    assert(p.contains("PA0001") && p.contains("[PII]"))
    assert(!p.contains("TABLE EKKO"))
  }

  // ── result envelope ─────────────────────────────────────────────────────

  test("result envelope: row cap + has_more lookahead + type classes") {
    fixtures
    val env = ResultEnvelope.fromDataFrame(
      spark.sql("SELECT BELNR, DMBTR FROM BSEG ORDER BY BELNR, BUZEI"), maxRows = 10)
    assert(env.rowCount == 10 && env.hasMore)
    assert(env.columnTypes == Seq("str", "float"))
    assert(env.toJson.contains("\"has_more\":true"))
    val small = ResultEnvelope.fromDataFrame(
      spark.sql("SELECT LIFNR FROM LFA1"), maxRows = 200)
    assert(!small.hasMore && small.rowCount == 8)
  }

  // ── template library over fixtures ──────────────────────────────────────

  test("templates: every template parses, passes governance, and runs") {
    fixtures
    for ((name, _) <- SapTemplates.templates) {
      val df = SapTemplates.run(spark, name)
      assert(df.columns.nonEmpty, name)
      df.collect() // must execute
    }
  }

  test("templates: all 58 reference pattern names are runnable") {
    assert(SapTemplates.canonicalPatternNames.size == 58)
    val missing = SapTemplates.canonicalPatternNames
      .filterNot(SapTemplates.templates.contains)
    assert(missing.isEmpty, s"missing templates: $missing")
  }

  test("templates: non-trivial results on fixtures (spot rows > 0)") {
    fixtures
    for (name <- Seq("trial_balance", "vendor_spend_by_quarter", "three_way_match",
        "inventory_on_hand", "order_operations_iw49n",
        "tcode_iw49n_cancelled_by_equipment", "value_chain_p2p_pipeline_summary",
        "value_chain_r2r_co_reconciliation", "payroll_by_department",
        "benefits_enrollment_summary")) {
      assert(SapTemplates.run(spark, name).collect().nonEmpty, name)
    }
  }

  test("template invariant: multi-row receipt history does not multiply ordered qty") {
    fixtures
    // PO 0000450001 has items 10+20 ordering 11+12=23; item 10's receipt is
    // split across TWO EKBE rows (5+6=11). A join of EKBE below item grain
    // would report ordered_qty 34 (11 counted twice) — the pre-aggregated
    // shape must report 23 ordered / 11 received / Partially received.
    val po = SapTemplates.run(spark, "purchase_order_status")
      .filter(col("EBELN") === "0000450001").collect()(0)
    assert(po.getDecimal(2).intValue() == 23, "ordered_qty")
    assert(po.getDecimal(3).intValue() == 11, "received_qty")
    assert(po.getString(4) == "Partially received")
    // same invariant through the by-material rollup: MAT000011 is PO 1 item
    // 10 only → ordered 11, received 11 (two partial receipts summed once)
    val mat = SapTemplates.run(spark, "tcode_me2m")
      .filter(col("MATNR") === "MAT000011").collect()(0)
    assert(mat.getDecimal(3).intValue() == 11, "me2m ordered_qty")
    assert(mat.getDecimal(4).intValue() == 11, "me2m received_qty")
  }

  test("template invariant: p2p trace AP totals don't fan out with receipt rows") {
    fixtures
    // expected signed AP per vendor, straight off BSIK — the trace joins
    // EKBE and RSEG too, and any row fan-out there would inflate these sums
    // (POs 1-2 now have multi-row receipt history)
    val expected = spark.sql(
      """SELECT LIFNR, SUM(CASE WHEN SHKZG = 'S' THEN DMBTR ELSE -DMBTR END) AS amt
        FROM BSIK WHERE AUGDT IS NULL OR AUGDT = '' GROUP BY LIFNR""")
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val trace = SapTemplates.run(spark, "value_chain_procure_to_pay_trace").collect()
    assert(trace.nonEmpty)
    var checked = 0
    trace.foreach { r =>
      val vendor = r.getString(2)
      val got = r.getDecimal(7)
      expected.get(vendor).foreach { exp =>
        assert(got != null && got.compareTo(exp) == 0,
          s"PO ${r.getString(0)} vendor $vendor: got $got expected $exp")
        checked += 1
      }
      if (!expected.contains(vendor)) assert(got == null, s"vendor $vendor")
    }
    assert(checked > 0, "no PO had open AP items — fixture drift")
  }

  test("template invariant: journal entries are balanced (signed sum = 0)") {
    fixtures
    val net = SapTemplates.run(spark, "journal_balance_check")
      .agg(sum(abs(col("net")))).collect()(0).getDecimal(0)
    assert(net.compareTo(java.math.BigDecimal.ZERO) == 0)
  }

  test("template invariant: top vendors returns 5 with signed spend") {
    fixtures
    val rows = SapTemplates.run(spark, "top_vendors_by_spend").collect()
    assert(rows.length == 5)
    // descending by spend
    val spends = rows.map(_.getDecimal(2).doubleValue()).toSeq
    assert(spends == spends.sortBy(-_))
  }

  test("template invariant: o2c pipeline stages count orders/deliveries/bills") {
    fixtures
    val stages = SapTemplates.run(spark, "value_chain_o2c_pipeline_summary").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("1. Ordered, not delivered") == 3) // 12 orders, 9 with flow
    assert(stages("2. Delivered, not billed") == 3)  // 9 deliveries, 6 billed
    assert(stages("3. Billed") == 6)
  }

  test("template invariant: headcount aggregates without tripping PII gate") {
    fixtures
    val rows = SapTemplates.run(spark, "employee_headcount").collect()
    assert(rows.map(_.getLong(2)).sum == 12)
  }

  test("engine: execute returns the reference envelope shape") {
    fixtures
    val env = Engine.execute(spark, "SELECT TOP 3 LIFNR, NAME1 FROM LFA1 ORDER BY LIFNR")
    assert(env.rowCount == 3 && !env.hasMore)
    assert(env.sql.exists(_.contains("LIMIT 3")))
    intercept[PiiGate.Violation] {
      Engine.execute(spark, "SELECT PERNR FROM PA0001")
    }
  }
}

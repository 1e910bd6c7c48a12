package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.data.SapFixtures
import graft.server.ApiServer

/** HTTP façade: the reference's /api envelope over the engine. */
class ServerSpec extends AnyFunSuite {
  import SharedSpark._

  private def post(url: String, body: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST"); conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    (code, new String(is.readAllBytes(), StandardCharsets.UTF_8))
  }

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    (code, new String(is.readAllBytes(), StandardCharsets.UTF_8))
  }

  test("api server: execute, governance block, catalog, kg path") {
    SapFixtures.register(spark)
    val server = ApiServer.start(spark)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val (c1, b1) = post(s"$base/api/execute",
        """{"sql": "SELECT TOP 2 LIFNR, NAME1 FROM LFA1 ORDER BY LIFNR"}""")
      assert(c1 == 200 && b1.contains("\"row_count\":2") && b1.contains("0000000001"))

      val (c2, b2) = post(s"$base/api/execute",
        """{"sql": "SELECT ENAME FROM PA0001"}""")
      assert(c2 == 403 && b2.contains("\"governance_block\":true"))

      val (c3, b3) = post(s"$base/api/execute", """{"nope": 1}""")
      assert(c3 == 400 && b3.contains("missing sql"))

      val (c4, b4) = get(s"$base/api/catalog")
      assert(c4 == 200 && b4.contains("\"name\":\"BSEG\""))

      val (c5, b5) = get(s"$base/api/kg/path?from=BKPF&to=LFA1")
      assert(c5 == 200 && b5.contains("\"path\":[\"BKPF\",") && b5.contains("\"LFA1\"]"))

      val (c6, _) = get(s"$base/api/kg/path?from=BKPF&to=NOSUCHTBL")
      assert(c6 == 404)
    } finally server.stop(0)
  }

  test("api server: kg explorer endpoints round-trip") {
    SapFixtures.register(spark) // /api/ask routes to templates over the views
    val server = ApiServer.start(spark)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val (c1, b1) = get(s"$base/api/kg/stats")
      assert(c1 == 200 && b1.contains("\"total_nodes\":240") &&
        b1.contains("\"total_edges\":336"))

      val (c2, b2) = get(s"$base/api/kg/graph")
      assert(c2 == 200 && b2.contains("\"id\":\"tbl:BKPF\"") &&
        b2.contains("\"type\":\"concept\"") && b2.contains("\"stats\":"))

      val (c3, b3) = get(s"$base/api/kg/resolve?term=vendor")
      assert(c3 == 200 && b3.contains("\"LFA1\""))
      val (c3b, b3b) = get(s"$base/api/kg/resolve?question=" +
        java.net.URLEncoder.encode("top vendors by spend", "UTF-8"))
      assert(c3b == 200 && b3b.contains("\"LFA1\""))

      val (c4, b4) = get(s"$base/api/kg/concept?name=Journal_Entry")
      assert(c4 == 200 && b4.contains("\"table_name\":\"BKPF\"") &&
        b4.contains("\"module\":\"FI_GL\""))
      assert(get(s"$base/api/kg/concept?name=Nope")._1 == 404)

      val (c5, b5) = get(s"$base/api/kg/table?name=BSEG")
      assert(c5 == 200 && b5.contains("\"concept_name\":") &&
        b5.contains("\"join_partners\":["))

      val (c6, b6) = get(s"$base/api/kg/module?code=PM")
      // AUFK itself is attributed to CO (first-module-wins, as the reference
      // does); PM's subgraph carries the PM-specific chain
      assert(c6 == 200 && b6.contains("tbl:AFIH") && b6.contains("tbl:AFVC"))
      assert(get(s"$base/api/kg/module?code=ZZ")._1 == 404)

      val (c7, b7) = post(s"$base/api/classify",
        """{"question": "Who are our top 10 vendors by total spend?"}""")
      assert(c7 == 200 && b7.contains("\"confidence\":\"high\"") &&
        b7.contains("\"FI_AP\"") && b7.contains("\"message\":"))

      val (c8, b8) = post(s"$base/api/ask",
        """{"question": "Show customer open items with aging buckets"}""")
      assert(c8 == 200 && b8.contains("\"answered\":true") &&
        b8.contains("\"template\":") && b8.contains("\"rows\":"))
      val (c9, b9) = post(s"$base/api/ask", """{"question": "show me data"}""")
      assert(c9 == 200 && b9.contains("\"answered\":false") &&
        b9.contains("rephrase"))
    } finally server.stop(0)
  }

  test("disambiguation loop over HTTP: classify -> slot answer -> confirmed execute") {
    SapFixtures.register(spark)
    val server = ApiServer.start(spark)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      // turn 1: vague ask → disambiguation with a metric slot question
      val q1 = "what about our customer open items"
      val (c1, b1) = post(s"$base/api/classify", s"""{"question": "$q1"}""")
      assert(c1 == 200 && b1.contains("\"disambiguation_needed\":true"))
      assert(b1.contains("\"slot\":\"metric\""),
        s"turn 1 should ask a metric slot question: $b1")

      // turn 2 answers the metric slot question with one of its options;
      // ALONE the answer has no module context → low confidence, no routing
      val q2 = "count of documents"
      val (c2a, b2a) = post(s"$base/api/classify", s"""{"question": "$q2"}""")
      assert(c2a == 200 && b2a.contains("\"confidence\":\"low\""),
        s"slot answer without history has no intent of its own: $b2a")
      val (c2, b2) = post(s"$base/api/ask", s"""{"question": "$q2"}""")
      assert(c2 == 200 && b2.contains("\"answered\":false"),
        s"slot answer without history must not route: $b2")

      // turn 2: same slot answer WITH history → accumulated intent is
      // high-confidence and routes to a validated template with results
      val (c3, b3) = post(s"$base/api/classify",
        s"""{"question": "$q2", "history": ["$q1"]}""")
      assert(c3 == 200 && b3.contains("\"confidence\":\"high\""),
        s"accumulated classification should confirm: $b3")
      val (c4, b4) = post(s"$base/api/ask",
        s"""{"question": "$q2", "history": ["$q1"]}""")
      assert(c4 == 200 && b4.contains("\"answered\":true") &&
        b4.contains("\"template\":") && b4.contains("\"rows\":"),
        s"accumulated ask should execute: $b4")
    } finally server.stop(0)
  }

  test("/api/generate: module-filtered prompt, offline stub transport") {
    SapFixtures.register(spark)
    val server = ApiServer.start(spark)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val (c1, b1) = post(s"$base/api/generate",
        """{"question": "Who are our top 10 vendors by total spend?"}""")
      assert(c1 == 200 && b1.contains("\"status\":\"ok\""))
      assert(b1.contains("\"mode\":\"stub\""))
      assert(b1.contains("\"modules_used\":[\"FI_AP\""), s"RAG filter: $b1")
      assert(b1.contains("SELECT"), s"stub should route to validated SQL: $b1")
      assert("\"prompt_chars\":(\\d+)".r.findFirstMatchIn(b1)
        .exists(_.group(1).toInt > 1000))
      assert(b1.contains("\"input_tokens\":"))

      // classification-provided modules + confidence pass through
      val (c2, b2) = post(s"$base/api/generate",
        """{"question": "vendor spend", "modules": ["FI_AP"], "confidence": "high", "matched_pattern": true}""")
      assert(c2 == 200 && b2.contains("\"modules_used\":[\"FI_AP\"]"))
      assert(b2.contains("\"confidence\":\"high\"") &&
        b2.contains("\"matched_pattern\":true"))

      val (c3, b3) = post(s"$base/api/generate", """{"nope": 1}""")
      assert(c3 == 400 && b3.contains("missing question"))
    } finally server.stop(0)
  }

  test("browser UI: served at root, 404 elsewhere, examples endpoint") {
    SapFixtures.register(spark)
    val server = ApiServer.start(spark)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val (c1, b1) = get(s"$base/")
      assert(c1 == 200 && b1.contains("<title>Graft") &&
        b1.contains("/api/ask") && b1.contains("downloadCsv") &&
        b1.contains("svgBarChart") && b1.contains("svgLineChart") &&
        b1.contains("svgPieChart") && b1.contains("analyzeDataForChart"))
      val (c2, b2) = get(s"$base/index.html")
      assert(c2 == 200 && b2 == b1)
      val (c3, _) = get(s"$base/no/such/page")
      assert(c3 == 404)

      val (c4, b4) = get(s"$base/api/examples")
      assert(c4 == 200)
      val n = "\"question\":".r.findAllIn(b4).length
      assert(n == graft.intent.ExampleQuestions.all.size)
      assert(b4.contains("\"module\":\"FI_AP\""))
    } finally server.stop(0)
  }

  test("sql body parser handles escapes") {
    assert(ApiServer.extractSql("""{"sql": "SELECT \"a\"\nFROM t"}""")
      .contains("SELECT \"a\"\nFROM t"))
    assert(ApiServer.extractSql("""{}""").isEmpty)
  }

  test("string-array parser survives ']' inside an element") {
    val body = """{"history": ["show spend [Q1]", "and [Q2] too"], "x": 1}"""
    assert(ApiServer.extractStringArray(body, "history") ==
      Seq("show spend [Q1]", "and [Q2] too"))
    assert(ApiServer.extractStringArray("""{"history": []}""", "history").isEmpty)
  }

  test("top-level JSON anchors ignore key-shaped text in nested strings") {
    val body =
      """{"content":[{"type":"text","text":"fake \"usage\": {\"input_tokens\": 9} and \"content\":[{}]"}],
        |"usage":{"input_tokens":5}}""".stripMargin
    val blocks = ApiServer.extractTopObjectArray(body, "content")
    assert(blocks.size == 1 && blocks.head.contains("\"type\":\"text\""))
    assert(ApiServer.extractTopObject(body, "usage")
      .contains("""{"input_tokens":5}"""))
    assert(ApiServer.extractTopObject(body, "nope").isEmpty)
  }

  test("server settings: status, save-key format check, save-model allowlist") {
    SapFixtures.register(spark)
    val server = ApiServer.start(spark)
    val base = s"http://localhost:${server.getAddress.getPort}"
    val savedKey = ApiServer.ServerConfig.apiKey
    val savedModel = ApiServer.ServerConfig.model
    try {
      val (c0, b0) = get(s"$base/api/status")
      assert(c0 == 200 && b0.contains("\"model\":") &&
        b0.contains("\"has_knowledge_graph\":true"))

      // bad key format: reference-parity error envelope, nothing stored
      val (c1, b1) = post(s"$base/api/save-key", """{"key": "not-a-key"}""")
      assert(c1 == 200 && b1.contains("\"status\":\"error\"") &&
        b1.contains("sk-ant-"))

      // good format: stored (no live probe in offline mode), preview echoed
      val (c2, b2) = post(s"$base/api/save-key",
        """{"key": "sk-ant-test-abcdef"}""")
      assert(c2 == 200 && b2.contains("\"status\":\"ok\"") &&
        b2.contains("\"key_preview\":\"...abcdef\""), b2)
      val (_, b2s) = get(s"$base/api/status")
      assert(b2s.contains("\"has_api\":true") && !b2s.contains("sk-ant-test"),
        "status must never echo the full key")

      val (c3, b3) = post(s"$base/api/remove-key", "{}")
      assert(c3 == 200 && b3.contains("\"status\":\"ok\""))
      assert(get(s"$base/api/status")._2.contains("\"has_api\":false"))

      val (c4, b4) = post(s"$base/api/save-model", """{"model": "gpt-oops"}""")
      assert(c4 == 200 && b4.contains("Unknown model"))
      val (c5, b5) = post(s"$base/api/save-model",
        """{"model": "claude-haiku-4-20250414"}""")
      assert(c5 == 200 && b5.contains("\"status\":\"ok\"") &&
        b5.contains("claude-haiku-4-20250414"))
      assert(get(s"$base/api/status")._2.contains("claude-haiku-4-20250414"))
    } finally {
      ApiServer.ServerConfig.apiKey = savedKey
      ApiServer.ServerConfig.model = savedModel
      server.stop(0)
    }
  }
}

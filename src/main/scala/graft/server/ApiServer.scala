package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.Engine
import graft.governance.PiiGate
import graft.graph.KnowledgeGraph
import graft.model.Catalog

/** HTTP façade replicating the reference's API envelope (SURVEY §7.7,
  * sap_sql_engine.py /api/execute and /api/kg endpoints): a thin JDK-http layer over
  * the engine — no frameworks, no extra dependencies.
  *
  * Routes:
  *   POST /api/execute   {"sql": "..."}  → result envelope JSON
  *                       (governance violations → governance_block envelope,
  *                        mirroring sap_sql_engine.py:1592-1604)
  *   GET  /api/catalog                    → table inventory
  *   GET  /api/kg/path?from=T1&to=T2      → shortest join path + chain SQL
  *
  * Unlike the reference's serial HTTPServer (1 request at a time,
  * sap_sql_engine.py:1724), requests here execute on a thread pool and Spark
  * schedules them concurrently.
  */
object ApiServer {

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
    case ch => ch.toString
  } + "\""

  /** Minimal {"sql": "..."} body parser (no JSON library in scope). */
  def extractSql(body: String): Option[String] = extractField(body, "sql")

  /** Minimal {"<key>": "..."} string-field parser. */
  def extractField(body: String, key: String): Option[String] = {
    val m = ("\"" + key + """"\s*:\s*"""").r.findFirstMatchIn(body)
    m.map { hit =>
      val sb = new StringBuilder
      var i = hit.end
      var done = false
      while (i < body.length && !done) {
        body.charAt(i) match {
          case '\\' if i + 1 < body.length =>
            body.charAt(i + 1) match {
              case 'n' => sb += '\n'
              case 't' => sb += '\t'
              case 'r' => sb += '\r'
              case 'u' if i + 5 < body.length =>
                sb += Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar
                i += 4
              case other => sb += other
            }
            i += 2
          case '"' => done = true
          case ch => sb += ch; i += 1
        }
      }
      sb.toString
    }
  }

  /** Minimal {"<key>": ["a", "b"]} string-array parser. The closing bracket
    * is located with a string-aware scan, so a ']' inside an element (e.g. a
    * history question like "show spend [Q1]") cannot truncate the array. */
  def extractStringArray(body: String, key: String): Seq[String] = {
    val m = ("\"" + key + """"\s*:\s*\[""").r.findFirstMatchIn(body)
    m.toSeq.flatMap { hit =>
      var i = hit.end
      var inStr = false
      var close = -1
      while (i < body.length && close < 0) {
        val ch = body.charAt(i)
        if (inStr) {
          if (ch == '\\') i += 1
          else if (ch == '"') inStr = false
        } else if (ch == '"') inStr = true
        else if (ch == ']') close = i
        i += 1
      }
      if (close < 0) Nil
      else """"((?:[^"\\]|\\.)*)"""".r
        .findAllMatchIn(body.substring(hit.end, close))
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }
  }

  /** Scans consecutive top-level `{...}` objects starting at `from` (just
    * past a '['), stopping at the matching ']'. String- and nesting-aware. */
  private def objectsFrom(body: String, from: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = from
    var depth = 0
    var start = -1
    var inStr = false
    var done = false
    while (i < body.length && !done) {
      val ch = body.charAt(i)
      if (inStr) {
        if (ch == '\\') i += 1
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += body.substring(start, i + 1); start = -1 }
        case ']' if depth == 0 => done = true
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** Minimal {"<key>": [{...}, {...}]} object-array parser: returns each
    * top-level object's raw text (fields readable via [[extractField]]). */
  def extractObjectArray(body: String, key: String): Seq[String] = {
    val m = ("\"" + key + """"\s*:\s*\[""").r.findFirstMatchIn(body)
    m.toSeq.flatMap(hit => objectsFrom(body, hit.end))
  }

  /** Index of the value of a DEPTH-1 key in a JSON object — the scan tracks
    * string and nesting state, so a key-looking substring inside a nested
    * string value (e.g. '"usage":' inside LLM-generated SQL text) can never
    * match. Returns the index of the value's first character. */
  def topLevelValueIndex(body: String, key: String): Option[Int] = {
    val pat = "\"" + key + "\""
    var i = body.indexOf('{')
    var depth = 0
    var inStr = false
    var found = -1
    while (i >= 0 && i < body.length && found < 0) {
      val ch = body.charAt(i)
      if (inStr) {
        if (ch == '\\') i += 1
        else if (ch == '"') inStr = false
      } else ch match {
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case '"' =>
          if (depth == 1 && body.startsWith(pat, i)) {
            var j = i + pat.length
            while (j < body.length && body.charAt(j).isWhitespace) j += 1
            if (j < body.length && body.charAt(j) == ':') {
              j += 1
              while (j < body.length && body.charAt(j).isWhitespace) j += 1
              found = j
              i = j - 1
            } else inStr = true
          } else inStr = true
        case _ =>
      }
      i += 1
    }
    if (found < 0) None else Some(found)
  }

  /** Top-level {"<key>": [{...}]} object-array parser anchored by
    * [[topLevelValueIndex]] — immune to key-shaped text in nested strings. */
  def extractTopObjectArray(body: String, key: String): Seq[String] =
    topLevelValueIndex(body, key)
      .filter(i => i < body.length && body.charAt(i) == '[')
      .toSeq.flatMap(i => objectsFrom(body, i + 1))

  /** Top-level {"<key>": {...}} object extractor (raw text incl. braces),
    * anchored by [[topLevelValueIndex]]. */
  def extractTopObject(body: String, key: String): Option[String] =
    topLevelValueIndex(body, key)
      .filter(i => i < body.length && body.charAt(i) == '{').map { start =>
        var i = start + 1
        var depth = 1
        var inStr = false
        while (i < body.length && depth > 0) {
          val ch = body.charAt(i)
          if (inStr) {
            if (ch == '\\') i += 1
            else if (ch == '"') inStr = false
          } else ch match {
            case '"' => inStr = true
            case '{' => depth += 1
            case '}' => depth -= 1
            case _ =>
          }
          i += 1
        }
        body.substring(start, i)
      }

  /** Server-side settings backing the /api/save-key, /api/remove-key,
    * /api/save-model and /api/status endpoints (reference sap_sql_engine.py:
    * 1376-1385, 1529-1584). The reference persists to config.json; here
    * state is per-process (persisting a credential to disk is opt-in via
    * GRAFT_CONFIG_FILE — written PLAINTEXT on every change, loaded at
    * startup; see README deployment notes). The reference's live "Say OK"
    * key validation is an online call — in this no-egress environment the
    * format check runs and the probe is skipped unless
    * GRAFT_GENERATE_MODE=http. */
  object ServerConfig {
    @volatile var apiKey: String = ""
    @volatile var model: String = graft.intent.SqlGenerator.DefaultModel
    // reference ALLOWED_MODELS set (sap_sql_engine.py:1570-1578)
    val allowedModels: Set[String] = Set(
      "claude-sonnet-4-5-20250929",
      "claude-sonnet-4-20250514",
      "claude-haiku-4-20250414")

    def keyPreview: String = if (apiKey.length > 6) "..." + apiKey.takeRight(6) else ""

    private def configFile: Option[java.nio.file.Path] =
      sys.env.get("GRAFT_CONFIG_FILE").map(java.nio.file.Paths.get(_))

    def persist(): Unit = configFile.foreach { p =>
      java.nio.file.Files.write(p,
        s"""{"anthropic_api_key":${q(apiKey)},"model":${q(model)}}"""
          .getBytes(StandardCharsets.UTF_8))
    }

    def load(): Unit = configFile.filter(java.nio.file.Files.exists(_)).foreach { p =>
      val body = new String(java.nio.file.Files.readAllBytes(p), StandardCharsets.UTF_8)
      extractField(body, "anthropic_api_key").foreach(apiKey = _)
      extractField(body, "model").filter(allowedModels).foreach(model = _)
    }
  }

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  /** Start the server; port 0 picks an ephemeral port. Returns the server
    * (query `getAddress.getPort`; call `stop(0)` to shut down).
    *
    * Binds LOOPBACK by default (the reference defaults HOST=127.0.0.1,
    * sap_sql_engine.py) — /api/execute runs arbitrary SQL in dev mode, so a
    * wildcard bind must be an explicit operator choice via the HOST env
    * var or the `host` parameter. */
  def start(spark: SparkSession, port: Int = 0,
      host: String = sys.env.getOrElse("HOST", "127.0.0.1")): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    ServerConfig.load()

    // ── browser UI (reference sap_sql_ui.html): single-file console served
    //    from the jar — ask flow, dev-mode SQL, results table/chart/CSV,
    //    catalog browser, KG explorer. Loaded once; "/" catches all paths
    //    not claimed by a more specific context, so non-root paths 404 ─────
    lazy val uiHtml: Array[Byte] = {
      val in = getClass.getResourceAsStream("/graft/ui/index.html")
      if (in == null) Array.emptyByteArray else try in.readAllBytes() finally in.close()
    }
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      if ((path == "/" || path == "/index.html") && uiHtml.nonEmpty) {
        ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
        ex.sendResponseHeaders(200, uiHtml.length)
        val os = ex.getResponseBody
        os.write(uiHtml); os.close()
      } else respond(ex, 404, """{"error":"not found"}""")
    })

    // the reference UI's 27 sidebar example questions (module-grouped)
    server.createContext("/api/examples", (ex: HttpExchange) => {
      val items = graft.intent.ExampleQuestions.all.map { case (m, question) =>
        s"""{"module":${q(m)},"question":${q(question)}}"""
      }
      respond(ex, 200, s"""{"examples":[${items.mkString(",")}]}""")
    })

    server.createContext("/api/execute", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        extractSql(body) match {
          case None => respond(ex, 400, """{"error":"missing sql field"}""")
          case Some(sql) =>
            try respond(ex, 200, Engine.execute(spark, sql).toJson)
            catch {
              case v: PiiGate.Violation =>
                // reference envelope decoration, sap_sql_engine.py:1592-1604
                respond(ex, 403,
                  s"""{"governance_block":true,"governance_type":"pii_violation","governance_message":${q(v.getMessage)}}""")
              case e: Exception =>
                respond(ex, 400, s"""{"error":${q(Option(e.getMessage).getOrElse(e.toString).take(500))}}""")
            }
        }
      } catch { case e: Exception => respond(ex, 500, s"""{"error":${q(e.toString)}}""") }
    })

    server.createContext("/api/catalog", (ex: HttpExchange) => {
      val tables = Catalog.Model.tables.map(t =>
        s"""{"name":${q(t.name)},"module":${q(t.module)},"pk":[${t.primaryKey.map(q).mkString(",")}],"n_columns":${t.columns.size}}""")
      respond(ex, 200, s"""{"tables":[${tables.mkString(",")}]}""")
    })

    server.createContext("/api/kg/path", (ex: HttpExchange) => {
      val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      (params.get("from"), params.get("to")) match {
        case (Some(f), Some(t)) =>
          val kg = KnowledgeGraph.default
          kg.findJoinPath(f.toUpperCase, t.toUpperCase) match {
            case Some(path) =>
              val chain = kg.joinChainSql(path).getOrElse("")
              respond(ex, 200,
                s"""{"path":[${path.map(q).mkString(",")}],"join_sql":${q(chain)}}""")
            case None => respond(ex, 404, """{"error":"no join path"}""")
          }
        case _ => respond(ex, 400, """{"error":"from and to required"}""")
      }
    })

    // ── KG explorer surface (reference sap_knowledge_graph.py:326-503) ────
    def queryParams(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap

    def kgNodeJson(n: KnowledgeGraph.default.Node): String =
      s"""{"id":${q(n.id)},"label":${q(n.label)},""" +
        s""""type":${q(n.nodeType.toString.stripSuffix("Node").toLowerCase)},""" +
        s""""module":${q(n.module)},"description":${q(n.description.take(100))}}"""
    def kgEdgeJson(e: KnowledgeGraph.default.Edge): String =
      s"""{"source":${q(e.from)},"target":${q(e.to)},"type":${q(e.edgeType)}}"""
    def statsJson: String = KnowledgeGraph.default.stats.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")

    server.createContext("/api/kg/graph", (ex: HttpExchange) => {
      val g = KnowledgeGraph.default.toD3
      respond(ex, 200,
        s"""{"nodes":[${g.nodes.map(kgNodeJson).mkString(",")}],""" +
          s""""links":[${g.links.map(kgEdgeJson).mkString(",")}],""" +
          s""""stats":$statsJson}""")
    })

    server.createContext("/api/kg/stats", (ex: HttpExchange) =>
      respond(ex, 200, statsJson))

    server.createContext("/api/kg/resolve", (ex: HttpExchange) => {
      val params = queryParams(ex)
      (params.get("term"), params.get("question")) match {
        case (Some(term), _) =>
          val tables = KnowledgeGraph.default.resolveTerm(term)
          respond(ex, 200,
            s"""{"term":${q(term)},"tables":[${tables.map(q).mkString(",")}]}""")
        case (None, Some(question)) =>
          val tables = KnowledgeGraph.default.resolveQuestion(question)
          respond(ex, 200,
            s"""{"question":${q(question)},"tables":[${tables.map(q).mkString(",")}]}""")
        case _ => respond(ex, 400, """{"error":"term or question required"}""")
      }
    })

    server.createContext("/api/kg/concept", (ex: HttpExchange) => {
      queryParams(ex).get("name") match {
        case None => respond(ex, 400, """{"error":"name required"}""")
        case Some(name) => KnowledgeGraph.default.conceptSchema(name) match {
          case None => respond(ex, 404, """{"error":"unknown concept"}""")
          case Some((bo, tables)) =>
            val ts = tables.map(t =>
              s"""{"table_name":${q(t.name)},"module":${q(t.module)},"description":${q(t.description)}}""")
            respond(ex, 200,
              s"""{"concept_name":${q(bo.name)},"module":${q(bo.module)},""" +
                s""""description":${q(bo.description)},"tables":[${ts.mkString(",")}]}""")
        }
      }
    })

    server.createContext("/api/kg/table", (ex: HttpExchange) => {
      queryParams(ex).get("name") match {
        case None => respond(ex, 400, """{"error":"name required"}""")
        case Some(name) => KnowledgeGraph.default.tableContext(name) match {
          case None => respond(ex, 404, """{"error":"unknown table"}""")
          case Some((t, concepts, partners)) =>
            val cs = concepts.map(bo =>
              s"""{"concept_name":${q(bo.name)},"description":${q(bo.description)}}""")
            respond(ex, 200,
              s"""{"table_name":${q(t.name)},"module":${q(t.module)},""" +
                s""""description":${q(t.description)},""" +
                s""""concepts":[${cs.mkString(",")}],""" +
                s""""join_partners":[${partners.map(q).mkString(",")}]}""")
        }
      }
    })

    server.createContext("/api/kg/module", (ex: HttpExchange) => {
      queryParams(ex).get("code") match {
        case None => respond(ex, 400, """{"error":"code required"}""")
        case Some(code) =>
          val g = KnowledgeGraph.default.moduleGraph(code.toUpperCase)
          if (g.nodes.isEmpty) respond(ex, 404, """{"error":"unknown module"}""")
          else respond(ex, 200,
            s"""{"module":${q(code.toUpperCase)},""" +
              s""""nodes":[${g.nodes.map(kgNodeJson).mkString(",")}],""" +
              s""""links":[${g.links.map(kgEdgeJson).mkString(",")}]}""")
      }
    })

    // ── intent classification (reference classify_intent envelope) ────────
    server.createContext("/api/classify", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        extractField(body, "question") match {
          case None => respond(ex, 400, """{"error":"missing question field"}""")
          case Some(question) =>
            val history = extractStringArray(body, "history")
            val c = graft.intent.HeuristicClassifier.classify(question, history)
            val slots = c.slots.toSeq.sortBy(_._1).map { case (k, v) =>
              s"""${q(k)}:{"value":${q(v.value)},"status":${q(v.status)}}"""
            }
            val sugg = c.suggestions.map(s =>
              s"""{"prompt":${q(s.prompt)},"module":${q(s.module)},"match_quality":${q(s.matchQuality)}}""")
            val sqs = c.slotQuestions.map(sq =>
              s"""{"slot":${q(sq.slot)},"question":${q(sq.question)},"options":[${sq.options.map(q).mkString(",")}]}""")
            respond(ex, 200,
              s"""{"confidence":${q(c.confidence)},""" +
                s""""modules":[${c.modules.map(q).mkString(",")}],""" +
                s""""slots":{${slots.mkString(",")}},""" +
                s""""interpretation":${q(c.interpretation)},""" +
                s""""disambiguation_needed":${c.disambiguationNeeded},""" +
                s""""suggestions":[${sugg.mkString(",")}],""" +
                s""""slot_questions":[${sqs.mkString(",")}],""" +
                s""""message":${q(graft.intent.IntentRenderer.render(c))}}""")
        }
      } catch { case e: Exception => respond(ex, 500, s"""{"error":${q(e.toString)}}""") }
    })

    // ── server settings (reference /api/status sap_sql_engine.py:1376-1385;
    //    /api/save-key /api/remove-key /api/save-model :1529-1584): key and
    //    model state lives in ServerConfig, loaded at startup, persisted
    //    opt-in via GRAFT_CONFIG_FILE, and consumed by /api/generate below ──
    server.createContext("/api/status", (ex: HttpExchange) =>
      respond(ex, 200,
        s"""{"has_api":${ServerConfig.apiKey.nonEmpty},""" +
          s""""model":${q(ServerConfig.model)},""" +
          s""""key_preview":${q(ServerConfig.keyPreview)},""" +
          s""""has_test_db":${spark.catalog.tableExists("documents")},""" +
          s""""has_knowledge_graph":true}"""))

    server.createContext("/api/save-key", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val key = extractField(body, "key").getOrElse("").trim
        if (!key.startsWith("sk-ant-"))
          respond(ex, 200,
            """{"status":"error","error":"Invalid key format. Should start with sk-ant-"}""")
        else {
          // the reference fires a live "Say OK" probe; only possible when
          // the HTTP transport is configured (no egress otherwise)
          val probeFailure: Option[String] =
            if (!sys.env.get("GRAFT_GENERATE_MODE").contains("http")) None
            else try {
              val probe = new graft.intent.HttpGenerationClient(key)
              probe.complete(graft.intent.GenRequest(ServerConfig.model, 10,
                "", Seq(graft.intent.ChatMessage("user", "Say OK"))))
              None
            } catch {
              case e: graft.intent.ApiStatusError if e.status == 401 || e.status == 403 =>
                Some("API key validation failed. Check that the key is correct and has credits.")
              case _: Exception => None // transient/offline: accept, as the reference does
            }
          probeFailure match {
            case Some(err) => respond(ex, 200, s"""{"status":"error","error":${q(err)}}""")
            case None =>
              ServerConfig.apiKey = key
              ServerConfig.persist()
              respond(ex, 200,
                s"""{"status":"ok","key_preview":${q(ServerConfig.keyPreview)}}""")
          }
        }
      } catch { case e: Exception => respond(ex, 500, s"""{"status":"error","error":${q(e.toString)}}""") }
    })

    server.createContext("/api/remove-key", (ex: HttpExchange) => {
      ServerConfig.apiKey = ""
      ServerConfig.persist()
      respond(ex, 200, """{"status":"ok"}""")
    })

    server.createContext("/api/save-model", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val model = extractField(body, "model").getOrElse("").trim
        if (!ServerConfig.allowedModels.contains(model))
          respond(ex, 200, s"""{"status":"error","error":${q(s"Unknown model: $model")}}""")
        else {
          ServerConfig.model = model
          ServerConfig.persist()
          respond(ex, 200, s"""{"status":"ok","model":${q(model)}}""")
        }
      } catch { case e: Exception => respond(ex, 500, s"""{"status":"error","error":${q(e.toString)}}""") }
    })

    // ── SQL generation (reference /api/generate, sap_sql_engine.py:
    //    1480-1527): module-filtered RAG prompt → history-capped,
    //    cache-marked, retried generation call. Transport comes from
    //    configuration (offline stub by default in this environment);
    //    a key saved via /api/save-key selects the HTTP transport when
    //    GRAFT_GENERATE_MODE=http, and the saved model is used ─────────────
    server.createContext("/api/generate", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        extractField(body, "question") match {
          case None => respond(ex, 400, """{"status":"error","error":"missing question field"}""")
          case Some(question) =>
            import graft.intent.{ChatMessage, SqlGenerator}
            import graft.pipeline.{ModuleDetector, PromptRenderer}
            // classification-provided modules win; else keyword detection
            // (the reference's RAG fallback)
            val provided = extractStringArray(body, "modules")
            val detected = if (provided.nonEmpty) provided
              else ModuleDetector.detect(question)
            val prompt = PromptRenderer.render(Catalog.Model, detected)
            val history = extractObjectArray(body, "history").flatMap { obj =>
              for {
                role <- extractField(obj, "role")
                content <- extractField(obj, "content")
              } yield ChatMessage(role, content)
            }
            // a key saved at runtime wins over env config (reference:
            // get_api_key reads config first); stub otherwise
            val client =
              if (ServerConfig.apiKey.nonEmpty &&
                  sys.env.get("GRAFT_GENERATE_MODE").contains("http"))
                new graft.intent.HttpGenerationClient(ServerConfig.apiKey)
              else SqlGenerator.defaultClient()
            try {
              val r = SqlGenerator.generate(question, prompt, client, history,
                model = ServerConfig.model)
              val passthrough =
                extractField(body, "confidence").map(c =>
                  s""","confidence":${q(c)},"matched_pattern":${"\"matched_pattern\"\\s*:\\s*true".r.findFirstIn(body).isDefined}""")
                  .getOrElse("")
              respond(ex, 200,
                s"""{"status":"ok","result":${q(r.text)},""" +
                  s""""usage":{"input_tokens":${r.usage.inputTokens},""" +
                  s""""output_tokens":${r.usage.outputTokens},""" +
                  s""""cache_creation_input_tokens":${r.usage.cacheCreationInputTokens},""" +
                  s""""cache_read_input_tokens":${r.usage.cacheReadInputTokens}},""" +
                  s""""mode":${q(client.mode)},""" +
                  s""""modules_used":[${detected.map(q).mkString(",")}],""" +
                  s""""prompt_chars":${prompt.length}$passthrough}""")
            } catch {
              case e: Exception =>
                respond(ex, 200,
                  s"""{"status":"error","error":${q(Option(e.getMessage).getOrElse(e.toString).take(500))}}""")
            }
        }
      } catch { case e: Exception => respond(ex, 500, s"""{"status":"error","error":${q(e.toString)}}""") }
    })

    // ── end-to-end NL ask: classify → validated-template route → execute
    //    (the reference UI's question flow in one call; unmatched questions
    //    return the disambiguation message instead of results) ─────────────
    server.createContext("/api/ask", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        extractField(body, "question") match {
          case None => respond(ex, 400, """{"error":"missing question field"}""")
          case Some(question) =>
            try {
              val ans = graft.intent.AnswerPipeline.answer(spark, question,
                history = extractStringArray(body, "history"))
              val result = ans.envelope.map(e => s""","result":${e.toJson}""").getOrElse("")
              val tmpl = ans.templateName.map(t => s""","template":${q(t)}""").getOrElse("")
              respond(ex, 200,
                s"""{"answered":${ans.envelope.isDefined},""" +
                  s""""confidence":${q(ans.classification.confidence)},""" +
                  s""""message":${q(ans.message)}$tmpl$result}""")
            } catch {
              case v: PiiGate.Violation =>
                respond(ex, 403,
                  s"""{"governance_block":true,"governance_type":"pii_violation","governance_message":${q(v.getMessage)}}""")
            }
        }
      } catch { case e: Exception => respond(ex, 500, s"""{"error":${q(e.toString)}}""") }
    })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    server
  }
}

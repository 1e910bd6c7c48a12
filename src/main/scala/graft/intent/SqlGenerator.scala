package graft.intent

/** LLM SQL-generation client (SURVEY §3.1; reference
  * `generate_sql_with_api`, sap_sql_engine.py:837-898, and the
  * `/api/generate` route, sap_sql_engine.py:1480-1527).
  *
  * The reference contract, reproduced here deterministically around an
  * exchangeable transport:
  *  - conversation history capped at 10 turns (20 messages), newest kept;
  *  - retry ×3 with exponential backoff (1 s, 2 s, 4 s) on transient API
  *    statuses (500, 502, 503, 529);
  *  - the system prompt is sent as a single system block marked with
  *    ephemeral cache control (identical on every call → prompt-cache hit);
  *  - the result carries the generated text plus token usage, including
  *    cache-creation/cache-read counts when the transport reports them.
  *
  * The TRANSPORT is exchangeable: [[OfflineStubClient]] is the default in
  * this no-egress environment (deterministic: routes through the validated
  * BOKG template pool), and [[HttpGenerationClient]] implements the public
  * Anthropic Messages REST shape, activated purely by configuration
  * (`GRAFT_GENERATE_MODE=http` + an API key) — the gap is config, not code.
  */
final case class ChatMessage(role: String, content: String)

final case class GenUsage(
    inputTokens: Long,
    outputTokens: Long,
    cacheCreationInputTokens: Long = 0L,
    cacheReadInputTokens: Long = 0L)

final case class GenResult(text: String, usage: GenUsage)

/** A generation request: system prompt (cache-marked) + chat messages. */
final case class GenRequest(
    model: String,
    maxTokens: Int,
    systemPrompt: String,
    messages: Seq[ChatMessage]) {

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
    case ch => ch.toString
  } + "\""

  /** Public Anthropic Messages API request body — the system block carries
    * ephemeral cache_control exactly as the reference sends it. */
  def toJson: String = {
    val msgs = messages.map(m =>
      s"""{"role":${q(m.role)},"content":${q(m.content)}}""").mkString(",")
    s"""{"model":${q(model)},"max_tokens":$maxTokens,""" +
      s""""system":[{"type":"text","text":${q(systemPrompt)},""" +
      s""""cache_control":{"type":"ephemeral"}}],""" +
      s""""messages":[$msgs]}"""
  }
}

/** Transport error carrying the HTTP status (drives the retry policy). */
final class ApiStatusError(val status: Int, msg: String)
  extends RuntimeException(s"API status $status: $msg")

trait GenerationClient {
  def complete(req: GenRequest): GenResult
  /** Reported in the /api/generate envelope ("api" | "stub"). */
  def mode: String
}

/** Deterministic offline transport: routes the newest user message through
  * the validated BOKG template pool ([[AnswerPipeline.bestPattern]]) and
  * returns that template's SQL — the offline analog of "generate SQL for
  * this question". Unmatched questions get an explanatory refusal rather
  * than hallucinated SQL. Usage counts are length/4 estimates (the
  * standard chars-per-token heuristic), cache counters zero. */
object OfflineStubClient extends GenerationClient {
  val mode = "stub"

  def complete(req: GenRequest): GenResult = {
    val question = req.messages.reverse.find(_.role == "user")
      .map(_.content).getOrElse("")
    val text = AnswerPipeline.bestPattern(question) match {
      case Some(name) =>
        val sql = graft.queries.SapTemplates.templates(name)
        s"-- validated pattern: $name\n$sql"
      case None =>
        "-- offline stub: no validated BOKG pattern matches this question;\n" +
          "-- configure GRAFT_GENERATE_MODE=http with an API key for novel SQL."
    }
    val inChars = req.systemPrompt.length.toLong +
      req.messages.map(_.content.length.toLong).sum
    GenResult(text, GenUsage(inChars / 4, text.length.toLong / 4))
  }
}

/** HTTP transport for the public Anthropic Messages API (the reference's
  * `anthropic` SDK call, expressed over JDK HttpClient — no added
  * dependencies). Non-2xx responses raise [[ApiStatusError]] so the shared
  * retry policy in [[SqlGenerator.generate]] applies. Never constructed
  * unless configuration selects it.
  *
  * One [[java.net.http.HttpClient]] per transport instance (connection
  * reuse across the retry loop), with connect and per-request timeouts so a
  * hung endpoint cannot block the retry loop forever (the reference SDK has
  * a default timeout too). `post` is overridable so tests can fake the
  * transport without a network. */
class HttpGenerationClient(
    apiKey: String,
    endpoint: String = "https://api.anthropic.com/v1/messages",
    apiVersion: String = "2023-06-01",
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 120000L) extends GenerationClient {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}
  val mode = "api"

  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
    .build()

  /** Performs the POST; returns (status, body). Overridden in tests. */
  protected def post(json: String): (Int, String) = {
    val request = HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
      .header("content-type", "application/json")
      .header("x-api-key", apiKey)
      .header("anthropic-version", apiVersion)
      .POST(HttpRequest.BodyPublishers.ofString(json))
      .build()
    val resp = http.send(request, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  def complete(req: GenRequest): GenResult = {
    val (status, body) = post(req.toJson)
    if (status / 100 != 2) throw new ApiStatusError(status, body.take(500))
    HttpGenerationClient.parseResponse(body)
  }
}

object HttpGenerationClient {
  import graft.server.ApiServer.{extractField, extractTopObject, extractTopObjectArray}

  /** Structural Messages-API response parse: the reply is the concatenation
    * of the TOP-LEVEL content array's text blocks (a multi-block response —
    * e.g. thinking + text — is read correctly), and usage counts come only
    * from the TOP-LEVEL usage object. Generated SQL containing '"text":' or
    * '"input_tokens": 5' can no longer be mis-read, because both anchors are
    * depth-1 keys located by a string-aware scan. */
  def parseResponse(body: String): GenResult = {
    val text = extractTopObjectArray(body, "content")
      .filter(b => extractField(b, "type").contains("text"))
      .flatMap(b => extractField(b, "text")).mkString
    val usage = extractTopObject(body, "usage").getOrElse("")
    def n(key: String): Long =
      ("\"" + key + """"\s*:\s*(\d+)""").r.findFirstMatchIn(usage)
        .map(_.group(1).toLong).getOrElse(0L)
    GenResult(text, GenUsage(n("input_tokens"), n("output_tokens"),
      n("cache_creation_input_tokens"), n("cache_read_input_tokens")))
  }
}

object SqlGenerator {

  /** Reference constants (sap_sql_engine.py:33-34). */
  val DefaultModel = "claude-sonnet-4-5-20250929"
  val MaxTokens = 4096
  val MaxHistoryTurns = 10
  val MaxRetries = 3

  private val transientStatuses = Set(500, 502, 503, 529)

  /** Transport selected by configuration: `GRAFT_GENERATE_MODE=http` plus
    * `GRAFT_API_KEY`/`ANTHROPIC_API_KEY` → live HTTP; anything else → the
    * deterministic offline stub. */
  def defaultClient(env: Map[String, String] = sys.env): GenerationClient =
    if (env.get("GRAFT_GENERATE_MODE").contains("http"))
      env.get("GRAFT_API_KEY").orElse(env.get("ANTHROPIC_API_KEY")) match {
        case Some(key) if key.nonEmpty => new HttpGenerationClient(key)
        case _ => OfflineStubClient
      }
    else OfflineStubClient

  /** Generate SQL for a question: history-capped messages, cache-marked
    * system prompt, retry ×3 with exponential backoff on transient API
    * statuses — the reference loop verbatim. `sleepMs` is injectable so
    * the backoff schedule is testable without waiting. */
  def generate(
      question: String,
      systemPrompt: String,
      client: GenerationClient,
      history: Seq[ChatMessage] = Nil,
      model: String = DefaultModel,
      sleepMs: Long => Unit = Thread.sleep): GenResult = {
    val capped =
      if (history.length > MaxHistoryTurns * 2) history.takeRight(MaxHistoryTurns * 2)
      else history
    val req = GenRequest(model, MaxTokens, systemPrompt,
      capped :+ ChatMessage("user", question))
    var attempt = 0
    var out: Option[GenResult] = None
    while (out.isEmpty) {
      try out = Some(client.complete(req))
      catch {
        case e: ApiStatusError
            if transientStatuses.contains(e.status) && attempt < MaxRetries - 1 =>
          sleepMs(1000L << attempt) // 1 s, 2 s, 4 s
          attempt += 1
      }
    }
    out.get
  }
}

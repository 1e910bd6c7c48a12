package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.intent.{ApiStatusError, ChatMessage, GenRequest, GenResult,
  GenUsage, GenerationClient, HttpGenerationClient, OfflineStubClient,
  SqlGenerator}

/** The LLM generation client contract (reference generate_sql_with_api,
  * sap_sql_engine.py:837-898): retry/backoff policy, history cap, cache
  * marking, and the offline-stub transport — all deterministic, no network. */
class SqlGeneratorSpec extends AnyFunSuite {

  private class FlakyClient(failures: Int, status: Int = 529)
    extends GenerationClient {
    val mode = "fake"
    var calls = 0
    var lastRequest: Option[GenRequest] = None
    def complete(req: GenRequest): GenResult = {
      calls += 1
      lastRequest = Some(req)
      if (calls <= failures) throw new ApiStatusError(status, "overloaded")
      GenResult("SELECT 1", GenUsage(10, 2))
    }
  }

  test("transient statuses retry x3 with exponential backoff (1s, 2s, 4s)") {
    val sleeps = Seq.newBuilder[Long]
    val c = new FlakyClient(failures = 2)
    val r = SqlGenerator.generate("q", "sys", c, sleepMs = sleeps += _)
    assert(r.text == "SELECT 1")
    assert(c.calls == 3)
    assert(sleeps.result() == Seq(1000L, 2000L))
  }

  test("a persistent transient error surfaces after the third attempt") {
    val c = new FlakyClient(failures = 99)
    val e = intercept[ApiStatusError] {
      SqlGenerator.generate("q", "sys", c, sleepMs = _ => ())
    }
    assert(e.status == 529)
    assert(c.calls == 3, "must stop after MaxRetries attempts")
  }

  test("non-transient statuses do not retry") {
    val c = new FlakyClient(failures = 99, status = 401)
    intercept[ApiStatusError] {
      SqlGenerator.generate("q", "sys", c, sleepMs = _ => ())
    }
    assert(c.calls == 1)
  }

  test("conversation history is capped at 10 turns, newest kept") {
    val c = new FlakyClient(failures = 0)
    val history = (1 to 30).map(i => ChatMessage(
      if (i % 2 == 1) "user" else "assistant", s"turn $i"))
    SqlGenerator.generate("now", "sys", c, history, sleepMs = _ => ())
    val msgs = c.lastRequest.get.messages
    assert(msgs.length == 21, "20 capped history messages + the question")
    assert(msgs.head.content == "turn 11", "cap must keep the NEWEST turns")
    assert(msgs.last == ChatMessage("user", "now"))
  }

  test("request JSON marks the system block with ephemeral cache control") {
    val json = GenRequest("m", 4096, "you are \"graft\"",
      Seq(ChatMessage("user", "hi"))).toJson
    assert(json.contains(""""cache_control":{"type":"ephemeral"}"""))
    assert(json.contains(""""text":"you are \"graft\""""))
    assert(json.contains(""""max_tokens":4096"""))
  }

  test("offline stub routes template-matched questions to validated SQL") {
    val r = SqlGenerator.generate(
      "Show customer open items with aging buckets", "sys", OfflineStubClient)
    assert(r.text.contains("-- validated pattern:"))
    assert(r.text.toUpperCase.contains("SELECT"))
    assert(r.usage.inputTokens > 0)
  }

  test("offline stub refuses rather than hallucinates on unmatched input") {
    val r = SqlGenerator.generate("qqq zzz", "sys", OfflineStubClient)
    assert(r.text.contains("no validated BOKG pattern"))
    assert(!r.text.toUpperCase.contains("SELECT "))
  }

  // ── HttpGenerationClient hardening (round-7 verdict task 3): structural
  //    response parse + fake-transport/timeout paths, no network ───────────

  /** Fake transport: overrides `post`, records request bodies. */
  private class FakeHttp(reply: => (Int, String))
    extends HttpGenerationClient("sk-ant-test") {
    var sent = Seq.empty[String]
    override protected def post(json: String): (Int, String) = {
      sent :+= json
      reply
    }
  }

  test("multi-block Messages responses concatenate only the text blocks") {
    val body =
      """{"id":"msg_1","type":"message","role":"assistant","content":[
        |{"type":"thinking","thinking":"the plan, with \"text\": inside"},
        |{"type":"text","text":"SELECT 1"},
        |{"type":"text","text":" -- done"}],
        |"stop_reason":"end_turn",
        |"usage":{"input_tokens":42,"output_tokens":7,
        |"cache_creation_input_tokens":3,"cache_read_input_tokens":39}}""".stripMargin
    val r = HttpGenerationClient.parseResponse(body)
    assert(r.text == "SELECT 1 -- done",
      "thinking blocks must be excluded, text blocks concatenated in order")
    assert(r.usage == GenUsage(42, 7, 3, 39))
  }

  test("key-shaped text inside the generated SQL cannot corrupt the parse") {
    // generated SQL contains '"text":' and '"input_tokens": 5' and ']' —
    // the old whole-body regexes would have matched these
    val sql = """SELECT '{"text":"fake","input_tokens": 5}' AS j, arr[1] FROM t"""
    val q = sql.replace("\"", "\\\"")
    val body =
      s"""{"content":[{"type":"text","text":"$q"}],""" +
        s""""usage":{"input_tokens":100,"output_tokens":50}}"""
    val r = HttpGenerationClient.parseResponse(body)
    assert(r.text == sql)
    assert(r.usage.inputTokens == 100 && r.usage.outputTokens == 50)
  }

  test("fake transport: complete() round-trips and non-2xx raises ApiStatusError") {
    val ok = new FakeHttp((200,
      """{"content":[{"type":"text","text":"SELECT 2"}],"usage":{"input_tokens":1,"output_tokens":1}}"""))
    val r = ok.complete(GenRequest("m", 10, "sys", Seq(ChatMessage("user", "q"))))
    assert(r.text == "SELECT 2")
    assert(ok.sent.head.contains(""""cache_control":{"type":"ephemeral"}"""))

    val overloaded = new FakeHttp((529, """{"error":"overloaded"}"""))
    val e = intercept[ApiStatusError] {
      overloaded.complete(GenRequest("m", 10, "sys", Seq(ChatMessage("user", "q"))))
    }
    assert(e.status == 529)
  }

  test("a transport timeout propagates immediately (no endless retry loop)") {
    val hung = new HttpGenerationClient("sk-ant-test") {
      var calls = 0
      override protected def post(json: String): (Int, String) = {
        calls += 1
        throw new java.net.http.HttpTimeoutException("request timed out")
      }
    }
    intercept[java.net.http.HttpTimeoutException] {
      SqlGenerator.generate("q", "sys", hung, sleepMs = _ => ())
    }
    assert(hung.calls == 1, "timeouts are not ApiStatusError — no retry storm")
  }

  test("defaultClient is the offline stub unless http mode + key configured") {
    assert(SqlGenerator.defaultClient(Map.empty).mode == "stub")
    assert(SqlGenerator.defaultClient(
      Map("GRAFT_GENERATE_MODE" -> "http")).mode == "stub")
    assert(SqlGenerator.defaultClient(
      Map("GRAFT_GENERATE_MODE" -> "http", "GRAFT_API_KEY" -> "k")).mode == "api")
  }
}

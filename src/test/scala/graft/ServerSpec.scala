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

  test("sql body parser handles escapes") {
    assert(ApiServer.extractSql("""{"sql": "SELECT \"a\"\nFROM t"}""")
      .contains("SELECT \"a\"\nFROM t"))
    assert(ApiServer.extractSql("""{}""").isEmpty)
  }
}

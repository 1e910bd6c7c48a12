package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden test for the browser console's chart-type analysis
  * (`analyzeDataForChart` in src/main/resources/graft/ui/index.html).
  *
  * The function is pure JS between CHART-ANALYSIS-BEGIN/END markers; this
  * spec extracts it and runs it under `node` against a fixture battery whose
  * expected outputs were produced by the REFERENCE console's own
  * analyzeDataForChart (sap_sql_ui.html:2708-2800) — so a drift from the
  * reference's auto-selection rules (label preference, type thresholds,
  * suggested-type decision table) fails here without a browser.
  */
class UiChartSpec extends AnyFunSuite {

  // (name, columns JSON, rows JSON, expected {label,values,types,def} JSON —
  // reference-produced goldens; "null" = not chartable)
  private val fixtures: Seq[(String, String, String, String)] = Seq(
    ("time labels pick line first",
      """["month","revenue"]""",
      """[["2024-01",10],["2024-02",12],["2024-03",9]]""",
      """{"label":0,"values":[1],"types":["line","bar","pie"],"def":"line"}"""),
    ("few categories single value offer pie/doughnut",
      """["region","total"]""",
      """[["EU",5],["US",7],["APAC",3],["LATAM",2]]""",
      """{"label":0,"values":[1],"types":["bar","pie","doughnut"],"def":"bar"}"""),
    ("many categories stay bar/line",
      """["customer","total"]""",
      (0 until 20).map(i => s"""["cust$i",${i * 10}]""").mkString("[", ",", "]"),
      """{"label":0,"values":[1],"types":["bar","line"],"def":"bar"}"""),
    ("multiple value columns force bar/line",
      """["region","credit","debit"]""",
      """[["EU",5,2],["US",7,3],["APAC",3,1]]""",
      """{"label":0,"values":[1,2],"types":["bar","line"],"def":"bar"}"""),
    ("mid-cardinality keeps the full menu",
      """["name","v"]""",
      (0 until 12).map(i => s"""["n$i",$i]""").mkString("[", ",", "]"),
      """{"label":0,"values":[1],"types":["bar","line","pie"],"def":"bar"}"""),
    ("no numeric column is not chartable",
      """["name","desc"]""", """[["a","x"],["b","y"]]""", "null"),
    ("numeric-only data charts by row index",
      """["x","y"]""", """[[1,2],[3,4],[5,6]]""",
      """{"label":null,"values":[0,1],"types":["bar","line"],"def":"bar"}"""),
    ("quarter labels are dates, default line",
      """["q","amt"]""",
      """[["Q1 2024",4],["Q2 2024",6],["Q3 2024",5]]""",
      """{"label":0,"values":[1],"types":["line","bar","pie"],"def":"line"}"""),
    ("numeric year column is a value, not a label",
      """["year","amt"]""", """[[2020,1],[2021,2],[2022,3]]""",
      """{"label":null,"values":[0,1],"types":["bar","line"],"def":"bar"}"""),
    ("month names are dates",
      """["m","v"]""", """[["Jan",1],["Feb",2],["Mar",3]]""",
      """{"label":0,"values":[1],"types":["line","bar","pie"],"def":"line"}"""),
    ("time-NAMED string column wins the axis",
      """["period","v"]""", """[["p-one",1],["p-two",2]]""",
      """{"label":0,"values":[1],"types":["line","bar","pie"],"def":"line"}"""))

  private lazy val analysisJs: String = {
    val in = getClass.getResourceAsStream("/graft/ui/index.html")
    val html = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val b = html.indexOf("// CHART-ANALYSIS-BEGIN")
    val e = html.indexOf("// CHART-ANALYSIS-END")
    assert(b >= 0 && e > b, "chart-analysis markers missing from index.html")
    html.substring(b, e)
  }

  private def nodeAvailable: Boolean =
    try {
      new ProcessBuilder("node", "--version").start().waitFor() == 0
    } catch { case _: Exception => false }

  test("chart auto-selection matches the reference's rules (node golden)") {
    assume(nodeAvailable, "node not on PATH — golden run skipped")
    val cases = fixtures.map { case (_, cols, rows, _) =>
      s"""{"cols":$cols,"rows":$rows}"""
    }.mkString("[", ",", "]")
    val script =
      s"""$analysisJs
        |const out = $cases.map(c => {
        |  const r = analyzeDataForChart(c.cols, c.rows);
        |  return r === null ? null : {label: r.labelCol ? r.labelCol.index : null,
        |    values: r.valueCols.map(v => v.index),
        |    types: r.suggestedTypes, def: r.defaultType};
        |});
        |console.log(JSON.stringify(out));
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("chart-golden", ".js")
    java.nio.file.Files.writeString(f, script)
    val p = new ProcessBuilder("node", f.toString).redirectErrorStream(true).start()
    val outRaw = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim
    assert(p.waitFor() == 0, s"node failed: $outRaw")
    java.nio.file.Files.delete(f)
    // compare per-fixture (strip whitespace from expected literals)
    val got = outRaw.stripPrefix("[").stripSuffix("]")
    val gotParts = splitTop(got)
    assert(gotParts.size == fixtures.size, s"fixture count mismatch: $outRaw")
    fixtures.zip(gotParts).foreach { case ((name, _, _, want), actual) =>
      assert(actual == want.replaceAll("\\s", ""), s"'$name' diverged")
    }
  }

  test("SVG renderers produce the expected mark structure (node + DOM shim)") {
    assume(nodeAvailable, "node not on PATH — render smoke skipped")
    val in = getClass.getResourceAsStream("/graft/ui/render_smoke.js")
    assert(in != null, "render_smoke.js test resource missing")
    val js = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val f = java.nio.file.Files.createTempFile("render-smoke", ".js")
    java.nio.file.Files.writeString(f, js)
    val p = new ProcessBuilder("node", f.toString).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"render smoke failed:\n$out")
    java.nio.file.Files.delete(f)
    assert(out.linesIterator.count(_.startsWith("OK")) >= 10, out)
  }

  /** Split a JSON array body at top-level commas (fixtures are flat). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var inStr = false
    s.zipWithIndex.foreach { case (c, i) =>
      if (inStr) { if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
    }
    out += s.substring(start).trim
    out.result()
  }
}

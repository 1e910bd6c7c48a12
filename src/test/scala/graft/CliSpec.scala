package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.data.SapFixtures
import graft.intent.AnswerPipeline

/** CLI REPL loop + the NL answer pipeline (question → classification →
  * validated-template routing → envelope). */
class CliSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val fixtures = SapFixtures.register(spark)

  test("answer pipeline routes a sidebar question to a validated template") {
    fixtures
    val ans = AnswerPipeline.answer(spark, "Show customer open items with aging buckets")
    assert(ans.templateName.contains("tcode_fbl5n_customer_open_items") ||
      ans.templateName.exists(_.startsWith("tcode_fbl5n")), ans.templateName)
    assert(ans.envelope.exists(_.rowCount > 0))
  }

  test("answer pipeline executes raw SQL directly") {
    fixtures
    val ans = AnswerPipeline.answer(spark, "SELECT TOP 2 LIFNR FROM LFA1 ORDER BY LIFNR")
    assert(ans.templateName.isEmpty && ans.envelope.exists(_.rowCount == 2))
  }

  test("answer pipeline falls back to disambiguation for vague questions") {
    val ans = AnswerPipeline.answer(spark, "show me data")
    assert(ans.envelope.isEmpty && ans.message.contains("rephrase"))
  }

  test("every sidebar example resolves to a template or a rendered message") {
    fixtures
    for ((_, q) <- graft.intent.ExampleQuestions.all) {
      val ans = AnswerPipeline.answer(spark, q)
      assert(ans.message.nonEmpty, q)
      if (ans.templateName.isDefined) assert(ans.envelope.isDefined, q)
    }
  }

  test("cli: examples listing, numbered selection, export, key, help") {
    fixtures
    val s0 = Cli.State()
    val (_, listing) = Cli.handleLine(spark, s0, "examples")
    assert(listing.linesIterator.size == 27 && listing.contains("[FI_AP]"))

    val (s1, out1) = Cli.handleLine(spark, s0, "3") // top 10 vendors
    assert(out1.nonEmpty)

    val (s2, out2) = Cli.handleLine(spark, s1,
      "SELECT TOP 3 LIFNR, NAME1 FROM LFA1 ORDER BY LIFNR")
    assert(out2.contains("LIFNR") && s2.last.exists(_.rowCount == 3))

    val tmp = java.nio.file.Files.createTempFile("graft-cli", ".csv").toString
    val (_, out3) = Cli.handleLine(spark, s2, s"export $tmp")
    assert(out3.contains("wrote 3 rows"))
    val lines = scala.io.Source.fromFile(tmp).getLines().toSeq
    assert(lines.head == "LIFNR,NAME1" && lines.size == 4)

    val (_, out4) = Cli.handleLine(spark, s2, "key")
    assert(out4.contains("deterministic"))
    val (_, out5) = Cli.handleLine(spark, s2, "help")
    assert(out5.contains("examples"))
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.data.SapFixtures
import graft.queries.SapTemplates
import graft.sql.HanaDialect

/** Dialect front-end property fuzz (round-8 judge task 6): every reference
  * template, run through `HanaDialect.sql` under randomized
  * comment/whitespace/keyword-case/multi-statement/TOP/FETCH mutations,
  * must produce the SAME analyzed plan as the clean template — the exact
  * input class the LLM generation path emits (models interleave comments,
  * casing, and vendor LIMIT spellings freely). Plan equality (canonicalized
  * analyzed plan) rather than result equality: it is sensitive to any
  * semantic drift yet costs one analysis pass, not an execution, per
  * sample. Generators run from fixed seeds, so failures reproduce.
  */
class DialectFuzzSpec extends AnyFunSuite {
  import SharedSpark._

  lazy val fixtures = SapFixtures.register(spark)

  // ── literal-aware string surgery ─────────────────────────────────────────

  /** Indices of characters OUTSIDE single-quoted literals. */
  private def outsideLiterals(sql: String): Vector[Int] = {
    var inStr = false
    val b = Vector.newBuilder[Int]
    for (i <- sql.indices) {
      if (sql.charAt(i) == '\'') { inStr = !inStr; b += -1 }
      else if (!inStr) b += i
    }
    b.result().filter(_ >= 0)
  }

  private val keywords = Set("select", "from", "where", "group", "by",
    "order", "having", "join", "left", "right", "inner", "outer", "on",
    "and", "or", "not", "in", "exists", "between", "like", "case", "when",
    "then", "else", "end", "union", "all", "distinct", "with", "as", "is",
    "null", "asc", "desc", "limit")

  /** Flip the case of whole keyword tokens (never identifiers/aliases —
    * alias case changes the output schema). */
  private def mutCase(sql: String, rnd: scala.util.Random): String = {
    val out = sql.toCharArray
    val safe = outsideLiterals(sql).toSet
    for (m <- raw"[A-Za-z_]+".r.findAllMatchIn(sql)) {
      val word = m.matched.toLowerCase
      if (keywords(word) && m.start.until(m.end).forall(safe) && rnd.nextBoolean()) {
        val repl =
          if (rnd.nextBoolean()) word.toUpperCase
          else word.map(c => if (rnd.nextBoolean()) c.toUpper else c.toLower)
        for (k <- 0 until m.matched.length) out(m.start + k) = repl(k)
      }
    }
    new String(out)
  }

  /** Stretch spaces outside literals into random whitespace runs. */
  private def mutWhitespace(sql: String, rnd: scala.util.Random): String = {
    val safe = outsideLiterals(sql).toSet
    val sb = new StringBuilder
    for (i <- sql.indices) {
      val c = sql.charAt(i)
      if (c == ' ' && safe(i) && rnd.nextInt(3) == 0)
        sb.append(Seq("  ", "\n", "\t ", " \n  ")(rnd.nextInt(4)))
      else sb.append(c)
    }
    sb.toString
  }

  /** Sprinkle line and block comments at whitespace outside literals. */
  private def mutComments(sql: String, rnd: scala.util.Random): String = {
    val safe = outsideLiterals(sql).toSet
    val sb = new StringBuilder
    for (i <- sql.indices) {
      val c = sql.charAt(i)
      if (c == '\n' && safe(i) && rnd.nextInt(4) == 0)
        sb.append(" -- fuzz ").append(rnd.nextInt(100)).append('\n')
      else if (c == ' ' && safe(i) && rnd.nextInt(8) == 0)
        sb.append(" /* fz").append(rnd.nextInt(100)).append(" */ ")
      else sb.append(c)
    }
    sb.toString
  }

  /** Wrap in a multi-statement script — the front end must keep only the
    * last SELECT/WITH. */
  private def mutMultiStatement(sql: String, rnd: scala.util.Random): String = {
    val noise = Seq("DROP TABLE fuzz_tmp", "DELETE FROM fuzz_log",
      "UPDATE fuzz_cfg SET v = 1")(rnd.nextInt(3))
    s"$noise;\n${sql.trim};"
  }

  private val TrailingLimit = raw"(?is)^(.*\S)\s+LIMIT\s+(\d+)\s*$$".r

  /** `… LIMIT n` → `… FETCH FIRST n ROWS ONLY` (ANSI/Oracle 12c). */
  private def mutFetchFirst(sql: String): String = sql match {
    case TrailingLimit(body, n) => s"$body FETCH FIRST $n ROWS ONLY"
    case _ => sql
  }

  /** `SELECT … LIMIT n` → `SELECT TOP n …` — only when exactly one
    * depth-0 SELECT exists (under set operations TOP-on-one-arm would
    * change semantics, so those templates keep LIMIT). */
  private def mutTop(sql: String): String = sql match {
    case TrailingLimit(body, n) =>
      var depth = 0; var inStr = false
      val starts = raw"(?i)SELECT\s".r.findAllMatchIn(body).map(_.start).toSet
      var depth0 = List.empty[Int]
      for (i <- body.indices) {
        val c = body.charAt(i)
        if (c == '\'') inStr = !inStr
        else if (!inStr && c == '(') depth += 1
        else if (!inStr && c == ')') depth -= 1
        if (starts(i) && !inStr && depth == 0) depth0 ::= i
      }
      depth0 match {
        case only :: Nil =>
          body.substring(0, only) + s"SELECT TOP $n " +
            body.substring(only + "SELECT ".length)
        case _ => sql
      }
    case _ => sql
  }

  // ── the property ─────────────────────────────────────────────────────────

  // ANALYZED plan, not optimized: the property targets the string
  // front end, and the optimizer's RewriteDistinctAggregates orders its
  // Expand projections by non-canonical expression ids — two analyses of
  // the IDENTICAL string can differ there, which would make the fuzz flaky
  // for multi-COUNT(DISTINCT) templates without testing anything extra
  private def canonical(sql: String) =
    HanaDialect.sql(spark, sql).queryExecution.analyzed.canonicalized

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("all templates: fuzzed spellings analyze to the clean plan") {
    fixtures
    val seedGen = Gen.long
    var checked = 0
    for ((name, tmpl) <- SapTemplates.templates.toSeq.sortBy(_._1)) {
      val clean = canonical(tmpl)
      for (round <- 0 until 3) {
        val rnd = new scala.util.Random(
          sample(seedGen, name.hashCode.toLong * 31 + round))
        var mutated = tmpl
        if (rnd.nextBoolean()) mutated = mutCase(mutated, rnd)
        if (rnd.nextBoolean()) mutated = mutWhitespace(mutated, rnd)
        mutated = mutComments(mutated, rnd)
        if (rnd.nextBoolean()) mutated = mutMultiStatement(mutated, rnd)
        assert(canonical(mutated) == clean,
          s"$name round $round: fuzzed plan diverged\n--- fuzzed SQL ---\n$mutated")
        checked += 1
      }
    }
    assert(checked == SapTemplates.templates.size * 3)
  }

  test("the three row-limit spellings (LIMIT / FETCH FIRST / TOP) analyze identically") {
    // templates carry HANA's native TOP at most — synthesize the vendor
    // spellings on every TOP-free template and pin all three to one plan
    fixtures
    var fetchCovered = 0
    var topCovered = 0
    for ((name, tmpl0) <- SapTemplates.templates.toSeq.sortBy(_._1)) {
      val tmpl = tmpl0.trim.stripSuffix(";")
      if (raw"(?i)\bTOP\b".r.findFirstIn(tmpl).isEmpty) {
        val limited = s"$tmpl LIMIT 7"
        val clean = canonical(limited)
        assert(canonical(mutFetchFirst(limited)) == clean,
          s"$name: FETCH FIRST spelling diverged")
        fetchCovered += 1
        val top = mutTop(limited)
        if (top != limited) {
          assert(canonical(top) == clean, s"$name: TOP spelling diverged")
          topCovered += 1
        }
      }
    }
    assert(fetchCovered > 40, s"FETCH coverage too thin: $fetchCovered")
    assert(topCovered > 10, s"TOP coverage too thin: $topCovered")
  }
}

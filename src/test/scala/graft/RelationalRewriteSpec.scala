package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactness pins for r17 plan rewrites of relational faces: the rewritten
  * form must equal the naive form on ADVERSARIAL inputs the driver corpus
  * does not contain (the oracle hash pins the corpus; these pin the general
  * contract). */
class RelationalRewriteSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("likePrefixFamily ≡ naive LIKE self-join on short, metacharacter, " +
      "and null names") {
    // names exercising every routing branch: normal 4+ char, exactly 4
    // chars, shorter than 4 (prefix = whole name, NOT 4-char equality),
    // LIKE metacharacters % and _ inside the prefix, a TRAILING backslash
    // (pattern 'abc\%' = escaped literal %, valid but not a prefix test),
    // empty, null
    val parts = Seq(
      (1L, "goldenrod lace"), (2L, "gold plated"), (3L, "golf"),
      (4L, "go"), (5L, "gone fishing"), (6L, "a%cd tail"),
      (7L, "axcd tail"), (8L, "a_cd tail"), (9L, "abcd tail"),
      (10L, "abc\\"), (11L, ""), (13L, "ab"), (14L, "abcde"),
      (15L, "abc% x"))
      .toDF("p_partkey", "p_name")
      .unionByName(Seq((12L, Option.empty[String]))
        .toDF("p_partkey", "p_name"))
    def naiveOf(df: org.apache.spark.sql.DataFrame) = df.as("p1")
      .join(df.as("p2"),
        expr("p2.p_name LIKE CONCAT(SUBSTR(p1.p_name, 1, 4), '%')"))
      .groupBy(col("p1.p_partkey").as("p_partkey"))
      .agg(count(lit(1)).as("family_size"))
    val naive = naiveOf(parts).as[(Long, Long)].collect().toMap
    val rewritten = graft.queries.Relational
      .likePrefixFamily(parts, parts)
      .as[(Long, Long)].collect().toMap
    assert(naive.nonEmpty, "adversarial corpus must produce families")
    assert(rewritten == naive,
      s"rewrite diverged: naive=$naive rewritten=$rewritten")
    // a MID-PREFIX backslash makes the LIKE pattern itself invalid
    // ('a\cd%': escape may not precede 'c') — the naive form throws, and
    // the rewrite routes such rows to the same LIKE expression, preserving
    // the error instead of silently inventing an answer
    val bad = parts.unionByName(Seq((16L, "a\\cd tail"))
      .toDF("p_partkey", "p_name"))
    assertThrows[org.apache.spark.SparkThrowable] {
      naiveOf(bad).collect()
    }
    assertThrows[org.apache.spark.SparkThrowable] {
      graft.queries.Relational.likePrefixFamily(bad, bad).collect()
    }
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance term matching via deletion neighborhoods (the SymSpell
  * construction): two terms within Levenshtein distance d share at least
  * one string in their delete-≤d neighborhoods, so candidate generation is
  * an equi-join on generated variants — vocabulary-bounded, never
  * all-pairs. A term of length L has ≤ 1 + L + L(L−1)/2 delete-≤2
  * variants, so the exploded variant table is O(|vocab| · L²) regardless
  * of corpus size; the final `levenshtein` verification runs on candidate
  * pairs only.
  */
object FuzzyMatch {

  /** SQL for all strings obtained from `in` by deleting one character. */
  private def del1Sql(in: String): String =
    s"transform(sequence(1, length($in)), i -> " +
      s"concat(substring($in, 1, i - 1), substring($in, i + 1, length($in))))"

  /** Distinct delete-0/1/2 neighborhood of the string column `colName`. */
  def deleteNeighborhood2(colName: String): Column = {
    val d1 = del1Sql(colName)
    expr(s"array_distinct(concat(array($colName), $d1, " +
      s"flatten(transform($d1, v -> ${del1Sql("v")}))))")
  }

  /** Distinct delete-0/1 neighborhood of the string column `colName`. */
  def deleteNeighborhood1(colName: String): Column =
    expr(s"array_distinct(concat(array($colName), ${del1Sql(colName)}))")

  /** Entity-resolution duplicate candidates: pairs of rows whose NAME is
    * within Levenshtein distance 1, found by equi-joining delete-≤1
    * neighborhoods (complete by the SymSpell guarantee: lev ≤ 1 ⇒ a shared
    * variant) and verifying candidates with the exact distance — the
    * blocking step of master-data dedup, never an all-pairs name cross.
    * Variant fan-out per row is length+1; the join key space is bounded by
    * |entities|·(L+1) regardless of corpus size. */
  def entityDupPairs(entities: DataFrame, idCol: String,
      nameCol: String): DataFrame = {
    val base = entities.select(col(idCol).as("id"), col(nameCol).as("name"))
    val variants = base.select(col("id"), col("name"),
      explode(deleteNeighborhood1("name")).as("v"))
    variants.select(col("id").as("id_a"), col("name").as("name_a"), col("v"))
      .join(variants.select(col("id").as("id_b"), col("name").as("name_b"),
        col("v")), Seq("v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
  }

  /** Candidate typo pairs among `terms` (columns `term`, `freq`): pairs of
    * distinct terms within Levenshtein distance ≤ 2, found by joining
    * delete-≤2 neighborhoods and verifying candidates with the exact
    * distance. Returns (term_a, term_b, dist, freq_a, freq_b), term_a <
    * term_b.
    */
  def typoPairs(terms: DataFrame): DataFrame = {
    val variants = terms
      .select(col("term"), explode(deleteNeighborhood2("term")).as("v"))
    val cand = variants.select(col("term").as("term_a"), col("v"))
      .join(variants.select(col("term").as("term_b"), col("v")), "v")
      .filter(col("term_a") < col("term_b"))
      .select(col("term_a"), col("term_b"))
      .distinct()
      .filter(levenshtein(col("term_a"), col("term_b")) <= 2)
    cand
      .join(terms.select(col("term").as("term_a"), col("freq").as("freq_a")), "term_a")
      .join(terms.select(col("term").as("term_b"), col("freq").as("freq_b")), "term_b")
      .select(col("term_a"), col("term_b"),
        levenshtein(col("term_a"), col("term_b")).cast("long").as("dist"),
        col("freq_a"), col("freq_b"))
  }
}

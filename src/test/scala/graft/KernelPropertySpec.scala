package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Bloom, Dedup, FuzzyMatch}

/** Property-based hardening of the novel kernels: the deterministic unit
  * specs pin one corpus; these throw randomized structure at the same
  * invariants (candidate-generation completeness, filter soundness,
  * cross-model equality) so structural edge cases — short strings,
  * skewed set sizes, adversarial key shapes — can't hide. Generators run
  * from fixed seeds, so failures reproduce.
  */
class KernelPropertySpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // tight alphabet on purpose: maximizes near-collisions per vocabulary
  private val word: Gen[String] =
    for {
      n <- Gen.choose(3, 9)
      cs <- Gen.listOfN(n, Gen.choose('a', 'e'))
    } yield cs.mkString

  test("symspell candidates are complete for every random vocabulary") {
    for (round <- 1 to 8) {
      val vocab = sample(Gen.listOfN(12, word), 1000L + round).distinct
      val terms = vocab.map(w => (w, 1L)).toDF("term", "freq")
      val got = FuzzyMatch.typoPairs(terms)
        .select("term_a", "term_b").as[(String, String)].collect().toSet
      val brute = (for {
        a <- vocab; b <- vocab if a < b && lev(a, b) <= 2
      } yield (a, b)).toSet
      assert(got == brute,
        s"round=$round vocab=$vocab missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("prefix-filtered jaccard equals the naive join on random doc sets") {
    val doc: Gen[String] =
      for {
        n <- Gen.choose(5, 30)
        ws <- Gen.listOfN(n, word)
      } yield ws.mkString(" ")
    for (round <- 1 to 5) {
      val texts = sample(Gen.listOfN(10, doc), 2000L + round)
      val docsDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sh = Dedup.shingles(docsDf, "doc_id", "text", 3)
      val naive = Dedup.jaccardPairs(sh, 0.5)
        .select("id_a", "id_b", "common").as[(Long, Long, Long)].collect().toSet
      val pref = Dedup.jaccardPairsPrefix(sh, 1, 2)
        .select("id_a", "id_b", "common").as[(Long, Long, Long)].collect().toSet
      assert(pref == naive,
        s"round=$round missing=${naive -- pref} extra=${pref -- naive}")
    }
  }

  test("bloom filter never rejects an inserted key") {
    for (round <- 1 to 5) {
      val keys = sample(Gen.listOfN(200, Gen.long), 3000L + round).distinct
      val df = keys.toDF("k")
      val m = 1 << 12
      val bs = Bloom.build(df, col("k"), m, 4)
      val missed = df.filter(!Bloom.mightContain(bs, m, 4)(col("k"))).count()
      assert(missed == 0, s"round=$round: $missed inserted keys rejected")
    }
  }
}

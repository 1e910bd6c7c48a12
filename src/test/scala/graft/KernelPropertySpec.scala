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

  test("bfsHops equals reference BFS distances on random graphs") {
    import graft.ext.GraphOps
    val edgeGen = for {
      n <- Gen.choose(6, 14)
      m <- Gen.choose(5, 25)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es.filter { case (a, b) => a != b }.distinct
    for (round <- 1 to 6) {
      val es = sample(edgeGen, 4000L + round)
      if (es.nonEmpty) {
        val edges = es.toDF("src", "dst")
        val seed = es.map(_._1).min
        val got = GraphOps.bfsHops(edges, Seq(seed).toDF("node"), 3)
          .as[(Long, Long)].collect().toMap
        // reference BFS over the directed adjacency
        val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        var ref = Map(seed -> 0L)
        var frontier = Set(seed)
        for (h <- 1L to 3L) {
          val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
            .diff(ref.keySet)
          ref ++= next.map(_ -> h)
          frontier = next
        }
        assert(got == ref, s"round=$round got=$got ref=$ref edges=$es")
      }
    }
  }

  test("upsertLatest: latest change wins and reapplication is a fixpoint") {
    import graft.ext.Merge
    val changeGen = for {
      n <- Gen.choose(1, 30)
      cs <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 6L)
        v <- Gen.choose(0.0, 100.0)
        del <- Gen.frequency(4 -> Gen.const(false), 1 -> Gen.const(true))
      } yield (k, v, del))
    } yield cs.zipWithIndex.map { case ((k, v, d), i) => (k, i.toLong, v, d) }
    for (round <- 1 to 6) {
      val snapshot = (1L to 3L).map(k => (k, k * 10.0)).toDF("k", "v")
      val cs = sample(changeGen, 5000L + round)
      val changes = cs.toDF("k", "ord", "v", "del")
      val got = Merge.upsertLatest(snapshot, changes, "k", "v",
          col("ord"), col("del"))
        .as[(Long, Double, String)].collect()
        .map { case (k, v, op) => k -> ((v, op)) }.toMap
      // reference: latest change per key by ord, tombstone deletes
      val last = cs.groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._2)
      }
      val ref = ((1L to 3L).flatMap { k =>
        last.get(k) match {
          case Some((_, _, _, true)) => None
          case Some((_, _, v, false)) => Some(k -> ((v, "updated")))
          case None => Some(k -> ((k * 10.0, "kept")))
        }
      } ++ last.collect {
        case (k, (_, _, v, false)) if k > 3L => k -> ((v, "inserted"))
      }).toMap
      assert(got == ref, s"round=$round got=$got ref=$ref changes=$cs")
      // fixpoint: applying the same delta to the merged state changes nothing
      val once = got.map { case (k, (v, _)) => (k, v) }.toSeq.toDF("k", "v")
      val twice = Merge.upsertLatest(once, changes, "k", "v",
          col("ord"), col("del"))
        .select("k", "v").as[(Long, Double)].collect().toMap
      assert(twice == got.map { case (k, (v, _)) => k -> v })
    }
  }

  test("sharedSpanRuns max span equals brute-force longest common run") {
    val doc: Gen[List[String]] =
      for {
        n <- Gen.choose(6, 25)
        ws <- Gen.listOfN(n, word)
      } yield ws
    for (round <- 1 to 5) {
      val docs = sample(Gen.listOfN(6, doc), 6000L + round)
      val n = 3
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.sharedSpanRuns(df, "doc_id", "text", n, 1000)
        .select("id_a", "id_b", "max_span_tokens")
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, s) => (a, b) -> s }.toMap
      // brute force: longest common contiguous token run >= n per pair
      val ref = (for {
        a <- docs.indices; b <- docs.indices if a < b
        runs = for {
          i <- docs(a).indices; j <- docs(b).indices
          if docs(a)(i) == docs(b)(j) && (i == 0 || j == 0 ||
            docs(a)(i - 1) != docs(b)(j - 1))
        } yield Iterator.from(0)
          .takeWhile(k => i + k < docs(a).length && j + k < docs(b).length &&
            docs(a)(i + k) == docs(b)(j + k)).size
        best = if (runs.isEmpty) 0 else runs.max
        if best >= n
      } yield (a.toLong, b.toLong) -> best.toLong).toMap
      assert(got == ref, s"round=$round got=$got ref=$ref docs=$docs")
    }
  }

  test("bloom filter never rejects an inserted key") {
    for (round <- 1 to 5) {
      val keys = sample(Gen.listOfN(200, Gen.long), 3000L + round).distinct
      val df = keys.toDF("k")
      val bs = Bloom.build(df, col("k"))
      val missed = df.filter(!Bloom.mightContain(bs)(col("k"))).count()
      assert(missed == 0, s"round=$round: $missed inserted keys rejected")
    }
  }

  test("native vector kernels are bit-identical to their HOF forms") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.{VecDot, VecDotLong, VecL2SqScaled}
    // arrays with null elements, length mismatches, empties, and values
    // whose products/squares stress the fold (the kernels promise the SAME
    // left-to-right IEEE fold from 0 and the same zip_with null semantics)
    val elem: Gen[Option[Float]] = Gen.frequency(
      9 -> Gen.choose(-10000, 10000).map(i => Some(i / 7.0f)),
      1 -> Gen.const(None))
    val farr: Gen[Seq[Option[Float]]] =
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, elem))
    val pairs = (1 to 6).flatMap(r =>
      sample(Gen.listOfN(60, Gen.zip(farr, farr)), 4000L + r))
    val df = pairs.toDF("a", "b")

    def nat(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      ColumnBridge.column(e)
    val hofDot = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val hofL2 = round(aggregate(
      zip_with(col("a"), col("b"), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v) * lit(1e6)).cast("long")
    val rows = df.select(
      nat(VecDot(ColumnBridge.expression(col("a")),
        ColumnBridge.expression(col("b")))).as("nd"),
      hofDot.as("hd"),
      nat(VecL2SqScaled(ColumnBridge.expression(col("a")),
        ColumnBridge.expression(col("b")))).as("nl"),
      hofL2.as("hl")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"dot diverged: ${r.get(0)} vs ${r.get(1)}")
      assert(r.get(2) == r.get(3), s"l2sq diverged: ${r.get(2)} vs ${r.get(3)}")
    }
    assert(rows.exists(_.isNullAt(0)) && rows.exists(!_.isNullAt(0)),
      "fixture must exercise both null and non-null outcomes")

    val lpairs = (1 to 3).flatMap(r => sample(Gen.listOfN(40, Gen.zip(
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.choose(-1000L, 1000L))),
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.choose(-1000L, 1000L))))),
      5000L + r))
    val ldf = lpairs.toDF("a", "b")
    val hofLong = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    ldf.select(
      nat(VecDotLong(ColumnBridge.expression(col("a")),
        ColumnBridge.expression(col("b")))).as("n"),
      hofLong.as("h")).collect().foreach { r =>
      assert(r.get(0) == r.get(1), s"dotLong diverged: ${r.get(0)} vs ${r.get(1)}")
    }
  }
}

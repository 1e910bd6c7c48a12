package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, GraphOps, Merge, Similarity}

/** Round-5 curation kernels: BFS reachability, CDC merge semantics,
  * hard-negative mining, cluster-bounded semantic dedup. */
class CurationSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("bfsHops: hop distances on a hand-built graph, frontier never revisits") {
    // 1-2-3-4 path plus a 1-5 spur and a disconnected 9-10 edge
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (9L, 10L))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Seq(1L).toDF("node")
    val got = GraphOps.bfsHops(edges, seeds, 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L))
    // maxHops bounds the expansion: node 4 (3 hops out) is not reached
    assert(!got.contains(4L) && !got.contains(9L))
  }

  test("bfsHops: a node reachable two ways gets its MINIMUM hop count") {
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val got = GraphOps.bfsHops(edges, Seq(1L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got(3L) == 1L) // direct edge wins over the 2-hop path
  }

  test("upsertLatest: insert / update / keep / delete branches all fire") {
    val snapshot = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    // key 1: updated twice, latest wins; key 2: deleted; key 4: fresh insert;
    // key 3: untouched
    val changes = Seq(
      (1L, 1L, 11.0, false), (1L, 2L, 12.0, false),
      (2L, 1L, 99.0, false), (2L, 2L, 0.0, true),
      (4L, 1L, 40.0, false)
    ).toDF("k", "ord", "v", "del")
    val got = Merge.upsertLatest(snapshot, changes, "k", "v",
        col("ord"), col("del"))
      .as[(Long, Double, String)].collect()
      .map { case (k, v, op) => k -> ((v, op)) }.toMap
    assert(got == Map(
      1L -> ((12.0, "updated")),
      3L -> ((30.0, "kept")),
      4L -> ((40.0, "inserted"))))
  }

  test("upsertLatest: re-applying the same delta is idempotent") {
    val snapshot = Seq((1L, 10.0)).toDF("k", "v")
    val changes = Seq((1L, 1L, 11.0, false)).toDF("k", "ord", "v", "del")
    val once = Merge.upsertLatest(snapshot, changes, "k", "v",
      col("ord"), col("del"))
    val twice = Merge.upsertLatest(once.select(col("k"), col("v")), changes,
      "k", "v", col("ord"), col("del"))
    assert(twice.as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 11.0, "updated")))
  }

  test("hardNegatives excludes same-label candidates and ranks by cosine") {
    val emb = Tables(spark, sf, "embeddings")
    val got = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5), 3)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // no returned negative shares the query's label
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { r =>
      val (qid, cid) = (r.getLong(0), r.getLong(2))
      assert(labels(qid.toInt) != labels(cid.toInt),
        s"negative $cid shares label with query $qid")
    }
    // per query: scores are non-increasing in rank
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("randomProjectLong roughly preserves pairwise distances (JL property)") {
    val emb = Tables(spark, sf, "embeddings").filter(col("vec_id") < 30)
    val proj = Similarity.randomProjectLong(emb, 16)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3)
      }
    val orig = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      i <- ids; j <- ids if i < j
      num = d2(proj(i), proj(j)); den = d2(orig(i), orig(j)) if den > 1e-9
    } yield num / den
    // ±1 projections to k=16 dims: E[ratio]=1 over matrices, but ONE fixed
    // matrix applied to correlated vectors realizes a shared ~χ²₁₆/16
    // factor (sd ≈ 0.35), so the pair-mean itself wanders — bound loosely.
    // The real JL claim is that no pair collapses to 0 or explodes.
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 2.0, s"mean distortion $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"distortion out of range: min=${ratios.min} max=${ratios.max}")
  }

  test("temporalSplit: train/test windows exclude the embargo gap") {
    val df = Seq(
      ("2024-01-19 23:59:59", 1L), ("2024-01-20 00:00:00", 2L),
      ("2024-01-21 12:00:00", 3L), ("2024-01-22 00:00:00", 4L)
    ).toDF("t", "id").select(to_timestamp(col("t")).as("ts"), col("id"))
    val got = df.withColumn("split", graft.ext.CorpusPipeline.temporalSplit(
        col("ts"), "2024-01-20 00:00:00", "2024-01-22 00:00:00"))
      .select(col("id"), col("split"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("train"), 2L -> None, 3L -> None,
      4L -> Some("test")))
  }

  test("sharedSpanRuns finds a planted 12-token overlap and nothing else") {
    val mk = (id: Long, text: String) => (id, text)
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      mk(1L, s"alpha beta $shared gamma delta"),
      mk(2L, s"one two three $shared four"),
      mk(3L, "completely different words with no overlap at all here okay")
    ).toDF("doc_id", "text")
    val got = Dedup.sharedSpanRuns(docs, "doc_id", "text", 8, 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // the only pair sharing an 8-shingle run is (1,2); a 12-token overlap
    // yields 12-8+1 = 5 consecutive shingles → max span 5+7 = 12 tokens
    assert(got == Seq((1L, 2L, 5L, 12L)))
  }

  test("entityDupPairs equals the brute-force lev<=1 pairs on a synthetic master") {
    val rows = Seq(
      (1L, "acme corp"), (2L, "acme c0rp"), // substitution: dist 1
      (3L, "acme cor"),                     // deletion vs 1: dist 1
      (4L, "acme corporation"),             // dist > 1 from all
      (5L, "zenith"), (6L, "zenith")        // identical: dist 0
    )
    val df = rows.toDF("id", "name")
    val got = graft.ext.FuzzyMatch.entityDupPairs(df, "id", "name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (ia, na) <- rows; (ib, nb) <- rows if ia < ib
      d = {
        // textbook Levenshtein for the oracle side of the spec
        val m = Array.tabulate(na.length + 1, nb.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to na.length; j <- 1 to nb.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (na(i - 1) == nb(j - 1)) 0 else 1))
        m(na.length)(nb.length)
      } if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute && got.contains((1L, 2L, 1L)) && got.contains((5L, 6L, 0L)))
  }

  test("clusterNearDupPairs agrees with the global exact pairs inside a cluster") {
    val emb = Tables(spark, sf, "embeddings")
    val tau = 0.3
    val within = Dedup
      .clusterNearDupPairs(emb, "label", "vec_id", "embedding", tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force baseline, restricted to same-label pairs
    val global = Dedup.embeddingNearDups(emb, "vec_id", "embedding", tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val sameLabelGlobal = global.filter { case (a, b) => labels(a) == labels(b) }
    assert(within == sameLabelGlobal)
  }

  test("clusterNearDupPairsBounded: subset of exact, recall pinned, exact when small") {
    val emb = Tables(spark, sf, "embeddings")
    val tau = 0.3
    val exact = Dedup
      .clusterNearDupPairs(emb, "label", "vec_id", "embedding", tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bounded = Dedup
      .clusterNearDupPairsBounded(emb, "label", "vec_id", "embedding", tau,
        maxClusterSize = 8, tables = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH sub-bucketing can only MISS pairs, never invent them (cosine is
    // verified exactly on every candidate)
    assert(bounded.subsetOf(exact))
    // recall is θ-dependent: at τ=0.3 the pairs sit near 73° apart, where a
    // hyperplane separates them with prob ~0.4 per bit — the fixture-wide
    // bound is accordingly loose; the near-dup regime the operator targets
    // (cos→1) is pinned at ~1.0 recall in the planted test below
    assert(exact.isEmpty || bounded.size.toDouble / exact.size >= 0.3,
      s"pair recall ${bounded.size}/${exact.size}")
    // clusters at/below the bound are not split: results identical to exact
    val boundedLarge = Dedup
      .clusterNearDupPairsBounded(emb, "label", "vec_id", "embedding", tau,
        maxClusterSize = 100000, tables = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(boundedLarge == exact)
  }

  test("clusterNearDupPairsBounded: planted near-dups all survive the split") {
    // one 30-vector cluster forced through the split path (bound 8 → 4
    // sub-buckets): 20 distinct bases + 10 near-copies (cos ≈ 0.9999).
    // Vectors at that angle flip a hyperplane sign with prob ~0.004/bit, so
    // across 3 tables every planted pair lands in a shared sub-bucket with
    // near-certainty — this is the recall claim at the operator's actual
    // near-dup operating point.
    val rnd = new scala.util.Random(42)
    val bases = Seq.tabulate(20)(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = bases.zipWithIndex.map { case (v, i) => (i.toLong, 0, v) } ++
      bases.take(10).zipWithIndex.map { case (v, i) =>
        ((100 + i).toLong, 0, v.map(x => x + 0.001f * rnd.nextGaussian().toFloat))
      }
    val emb = rows.toDF("vec_id", "label", "embedding")
    val got = Dedup
      .clusterNearDupPairsBounded(emb, "label", "vec_id", "embedding", 0.99,
        maxClusterSize = 8, tables = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 10).map(i => (i.toLong, (100 + i).toLong)).toSet
    assert(planted.subsetOf(got),
      s"missed planted pairs: ${planted.diff(got)}")
  }

  test("clusterNearDupPairsBounded: sub-bucket sizes honor the bound (±2x)") {
    // the scale contract: after splitting, no (cluster, sub) group should be
    // far above maxClusterSize — that is what keeps the pair join linear
    val emb = Tables(spark, sf, "embeddings")
    val bound = 8
    val sizes = emb.groupBy("label").agg(count(lit(1)).as("n"))
    val nsub = expr(s"(n + ${bound - 1}) div $bound")
    val bits = (1 to 20).foldLeft(when(nsub <= 1, lit(0))) { (acc, b) =>
      acc.when(nsub <= (1L << b), lit(b))
    }.otherwise(lit(20))
    val keyed = emb.join(sizes, Seq("label")).withColumn("bits", bits)
      .withColumn("sub",
        Similarity.lshBucket(col("embedding"), 16, 64, 0)
          .bitwiseAND(expr("shiftleft(1, bits) - 1")))
    val grp = keyed.groupBy("label", "sub").agg(count(lit(1)).as("c"))
      .agg(max(col("c")).cast("double").as("mx"), avg(col("c")).as("av"))
      .as[(Double, Double)].head()
    // hyperplane splits are not perfectly balanced; 4x the target bound is
    // the alarm line for a hot sub-bucket (quadratic blowup needs >>10x)
    assert(grp._1 <= bound * 4, s"hot sub-bucket: max=${grp._1} avg=${grp._2}")
  }
}

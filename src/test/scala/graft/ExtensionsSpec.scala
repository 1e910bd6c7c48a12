package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.functions.HashFunctions

/** Correctness of the non-SQL-expressible extension operators, pinned
  * against exact baselines (the oracle harness can't cover these). */
class ExtensionsSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents").cache()

  test("minhash-LSH finds every exact near-dup pair (recall=1 at jac>=0.8)") {
    val exact = Dedup
      .jaccardPairs(Dedup.shingles(docs, "doc_id", "text", 3), 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashDedup(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    // verification step filters candidates by exact jaccard, so approx ⊆ exact
    assert(approx.subsetOf(exact))
    // 16 bands × 4 rows at jac .8: P(miss) = (1-.8^4)^16 ≈ 0.02% per pair
    assert(approx.size >= exact.size * 9 / 10,
      s"LSH recall too low: ${approx.size}/${exact.size}")
  }

  test("minhash verification is candidate-pruned (r17): the per-doc set " +
      "aggregates read a semi-joined shingle relation, not the full corpus") {
    // guide §3.2 / round-17 optimization: before the prune, the two
    // sorted-array verification aggregates ran over EVERY doc and the full
    // result was broadcast — a corpus-wide array shuffle at scale. The
    // output itself is pinned exact by the recall test above; this pins the
    // PLAN shape (a LeftSemi join of the shingle relation against the
    // candidate ids below the set aggregates) so the prune can't silently
    // regress.
    val plan = Dedup.minhashDedup(docs, "doc_id", "text", 0.8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      "expected a LeftSemi candidate prune below the verification " +
        "aggregates; plan:\n" + plan.linesIterator.take(30).mkString("\n"))
    // second pass: the batch path builds ONE shared pruned set aggregate
    // (cached, columns doc_id/__sa/na) and both verification joins read it
    // through the cache (the second reference renames __sa→__sb; one cache
    // entry — the canonical plans match). The per-side form paid two
    // candidate-sized aggregates, two shuffle exchanges and two broadcast
    // builds per execution, and had NO cached sets relation at all.
    val sharedScans = plan.linesIterator
      .filter(l => l.contains("InMemoryTableScan") &&
        (l.contains("__sa") || l.contains("__sb")))
      .size
    assert(sharedScans >= 2,
      s"expected both verification joins to read the one cached shared set " +
        s"aggregate (saw $sharedScans InMemoryTableScan(__sa/__sb) " +
        "references); plan:\n" + plan.linesIterator.take(40).mkString("\n"))
  }

  test("prefix/containment/decontaminate verification is candidate-pruned " +
      "(r17 second pass): set aggregates read semi-joined shingle relations") {
    // the same guide-§3.2 prune as minhashDedup, landed once the candidate
    // set was cached (the uncached first-pass attempt re-ran the whole
    // candidate subtree per reference and measured 2× slower — see
    // OPTIMIZATION_r17.md). Output exactness is pinned by the
    // prefix≡naive and stop-set-split tests in this suite; this pins the
    // PLAN shape so the prune can't silently regress.
    val sh = Dedup.hashedShingles(docs, "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    for ((name, df) <- Seq(
        "jaccardPairsPrefix" -> Dedup.jaccardPairsPrefix(sh, 4, 5),
        "containmentPairs" -> Dedup.containmentPairs(sh, 4, 5, minShingles = 5),
        "decontaminate" -> Dedup.decontaminate(
          sh.filter(col("doc_id") % 7 =!= 0), sh.filter(col("doc_id") % 7 === 0),
          4, 5, minShingles = 5))) {
      val plan = planOf(df)
      assert(plan.contains("LeftSemi"),
        s"$name: expected a LeftSemi candidate prune below the " +
          "verification set aggregates; plan:\n" +
          plan.linesIterator.take(30).mkString("\n"))
    }
  }

  test("char-entropy run-length form ≡ filter-per-distinct-char reference") {
    // r17 per-task rewrite (q_text_entropy): counts from ONE sorted
    // run-length pass instead of rescanning the char array once per
    // distinct char. The per-doc count multiset is identical, so the
    // integer-scaled terms and their order-free long sum must match the
    // old form exactly — including on degenerate inputs (single char,
    // all-same chars, unicode).
    val docs = Tables(spark, sf, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((900001L, "a"), (900002L, "aaaaaa"),
        (900003L, "ÃŸÃŸÃ©Ã©Ã©x"), (900004L, "ab"))
        .toDF("doc_id", "text"))
    val base = docs.select(col("doc_id"), expr("split(text, '')").as("ch"))
      .withColumn("n", size(col("ch")).cast("double"))
    def total(terms: org.apache.spark.sql.Column) =
      round(terms.cast("double") / lit(1e10), 6)
    val oldForm = base.withColumn("terms", expr(
        """transform(
          transform(array_distinct(ch), c2 -> size(filter(ch, x -> x = c2))),
          c -> cast(round(-(c / n) * ln(c / n) * 1e10) as bigint))"""))
      .select(col("doc_id"),
        total(expr("aggregate(terms, 0L, (a, t) -> a + t)")).as("e"))
    // the landed form: ONE run-length aggregate over the sorted array as
    // the higher-order function's INPUT (evaluated once per row) — an
    // intermediate sorted column referenced inside a later lambda gets
    // inlined into the lambda body and re-sorts per element
    val newForm = base.withColumn("sum_terms", expr(
        """aggregate(
          array_sort(transform(ch, c -> ascii(c))),
          struct(cast(null as int) as prev, 0L as run, 0L as acc),
          (s, x) -> if(s.prev is null or x = s.prev,
            struct(x as prev, s.run + 1 as run, s.acc as acc),
            struct(x as prev, 1L as run,
              s.acc + cast(round(-(s.run / n) * ln(s.run / n) * 1e10)
                as bigint) as acc)),
          s -> s.acc + cast(round(-(s.run / n) * ln(s.run / n) * 1e10)
            as bigint))"""))
      .select(col("doc_id"), total(col("sum_terms")).as("e"))
    val diff = oldForm.as("o").join(newForm.as("nw"), Seq("doc_id"))
      .filter(col("o.e") =!= col("nw.e"))
    assert(diff.isEmpty, s"entropy mismatch: ${diff.take(5).mkString(", ")}")
  }

  test("simhash: identical docs collide; near-dups are close in hamming") {
    val planted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different content about spark query engines at scale"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 8)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => ((a, b), h) }.toMap
    assert(pairs(((1L, 2L))) == 0, "identical docs must have distance 0")
    assert(pairs.contains((1L, 3L)) && pairs(((1L, 3L))) <= 8,
      "one-word change stays within hamming 8")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
  }

  test("ann-lsh results are a subset of brute force ranking universe") {
    val queries = Tables(spark, sf, "embeddings").filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(Tables(spark, sf, "embeddings"), queries, 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(Tables(spark, sf, "embeddings"), queries, 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(approx.nonEmpty)
    // sanity: approximate neighbors share the query ids and score sanely
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall > 0.1, s"suspiciously low ANN recall: $recall")
  }

  test("ivf ann probes cells and returns ranked neighbors") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val out = Similarity.ivfTopK(emb, queries, 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    // every query returns at most k ranked results with rk 1..k
    val byQ = out.groupBy(_._1)
    assert(byQ.values.forall(rs => rs.map(_._4).sorted.sameElements(1L to rs.length)))
    // overlap with brute force should be nontrivial
    val exact = Similarity.cosineTopK(emb, queries, 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = out.map(r => (r._1, r._2)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall > 0.1, s"IVF recall suspiciously low: $recall")
  }

  test("pq adc ranking overlaps exact l2 ranking and codes are bounded") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val out = Similarity.pqTopK(emb, queries, 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    assert(byQ.values.forall(rs => rs.map(_._4).sorted.sameElements(1L to rs.length)))
    // codes live in [1, kCodes] and every vector carries exactly m of them
    val codes = Similarity.pqEncode(emb, Similarity.pqCodebooks(emb))
      .select(explode(col("codes")).as("c")).as[Long].collect()
    assert(codes.forall(c => c >= 1L && c <= 16L))
    // exact L2 top-3 per query (PQ approximates L2, not cosine)
    val exact = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .join(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))),
        col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        aggregate(zip_with(col("qe"), col("ce"), (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0.0), (a, v) => a + v).as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d2"), col("cid"))))
      .filter(col("rk") <= 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = out.map(r => (r._1, r._2)).toSet
    // quality floor for the DEFAULT (16-code) configuration is pinned in
    // the dedicated hit-rate test; here assert overlap is above chance
    // (chance ≈ k/N) — the structural contract, robust to bootstrap changes
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.1, s"PQ recall suspiciously low: $recall")
  }

  test("ann quality: hit-rate@top-10 floors hold for every variant") {
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val cosTop10 = Similarity.cosineTopK(emb, q, 10)
    val l2Top10 = Similarity.l2TopK(emb, q, 10)
    def rates(approx: org.apache.spark.sql.DataFrame,
        exact: org.apache.spark.sql.DataFrame): Seq[Double] =
      Similarity.hitRateAtK(approx, exact)
        .select("hit_rate").as[Double].collect().toSeq
    // the bounds the oracle faces assert at sf0.01, re-pinned here at the
    // spec scale so a quality regression fails BOTH gates
    val lsh = rates(Similarity.lshTopK(emb, q, 3, planes = 5, tables = 12), cosTop10)
    assert(lsh.forall(_ >= 0.99), s"lsh per-query hit rate regressed: $lsh")
    val ivf = rates(Similarity.ivfTopK(emb, q, 3, refineIters = 2), cosTop10)
    assert(ivf.sum / ivf.size >= 0.8, s"ivf mean hit rate regressed: $ivf")
    val pq = rates(Similarity.pqTopK(emb, q, 3, kCodes = 64, refineIters = 2), l2Top10)
    assert(pq.sum / pq.size >= 0.3, s"pq mean hit rate regressed: $pq")
    val ivfpq = rates(Similarity.ivfpqTopK(emb, q, 3, nprobe = 8, kCodes = 64,
      refineIters = 2), l2Top10)
    assert(ivfpq.sum / ivfpq.size >= 0.3, s"ivfpq mean hit rate regressed: $ivfpq")
  }

  test("ivf bootstrap: hash-drawn+refined centroids balance cells") {
    val emb = Tables(spark, sf, "embeddings")
    val n = emb.count()
    val boot = Similarity.ivfCentroids(emb, 16)
    // seeds are drawn uniformly over id space, not one corner: the draw
    // must span well beyond the first 16 ids (the round-5 bootstrap defect)
    val seedMax = boot.join(emb, boot("centroid") === emb("embedding"))
      .agg(max(col("vec_id"))).as[Long].head()
    assert(seedMax > 16, s"centroid seeds still drawn from the low-id corner ($seedMax)")
    val refined = Similarity.ivfRefine(emb, boot)
    val sizes = Similarity.ivfAssign(emb, refined)
      .groupBy("cell").agg(count(lit(1)).as("sz"))
      .select("sz").as[Long].collect()
    val mean = n.toDouble / 16
    assert(sizes.length >= 12, s"too many empty cells: ${sizes.length}/16")
    assert(sizes.max <= 4 * mean,
      s"hot cell: max=${sizes.max} vs mean=$mean — straggler at scale")
  }

  test("ivfpq candidates are cell-bounded and rankings stay subset-consistent with pq") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val out = Similarity.ivfpqTopK(emb, queries, 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    assert(byQ.values.forall(rs => rs.map(_._4).sorted.sameElements(1L to rs.length)))
    // every hybrid hit carries the SAME adc distance full PQ computes for
    // that (qid, cid) — the cell filter prunes candidates, never rescores
    val full = Similarity.pqTopK(emb, queries, 500)
      .select("qid", "cid", "adist")
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, d) => (q, c) -> d }.toMap
    out.foreach { case (q, c, d, _) =>
      assert(full.get((q, c)).contains(d),
        s"ivfpq distance $d for ($q,$c) disagrees with pq ${full.get((q, c))}")
    }
  }

  test("fingerprint is deterministic and order-sensitive only at window level") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (3L, "completely different text payload")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), HashFunctions.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("language id picks the language whose stopwords dominate") {
    val df = Seq(
      (1L, "the cat and the dog in a house that is big"),
      (2L, "der hund und die katze ist nicht ein problem"),
      (3L, "le chat et la maison est un exemple"),
      (4L, "zzz qqq www")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "fr"); assert(out(4L) == "und")
  }

  test("multimodal: payload schema, batch extraction shape, no driver state") {
    val media = Multimodal.withBinaryPayload(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(media, new Multimodal.ByteHistogramExtractor)
    val row = feats.filter(col("media_id") === 0).collect().head
    val v = row.getSeq[Float](1)
    assert(v.length == 16)
    assert(math.abs(v.sum - 1.0f) < 1e-3, "histogram must be L1-normalized")
    // determinism
    val again = Multimodal.extractFeatures(media, new Multimodal.ByteHistogramExtractor)
      .filter(col("media_id") === 0).collect().head.getSeq[Float](1)
    assert(v == again)
  }

  test("asof join matches duckdb asof semantics on a planted case") {
    val purchases = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 10L))
      .toDF("event_id", "user_id", "p_us")
    val views = Seq((10L, 90L), (10L, 100L), (10L, 120L), (20L, 40L))
      .toDF("user_id", "v_us")
    val out = graft.ext.AsOfJoin
      .asofJoin(purchases, views, Seq("user_id"), "p_us", "v_us", Nil)
      .select("event_id", "asof_v_us").as[(Long, Long)].collect().toMap
    assert(out(1L) == 100L) // <= semantics: equal timestamp matches
    assert(!out.contains(2L)) // no view at or before 50 → dropped (inner)
    assert(!out.contains(3L)) // user 20's only view is after the purchase
  }

  test("forward asof join picks earliest at-or-after; tied timestamps resolve deterministically") {
    val purchases = Seq((1L, 10L, 100L), (2L, 10L, 130L), (3L, 20L, 50L))
      .toDF("event_id", "user_id", "p_us")
    val views = Seq((10L, 90L), (10L, 100L), (10L, 120L), (20L, 40L))
      .toDF("user_id", "v_us")
    val out = graft.ext.AsOfJoin
      .asofJoinForward(purchases, views, Seq("user_id"), "p_us", "v_us", Nil)
      .select("event_id", "asof_v_us").as[(Long, Long)].collect().toMap
    assert(out(1L) == 100L) // >= semantics: equal timestamp matches
    assert(!out.contains(2L)) // no view at or after 130 → dropped (inner)
    assert(!out.contains(3L)) // user 20's only view precedes the purchase
    // duplicate right timestamps with DIFFERENT payloads: the payload struct
    // is the final sort key, so both directions pick deterministically —
    // forward the smallest payload, backward the largest
    val dupViews = Seq((10L, 100L, "b"), (10L, 100L, "a"), (10L, 100L, "c"))
      .toDF("user_id", "v_us", "tag")
    val fwd = graft.ext.AsOfJoin.asofJoinForward(
        purchases.filter(col("event_id") === 1), dupViews,
        Seq("user_id"), "p_us", "v_us", Seq("tag"))
      .select("asof_tag").as[String].collect().toList
    assert(fwd == List("a"))
    val bwd = graft.ext.AsOfJoin.asofJoin(
        purchases.filter(col("event_id") === 1), dupViews,
        Seq("user_id"), "p_us", "v_us", Seq("tag"))
      .select("asof_tag").as[String].collect().toList
    assert(bwd == List("c"))
  }

  // the three sketch queries now emit their error-bound check IN-QUERY
  // (exact value + boolean the DuckDB oracle reproduces); the specs assert
  // the booleans came out true at the spec scale too
  test("merged per-day hll sketches estimate type-level distincts within 5%") {
    val r = graft.queries.Registry.byName("q_hll_rollup")
      .build(spark, sf).as[(String, Long, Long, Boolean)].collect()
    assert(r.nonEmpty)
    r.foreach { case (typ, nDays, exact, ok) =>
      assert(nDays > 1, s"$typ: merge path not exercised ($nDays day)")
      assert(exact > 0)
      assert(ok, s"$typ: merged estimate outside 5% of exact $exact")
    }
  }

  test("hll approx distinct stays within the configured error bound") {
    val r = graft.queries.Registry.byName("q_approx_distinct")
      .build(spark, sf).as[(String, Long, Boolean)].collect()
    assert(r.nonEmpty)
    r.foreach { case (flag, exact, ok) =>
      assert(exact > 0)
      assert(ok, s"$flag: approx outside 5% of exact $exact")
    }
  }

  test("approx quantile sketch stays within 2% of exact percentiles") {
    val rows = graft.queries.Registry.byName("q_approx_quantiles")
      .build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Seq(1, 2, 3).forall(i => r.getDouble(i) > 0.0))
      assert(Seq(4, 5, 6).forall(r.getBoolean),
        s"quantile sketch outside 2% for ${r.getString(0)}")
    }
  }

  test("char-trigram language id complements the stopword heuristic") {
    val df = Seq(
      (1L, "the thing and the other thing are singing"),
      (2L, "ich mochte dich und die schoene sache"),
      (3L, "xqz")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.langIdCharNgram(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "de"); assert(out(3L) == "und")
  }

  test("multimodal: resize caps metadata and shrinks payload deterministically") {
    val media = Multimodal.withBinaryPayload(docs)
    val small = Multimodal.resize(media, 64, 64)
    val row = small.filter(col("media_id") === 1).collect().head
    val meta = row.getStruct(2)
    assert(meta.getInt(1) <= 64 && meta.getInt(2) <= 64)
    val orig = media.filter(col("media_id") === 1).collect().head
      .getAs[Array[Byte]](1).length
    assert(row.getAs[Array[Byte]](1).length <= orig)
    // determinism
    val again = Multimodal.resize(media, 64, 64)
      .filter(col("media_id") === 1).collect().head.getAs[Array[Byte]](1)
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]](1), again))
  }

  test("multimodal: frame sampling explodes payloads to frame rows") {
    val media = Multimodal.withBinaryPayload(docs.limit(5))
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, everyNth = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]](2).length <= 32))
    // every 2nd frame only
    val nos = rows.filter(_.getLong(0) == rows.head.getLong(0)).map(_.getLong(1))
    assert(nos.forall(_ % 2 == 0))
  }

  test("multimodal: scene cuts fire exactly at the planted shot boundary") {
    val chunkA = Array.tabulate(64)(i => (i * 7).toByte)
    val chunkB = Array.tabulate(64)(i => (i * 13 + 101).toByte)
    val payload = Array.fill(4)(chunkA).flatten ++ Array.fill(4)(chunkB).flatten
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, everyNth = 1)
    val cuts = Multimodal.sceneCuts(frames, minCutHamming = 10)
      .orderBy("frame_no").collect()
    assert(cuts.length == 8)
    assert(cuts.head.isNullAt(2), "first frame has no predecessor distance")
    val cutFrames = cuts.filter(_.getBoolean(3)).map(_.getLong(1)).toList
    assert(cutFrames == List(4L),
      s"expected one cut at the A→B boundary, got $cutFrames")
    // identical consecutive frames have distance 0
    assert(cuts.drop(1).filterNot(_.getBoolean(3)).forall(_.getLong(2) == 0L))
  }

  test("multimodal: perceptual hash groups identical payloads; banding finds pairs") {
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val df = Seq(
      (1L, base), (2L, base),                            // identical payloads
      (3L, base.replaceFirst("lazy", "hazy")),           // one-byte edit
      (4L, "completely different content entirely unrelated words " * 6))
      .toDF("doc_id", "text")
    val media = Multimodal.withBinaryPayload(df)
    val h = Multimodal.perceptualHash(media).as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L), "identical payloads must collide exactly")
    val d13 = java.lang.Long.bitCount(h(1L) ^ h(3L))
    val d14 = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(d13 < d14, "a one-byte edit must stay closer than unrelated content")
    // banded pair path surfaces the exact-duplicate pair at distance 0
    val pairs = Multimodal.phashNearDups(media).as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    // expression path agrees with the row kernel
    assert(h(1L) == graft.functions.MediaHashImpl.aHash(base.getBytes("UTF-8")))
  }

  test("multimodal: audio frame energy computes exact RMS over PCM16LE") {
    // 256 samples of a ±1000 square wave, then 64 samples of silence
    val bb = java.nio.ByteBuffer.allocate((256 + 64) * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 256).foreach(i => bb.putShort(if (i % 2 == 0) 1000 else -1000))
    (0 until 64).foreach(_ => bb.putShort(0))
    val media = Seq((7L, bb.array())).toDF("media_id", "payload")
    val frames = Multimodal.audioFrameEnergy(media, 128).orderBy("frame_no").collect()
    assert(frames.length == 3, "128 + 128 + 64-sample partial frame")
    assert(frames(0).getDouble(3) == 1000.0, "RMS of a ±1000 square wave is exactly 1000")
    assert(frames(0).getLong(4) == 1000L)
    assert(frames(2).getLong(2) == 64L, "last frame is partial")
    assert(frames(2).getDouble(3) == 0.0)
    assert(frames(2).getLong(4) == 0L)
  }

  test("embedding dedup: kernel form ≡ exploded-dim reference, id conjunct " +
      "short-circuits the dot kernel") {
    val emb = Tables(spark, sf, "embeddings")
    // exploded-dimension reference — the operator's pre-r17 implementation
    // (dim-keyed join + pair-keyed aggregate), kept as the independent
    // exactness baseline: same per-element float→double products, shuffle-
    // order summation vs the kernel's array-order summation, both absorbed
    // by round(·, 6)
    val ex = emb.select(col("vec_id").as("id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), col("x").cast("double").as("x"))
    val norms = ex.groupBy("id").agg(sqrt(sum(col("x") * col("x"))).as("nv"))
    val baseline = ex.select(col("id").as("id_a"), col("dim"), col("x").as("xa"))
      .join(ex.select(col("id").as("id_b"), col("dim"), col("x").as("xb")), Seq("dim"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("xa") * col("xb")).as("dp"))
      .join(norms.select(col("id").as("id_a"), col("nv").as("na")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("nv").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (round(col("dp") / (col("na") * col("nb")), 6) + lit(0.0)).as("cos"))
      .filter(col("cos") >= 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val kernel = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.4)
    val got = kernel.as[(Long, Long, Double)].collect().toSet
    assert(baseline.nonEmpty && got == baseline)
    val physical = kernel.queryExecution.executedPlan.toString
    // the r17 shape: native vecdot kernel scored IN the bounded pair join
    // (no exploded-dim shuffle), with the cheap id inequality ordered BEFORE
    // the kernel in the join condition so the discarded ordered half never
    // evaluates a dot product
    assert(physical.contains("vecdot"), physical.take(2000))
    assert(!physical.contains("posexplode"), physical.take(2000))
    val joinLine = physical.linesIterator
      .find(_.contains("NestedLoopJoin")).getOrElse(
        fail("expected the guarded pair join in: " + physical.take(2000)))
    assert(joinLine.indexOf("vecdot") > joinLine.indexOf(" < "),
      s"id conjunct must precede the kernel: $joinLine")
  }

  test("embedding dedup LSH path: candidates verified, high recall at 0.8") {
    // plant unambiguous near-dups: clones with small perturbations
    val base = Tables(spark, sf, "embeddings").filter(col("vec_id") < 40)
    val clones = base.select((col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
    val corpus = base.select("vec_id", "embedding").unionAll(clones).cache()
    val exact = Dedup.embeddingNearDups(corpus, "vec_id", "embedding", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.embeddingNearDupsLsh(corpus, "vec_id", "embedding", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 40, s"expected planted pairs, got ${exact.size}")
    // verification filters candidates by exact cosine, so approx ⊆ exact
    assert(approx.subsetOf(exact))
    assert(approx.size >= exact.size * 9 / 10,
      s"LSH recall too low: ${approx.size}/${exact.size}")
  }

  test("doc chunking covers every token with the declared overlap") {
    val d = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // multi-chunk
      (2L, "a b c")                                    // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(d, "doc_id", "text", chunkTokens = 32, overlapTokens = 8)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect()
    val doc1 = out.filter(_._1 == 1L)
    // stride 24: starts 0,24,48,72 → 4 chunks; last covers tokens 73..100
    assert(doc1.length == 4)
    assert(doc1.take(3).forall(_._4 == 32) && doc1.last._4 == 28)
    assert(doc1.last._3.endsWith("w100"))
    // consecutive chunks share exactly 8 tokens
    val first = doc1(0)._3.split(" ").toSeq
    val second = doc1(1)._3.split(" ").toSeq
    assert(first.takeRight(8) == second.take(8))
    // short doc yields exactly one whole chunk
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._3 == "a b c" && doc2.head._4 == 3)
  }

  test("corpus pipeline: dedup + gates + split compose end-to-end") {
    import graft.ext.CorpusPipeline
    // plant an exact duplicate and a near-duplicate of doc 1's text
    val base = docs.select("doc_id", "text")
    val d1 = base.filter(col("doc_id") === 1).select(col("text")).collect()(0).getString(0)
    val planted = base.unionAll(Seq(
      (900001L, d1),                                   // exact dup → dropped
      (900002L, d1 + " tiny tail change")              // near dup → dropped at 0.8
    ).toDF("doc_id", "text"))
    val out = CorpusPipeline.prepare(planted, langs = Nil).cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(900001L), "exact duplicate survived")
    assert(!ids.contains(900002L), "near duplicate survived")
    assert(ids.contains(1L), "representative was dropped")
    // split is exhaustive, deterministic, and train-dominated
    val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "eval", "test")))
    assert(bySplit("train") > bySplit.getOrElse("eval", 0L))
    assert(out.columns.contains("lang_id") && out.columns.contains("n_tokens"))
  }

  test("topKPerKey ≡ the rank window under hot keys, ties, and the SQL route") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
    // plant a Zipf-like hot key: 80% of events remapped onto one user —
    // the distribution the aggregate form exists for; ties on value occur
    // naturally in the generator data and resolve on event_id both ways
    val hot = ev.withColumn("user_id",
      when(pmod(col("event_id"), lit(5)) =!= 0, lit(-1L))
        .otherwise(col("user_id")))
    val orderStruct = struct(col("value"), (-col("event_id")).as("nid"),
      col("event_type"))
    for (k <- Seq(1, 2, 3)) {
      val viaAgg = graft.perf.Skew.topKPerKey(hot, Seq("user_id"),
        orderStruct, k)
        .select(col("user_id"), col("rk"), (-col("nid")).as("event_id"),
          col("event_type"), col("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("value"), col("event_id"))
      val viaWin = hot.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("user_id"), col("rk"), col("event_id"),
          col("event_type"), col("value"))
      assert(viaAgg.exceptAll(viaWin).isEmpty &&
        viaWin.exceptAll(viaAgg).isEmpty, s"k=$k diverges from the window")
    }
    // the skew contract is structural: a PARTIAL aggregate must appear in
    // the plan (map-side combine of the bounded heap — without it the hot
    // key still lands whole on one reducer)
    val plan = graft.perf.Skew.topKPerKey(hot, Seq("user_id"), orderStruct, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_struct"),
      s"no partial top_k_struct phase in:\n$plan")
    // SQL route (HanaDialect sessions get it via GraftFunctions.install)
    graft.functions.GraftFunctions.install(spark)
    hot.createOrReplaceTempView("__topk_ev")
    val viaSql = spark.sql("SELECT user_id, top_k_struct(" +
      "struct(value, -event_id, event_type), 2) AS t FROM __topk_ev " +
      "GROUP BY user_id")
    assert(viaSql.count() == hot.select("user_id").distinct().count())
    // a non-orderable struct is refused at analysis, not at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      hot.groupBy(col("user_id"))
        .agg(graft.functions.TopKFunctions.topKStruct(
          struct(map(lit("k"), col("value")).as("m")), 2))
        .collect()
    }
  }

  test("capPerKey keeps exactly the first-k rows per key, all columns intact") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"))
    // hot key planted as in the topKPerKey pin; event_id is unique, so the
    // window form is an exact expectation
    val hot = ev.withColumn("user_id",
      when(pmod(col("event_id"), lit(5)) =!= 0, lit(-1L))
        .otherwise(col("user_id")))
    for (k <- Seq(1, 7)) {
      // "earliest k per user" — the ingest-cap shape (ts, event_id asc)
      val capped = graft.perf.Skew.capPerKey(hot, Seq("user_id"),
        Seq(negate(unix_micros(col("ts"))), negate(col("event_id"))), k)
      assert(capped.columns.toSeq == hot.columns.toSeq,
        "cap must return the original columns unchanged")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val expected = hot.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn")
      assert(capped.exceptAll(expected).isEmpty &&
        expected.exceptAll(capped).isEmpty,
        s"cap k=$k diverges from the earliest-k window form")
    }
    // skew immunity is structural here too: partial heap before the shuffle
    val plan = graft.perf.Skew.capPerKey(hot, Seq("user_id"),
      Seq(negate(col("event_id"))), 3).queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_struct"),
      s"no partial top_k_struct phase in:\n$plan")
  }

  test("prepare with benchmark decontamination ≡ prepare then filter leaked ids") {
    import graft.ext.{CorpusPipeline, Dedup}
    val base = docs.select("doc_id", "text")
    // the benchmark set: docs planted INSIDE the corpus (the leak case) —
    // each eval doc is contained in itself, so it must be dropped, plus
    // any other doc that contains ≥80% of an eval doc's shingles
    val bench = base.filter(pmod(col("doc_id"), lit(7)) === 0)
    val withD = CorpusPipeline.prepare(base, langs = Nil,
      benchmark = Some(bench)).cache()
    val without = CorpusPipeline.prepare(base, langs = Nil).cache()
    // the flag is per-document (|eval ∩ doc| / |eval| on the doc's own
    // shingles), so leaked ids computed over the POST-prepare survivors
    // equal the pipeline's internal (pre-gate) flags restricted to them
    val leaked = Dedup.decontaminate(
      Dedup.hashedShingles(without, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle"),
      Dedup.hashedShingles(bench, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle"), 4, 5)
      .select("train_id").as[Long].collect().toSet
    assert(leaked.nonEmpty, "planted in-corpus benchmark found no leaks")
    val idsWith = withD.select("doc_id").as[Long].collect().toSet
    val idsWithout = without.select("doc_id").as[Long].collect().toSet
    assert(idsWith == idsWithout -- leaked,
      s"composition diverged: extra=${idsWith -- (idsWithout -- leaked)} " +
        s"missing=${(idsWithout -- leaked) -- idsWith}")
    // surviving eval-id docs are gone from every split (the leak case)
    assert(idsWith.forall(id => id % 7 != 0 || !idsWithout.contains(id) ||
      !leaked.contains(id)), "a leaked benchmark doc shipped in a split")
    // non-id columns unchanged for survivors
    val rowsWith = withD.orderBy("doc_id").collect()
    val rowsKept = without.filter(!col("doc_id").isin(leaked.toSeq: _*))
      .orderBy("doc_id").collect()
    assert(rowsWith.sameElements(rowsKept))
  }

  test("split bucketing survives structured ids (strides, shard prefixes)") {
    import graft.ext.CorpusPipeline
    // ids that are all ≡ 0 (mod 100) — a low-residue bucket would put 100%
    // of them in one split; the multiply-shift high-bits bucket must not
    for (stride <- Seq(100L, 1000L, 1L << 20)) {
      val ids = (1L to 400L).map(_ * stride).toDF("id")
      val counts = ids.select(CorpusPipeline.splitColumn(col("id")).as("split"))
        .groupBy("split").count().as[(String, Long)].collect().toMap
      val train = counts.getOrElse("train", 0L)
      assert(train > 300 && train < 390,
        s"stride $stride: train=$train of 400 — split degenerated: $counts")
      assert(counts.getOrElse("eval", 0L) + counts.getOrElse("test", 0L) > 10,
        s"stride $stride: holdout collapsed: $counts")
    }
  }

  test("connected components cluster chains; one representative per cluster") {
    // chain 1-2-3 (1~2, 2~3 but 1≁3) plus a separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: empty pair list yields an empty labeling") {
    // guards the r17 sum-invariant convergence check against the
    // empty-aggregate null (sum over zero rows is NULL, not 0)
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).count() == 0L)
  }

  test("connected components converge on a deep chain (pointer jumping)") {
    // a 60-node path graph (diameter 59): plain hash-min propagation would
    // need 59 rounds — pointer jumping must finish within the default cap
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(comps.length == 60 && comps.forall(_._2 == 1L),
      s"non-min labels: ${comps.filter(_._2 != 1L).take(5).mkString(",")}")
  }

  test("corpus pipeline drops a full near-dup CHAIN down to one representative") {
    import graft.ext.CorpusPipeline
    val base = docs.select("doc_id", "text")
    val d1 = base.filter(col("doc_id") === 1).select(col("text")).collect()(0).getString(0)
    // b is a near-dup of doc 1; c is a near-dup of b (two tail edits away
    // from doc 1 — may or may not pair with 1 directly). Cluster dedup must
    // keep exactly doc 1 from the chain.
    val planted = base.unionAll(Seq(
      (900011L, d1 + " tail x"),
      (900012L, d1 + " tail x y")
    ).toDF("doc_id", "text"))
    val ids = CorpusPipeline.prepare(planted, langs = Nil)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && !ids.contains(900011L) && !ids.contains(900012L))
  }

  test("contamination flags copied eval docs and clears disjoint ones") {
    val train = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // verbatim copy → rate 1
      (101L, "one two three four five six")          // disjoint → rate 0
    ).toDF("doc_id", "text")
    val rows = Dedup.contamination(
        Dedup.shingles(eval_, "doc_id", "text", 3),
        Dedup.shingles(train, "doc_id", "text", 3))
      .as[(Long, Long, Long, Double)].collect()
    val byId = rows.map { case (id, n, c, r) => id -> ((n, c, r)) }.toMap
    assert(byId(100L) == ((4L, 4L, 1.0)))
    assert(byId(101L) == ((4L, 0L, 0.0)))
  }

  test("stratified sampling keeps per-stratum rates, independent of the split") {
    import graft.ext.CorpusPipeline
    val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val kept = CorpusPipeline.stratifiedSample(rows, "lang", "id", Map("en" -> 20))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // en sampled at ~20% of 1000, de kept fully
    assert(kept("de") == 1000L)
    assert(kept("en") > 120 && kept("en") < 280, s"en kept ${kept("en")}")
    // deterministic: the same call yields the same set
    val again = CorpusPipeline.stratifiedSample(rows, "lang", "id", Map("en" -> 20))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == kept)
    // sampling must NOT be the low slice of the train/eval split buckets:
    // the salted sample of en docs should hit all three splits
    val splits = CorpusPipeline.stratifiedSample(rows, "lang", "id", Map("en" -> 20))
      .filter(col("lang") === "en")
      .select(CorpusPipeline.splitColumn(col("id")).as("split"))
      .distinct().as[String].collect().toSet
    assert(splits == Set("train", "eval", "test"), s"sample ⊂ $splits only")
  }

  test("redaction scrubs emails and phones, leaves clean text alone") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "contact jane.doe+x@example.co.uk or +1 (415) 555-0199 today"),
      (2L, "the quick brown fox jumps over 42 lazy dogs"),
      // precision guards: dates, decimals, and digit-bearing email local
      // parts must NOT be phone-matched (emails redact first; the count
      // mirrors the pass order so nothing double-counts)
      (3L, "released 2025-01-15, pi is 3.141592653, build 20250115"),
      (4L, "mail 123456789@corp.com and call 415-555-0199-22 now")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.redact(col("text")).as("r"),
        TextAnalysis.redactionCount(col("text")).as("n"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0)._2 == "contact [EMAIL] or [PHONE] today", out(0)._2)
    assert(out(0)._3 == 2L)
    assert(out(1)._2 == "the quick brown fox jumps over 42 lazy dogs")
    assert(out(1)._3 == 0L)
    assert(out(2)._2 == "released 2025-01-15, pi is 3.141592653, build 20250115",
      out(2)._2)
    assert(out(2)._3 == 0L)
    assert(out(3)._2 == "mail [EMAIL] and call [PHONE] now", out(3)._2)
    assert(out(3)._3 == 2L)
  }

  test("repetition rate flags looping text, clears varied text") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "a b c a b c a b c"),          // 7 grams, 3 distinct → 1 − 3/7
      (2L, "one two three four five six") // all distinct → 0
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id") +: TextAnalysis.repetitionColumns("toks"): _*)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 7L, 3L, 0.571429)))
    assert(out(1) == ((2L, 4L, 4L, 0.0)))
  }

  test("incremental dedup: delta checked against corpus only, no self-join") {
    val corpus = docs.select("doc_id", "text").filter(col("doc_id") <= 400)
    val d1 = corpus.filter(col("doc_id") === 1).select("text").collect()(0).getString(0)
    val delta = Seq(
      (900021L, d1),                      // exact copy of corpus doc 1
      (900022L, d1 + " small tail edit"), // near-dup of corpus doc 1
      (900023L, "a totally unrelated fresh document about nothing at all")
    ).toDF("doc_id", "text")
    // exact: only the verbatim copy is dropped
    val hashed = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("__h", sha2(encode(col("text"), "UTF-8"), 256))
    val kept = Dedup.incrementalExact(hashed(delta), hashed(corpus), Seq("__h"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(900022L, 900023L))
    // near-dup: copy and edit both pair with corpus doc 1; fresh doc doesn't
    val pairs = Dedup.incrementalMinhashPairs(delta, corpus, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(_._1).toSet == Set(900021L, 900022L), pairs.mkString(","))
    assert(pairs.forall(_._2 == 1L))
  }

  test("sequence packing assigns each doc to the window holding its start") {
    import graft.ext.CorpusPipeline
    // small budget so some docs straddle windows (seq_ids may then skip —
    // the skipped windows hold the middle of a long doc, by contract)
    val budget = 64L
    val packed = CorpusPipeline.packSequences(docs, "doc_id", "text", budget).cache()
    val totalTokens = docs
      .select(sum(size(split(col("text"), " ")).cast("long"))).as[Long].collect()(0)
    assert(packed.select(sum("n_tokens")).as[Long].collect()(0) == totalTokens)
    // deterministic: same packing on a rerun
    val a = packed.select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    val b = CorpusPipeline.packSequences(docs, "doc_id", "text", budget)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(a == b)
    // exact contract: seq_id == floor(start_offset / budget) in shuffle order,
    // recomputed independently on the driver
    val ordered = packed
      .withColumn("k", CorpusPipeline.shuffleKey(col("doc_id")))
      .select("doc_id", "n_tokens", "seq_id", "k")
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._4, r._1))
    var offset = 0L
    ordered.foreach { case (id, n, seqId, _) =>
      assert(seqId == offset / budget, s"doc $id: seq $seqId vs ${offset / budget}")
      offset += n
    }
    assert(ordered.map(_._3).distinct.length > 1)
  }

  test("vocabulary ranks by corpus frequency with monotone coverage") {
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", 1000)
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1)
    assert(v.nonEmpty)
    // tf non-increasing in rank; coverage non-decreasing and ends at 1.0
    assert(v.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
    assert(v.sliding(2).forall { case Array(a, b) => a._5 <= b._5; case _ => true })
    assert(math.abs(v.last._5 - 1.0) < 1e-9, s"full vocab must cover 1.0, got ${v.last._5}")
    // totals reconcile with an independent token count
    val totalTokens = docs.select(sum(size(split(lower(col("text")), " ")).cast("long")))
      .as[Long].collect()(0)
    assert(v.map(_._3).sum == totalTokens)
    // df never exceeds the doc count, tf never below df
    val nDocs = docs.count()
    assert(v.forall(r => r._4 <= nDocs && r._3 >= r._4))
  }

  test("boilerplate shingles are exactly the >=minDocFrac doc-frequency set") {
    val planted = Seq(
      (1L, "shared header line alpha beta"),
      (2L, "shared header line gamma delta"),
      (3L, "shared header line epsilon zeta"),
      (4L, "totally unrelated content here now")).toDF("doc_id", "text")
    val out = Dedup
      .boilerplateShingles(Dedup.shingles(planted, "doc_id", "text", 3), planted, 0.5)
      .as[(String, Long, Double)].collect().toList
    // "shared header line" is in 3/4 docs = 0.75; every other 3-gram in 1/4
    assert(out == List(("shared header line", 3L, 0.75)))
  }

  test("span-dup fraction counts positional shared n-grams per doc") {
    val planted = Seq(
      (1L, "a b c d e"),          // grams: "a b c","b c d","c d e"
      (2L, "a b c x y"),          // shares "a b c" with doc 1
      (3L, "a b c a b c a b"))    // positional: "a b c" twice + 4 unique-to-doc grams
      .toDF("doc_id", "text")
    val out = Dedup.spanDupFraction(planted, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    assert(out == List(
      (1L, 3L, 1L, 0.333333),
      (2L, 3L, 1L, 0.333333),
      // doc 3 grams: abc, bca, cab, abc, bca, cab  — all 6 positions repeat
      // within the doc but only "a b c" (2 positions) is shared ACROSS docs
      (3L, 6L, 2L, 0.333333)))
  }

  test("int8 quantization bounds reconstruction error and preserves dot products") {
    val emb = Tables(spark, sf, "embeddings")
    val qz = Similarity.quantizeInt8(emb, "vec_id", "embedding").cache()
    val checked = qz.select(col("vec_id"), col("scale"),
        expr("array_max(transform(q, v -> abs(v)))").as("max_q"),
        expr("array_max(zip_with(q, xd, (v, x) -> abs(cast(v as double) * scale / 127.0D - x)))")
          .as("max_err"))
      .as[(Long, Double, Long, Double)].collect()
    assert(checked.nonEmpty)
    // quantized values stay in [-127, 127]; error within a half quantization
    // step (scale/254) plus float slack
    assert(checked.forall(_._3 <= 127L))
    assert(checked.forall(r => r._4 <= r._2 / 254.0 + 1e-9),
      "reconstruction error above half a quantization step")
    // dequantized self-dot stays within ~1% of the exact self-dot
    val dots = qz.select(col("vec_id"),
        Similarity.dot(col("xd"), col("xd")).as("exact"),
        Similarity.dot(Similarity.dequantizeInt8(col("q"), col("scale")),
          Similarity.dequantizeInt8(col("q"), col("scale"))).as("approx"))
      .as[(Long, Double, Double)].collect()
    assert(dots.forall { case (_, e, a) => e == 0.0 || math.abs(a - e) / e < 0.01 })
    qz.unpersist()
  }

  test("int8 top-k cosine tracks the exact double kernel") {
    val emb = Tables(spark, sf, "embeddings")
    val qs = emb.filter(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(emb, qs, 3)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val int8 = Similarity.cosineTopKInt8(emb, qs, 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(int8.length == exact.size && int8.nonEmpty)
    // every int8 winner's true cosine is within 0.02 of the exact kernel's
    // k-th best — quantization may swap near-ties but not lose neighbors
    val kthBest = exact.groupBy(_._1._1).map { case (q, m) => q -> m.values.min }
    val trueCos = Similarity.cosineTopK(emb, qs, Int.MaxValue - 1)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    int8.foreach { case (qid, cid, c8, _) =>
      val t = trueCos((qid, cid))
      assert(math.abs(c8 - t) <= 0.02, s"int8 cos $c8 vs true $t for ($qid,$cid)")
      assert(t >= kthBest(qid) - 0.02, s"($qid,$cid) not a near-top-k neighbor")
    }
  }

  test("Misra-Gries sketch is a guaranteed heavy-hitter superset under any partitioning") {
    val d = Tables(spark, sf, "documents")
    val toks = d.select(explode(split(lower(col("text")), " ")).as("term"))
    val total = toks.count()
    val cap = 32
    val exactHH = toks.groupBy("term").count()
      .filter(col("count") * (cap + 1) > total)
      .as[(String, Long)].collect().toMap
    assert(exactHH.nonEmpty, "fixture has no heavy hitters — threshold too high")
    for (parts <- Seq(1, 7, 32)) {
      val sketch = toks.repartition(parts)
        .agg(graft.functions.HashFunctions.misraGries(col("term"), cap).as("mg"))
        .select(explode(col("mg")).as("c"))
        .select(col("c.term"), col("c.cnt"))
        .as[(String, Long)].collect().toMap
      assert(sketch.size <= cap)
      // MG bound: every true heavy hitter survives, with a lower-bound count
      exactHH.foreach { case (term, cnt) =>
        assert(sketch.contains(term), s"heavy hitter '$term' lost at parts=$parts")
        assert(sketch(term) <= cnt, s"sketch count exceeds exact for '$term'")
      }
    }
  }

  test("globalRunningSum matches the single-window form above the sampling-reservoir regime") {
    // 200k rows: far beyond RangePartitioner's reservoir, the regime where
    // the old range-sampled implementation silently diverged between its
    // two plan branches. Deterministic bucketing must match exactly.
    val df = spark.range(200000L).toDF("doc_id")
      .withColumn("w", (pmod(col("doc_id") * 2654435761L, lit(97)) + 1).cast("long"))
    val key = graft.ext.CorpusPipeline.shuffleKey(col("doc_id"))
    val got = graft.ext.CorpusPipeline.globalRunningSum(
        df.withColumn("k", key), col("w"), col("k"), Int.MaxValue,
        Seq(col("doc_id")), "cum")
      .select(col("doc_id"), col("cum"))
    val wRef = org.apache.spark.sql.expressions.Window
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = df.withColumn("k", key)
      .withColumn("cum", sum(col("w")).over(wRef))
      .select(col("doc_id"), col("cum").as("cum_ref"))
    val wrong = got.join(ref, "doc_id")
      .filter(col("cum") =!= col("cum_ref")).count()
    assert(wrong == 0, s"$wrong of 200000 rows diverge from the single-window reference")
  }

  test("globalRunningSumAuto matches the single-window form on a dense key domain") {
    // the Auto variant derives its bucket width from max(key) in-plan; keys
    // here are dense 0..9999 with skewed weights — the shape q_vocab_growth
    // feeds it (per-bucket aggregates, one row per key)
    val df = spark.range(10000L).toDF("bucket")
      .withColumn("w", (pmod(col("bucket") * 31L, lit(13)) + 1).cast("long"))
    val got = graft.ext.CorpusPipeline.globalRunningSumAuto(
        df, col("w"), col("bucket"), Seq.empty, "cum")
      .select(col("bucket"), col("cum"))
    val wRef = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = df.withColumn("cum_ref", sum(col("w")).over(wRef))
      .select(col("bucket"), col("cum_ref"))
    val wrong = got.join(ref, "bucket")
      .filter(col("cum") =!= col("cum_ref")).count()
    assert(wrong == 0, s"$wrong of 10000 rows diverge from the single-window reference")
    // chaining two Auto calls must not collide on internal columns
    val twice = graft.ext.CorpusPipeline.globalRunningSumAuto(
      got, col("cum"), col("bucket"), Seq.empty, "cum2")
    assert(twice.count() == 10000L)
  }

  test("exact dedup keeps the deterministic winner") {
    val df = Seq((3L, "k1"), (1L, "k1"), (2L, "k2")).toDF("id", "key")
    val out = Dedup.exact(df, Seq("key"), "id").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "k1"), (2L, "k2")))
  }

  test("prefix-filtered set-similarity join equals the naive self-join exactly") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val naive = Dedup.jaccardPairs(sh, 0.8)
      .select("id_a", "id_b", "common").as[(Long, Long, Long)].collect().toSet
    val prefix = Dedup.jaccardPairsPrefix(sh, 4, 5)
      .select("id_a", "id_b", "common").as[(Long, Long, Long)].collect().toSet
    assert(naive.nonEmpty, "corpus should contain planted near-dups")
    assert(prefix == naive)
    // the routed faces run on HASHED shingles (8-byte shuffle keys) — same
    // pairs and commons as the string relation on this corpus (collisions
    // ~n²/2⁶⁵; a collision here would fail this assert)
    val hashed = Dedup.hashedShingles(docs, "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle")
    val prefixHashed = Dedup.jaccardPairsPrefix(hashed, 4, 5)
      .select("id_a", "id_b", "common").as[(Long, Long, Long)].collect().toSet
    assert(prefixHashed == naive, "hashed-shingle prefix join diverged")
  }

  test("stop-set df split is a pure plan transform: every prefix operator bit-identical with any stop set") {
    // round-14 task 5 exactness proof: routing df-saturated shingles
    // around the shuffled df join (broadcast split) may change the PLAN
    // only — rows, positions, candidates, and scores must be identical for
    // ANY stop set, including adversarial ones whose shingles sit inside
    // doc prefixes (docs made ENTIRELY of boilerplate)
    def collectSet(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // template-spam corpus + pure-boilerplate docs (prefixes reach into
    // the hot set) + normal docs
    val boiler = "terms and conditions apply all rights reserved contact us for details"
    val spam = (1 to 120).map { i =>
      if (i % 10 == 0) (i.toLong, (0 until 25).map(w => s"d${i}w$w").mkString(" "))
      else if (i % 10 == 1) (i.toLong, boiler) // PURE boilerplate
      else (i.toLong, s"$boiler item$i ref${i % 7}")
    }.toDF("doc_id", "text")
    val sh = Dedup.hashedShingles(spam, "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle").cache()
    try {
      // the saturated set (df >= 50% of docs) and an ARBITRARY set (top-2
      // by df plus two rare ones) — exactness must not depend on the
      // bound's semantics
      val saturated = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 60)
      assert(saturated.count() > 0, "spam corpus must saturate shingles")
      val arbitrary = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle")).limit(2)
        .unionByName(sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .orderBy(col("df").asc, col("shingle")).limit(2))
      for (stop <- Seq(saturated, arbitrary)) {
        assert(collectSet(Dedup.containmentPairs(sh, 4, 5, minShingles = 5,
            stop = Some(stop))) ==
          collectSet(Dedup.containmentPairs(sh, 4, 5, minShingles = 5)),
          "containmentPairs diverged under the df split")
        assert(collectSet(Dedup.jaccardPairsPrefix(sh, 4, 5,
            stop = Some(stop))) ==
          collectSet(Dedup.jaccardPairsPrefix(sh, 4, 5)),
          "jaccardPairsPrefix diverged under the df split")
        val evalSh = sh.filter(col("doc_id") % 10 === 2)
        val trainSh = sh.filter(col("doc_id") % 10 =!= 2)
        assert(collectSet(Dedup.decontaminate(trainSh, evalSh, 4, 5,
            minShingles = 5, stop = Some(stop))) ==
          collectSet(Dedup.decontaminate(trainSh, evalSh, 4, 5,
            minShingles = 5)),
          "decontaminate diverged under the df split")
      }
    } finally { sh.unpersist(); () }
  }

  test("symspell delete-neighborhood join finds every levenshtein<=2 pair") {
    val terms = docs
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term").rlike("^[a-z]{3,12}$"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .cache()
    val got = graft.ext.FuzzyMatch.typoPairs(terms)
      .select("term_a", "term_b").as[(String, String)].collect().toSet
    val vocab = terms.select("term").as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 2
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "vocabulary should contain close pairs")
    assert(got == brute)
  }

  test("containment pairs catch a planted subset doc that jaccard misses") {
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docsDf = Seq(
      (1L, body), // fully contained in 2
      (2L, body + " " + (100 to 160).map(i => s"pad$i").mkString(" ")),
      (3L, (200 to 240).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(docsDf, "doc_id", "text", 3)
    val cont = Dedup.containmentPairs(sh, 4, 5, minShingles = 10)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(cont.contains((1L, 2L)) && cont((1L, 2L)) == 1.0,
      s"planted containment missing: $cont")
    assert(!cont.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // the symmetric jaccard of the planted pair is far below threshold
    val jac = Dedup.jaccardPairs(sh, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("decontaminate finds planted eval leaks, exactly the cross-join answer") {
    // real corpus split eval/train + a planted LEAK: an eval doc fully
    // contained in a train doc, plus a boundary and a disjoint control
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val planted = Seq(
      (7000007L, body), // eval (id % 7 == 0), fully inside the train doc
      (7000008L, body + " " + (100 to 160).map(i => s"pad$i").mkString(" ")),
      (7000014L, (200 to 240).map(i => s"other$i").mkString(" ")) // eval, disjoint
    ).toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").unionByName(planted)
    val sh = Dedup.hashedShingles(corpus, "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle").cache()
    try {
      val evalSh = sh.filter(pmod(col("doc_id"), lit(7)) === 0)
      val trainSh = sh.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val got = Dedup.decontaminate(trainSh, evalSh, 4, 5, minShingles = 10)
        .select("eval_id", "train_id", "common")
        .as[(Long, Long, Long)].collect().toSet
      // brute-force cross-relation answer — the exactness oracle for the
      // prefix/positional/size candidate pruning
      val ce = evalSh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val naive = evalSh.select(col("doc_id").as("eval_id"), col("shingle"))
        .join(trainSh.select(col("doc_id").as("train_id"), col("shingle")),
          Seq("shingle"))
        .groupBy("eval_id", "train_id").agg(count(lit(1)).as("common"))
        .join(ce.select(col("doc_id").as("eval_id"), col("n")), Seq("eval_id"))
        .filter(col("n") >= 10)
        .filter(round(col("common") / col("n"), 6) >= 0.8)
        .select("eval_id", "train_id", "common")
        .as[(Long, Long, Long)].collect().toSet
      assert(naive.nonEmpty, "exactness pin needs qualifying leaks")
      assert(got == naive)
      // the planted full leak is flagged; the disjoint control is not
      assert(got.exists { case (e, t, _) => e == 7000007L && t == 7000008L })
      assert(!got.exists(_._1 == 7000014L))
    } finally sh.unpersist()
  }

  test("containment positional/size bounds are exact vs the unfiltered join") {
    // real corpus + planted positives (full subset, partial overlap at the
    // 0.8 boundary, disjoint) so the exactness pin exercises hits AND misses
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val planted = Seq(
      (9000001L, body),
      (9000002L, body + " " + (100 to 160).map(i => s"pad$i").mkString(" ")),
      (9000003L, (1 to 33).map(i => s"tok$i").mkString(" ") + " " +
        (300 to 310).map(i => s"edge$i").mkString(" ")),
      (9000004L, (200 to 240).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").unionByName(planted)
    val sh = Dedup.shingles(corpus, "doc_id", "text", 3).cache()
    try {
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val naive = sh.select(col("doc_id").as("id_a"), col("shingle"))
        .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
        .filter(col("id_a") =!= col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
        .join(counts.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
        .filter(col("na") >= 10)
        .filter(round(col("common") / col("na"), 6) >= 0.8)
        .select("id_a", "id_b", "common")
        .as[(Long, Long, Long)].collect().toSet
      val got = Dedup.containmentPairs(sh, 4, 5, minShingles = 10)
        .select("id_a", "id_b", "common")
        .as[(Long, Long, Long)].collect().toSet
      assert(naive.nonEmpty, "exactness pin needs qualifying pairs")
      assert(got == naive)
      // the routed face runs on HASHED shingles (8-byte shuffle keys) —
      // same pairs and commons as the string relation on this corpus
      // (collisions ~n²/2⁶⁵; a collision here would fail this assert)
      val hashed = Dedup.hashedShingles(corpus, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle")
      val gotHashed = Dedup.containmentPairs(hashed, 4, 5, minShingles = 10)
        .select("id_a", "id_b", "common")
        .as[(Long, Long, Long)].collect().toSet
      assert(gotHashed == naive, "hashed-shingle containment diverged")
    } finally sh.unpersist()
  }

  test("jsonl ingest quarantines malformed lines without losing them") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    val lines = Seq(
      """{"doc_id": 1, "text": "good one"}""",
      """{"doc_id": 2, "text": "also good"}""",
      """{"doc_id": 3 "text": "missing comma"}""",
      """not json at all""",
      """{"doc_id": 4, "text": "fine again"}""")
    java.nio.file.Files.write(dir.resolve("batch.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val batch =
      graft.ext.Ingest.jsonlWithQuarantine(spark, dir.toString, schema)
    try {
      assert(batch.clean.count() == 3)
      assert(batch.clean.select("doc_id").as[Long].collect().sorted.toList ==
        List(1L, 2L, 4L))
      val bad = batch.quarantined.as[String].collect()
      assert(bad.length == 2)
      assert(bad.exists(_.contains("missing comma")) &&
        bad.exists(_.contains("not json")))
    } finally batch.release()
  }

  test("bloom prefilter: no false negatives, equals plain anti-join") {
    import graft.ext.Bloom
    val corpus = spark.range(0, 5000).toDF("id")
      .select(concat(lit("doc-"), col("id")).as("key"))
    val delta = spark.range(4000, 12000).toDF("id")
      .select(concat(lit("doc-"), col("id")).as("key"))
    val bs = Bloom.build(corpus, col("key"))
    // every corpus key must probe true (no false negatives)
    val missed = corpus.filter(!Bloom.mightContain(bs)(col("key"))).count()
    assert(missed == 0, s"$missed corpus keys rejected by their own filter")
    // incremental dedup equals the plain anti-join exactly
    val got = Bloom.incrementalExact(delta, corpus, Seq("key"))
      .as[String].collect().toSet
    val want = delta.join(corpus, Seq("key"), "left_anti")
      .as[String].collect().toSet
    assert(got == want)
    // the prefilter must actually reject most genuinely-new keys — the
    // auto-sized filter (bits ∝ corpus count at fpp 0.01) must NOT be
    // saturated, which the old fixed-2^17-bit form silently was at scale
    val rejected = delta.filter(!Bloom.mightContain(bs)(col("key"))).count()
    assert(rejected > 6800, s"only $rejected of 7000 new keys skipped the join")
  }

  test("native kernels are SQL-callable and match the column API") {
    graft.functions.GraftFunctions.install(spark)
    val df = Seq((7L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("id", "text")
    df.createOrReplaceTempView("gf_docs")
    val sqlRow = spark.sql("""SELECT simhash64(split(text, ' ')) AS sh,
        rolling_minhash64(text, 16) AS fp,
        mulshift_bucket(id, 2654435761L, 33, 100) AS b
      FROM gf_docs""").collect()(0)
    val apiRow = df.select(
      HashFunctions.simhash(split(col("text"), " ")).as("sh"),
      HashFunctions.fingerprint(col("text"), 16).as("fp"),
      HashFunctions.mulShiftBucket(col("id"), 2654435761L, 33, 100).as("b"))
      .collect()(0)
    assert(sqlRow == apiRow)

    val sh = Dedup.shingles(docs.limit(50), "doc_id", "text", 3)
    sh.createOrReplaceTempView("gf_sh")
    val sqlSig = spark.sql(
      "SELECT doc_id, minhash_sig(xxhash64(shingle), 16) AS sig " +
        "FROM gf_sh GROUP BY doc_id")
      .as[(Long, Seq[Long])].collect().toMap
    val apiSig = sh.groupBy("doc_id")
      .agg(HashFunctions.minhashSig(xxhash64(col("shingle")), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sqlSig.nonEmpty && sqlSig == apiSig)
  }

  test("scaled-integer pagerank conserves mass and is deterministic") {
    // star graph: everything points at 'hub', hub points at 'a'
    val edges = Seq(("a", "hub", 3L), ("b", "hub", 1L), ("c", "hub", 2L),
      ("hub", "a", 4L)).toDF("src", "dst", "w")
    val r1 = graft.ext.GraphOps.pageRankScaled(edges, iters = 10)
      .as[(String, Long)].collect().toMap
    val r2 = graft.ext.GraphOps.pageRankScaled(edges, iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r1 == r2, "two runs must be bit-identical")
    // total mass stays ~1.0 (floor divisions each lose <1e-12 per node/iter)
    val total = r1.values.sum
    assert(math.abs(total - graft.ext.GraphOps.RankScale) < 1000000L,
      s"mass drifted: $total")
    // the hub receives mass from three nodes and must outrank the leaves
    assert(r1("hub") > r1("b") && r1("hub") > r1("c"))
  }

  test("triangleCount matches brute force on a hub-skewed planted graph") {
    // K5 on {0..4} (10 triangles) + a 30-leaf hub (node 0) contributing no
    // triangles but a deg-32 celebrity — exercises the degree-ordered
    // orientation + bloom prefilter + exact closing semi-join end to end
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val star = (10L to 39L).map(l => (0L, l))
    val edges = (k5 ++ star).toDF("u", "v")
    val got = graft.ext.GraphOps.triangleCount(edges)
      .as[Long].collect().head
    val ids = (k5 ++ star).flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val es = (k5 ++ star).toSet
    def adj(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
    val brute = (for {
      a <- ids; b <- ids if a < b && adj(a, b)
      c <- ids if b < c && adj(b, c) && adj(a, c)
    } yield 1).size
    assert(brute == 10 && got == brute.toLong)
    // empty graph: zero, not an error (bloom sizing clamps to >= 1)
    val none = graft.ext.GraphOps.triangleCount(
      Seq.empty[(Long, Long)].toDF("u", "v")).as[Long].collect().head
    assert(none == 0L)
  }

  test("triangleCount pair-loop hash replicates plan-side xxhash64(struct)") {
    // the mapPartitions wedge loop probes the broadcast bloom with
    // XXH64.hashLong(t, XXH64.hashLong(s, 42)) — this MUST equal the
    // xxhash64(struct(s, t)) the bloom was built over (HashExpression folds
    // struct fields left-to-right with the running hash as seed). A
    // divergence would surface as bloom FALSE NEGATIVES: silently dropped
    // triangles, invisible to anything but this pin and the oracle face.
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val pairs = Seq((3L, 7L), (123456789L, -42L), (0L, 0L),
      (Long.MaxValue, Long.MinValue))
    val planSide = pairs.toDF("s", "t")
      .select(xxhash64(struct(col("s"), col("t"))))
      .as[Long].collect().toSeq
    val loopSide = pairs.map { case (s, t) =>
      XXH64.hashLong(t, XXH64.hashLong(s, 42L)) }
    assert(planSide == loopSide)
  }

  test("triangleCount matches brute force on a seeded dense random graph") {
    // denser than the planted fixture: every orientation/tie/bloom branch
    // gets exercised, and the count is compared against the O(n^3) brute
    // force — catches wedge-enumeration mistakes (missed or double pairs)
    // the sparse fixture can't
    val rnd = new scala.util.Random(1310)
    val n = 60
    val es = (for { a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.2 } yield (a.toLong, b.toLong)).toVector
    val got = graft.ext.GraphOps.triangleCount(es.toDF("u", "v"))
      .as[Long].collect().head
    val set = es.toSet
    val brute = (for { a <- 0 until n; b <- (a + 1) until n
      if set((a.toLong, b.toLong)); c <- (b + 1) until n
      if set((b.toLong, c.toLong)) && set((a.toLong, c.toLong)) } yield 1).size
    assert(got == brute.toLong && brute > 100,
      s"got $got, brute $brute") // brute > 100 guards a degenerate fixture
  }

  test("ivfAssign: degenerate vectors land in the lowest cell, never dropped") {
    val cents = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("cell", "centroid")
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f)),          // clearly cell 1
      (11L, Seq(0.0f, 0.0f)),          // zero-norm: cosine NaN everywhere
      (12L, Seq.empty[Float]))         // empty embedding
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfAssign(corpus, cents)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(out.size == 3, "no row may be silently dropped")
    assert(out(10L) == 1L)
    assert(out(11L) == 1L && out(12L) == 1L,
      "degenerate rows must map deterministically to the lowest cell")
    // empty centroid set fails fast with a clear message, not analysis noise
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfAssign(corpus, cents.filter(col("cell") < 0))
    }
    assert(err.getMessage.contains("empty centroid set"))
  }

  test("ivfAssign/pqEncode broadcast-join fallback is identical to inline") {
    val emb = Tables(spark, sf, "embeddings")
    val cents = Similarity.ivfRefine(emb, Similarity.ivfCentroids(emb, 8))
    val inline = Similarity.ivfAssign(emb, cents)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val joined = Similarity.ivfAssign(emb, cents, inlineCeiling = 0)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(inline == joined,
      "over-ceiling join fallback must reproduce the inline assignment")
    val books = Similarity.pqCodebooks(emb)
    val ci = Similarity.pqEncode(emb, books)
      .select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
    val cj = Similarity.pqEncode(emb, books, inlineCeiling = 0)
      .select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
    assert(ci == cj,
      "over-ceiling join fallback must reproduce the inline encoding")
  }

  test("events stream starts on an empty directory (declared-schema fallback)") {
    val dir = java.nio.file.Files.createTempDirectory("empty-stream").toString
    val stream = graft.streaming.EventsStream.read(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}

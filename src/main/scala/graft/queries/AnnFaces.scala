package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{AnnIndex, Similarity}

/** Persisted-ANN-index faces (round-8 judge task 1): build an index ONCE,
  * write its artifacts to parquet, read them back, and search — pinned
  * BIT-IDENTICAL to the in-memory build-and-search of the same corpus. This
  * is the 100 TB deployment shape (build once / search many); the in-memory
  * `q_embed_ann_*` faces remain the quality (hit-rate) surface.
  *
  * Each face emits per-query (or one-row) comparison booleans; the DuckDB
  * oracle asserts the exact expected shape (TRUE everywhere), so a
  * hash-green row certifies the persisted path end-to-end: train → write →
  * read → search ≡ train → search.
  *
  * The index write is an index-build side effect into a fresh temp dir per
  * run (same contract as the q_csv/jsonl_roundtrip faces).
  */
object AnnFaces {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Per-qid comparison of two top-k results expected to be bit-identical:
    * full-outer join on (qid, rk), every row must agree on (cid, score). */
  private def compareTopK(mem: DataFrame, per: DataFrame,
      scoreCol: String): DataFrame = {
    val m = mem.select(col("qid"), col("rk"), col("cid").as("m_cid"),
      col(scoreCol).as("m_s"))
    val p = per.select(col("qid"), col("rk"), col("cid").as("p_cid"),
      col(scoreCol).as("p_s"))
    // null-SAFE comparison (<=> plus explicit non-null): Spark's bool_and
    // SKIPS null inputs, so with plain `=` a rank present on only one side
    // (null columns from the full-outer join) would be silently ignored
    // and a divergent result still reported identical
    m.join(p, Seq("qid", "rk"), "full_outer")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr(
          """bool_and(m_cid IS NOT NULL AND p_cid IS NOT NULL
            |AND m_cid <=> p_cid AND m_s <=> p_s)""".stripMargin),
          lit(false)).as("identical"))
      .orderBy(col("qid"))
  }

  /** Test seam for the comparator's null-safety (AnnIndexSpec regression). */
  private[graft] def compareTopKForTest(mem: DataFrame, per: DataFrame,
      scoreCol: String): DataFrame = compareTopK(mem, per, scoreCol)

  private def tempIndexDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Materialize the (≤|queries|-row) comparison result, then DELETE the
    * temp index dir. The comparison plan reads the stored index lazily, so
    * the dir must outlive the plan — collecting first lets each face clean
    * up after itself instead of leaking corpus-sized index copies under
    * /tmp on every correctness/bench execution (5+ faces × 4 bench runs per
    * round). The collected rows come back as a 1-partition local frame with
    * the original schema. */
  private def materializeAndClean(cmp: DataFrame, idxDir: String): DataFrame = {
    val rows = cmp.collect()
    graft.perf.Measure.deleteRecursively(idxDir)
    cmp.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), cmp.schema)
  }

  private val AnnOracle =
    """SELECT vec_id AS qid, CAST(3 AS BIGINT) AS n_rows, TRUE AS identical
      FROM embeddings WHERE vec_id < 10 ORDER BY qid"""

  val queries: Seq[Q] = Seq(
    // ── IVF: persist centroids + cell-partitioned vectors, search the
    //    stored index, pin ≡ in-memory (same params as q_embed_ann_ivf) ────
    Q(
      "q_ann_ivf_persist",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-ivf")
        val (cents, indexed) = AnnIndex.buildIvf(e, nCells = 16, refineIters = 2)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        materializeAndClean(compareTopK(
          Similarity.ivfSearch(cents, indexed, q, 3, nprobe = 4),
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = 4), "cos"), idx)
      },
      Some(AnnOracle)),

    // ── sign-LSH: persist the bucketed key table (partitioned by tbl,
    //    bucket-sorted files — searches prune via partition filter +
    //    row-group stats), search stored, pin ≡ in-memory (same params as
    //    q_embed_ann_lsh) ─────────────────────────────────────────────────
    Q(
      "q_ann_lsh_persist",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-lsh")
        val (keys, vectors) = AnnIndex.buildLsh(e, planes = 5, tables = 12)
        AnnIndex.writeLsh(idx, keys, vectors, planes = 5, dims = 64, tables = 12)
        materializeAndClean(compareTopK(
          Similarity.lshSearch(keys, vectors, q, 3, planes = 5, dims = 64,
            tables = 12),
          AnnIndex.searchLsh(s, idx, q, 3), "cos"), idx)
      },
      Some(AnnOracle)),

    // ── PQ: persist codebooks + codes, search stored, pin ≡ in-memory
    //    (same params as q_embed_ann_pq) ────────────────────────────────────
    Q(
      "q_ann_pq_persist",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-pq")
        val (books, codes) = AnnIndex.buildPq(e, kCodes = 64, refineIters = 2)
        AnnIndex.writePq(idx, books, codes, m = 8, kCodes = 64, dims = 64)
        materializeAndClean(compareTopK(
          Similarity.pqSearch(books, codes, q, 3, m = 8, dims = 64),
          AnnIndex.searchPq(s, idx, q, 3), "adist"), idx)
      },
      Some(AnnOracle)),

    // ── IVF+PQ hybrid: persist all three artifact sets, search stored,
    //    pin ≡ in-memory (same params as q_embed_ann_ivfpq) ─────────────────
    Q(
      "q_ann_ivfpq_persist",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-ivfpq")
        val (cents, books, codes) =
          AnnIndex.buildIvfPq(e, kCodes = 64, refineIters = 2)
        AnnIndex.writeIvfPq(idx, cents, books, codes,
          nCells = 16, m = 8, kCodes = 64, dims = 64)
        materializeAndClean(compareTopK(
          Similarity.ivfpqSearch(cents, books, codes, q, 3, nprobe = 8,
            m = 8, dims = 64),
          AnnIndex.searchIvfPq(s, idx, q, 3, nprobe = 8), "adist"), idx)
      },
      Some(AnnOracle)),

    // ── incremental maintenance: build+persist on 3/4 of the corpus,
    //    APPEND the remaining 1/4 encoded with the FROZEN artifacts (no
    //    retrain), then pin (a) the appended code set ≡ a one-shot frozen
    //    encode of the full corpus, per vec_id, and (b) search over the
    //    appended index ≡ the in-memory search tail over those codes ────────
    Q(
      "q_ann_ivfpq_append",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
        val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-append")
        val (cents, books, baseCodes) =
          AnnIndex.buildIvfPq(base, kCodes = 64, refineIters = 2)
        AnnIndex.writeIvfPq(idx, cents, books, baseCodes,
          nCells = 16, m = 8, kCodes = 64, dims = 64)
        AnnIndex.appendIvfPq(s, idx, delta)
        // one-shot frozen encode of the union — what append must equal
        val unionCodes = Similarity.pqEncode(e, books, m = 8, dims = 64)
          .join(Similarity.ivfAssign(e, cents).select(col("vec_id"), col("cell")),
            Seq("vec_id"))
        val (_, _, storedCodes) = AnnIndex.readIvfPq(s, idx)
        val codeCmp = storedCodes
          .select(col("vec_id"), col("codes").as("a_codes"), col("cell").as("a_cell"))
          .join(unionCodes.select(col("vec_id"), col("codes").as("b_codes"),
            col("cell").as("b_cell")), Seq("vec_id"), "full_outer")
          .agg(count(lit(1)).as("n_codes"),
            // null-safe for the same bool_and-skips-nulls reason as
            // compareTopK: a vec_id present on only one side must flip
            // the boolean, not vanish from the aggregate
            coalesce(expr(
              """bool_and(a_codes IS NOT NULL AND b_codes IS NOT NULL
                |AND a_codes <=> b_codes AND a_cell <=> b_cell)""".stripMargin),
              lit(false)).as("codes_identical"))
        val searchCmp = compareTopK(
          Similarity.ivfpqSearch(cents, books, unionCodes, q, 3, nprobe = 8,
            m = 8, dims = 64),
          AnnIndex.searchIvfPq(s, idx, q, 3, nprobe = 8), "adist")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("search_identical"))
        materializeAndClean(codeCmp.crossJoin(broadcast(searchCmp)), idx)
      },
      Some("""SELECT COUNT(*) AS n_codes, TRUE AS codes_identical,
          CAST(30 AS BIGINT) AS n_search_rows, TRUE AS search_identical
        FROM embeddings""")),

    // ── LSH append lifecycle (round-9 judge task 3): build+persist on 3/4
    //    of the corpus, APPEND the remaining 1/4 keyed with the FROZEN
    //    stored geometry (the hyperplanes are deterministic from
    //    (planes, dims, tables), so "frozen" holds by construction), then
    //    pin (a) the stored key table ≡ a one-shot keying of the union, per
    //    (vec_id, tbl) — each vector lands in exactly one bucket per table
    //    — and (b) search over the appended index ≡ the in-memory search
    //    over the union ─────────────────────────────────────────────────────
    Q(
      "q_ann_lsh_append",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
        val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-lsh-append")
        val (baseKeys, baseVecs) = AnnIndex.buildLsh(base, planes = 5, tables = 12)
        AnnIndex.writeLsh(idx, baseKeys, baseVecs, planes = 5, dims = 64,
          tables = 12)
        AnnIndex.appendLsh(s, idx, delta)
        // one-shot keying of the union — what append must equal
        val (unionKeys, unionVecs) = AnnIndex.buildLsh(e, planes = 5, tables = 12)
        val (storedKeys, _) = AnnIndex.readLsh(s, idx)
        val keyCmp = storedKeys
          .select(col("vec_id"), col("tbl"), col("bucket").as("a_bucket"))
          .join(unionKeys.select(col("vec_id"), col("tbl"),
            col("bucket").as("b_bucket")), Seq("vec_id", "tbl"), "full_outer")
          .agg(count(lit(1)).as("n_keys"),
            // null-safe (bool_and SKIPS nulls): a (vec_id, tbl) present on
            // only one side must flip the boolean, not vanish
            coalesce(expr(
              """bool_and(a_bucket IS NOT NULL AND b_bucket IS NOT NULL
                |AND a_bucket <=> b_bucket)""".stripMargin),
              lit(false)).as("keys_identical"))
        val searchCmp = compareTopK(
          Similarity.lshSearch(unionKeys, unionVecs, q, 3, planes = 5,
            dims = 64, tables = 12),
          AnnIndex.searchLsh(s, idx, q, 3), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("search_identical"))
        materializeAndClean(keyCmp.crossJoin(broadcast(searchCmp)), idx)
      },
      Some("""SELECT CAST(COUNT(*) * 12 AS BIGINT) AS n_keys,
          TRUE AS keys_identical,
          CAST(30 AS BIGINT) AS n_search_rows, TRUE AS search_identical
        FROM embeddings""")),

    // ── IVF append lifecycle (round-9 judge task 3): build+persist on 3/4,
    //    APPEND the remaining 1/4 assigned to the FROZEN stored centroids
    //    (no retrain), then pin (a) the stored vector table ≡ a
    //    frozen-centroid assignment of the union, per vec_id (cell AND
    //    embedding — parquet roundtrips the float array exactly), and
    //    (b) search over the appended index ≡ the in-memory search over the
    //    union assignment ───────────────────────────────────────────────────
    Q(
      "q_ann_ivf_append",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
        val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-ivf-append")
        val (cents, baseIndexed) = AnnIndex.buildIvf(base, nCells = 16,
          refineIters = 2)
        AnnIndex.writeIvf(idx, cents, baseIndexed, nCells = 16)
        AnnIndex.appendIvf(s, idx, delta)
        // frozen-centroid assignment of the union — what append must equal
        val unionIndexed = Similarity.ivfAssign(e, cents)
        val (_, storedIndexed) = AnnIndex.readIvf(s, idx)
        val vecCmp = storedIndexed
          .select(col("vec_id"), col("cell").as("a_cell"),
            col("embedding").as("a_emb"))
          .join(unionIndexed.select(col("vec_id"), col("cell").as("b_cell"),
            col("embedding").as("b_emb")), Seq("vec_id"), "full_outer")
          .agg(count(lit(1)).as("n_vecs"),
            coalesce(expr(
              """bool_and(a_cell IS NOT NULL AND b_cell IS NOT NULL
                |AND a_cell <=> b_cell AND a_emb <=> b_emb)""".stripMargin),
              lit(false)).as("vecs_identical"))
        val searchCmp = compareTopK(
          Similarity.ivfSearch(cents, unionIndexed, q, 3, nprobe = 4),
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = 4), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("search_identical"))
        materializeAndClean(vecCmp.crossJoin(broadcast(searchCmp)), idx)
      },
      Some("""SELECT COUNT(*) AS n_vecs, TRUE AS vecs_identical,
          CAST(30 AS BIGINT) AS n_search_rows, TRUE AS search_identical
        FROM embeddings""")),

    // ── compaction lifecycle (round-13 judge task 1): build on 3/4,
    //    append 1/4 (fragmenting the key/vector stores with per-batch
    //    files), COMPACT, then pin (a) search over the compacted index ≡
    //    search over the fragmented one — the rewrite may not add, drop, or
    //    reorder a single candidate — and (b) the artifact file count did
    //    not grow (the whole point of the operator). The pre-compaction
    //    search is collected BEFORE the swap: the compacted index replaces
    //    the very files the lazy plan would read ───────────────────────────
    Q(
      "q_ann_lsh_compact",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
        val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-lsh-compact")
        val (baseKeys, baseVecs) = AnnIndex.buildLsh(base, planes = 5,
          tables = 12)
        AnnIndex.writeLsh(idx, baseKeys, baseVecs, planes = 5, dims = 64,
          tables = 12)
        AnnIndex.appendLsh(s, idx, delta)
        val filesBefore = AnnIndex.fileCounts(s, idx).values.sum
        val beforeDf = AnnIndex.searchLsh(s, idx, q, 3)
        val before = s.createDataFrame(
          java.util.Arrays.asList(beforeDf.collect(): _*), beforeDf.schema)
        AnnIndex.compact(s, idx)
        val filesAfter = AnnIndex.fileCounts(s, idx).values.sum
        val cmp = compareTopK(before, AnnIndex.searchLsh(s, idx, q, 3), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("search_identical"))
          .withColumn("files_nonincreasing",
            lit(filesAfter <= filesBefore && filesAfter > 0))
        materializeAndClean(cmp, idx)
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS search_identical, TRUE AS files_nonincreasing""")),

    // ── deletion lifecycle (round-14 judge task 1): build over the full
    //    corpus, retract a quarter of the vectors, then pin search-after-
    //    delete ≡ an in-memory search over a build of the SURVIVORS — in
    //    BOTH phases: 'pending' (tombstones journaled, searches anti-join
    //    them; collected before the compact swaps the files away) and
    //    'applied' (compaction physically purged keys+vectors). `purged`
    //    additionally pins that no retracted vec_id survives in ANY stored
    //    artifact after the compact — the takedown contract is bytes-gone,
    //    not merely filtered ────────────────────────────────────────────────
    Q(
      "q_ann_lsh_delete",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val dead = e.filter(pmod(col("vec_id"), lit(4)) === 2)
        val survivors = e.filter(pmod(col("vec_id"), lit(4)) =!= 2)
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-lsh-delete")
        val (keys, vecs) = AnnIndex.buildLsh(e, planes = 5, tables = 12)
        AnnIndex.writeLsh(idx, keys, vecs, planes = 5, dims = 64, tables = 12)
        AnnIndex.delete(s, idx, dead.select("vec_id"),
          token = Some("face-delete"))
        // LSH keys are deterministic per vector, so a build over the
        // survivors IS the ground truth a correct deletion must match
        val (sk, sv) = AnnIndex.buildLsh(survivors, planes = 5, tables = 12)
        val memSurv = Similarity.lshSearch(sk, sv, q, 3, planes = 5,
          dims = 64, tables = 12)
        def cmp(name: String) = compareTopK(
          memSurv, AnnIndex.searchLsh(s, idx, q, 3), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as(name))
        val pendDf = cmp("pending_identical")
        val pend = s.createDataFrame(
          java.util.Arrays.asList(pendDf.collect(): _*), pendDf.schema)
        AnnIndex.compact(s, idx)
        val deadIds = dead.select("vec_id")
        val leftovers = Seq("keys.parquet", "vectors.parquet")
          .map(a => s.read.parquet(s"$idx/$a").select("vec_id")
            .join(broadcast(deadIds), Seq("vec_id"), "left_semi").count())
          .sum
        val out = pend.select(col("pending_identical"))
          .crossJoin(broadcast(cmp("applied_identical")
            .select(col("n_search_rows"), col("applied_identical"))))
          .withColumn("purged", lit(leftovers == 0L))
          .select(col("n_search_rows"), col("pending_identical"),
            col("applied_identical"), col("purged"))
        materializeAndClean(out, idx)
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS pending_identical, TRUE AS applied_identical,
          TRUE AS purged""")),

    // ── drift + retrain lifecycle (round 14): appends encode with FROZEN
    //    trained artifacts, so a distribution shift degrades fit until an
    //    explicit retrain — this face plants the shift (a TIGHT novel mode:
    //    a constant offset dominating every dim, the embedding-space shape
    //    of a new domain/model) and pins that (a) the fit journal OBSERVES
    //    it (the appended mass concentrates into one trained cell — the
    //    top-share axis; its mean misfit barely moves on this
    //    weakly-clustered corpus, which is exactly why the trigger is
    //    two-axis), (b) the self-sizing trigger fires on that evidence, and
    //    (c) search after the in-place retrain is BIT-IDENTICAL to a
    //    one-shot build over the union — retraining from the stored raw
    //    vectors loses nothing vs rebuilding from scratch (training is
    //    deterministic end-to-end: hash-ordered sampling, decimal-mean
    //    Lloyd). `journal_reset` pins the post-retrain journal invariant:
    //    one fresh baseline, no stale append rows (driftStats → None) ──────
    Q(
      "q_ann_ivf_retrain",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(4)) =!= 3)
        val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
          .withColumn("embedding",
            expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
        val union = base.unionByName(delta)
        val q = union.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-ivf-retrain")
        val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
          refineIters = 2)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        AnnIndex.appendIvf(s, idx, delta)
        val drifted = AnnIndex.driftStats(s, idx)
          .exists(d => d.appendErr > 1.5 * d.baselineErr || d.topShare > 0.5)
        val retrained = AnnIndex.maybeRetrain(s, idx, refineIters = 2)
        // ground truth: a one-shot build over the union, same geometry
        val (c2, ix2) = AnnIndex.buildIvf(union, nCells = 16, refineIters = 2)
        val cmp = compareTopK(
          Similarity.ivfSearch(c2, ix2, q, 3, nprobe = 4),
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = 4), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("search_identical"))
          .withColumn("drift_observed", lit(drifted))
          .withColumn("retrain_triggered", lit(retrained))
          .withColumn("journal_reset",
            lit(AnnIndex.driftStats(s, idx).isEmpty))
        materializeAndClean(cmp, idx)
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS search_identical, TRUE AS drift_observed,
          TRUE AS retrain_triggered, TRUE AS journal_reset""")),

    // ── recall-aware probe sizing (round 15): the search-time half of the
    //    √n geometry story — one bounded profiling pass (held-out sample ×
    //    brute-force ground truth over the stored corpus) estimates
    //    recall-vs-candidates per nprobe, and autoNprobe picks the
    //    smallest point meeting the stated recall target inside the stated
    //    candidate budget. Pinned: the profile is monotone on both axes,
    //    probing EVERY cell covers every true neighbor (recall proxy
    //    exactly 1 at full probe — the estimator's own sanity bound), the
    //    chosen point respects the budget, and the auto search is
    //    BIT-IDENTICAL to a fixed search at the chosen nprobe ────────────
    Q(
      "q_ann_auto_nprobe",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val idx = tempIndexDir("graft-ann-autoprobe")
        val (cents, indexed) = AnnIndex.buildIvf(e, nCells = 16,
          refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        val profile = AnnIndex.profileProbes(s, idx, k = 10, sampleQ = 128)
        val monotone = profile.sliding(2).forall(p => p.size < 2 ||
          (p(0).recallProxy <= p(1).recallProxy + 1e-12 &&
            p(0).candidatesPerQuery <= p(1).candidatesPerQuery + 1e-9))
        val np = AnnIndex.autoNprobe(s, idx, k = 10, targetRecall = 0.8,
          candidateBudgetFrac = 0.5)
        val budgetOk = profile.find(_.nprobe == np).exists(
          _.candidatesPerQuery <=
            0.5 * profile.last.candidatesPerQuery + 1e-9)
        val q = e.filter(col("vec_id") < 10)
        val (auto, chosen) = AnnIndex.searchIvfAuto(s, idx, q, 3,
          targetRecall = 0.8, candidateBudgetFrac = 0.5)
        val cmp = compareTopK(
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = chosen), auto, "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("auto_equals_fixed"))
          .withColumn("profile_monotone", lit(monotone))
          .withColumn("full_probe_recall_one",
            lit(profile.last.recallProxy == 1.0))
          .withColumn("budget_respected", lit(budgetOk && chosen == np))
        materializeAndClean(cmp, idx)
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS auto_equals_fixed, TRUE AS profile_monotone,
          TRUE AS full_probe_recall_one, TRUE AS budget_respected""")),

    // ── self-maintaining vector ingest (round 15): the streaming step
    //    under the oracle gate — replay batches self-screen to a no-op
    //    (the cell-pruned id anti-join), the drift journal the appends
    //    feed fires the retrain MID-STREAM with no operator in the loop,
    //    and the final self-maintained index answers exactly like a
    //    one-shot build over everything it ingested ───────────────────────
    Q(
      "q_vec_ingest_maintain",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val idx = tempIndexDir("graft-ann-vecingest")
        val base = e.filter(pmod(col("vec_id"), lit(4)) < 2)
          .select(col("vec_id"), col("embedding"))
        val aligned = e.filter(pmod(col("vec_id"), lit(4)) === 2)
          .select(col("vec_id"), col("embedding"))
        val drifted = e.filter(pmod(col("vec_id"), lit(4)) === 3)
          .withColumn("embedding",
            expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
          .select(col("vec_id"), col("embedding"))
        val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
          refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        val step = graft.streaming.VectorsStream.ingestStep(idx,
          autoMaintainFactor = Some(1))
        step(aligned, 0L)
        val afterB1 = s.read.parquet(s"$idx/vectors.parquet").count()
        step(aligned, 0L) // redelivered batch
        val replayNoop =
          s.read.parquet(s"$idx/vectors.parquet").count() == afterB1
        step(drifted, 1L)
        val retrained = s.read.parquet(s"$idx/drift.parquet")
          .select("phase").collect().map(_.getString(0)).toSeq ==
          Seq("retrain")
        val union = base.unionByName(aligned).unionByName(drifted)
        val q = union.filter(col("vec_id") < 10)
        val (c2, ix2) = AnnIndex.buildIvf(union, nCells = 16,
          refineIters = 1)
        val cmp = compareTopK(
          Similarity.ivfSearch(c2, ix2, q, 3, nprobe = 4),
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = 4), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("search_identical"))
          .withColumn("replay_noop", lit(replayNoop))
          .withColumn("retrain_mid_stream", lit(retrained))
        materializeAndClean(cmp, idx)
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS search_identical, TRUE AS replay_noop,
          TRUE AS retrain_mid_stream""")),

    // ── retrain hysteresis (round 16): the sf1 soak retrained on two
    //    consecutive batches of ONE mode — correct but wasteful (a retrain
    //    is hours at 100 TB). The damper: concentration only counts as
    //    drift when the concentrated mass is UNMODELED (its misfit at or
    //    above the baseline's order); mass sitting on its own trained
    //    centroid is a hot partition, not drift. Pinned: the first batch
    //    of a planted mode fires, a post-retrain batch of the SAME mode —
    //    still fully concentrated — does not, and a SECOND distinct mode
    //    fires on its first batch (the property a cooldown cannot give) ───
    Q(
      "q_ann_retrain_hysteresis",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(8)) < 4)
          .select(col("vec_id"), col("embedding"))
        def mode(sel: Int, b: Double) =
          e.filter(pmod(col("vec_id"), lit(8)) === sel)
            .withColumn("embedding",
              expr(s"transform(embedding, x -> cast(0.2 * x + $b as float))"))
            .select(col("vec_id"), col("embedding"))
        val idx = tempIndexDir("graft-ann-hysteresis")
        val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
          refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        AnnIndex.appendIvf(s, idx, mode(4, 3.0))
        val firstFired = AnnIndex.maybeRetrain(s, idx, refineIters = 1)
        AnnIndex.appendIvf(s, idx, mode(5, 3.0))
        val stillConcentrated =
          AnnIndex.driftStats(s, idx).exists(_.recentShare > 0.5)
        val refire = AnnIndex.maybeRetrain(s, idx, refineIters = 1)
        AnnIndex.appendIvf(s, idx, mode(6, -3.0))
        val secondFired = AnnIndex.maybeRetrain(s, idx, refineIters = 1)
        graft.perf.Measure.deleteRecursively(idx)
        Seq((firstFired, stillConcentrated, !refire, secondFired))
          .toDF("first_mode_fired", "modeled_mode_still_concentrated",
            "refire_suppressed", "second_mode_fired")
      },
      Some("""SELECT TRUE AS first_mode_fired,
          TRUE AS modeled_mode_still_concentrated,
          TRUE AS refire_suppressed, TRUE AS second_mode_fired""")),

    // ── deletion-driven drift (round 16): the fit journal is append-driven,
    //    so a mass takedown (one source/mode gutted) used to shift the
    //    stored distribution without firing anything — after compact purges
    //    the bytes, the trained geometry models deleted mass. The compact
    //    now journals the purged rows' cell distribution; maybeRetrain
    //    fires when the departed mass was material AND skewed. Pinned: an
    //    aligned purge journals but never fires; gutting 40% of a modeled
    //    mode fires; the retrain resets the journal ────────────────────────
    Q(
      "q_ann_purge_drift",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(2)) === 0)
          .select(col("vec_id"), col("embedding"))
        val tightMode = e.filter(pmod(col("vec_id"), lit(2)) === 1)
          .withColumn("embedding",
            expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
          .select(col("vec_id"), col("embedding"))
        val idx = tempIndexDir("graft-ann-purgedrift")
        val (cents, indexed) = AnnIndex.buildIvf(base.unionByName(tightMode),
          nCells = 16, refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        AnnIndex.delete(s, idx,
          e.filter(pmod(col("vec_id"), lit(20)) === 0).select("vec_id"),
          token = Some("t-aligned"))
        AnnIndex.compact(s, idx)
        val alignedJournaled =
          AnnIndex.driftStats(s, idx).exists(_.purgedVecs > 0L)
        val alignedFired = AnnIndex.maybeRetrain(s, idx, refineIters = 1)
        AnnIndex.delete(s, idx,
          tightMode.filter(pmod(col("vec_id"), lit(5)) < 2).select("vec_id"),
          token = Some("t-mode"))
        AnnIndex.compact(s, idx)
        val skewed = AnnIndex.driftStats(s, idx)
          .exists(d => d.purgedDepth > 0.3 && d.purgedFrac > 0.1)
        val skewedFired = AnnIndex.maybeRetrain(s, idx, refineIters = 1)
        val journalReset = AnnIndex.driftStats(s, idx).isEmpty
        graft.perf.Measure.deleteRecursively(idx)
        Seq((alignedJournaled, !alignedFired, skewed, skewedFired,
          journalReset))
          .toDF("aligned_purge_journaled", "aligned_never_fires",
            "skewed_purge_observed", "skewed_purge_fires", "journal_reset")
      },
      Some("""SELECT TRUE AS aligned_purge_journaled,
          TRUE AS aligned_never_fires, TRUE AS skewed_purge_observed,
          TRUE AS skewed_purge_fires, TRUE AS journal_reset""")),

    // ── probe-profile staleness (round 16): the recall curve is a trained
    //    artifact, but it also encodes per-cell OCCUPANCY, which frozen-
    //    geometry appends move without any rebuild — a corpus that tripled
    //    via appends must not be served last month's candidates/query.
    //    Pinned: the fresh curve is served, growth past the stale factor
    //    hides it, the maintenance path (maybeCompact) re-anchors it, and
    //    the auto search stays bit-identical to a fixed search at its pick ─
    Q(
      "q_ann_probe_stale",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val base = e.filter(pmod(col("vec_id"), lit(3)) === 0)
        val delta = e.filter(pmod(col("vec_id"), lit(3)) =!= 0)
        val q = e.filter(col("vec_id") < 10)
        val idx = tempIndexDir("graft-ann-probestale")
        val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
          refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        val p0 = AnnIndex.profileProbes(s, idx, k = 3, sampleQ = 64)
        val freshServed = AnnIndex.storedProbeProfile(s, idx, 3).contains(p0)
        AnnIndex.appendIvf(s, idx, delta)
        val staleHidden = AnnIndex.storedProbeProfile(s, idx, 3).isEmpty
        val compacted = AnnIndex.maybeCompact(s, idx, factor = 1)
        val reanchored = AnnIndex.storedProbeProfile(s, idx, 3).isDefined
        val (auto, chosen) = AnnIndex.searchIvfAuto(s, idx, q, 3,
          targetRecall = 0.8, candidateBudgetFrac = 0.5)
        val cmp = compareTopK(
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = chosen), auto, "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("auto_equals_fixed"))
          .withColumn("fresh_served", lit(freshServed))
          .withColumn("stale_hidden", lit(staleHidden))
          .withColumn("maintenance_reanchors", lit(compacted && reanchored))
        materializeAndClean(cmp, idx)
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS auto_equals_fixed, TRUE AS fresh_served,
          TRUE AS stale_hidden, TRUE AS maintenance_reanchors""")),

    // ── generation-pinned search (round 16, verdict task 1 on the ANN
    //    store): compact/retrain used to destroy the prior artifact state,
    //    so a training run pinning its corpus generation could not
    //    reproduce the ANN search that selected it. Maintenance ops now
    //    retire their pre-images into a generation archive; searchIvfAt(g)
    //    resolves each artifact as of that state (copy-on-write), pending
    //    AND retired retractions pass through, and GC'd generations refuse
    //    loudly. Pinned: the gen-0 search is bit-identical to the search
    //    collected before the retrain replaced the geometry — while the
    //    live search has moved — a takedown drops out of the pinned view,
    //    and pinning past the retention window throws ───────────────────
    Q(
      "q_ann_search_at",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val base = e.filter(pmod(col("vec_id"), lit(4)) < 3)
        val drifted = e.filter(pmod(col("vec_id"), lit(4)) === 3)
          .withColumn("embedding",
            expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
        val idx = tempIndexDir("graft-ann-searchat")
        val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
          refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        AnnIndex.appendIvf(s, idx, drifted)
        val endG0Df = AnnIndex.searchIvf(s, idx, q, 3, nprobe = 4)
        val endG0 = s.createDataFrame(
          java.util.Arrays.asList(endG0Df.collect(): _*), endG0Df.schema)
        AnnIndex.retrain(s, idx, refineIters = 1, retainGenerations = Some(2))
        val moved = AnnIndex.searchIvf(s, idx, q, 3, nprobe = 4)
          .collect().map(_.toString).toSet !=
          endG0.collect().map(_.toString).toSet
        // materialize every pinned comparison BEFORE the final compact:
        // its GC deletes the archived files these lazy plans read
        def snap(df: org.apache.spark.sql.DataFrame) = s.createDataFrame(
          java.util.Arrays.asList(df.collect(): _*), df.schema)
        val pinCmp = snap(compareTopK(endG0,
          AnnIndex.searchIvfAt(s, idx, 0, q, 3, nprobe = 4), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("pinned_identical")))
        // a retraction journaled AFTER the freeze still passes through the
        // pinned view: the takedown contract has no historical loophole
        val dead = 4L
        AnnIndex.delete(s, idx,
          e.filter(col("vec_id") === dead).select("vec_id"),
          token = Some("searchat-kill"))
        val memSurv = Similarity.ivfSearch(cents,
          Similarity.ivfAssign(base.unionByName(drifted)
            .filter(col("vec_id") =!= dead), cents), q, 3, nprobe = 4)
        val retractCmp = snap(compareTopK(memSurv,
          AnnIndex.searchIvfAt(s, idx, 0, q, 3, nprobe = 4), "cos")
          .agg(expr("bool_and(identical)").as("retraction_passes_through")))
        // retention 1 on the next maintenance sweeps generation 0
        AnnIndex.compact(s, idx, retainGenerations = Some(1))
        val gcRefused =
          try { AnnIndex.searchIvfAt(s, idx, 0, q, 3, nprobe = 4); false }
          catch { case _: IllegalArgumentException => true }
        val cmp = pinCmp.crossJoin(broadcast(retractCmp))
          .withColumn("live_moved_on", lit(moved))
          .withColumn("gc_refuses", lit(gcRefused))
        materializeAndClean(cmp, idx)
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS pinned_identical, TRUE AS retraction_passes_through,
          TRUE AS live_moved_on, TRUE AS gc_refuses""")),

    // ── pinned-generation probe sizing (round 17, verdict task 3): the
    //    probe profile is a trained artifact, but retrain used to WIPE it
    //    rather than retire it, so a pinned search could only take a fixed
    //    nprobe on faith. Maintenance now archives probe.parquet with the
    //    geometry it describes; autoNprobeAt(gen) re-picks from the
    //    archived curve. Pinned: the pinned pick equals the capture-time
    //    live pick, the pinned auto search is bit-identical to the pinned
    //    fixed search at that pick, the LIVE auto path is unaffected
    //    (re-profiles against the new geometry and stays ≡ fixed at its
    //    own pick), and a generation that was never profiled refuses
    //    rather than serving the wrong geometry's curve ───────────────────
    Q(
      "q_ann_pinned_autoprobe",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        val base = e.filter(pmod(col("vec_id"), lit(4)) < 3)
        val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
          .withColumn("embedding",
            expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
        val idx = tempIndexDir("graft-ann-pinprobe")
        val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
          refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        AnnIndex.profileProbes(s, idx, k = 3, sampleQ = 64)
        val np0 = AnnIndex.autoNprobe(s, idx, k = 3, targetRecall = 0.8,
          candidateBudgetFrac = 0.5)
        AnnIndex.appendIvf(s, idx, delta)
        AnnIndex.retrain(s, idx, refineIters = 1,
          retainGenerations = Some(2)) // archives gen 0: geometry + curve
        val pinnedPick = AnnIndex.autoNprobeAt(s, idx, 0, k = 3,
          targetRecall = 0.8, candidateBudgetFrac = 0.5)
        val (pinnedAuto, chosen) = AnnIndex.searchIvfAutoAt(s, idx, 0, q, 3,
          targetRecall = 0.8, candidateBudgetFrac = 0.5)
        // snap both comparisons BEFORE the second retrain below replaces
        // the files their lazy plans read
        def snap(df: org.apache.spark.sql.DataFrame) = s.createDataFrame(
          java.util.Arrays.asList(df.collect(): _*), df.schema)
        val pinCmp = snap(compareTopK(
          AnnIndex.searchIvfAt(s, idx, 0, q, 3, nprobe = chosen),
          pinnedAuto, "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("pinned_auto_equals_fixed")))
        // live path unaffected: re-profiles against the NEW geometry and
        // stays bit-identical to the fixed search at its own pick
        val (liveAuto, liveNp) = AnnIndex.searchIvfAuto(s, idx, q, 3,
          targetRecall = 0.8, candidateBudgetFrac = 0.5)
        val liveCmp = snap(compareTopK(
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = liveNp), liveAuto, "cos")
          .agg(expr("bool_and(identical)").as("live_auto_equals_fixed")))
        // generation 1 froze at the SECOND retrain below without ever
        // being live-profiled... except the searchIvfAuto above profiled
        // it. Wipe that live curve by retraining again: gen 1's archive
        // then holds geometry + the curve the auto search measured, while
        // querying a k it was never profiled at refuses
        AnnIndex.retrain(s, idx, refineIters = 1)
        val wrongKRefused =
          try { AnnIndex.autoNprobeAt(s, idx, 1, k = 7); false }
          catch { case ex: IllegalArgumentException =>
            ex.getMessage.contains("k=7") }
        // gen 0's pick still resolves after the second retrain (retention
        // 2 keeps both archives)
        val pinStable = AnnIndex.autoNprobeAt(s, idx, 0, k = 3,
          targetRecall = 0.8, candidateBudgetFrac = 0.5) == pinnedPick
        val cmp = materializeAndClean(
          pinCmp.crossJoin(broadcast(liveCmp))
            .withColumn("pinned_pick_matches_capture",
              lit(pinnedPick == np0 && chosen == pinnedPick))
            .withColumn("unprofiled_k_refuses", lit(wrongKRefused))
            .withColumn("pin_stable_across_later_maintenance",
              lit(pinStable)), idx)
        cmp
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS pinned_auto_equals_fixed, TRUE AS live_auto_equals_fixed,
          TRUE AS pinned_pick_matches_capture, TRUE AS unprofiled_k_refuses,
          TRUE AS pin_stable_across_later_maintenance""")),

    // ── probe-cost rebalance (round 17, verdict task 2): the hysteresis
    //    correctly refuses to call a modeled hot mode "drift" (its mass
    //    sits ON its centroid), but the round-16 soak recorded the honest
    //    residue — the forgone rebuild had bought mode re-spreading, and
    //    autoNprobe could report a budget it cannot meet without being
    //    able to trigger the fix. maybeRebalance closes the axis: it fires
    //    a retrain iff no profiled point meets the recall target within
    //    the candidate budget AND one hot cell alone exceeds that whole
    //    budget. Pinned: the grown modeled mode stays drift-silent, the
    //    hot cell provably blocks the budget, the rebalance fires and
    //    DISSOLVES the hot cell (no cell exceeds the budget after), the
    //    result is bit-identical to a one-shot build over the same
    //    corpus, a second call in the same generation epoch is
    //    suppressed, the post-fix trigger declines on the hot-cell guard
    //    itself (convergence, not the epoch marker), and an aligned
    //    corpus never fires ──────────────────────────────────────────────
    Q(
      "q_ann_rebalance",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        def mode(sel: Column) = e.filter(sel)
          .withColumn("embedding",
            expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
        val base = e.filter(pmod(col("vec_id"), lit(8)) < 5)
        val mode1 = mode(pmod(col("vec_id"), lit(8)) === 5)   // modeled: 1/6 of build
        val mode2 = mode(pmod(col("vec_id"), lit(8)) >= 6)    // growth: same mode
        val union = base.unionByName(mode1).unionByName(mode2)
        val idx = tempIndexDir("graft-ann-rebalance")
        val (cents, indexed) = AnnIndex.buildIvf(base.unionByName(mode1),
          nCells = 16, refineIters = 1)
        AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
        AnnIndex.appendIvf(s, idx, mode2)
        // the grown mode is MODELED — the drift trigger must stay silent
        // (the hysteresis contract; this is exactly the state the probe
        // axis exists for)
        val driftSilent = !AnnIndex.maybeRetrain(s, idx, refineIters = 1)
        val (k, target, frac) = (3, 0.8, 0.25)
        val p0 = AnnIndex.profileProbes(s, idx, k = k, sampleQ = 128)
        def met(p: Seq[AnnIndex.ProbePoint]) = {
          val budget = frac * p.last.candidatesPerQuery
          p.exists(x => x.candidatesPerQuery <= budget + 1e-9 &&
            x.recallProxy >= target)
        }
        val (_, total0, mx0, _) = AnnIndex.occupancy(s, idx)
        val hotBlocks = !met(p0) && mx0.toDouble > frac * total0
        val fired = AnnIndex.maybeRebalance(s, idx, k, target, frac,
          sampleQ = 128)
        val refire = AnnIndex.maybeRebalance(s, idx, k, target, frac,
          sampleQ = 128)
        // the rebuild re-spread the mode: no single cell exceeds the
        // candidate budget any more (the blocking condition is GONE, not
        // merely guarded). The candidate-mass economics at scale are the
        // sf1 soak's record (BASELINE.md) — a 500-row corpus compresses
        // them below a robust margin.
        val (_, total1, mx1, _) = AnnIndex.occupancy(s, idx)
        val hotDissolved = mx1.toDouble <= frac * total1
        // convergence, not just the epoch marker: move the generation
        // (compact) and re-evaluate — the trigger now declines on the
        // hot-cell guard itself
        AnnIndex.compact(s, idx)
        val converged = !AnnIndex.maybeRebalance(s, idx, k, target, frac,
          sampleQ = 128)
        // the rebalance retrain keeps the bit-identity contract: search ≡
        // a one-shot build over the same corpus (compared AFTER the
        // convergence compact above — which preserves the row multiset —
        // so the lazy plan reads the final files, not the swapped-away
        // pre-compact ones)
        val (c2, ix2) = AnnIndex.buildIvf(union, nCells = 16,
          refineIters = 1)
        val q = e.filter(col("vec_id") < 10)
        val cmp = compareTopK(
          Similarity.ivfSearch(c2, ix2, q, 3, nprobe = 4),
          AnnIndex.searchIvf(s, idx, q, 3, nprobe = 4), "cos")
          .agg(sum(col("n_rows")).as("n_search_rows"),
            expr("bool_and(identical)").as("search_equals_one_shot"))
        // aligned control: a well-spread index never fires — even when the
        // budget is tight, no single cell exceeds it, so a rebuild of the
        // same spread would buy nothing
        val idx2 = tempIndexDir("graft-ann-rebalance-ctl")
        val (cc, ci) = AnnIndex.buildIvf(base, nCells = 16, refineIters = 1)
        AnnIndex.writeIvf(idx2, cc, ci, nCells = 16)
        val alignedFired = AnnIndex.maybeRebalance(s, idx2, k, target, frac,
          sampleQ = 128)
        graft.perf.Measure.deleteRecursively(idx2)
        val out = materializeAndClean(cmp
          .withColumn("drift_silent", lit(driftSilent))
          .withColumn("hot_cell_blocks_budget", lit(hotBlocks))
          .withColumn("rebalance_fired", lit(fired))
          .withColumn("same_epoch_refire_suppressed", lit(!refire))
          .withColumn("hot_cell_dissolved", lit(hotDissolved))
          .withColumn("converged_not_just_guarded", lit(converged))
          .withColumn("aligned_never_fires", lit(!alignedFired)), idx)
        out
      },
      Some("""SELECT CAST(30 AS BIGINT) AS n_search_rows,
          TRUE AS search_equals_one_shot, TRUE AS drift_silent,
          TRUE AS hot_cell_blocks_budget, TRUE AS rebalance_fired,
          TRUE AS same_epoch_refire_suppressed, TRUE AS hot_cell_dissolved,
          TRUE AS converged_not_just_guarded,
          TRUE AS aligned_never_fires""")))
}

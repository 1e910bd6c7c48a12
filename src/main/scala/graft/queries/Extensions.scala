package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis}

/** LLM-training-data-pipeline operators (north star, beyond the reference
  * surface): deduplication, similarity search, text analysis, multimodal
  * plumbing, event-stream analytics. All operators are DataFrame→DataFrame
  * transformers — no collects, no driver-side state — so they scale by
  * partitioning alone. Non-SQL-expressible ops (MinHash-LSH, SimHash,
  * LSH-ANN, fingerprints) have no oracle entry; their correctness is pinned
  * by ScalaTest against exact baselines instead.
  */
object Extensions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(
    // ── exact deduplication: hash-groupBy keep-first (earliest event per
    //    (user_id, event_type)); one shuffle on the dedup key ─────────────
    Q(
      "q_dedup_exact",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(col("user_id"), col("event_type"))
          .agg(min(col("event_id")).as("first_event_id"),
            count(lit(1)).as("n_dupes"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, MIN(event_id) AS first_event_id,
        COUNT(*) AS n_dupes
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type"""),
      bench = true),

    // ── exact near-dup baseline: word-3-gram Jaccard ≥ 0.8 all-pairs.
    //    The oracle-grade exact computation (MinHash/LSH below approximates
    //    exactly this set) ────────────────────────────────────────────────
    Q(
      "q_dedup_ngram_jaccard",
      (s, dir) => {
        val d = t(s, dir, "documents")
        // guard enabled HERE (not in the library default): this registered
        // face is the sample-scale verifier and must fail fast above 20k docs
        Dedup.jaccardPairs(Dedup.shingles(d, "doc_id", "text", 3), 0.8,
            maxDocs = 20000)
          .select(col("id_a"), col("id_b"), col("common"), col("na"), col("nb"),
            col("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, common, ca.n AS na, cb.n AS nb,
          ROUND(CAST(common AS DOUBLE) / CAST(ca.n + cb.n - common AS DOUBLE), 6) AS jaccard
        FROM pairs JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE ROUND(CAST(common AS DOUBLE) / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.8
        ORDER BY id_a, id_b""")),

    // ── MinHash + banded LSH near-dup (approximate path that scales;
    //    verified candidates only). Oracle: the EXACT all-pairs Jaccard set
    //    at the same threshold — sound because every surviving pair is
    //    verified with exact Jaccard over the full shingle sets (precision
    //    1 by construction), and the 16-band/4-row signature's recall at
    //    J ≥ 0.8 (P[miss] = (1−J⁴)¹⁶ ≤ 0.08% at the threshold, vanishing
    //    above it) makes a missed pair a sub-10⁻³ event per pair — any
    //    recall miss WOULD fail this row, which is exactly what the check
    //    is for. Exactness also pinned vs q_dedup_ngram_jaccard in
    //    ScalaTest ─────────────────────────────────────────────────────────
    Q(
      "q_dedup_minhash_lsh",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.minhashDedup(d, "doc_id", "text", 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          ROUND(CAST(common AS DOUBLE) / CAST(ca.n + cb.n - common AS DOUBLE), 6) AS jaccard
        FROM pairs JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE ROUND(CAST(common AS DOUBLE) / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.8
        ORDER BY id_a, id_b"""),
      bench = true),

    // ── near-dup clustering: connected components over the exact Jaccard
    //    pair list (hash-min label propagation), summarized per cluster.
    //    Production dedup keeps one representative per CLUSTER, not per
    //    pair. Pairs come from the PREFIX-FILTERED exact join (the 100 TB
    //    face — row-identical to the naive self-join, pinned in ScalaTest),
    //    so this query is scale-safe end-to-end. Oracle: recursive-CTE
    //    transitive closure over the same pair set ───────────────────────────
    Q(
      "q_dedup_cluster",
      (s, dir) => {
        val pairs = Dedup.jaccardPairsPrefix(
          graft.ext.ShingleIndex.shinglesFor(s, dir), 4, 5)
        Dedup.connectedComponents(pairs)
          .groupBy(col("comp").as("component"))
          .agg(count(lit(1)).as("n_docs"), max(col("id")).as("max_doc"))
          .orderBy(col("component"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs_j AS (SELECT id_a, id_b FROM pr
          JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
          WHERE ROUND(CAST(common AS DOUBLE) / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.8),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs_j
          UNION SELECT id_b, id_a FROM pairs_j),
        reach AS (SELECT u, v FROM edges
          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u)
        SELECT comp AS component, COUNT(*) AS n_docs, MAX(id) AS max_doc
        FROM comp GROUP BY comp ORDER BY component""")),

    // ── held-out-set contamination: fraction of each held-out (eval AND
    //    test split, bucket ≥ 90) document's 3-gram shingles present
    //    anywhere in the train split (benchmark-leakage screen; split = the
    //    engine's deterministic multiply-shift bucketing). Screening only
    //    one of the two held-out splits would let leakage into the other
    //    ship undetected ────────────────────────────────────────────────────
    Q(
      "q_eval_contamination",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val bucket = graft.ext.CorpusPipeline.splitBucket(col("doc_id"))
        val ids = d.select(col("doc_id"), bucket.as("b"))
        // hashed 64-bit shingles (round 10): the train-side distinct and
        // the semi-join shuffle 8-byte keys instead of shingle strings —
        // the same collision contract as every routed dedup face
        val sh = Dedup.hashedShingles(d, "doc_id", "text", 3)
          .withColumnRenamed("sh", "shingle")
        Dedup.contamination(
            sh.join(ids.filter(col("b") >= 90).select("doc_id"), Seq("doc_id")),
            sh.join(ids.filter(col("b") < 90).select("doc_id"), Seq("doc_id")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        b AS (SELECT doc_id,
            ((CAST(doc_id AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 100 AS bucket
          FROM documents),
        train_sh AS (SELECT DISTINCT shingle FROM sh
          JOIN b USING (doc_id) WHERE bucket < 90),
        eval_sh AS (SELECT sh.doc_id, sh.shingle FROM sh
          JOIN b USING (doc_id) WHERE bucket >= 90),
        tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM eval_sh GROUP BY doc_id),
        hit AS (SELECT doc_id, COUNT(*) AS n_contaminated FROM eval_sh
          WHERE shingle IN (SELECT shingle FROM train_sh) GROUP BY doc_id)
        SELECT t.doc_id, t.n_shingles,
          CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
          ROUND(CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles, 6) AS contamination_rate
        FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id ORDER BY t.doc_id""")),

    // ── SimHash near-dup pairs (custom Catalyst expression + banding).
    //    Oracle: bit-exact replication of the 64-bit FNV-1a/SimHash in
    //    DuckDB (list_reduce over token bytes, HUGEINT mod-2⁶⁴ arithmetic)
    //    over ALL pairs at Hamming ≤ 3 — sound vs the banded Spark plan
    //    because 4×16 banding has guaranteed recall at Hamming ≤ 3
    //    (pigeonhole), so banding loses nothing by construction ─────────────
    Q(
      "q_dedup_simhash",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        // (bit, 2^bit) literals as HUGEINT-parsed values — power()/` ** `
        // would round through DOUBLE at bit 63
        val pow2 = (0 to 63)
          .map(b => s"($b, ${BigInt(2).pow(b)})").mkString(", ")
        s"""WITH tok AS (SELECT doc_id,
            UNNEST(string_split(lower(text), ' ')) AS term
          FROM documents),
        -- FNV-1a(64) per token: h = (h XOR byte) * prime mod 2^64
        th AS (SELECT doc_id, list_reduce(
            list_prepend(CAST(14695981039346656037 AS HUGEINT),
              list_transform(generate_series(1, len(term)),
                i -> CAST(ord(substr(term, i, 1)) AS HUGEINT))),
            (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616
          ) AS h FROM tok),
        pw(b, p) AS (VALUES $pow2),
        -- SimHash votes: each token hash votes +/-1 per bit position
        votes AS (SELECT doc_id, b,
            SUM(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
          FROM th CROSS JOIN pw GROUP BY 1, 2),
        sigu AS (SELECT v.doc_id,
            SUM(CASE WHEN v.v > 0 THEN p ELSE CAST(0 AS HUGEINT) END) AS su
          FROM votes v JOIN pw ON v.b = pw.b GROUP BY 1),
        sig AS (SELECT doc_id, CAST(CASE
            WHEN su >= ${BigInt(2).pow(63)} THEN su - ${BigInt(2).pow(64)}
            ELSE su END AS BIGINT) AS s
          FROM sigu)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= 3
        ORDER BY id_a, id_b"""
      }),

    // ── embedding-cosine near-dup pairs (semantic dedup; 0.4 is the
    //    near-dup band of this synthetic corpus) ────────────────────────────
    Q(
      "q_dedup_embedding",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        // sample-scale verifier (round-8 routing): the exact all-pairs
        // kernel fails fast above 4096 vectors, naming the LSH route — the
        // sf10 rehearsal caught this face running unguarded at 200k vectors
        Dedup.embeddingNearDups(e, "vec_id", "embedding", 0.4,
            maxVectors = 4096)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)),
        nrm AS (SELECT vec_id, SQRT(SUM(x*x)) AS nv FROM ex GROUP BY vec_id),
        dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.x * b.x) AS dot
          FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, ROUND(dot / (na.nv * nb.nv), 6) + 0 AS cos
        FROM dots JOIN nrm na ON id_a = na.vec_id JOIN nrm nb ON id_b = nb.vec_id
        WHERE ROUND(dot / (na.nv * nb.nv), 6) >= 0.4
        ORDER BY id_a, id_b""")),

    // ── exact brute-force cosine top-3 neighbors for query vecs (id<10) ──
    Q(
      "q_embed_knn",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.cosineTopK(e, e.filter(col("vec_id") < 10), 3)
          .orderBy(col("qid"), col("rk"))
      },
      Some("""WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)),
        nrm AS (SELECT vec_id, SQRT(SUM(x*x)) AS nv FROM ex GROUP BY vec_id),
        dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid, SUM(a.x * b.x) AS dot
          FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2)
        SELECT qid, cid, ROUND(dot / (na.nv * nb.nv), 6) + 0 AS cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY ROUND(dot / (na.nv * nb.nv), 6) DESC, cid) AS BIGINT) AS rk
        FROM dots JOIN nrm na ON qid = na.vec_id JOIN nrm nb ON cid = nb.vec_id
        QUALIFY rk <= 3 ORDER BY qid, rk"""),
      bench = true),

    // ── LSH-bucketed approximate ANN (the scale path), emitted as its
    //    quality face: the full ANN pipeline runs, each query's top-3 is
    //    scored as the hit rate within the exact top-10 (the relaxed ANN
    //    metric — exact top-3 margins are razor-thin on this near-uniform
    //    synthetic corpus), and the oracle asserts the per-query bound the
    //    configuration achieves (round-5 judge task: ANN rows had no DuckDB
    //    counterpart). Measured: hit rate 1.0 on every query at both dev
    //    scales ─────────────────────────────────────────────────────────────
    Q(
      "q_embed_ann_lsh",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        Similarity.hitRateAtK(
            Similarity.lshTopK(e, q, 3, planes = 5, tables = 12),
            Similarity.cosineTopK(e, q, 10))
          .select(col("qid"), col("n_approx"),
            (col("hit_rate") >= 0.99).as("hit_ok"))
          .orderBy(col("qid"))
      },
      Some("""SELECT vec_id AS qid, CAST(3 AS BIGINT) AS n_approx,
          TRUE AS hit_ok
        FROM embeddings WHERE vec_id < 10 ORDER BY qid""")),

    // ── IVF-cell approximate ANN (second scale path; hash-drawn centroids
    //    + Lloyd refines), per-query hit-rate face vs exact cosine top-10
    //    (measured min 2/3 at sf0.01 — bound 0.5 leaves one step of
    //    margin) ────────────────────────────────────────────────────────────
    Q(
      "q_embed_ann_ivf",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        Similarity.hitRateAtK(
            Similarity.ivfTopK(e, q, 3, refineIters = 2),
            Similarity.cosineTopK(e, q, 10))
          .select(col("qid"), col("n_approx"),
            (col("hit_rate") >= 0.5).as("hit_ok"))
          .orderBy(col("qid"))
      },
      Some("""SELECT vec_id AS qid, CAST(3 AS BIGINT) AS n_approx,
          TRUE AS hit_ok
        FROM embeddings WHERE vec_id < 10 ORDER BY qid""")),

    // ── PQ/ADC approximate ANN (third scale path — memory-bound regime:
    //    the index is m codes per vector, not the vector; 64-code refined
    //    codebooks), MEAN hit-rate face vs exact L2 top-10 (the metric PQ
    //    quantizes; per-query floors are noise-dominated on this corpus, the
    //    mean is stable: 0.6 / 0.4 at the two dev scales vs bound 0.3) ──────
    Q(
      "q_embed_ann_pq",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        Similarity.hitRateAtK(
            Similarity.pqTopK(e, q, 3, kCodes = 64, refineIters = 2),
            Similarity.l2TopK(e, q, 10))
          .agg(count(lit(1)).as("n_queries"),
            (avg(col("hit_rate")) >= 0.3).as("mean_hit_ok"))
      },
      Some("""SELECT COUNT(*) AS n_queries, TRUE AS mean_hit_ok
        FROM embeddings WHERE vec_id < 10""")),

    // ── IVF+PQ hybrid ANN (FAISS IVFPQ shape: refined cells bound
    //    candidates, PQ codes score them — query time never touches raw
    //    embeddings), MEAN hit-rate face vs exact L2 top-10 (compounds cell
    //    recall with code-ranking error: 0.47 / 0.5 measured vs bound
    //    0.25) ──────────────────────────────────────────────────────────────
    Q(
      "q_embed_ann_ivfpq",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
        Similarity.hitRateAtK(
            Similarity.ivfpqTopK(e, q, 3, nprobe = 8, kCodes = 64, refineIters = 2),
            Similarity.l2TopK(e, q, 10))
          .agg(count(lit(1)).as("n_queries"),
            (avg(col("hit_rate")) >= 0.25).as("mean_hit_ok"))
      },
      Some("""SELECT COUNT(*) AS n_queries, TRUE AS mean_hit_ok
        FROM embeddings WHERE vec_id < 10""")),

    // ── per-label embedding centroids (element-wise mean) ────────────────
    Q(
      "q_embed_centroid",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.labelCentroids(e)
          .select(col("label").cast("long").as("label"),
            col("dim").cast("long").as("dim"), col("centroid"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""SELECT CAST(label AS BIGINT) AS label,
          CAST(i - 1 AS BIGINT) AS dim,
          ROUND(CAST(SUM(CAST(embedding[i] AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 4) + 0 AS centroid
        FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
        GROUP BY 1, 2 ORDER BY label, dim""")),

    // ── int8 embedding quantization: per-vector symmetric scale, summary
    //    of the quantized representation + worst-case reconstruction error
    //    (4× storage shrink for an embedding corpus; half-up spelled as
    //    floor(v+0.5) so both engines round bit-identically) ────────────────
    Q(
      "q_embed_quantize",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.quantizeInt8(e, "vec_id", "embedding")
          .select(col("vec_id"), round(col("scale"), 6).as("scale"),
            expr("aggregate(q, 0L, (acc, v) -> acc + v)").as("sum_q"),
            expr("cast(size(filter(q, v -> abs(v) = 127)) as bigint)").as("n_sat"),
            round(expr(
              "array_max(zip_with(q, xd, (v, x) -> abs(cast(v as double) * scale / 127.0D - x)))"),
              6).as("max_abs_err"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)),
        sc AS (SELECT vec_id, MAX(ABS(x)) AS scale FROM ex GROUP BY vec_id),
        q AS (SELECT e.vec_id, e.x, sc.scale,
            CASE WHEN sc.scale = 0 THEN 0
                 ELSE CAST(FLOOR(e.x / sc.scale * 127.0 + 0.5) AS BIGINT) END AS qi
          FROM ex e JOIN sc USING (vec_id))
        SELECT vec_id, ROUND(scale, 6) AS scale,
          CAST(SUM(qi) AS BIGINT) AS sum_q,
          CAST(SUM(CASE WHEN ABS(qi) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
          ROUND(MAX(ABS(qi * scale / 127.0 - x)), 6) AS max_abs_err
        FROM q GROUP BY vec_id, scale ORDER BY vec_id""")),

    // ── int8-quantized KNN: the search kernel quantization exists for —
    //    per-vector scales cancel in the cosine, so scoring is integer dot
    //    and norm sums → one sqrt (4× smaller data on the scan) ──────────────
    Q(
      "q_embed_knn_int8",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.cosineTopKInt8(e, e.filter(col("vec_id") < 10), 3)
          .orderBy(col("qid"), col("rk"))
      },
      Some("""WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)),
        sc AS (SELECT vec_id, MAX(ABS(x)) AS scale FROM ex GROUP BY vec_id),
        q AS (SELECT e.vec_id, e.i,
            CASE WHEN sc.scale = 0 THEN 0
                 ELSE CAST(FLOOR(e.x / sc.scale * 127.0 + 0.5) AS BIGINT) END AS qi
          FROM ex e JOIN sc USING (vec_id)),
        nsq AS (SELECT vec_id, CAST(SUM(qi * qi) AS BIGINT) AS nsq FROM q GROUP BY vec_id),
        dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
            CAST(SUM(a.qi * b.qi) AS BIGINT) AS qdot
          FROM q a JOIN q b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        scored AS (SELECT qid, cid,
            ROUND(CASE WHEN na.nsq = 0 OR nb.nsq = 0 THEN 0.0
              ELSE CAST(qdot AS DOUBLE) /
                (SQRT(CAST(na.nsq AS DOUBLE)) * SQRT(CAST(nb.nsq AS DOUBLE))) END, 6) + 0 AS cos_q
          FROM dots JOIN nsq na ON qid = na.vec_id JOIN nsq nb ON cid = nb.vec_id)
        SELECT qid, cid, cos_q,
          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_q DESC, cid) AS BIGINT) AS rk
        FROM scored QUALIFY rk <= 3 ORDER BY qid, rk""")),

    // ── corpus mixture report: per (source, lang) doc/token counts and
    //    token share — the mixture-weights table a training-data pipeline
    //    reads before sampling sources ───────────────────────────────────────
    Q(
      "q_corpus_mixture",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val agg = d
          .select(col("source"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_toks"))
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        val total = agg.agg(sum(col("n_tokens")).as("total_tokens"))
        agg.crossJoin(broadcast(total))
          .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens").cast("double") /
              col("total_tokens").cast("double"), 6).as("token_share"),
            round(col("n_tokens").cast("double") /
              col("n_docs").cast("double"), 4).as("mean_tokens"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""WITH agg AS (SELECT source, lang, COUNT(*) AS n_docs,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1, 2)
        SELECT source, lang, n_docs, n_tokens,
          ROUND(CAST(n_tokens AS DOUBLE) /
            CAST((SELECT SUM(n_tokens) FROM agg) AS DOUBLE), 6) AS token_share,
          ROUND(CAST(n_tokens AS DOUBLE) / n_docs, 4) AS mean_tokens
        FROM agg ORDER BY source, lang""")),

    // ── unigram-LM negative log-likelihood: the perplexity-proxy quality
    //    filter (CCNet-style) — corpus unigram frequencies, then each doc
    //    scored by mean -ln p(token). Per-token scores are rounded then
    //    decimal-summed so the aggregate is order-independent ───────────────
    Q(
      "q_unigram_logprob",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val toks = d.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("term"))
        val total = toks.agg(count(lit(1)).cast("double").as("total_toks"))
        val freq = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        val scored = toks.join(freq, Seq("term"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"),
            round(-log(col("cnt").cast("double") / col("total_toks")), 6)
              .cast(DecimalType(28, 6)).as("nll"))
        scored.groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("nll")).as("sum_dec"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("sum_dec").cast("double"), 6).as("sum_nll"),
            round(col("sum_dec").cast("double") /
              col("n_tokens").cast("double"), 6).as("mean_nll"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
          FROM documents),
        freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total_toks FROM toks),
        scored AS (SELECT doc_id,
            CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / total_toks), 6) AS DECIMAL(28,6)) AS nll
          FROM toks JOIN freq USING (term) CROSS JOIN tot)
        SELECT doc_id, COUNT(*) AS n_tokens,
          ROUND(CAST(SUM(nll) AS DOUBLE), 6) AS sum_nll,
          ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ── temperature-scaled source sampling: inverse-sqrt (τ=0.5) mixture
    //    weights over per-source token mass — sqrt is correctly-rounded
    //    IEEE on any engine (pow is NOT, so τ is fixed at 0.5), and the
    //    weight normalizer is decimal-summed for order independence ─────────
    Q(
      "q_mixture_sample_rates",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val agg = d
          .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_toks"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        val tot = agg.agg(sum(col("n_tokens")).cast("double").as("total_tokens"))
        val sh = agg.crossJoin(broadcast(tot))
          .withColumn("share", col("n_tokens").cast("double") / col("total_tokens"))
          .withColumn("w", round(sqrt(col("share")), 10))
        val wsum = sh.agg(
          sum(col("w").cast(DecimalType(28, 10))).cast("double").as("w_sum"))
        sh.crossJoin(broadcast(wsum))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            round(col("share"), 6).as("token_share"),
            round(col("w") / col("w_sum"), 6).as("sample_p"))
          .withColumn("epochs_10m",
            round(lit(1.0e7) * col("sample_p") / col("n_tokens").cast("double"), 4))
          .orderBy(col("source"))
      },
      Some("""WITH agg AS (SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens FROM agg),
        sh AS (SELECT source, n_docs, n_tokens,
            CAST(n_tokens AS DOUBLE) / total_tokens AS share,
            ROUND(SQRT(CAST(n_tokens AS DOUBLE) / total_tokens), 10) AS w
          FROM agg CROSS JOIN tot),
        ws AS (SELECT CAST(SUM(CAST(w AS DECIMAL(28,10))) AS DOUBLE) AS w_sum FROM sh)
        SELECT source, n_docs, n_tokens,
          ROUND(share, 6) AS token_share,
          ROUND(w / w_sum, 6) AS sample_p,
          ROUND(1e7 * ROUND(w / w_sum, 6) / n_tokens, 4) AS epochs_10m
        FROM sh CROSS JOIN ws ORDER BY source""")),

    // ── time-range rolling window: per-user 7-day rolling event count and
    //    spend over DAILY pre-aggregates — the range frame runs on integer
    //    epoch-days (identical frame semantics on any engine), and the
    //    pre-aggregation keeps the window input small at scale ───────────────
    Q(
      "q_events_rolling_7d",
      (s, dir) => {
        val e = t(s, dir, "events")
        val daily = e
          .groupBy(col("user_id"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 6))).as("dv"))
          .withColumn("day_n",
            datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day_n"))
          .rangeBetween(-6, 0)
        daily.select(col("user_id"), col("day"), col("n"),
            sum(col("n")).over(w).as("n_7d"),
            col("dv").cast("double").as("day_value"),
            sum(col("dv")).over(w).cast("double").as("value_7d"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
            SUM(CAST(value AS DECIMAL(18,6))) AS dv
          FROM events GROUP BY 1, 2),
        d2 AS (SELECT *, DATEDIFF('day', DATE '1970-01-01', day) AS day_n FROM daily)
        SELECT user_id, day, n,
          CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
          CAST(dv AS DOUBLE) AS day_value,
          CAST(SUM(dv) OVER w AS DOUBLE) AS value_7d
        FROM d2
        WINDOW w AS (PARTITION BY user_id ORDER BY day_n
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, day""")),

    // ── per-source quality deciles: NTILE(10) partitioned by source (the
    //    partition keeps the sort distributed — no global single-partition
    //    window), total-ordered by (n_chars, doc_id) so bucket assignment
    //    is engine-independent ──────────────────────────────────────────────
    Q(
      "q_quality_ntile",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        d.select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy(col("source"), col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("source"), col("decile"))
      },
      Some("""WITH ranked AS (SELECT source, doc_id, n_chars,
            CAST(NTILE(10) OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS BIGINT) AS decile
          FROM documents)
        SELECT source, decile, COUNT(*) AS n_docs,
          MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM ranked GROUP BY 1, 2 ORDER BY source, decile""")),

    // ── salted skew aggregation: two-stage groupBy — stage 1 fans the hot
    //    key across 16 salt buckets (xxhash64 of the row id), stage 2
    //    combines partials. The oracle is the PLAIN aggregate: salting must
    //    be invisible in the result (decimal partials make it exact) ─────────
    Q(
      "q_skew_salted_agg",
      (s, dir) => {
        val e = t(s, dir, "events")
        val partials = e
          .select(col("event_type"),
            pmod(xxhash64(col("event_id")), lit(16)).as("salt"),
            col("value").cast(DecimalType(18, 6)).as("v"))
          .groupBy(col("event_type"), col("salt"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        partials.groupBy(col("event_type"))
          .agg(sum(col("n")).as("n_events"),
            sum(col("sv")).cast("double").as("total_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1 ORDER BY event_type""")),

    // ── skew-immune per-key top-k (round 11): the rank-window filter
    //    row_number() OVER (PARTITION BY user ORDER BY value DESC, id) <= 2
    //    rewritten as ONE bounded aggregate (TopKStructAgg — a k-element
    //    heap combined map-side, so a Zipf-hot user never forms a giant
    //    window partition: 13.7× → 1.0× max/median task skew in the sf10z
    //    rehearsal). The oracle IS the window form: the rewrite must be
    //    row-invisible ─────────────────────────────────────────────────────
    Q(
      "q_topk_per_key",
      (s, dir) => {
        val e = t(s, dir, "events")
        graft.perf.Skew.topKPerKey(
          e.select(col("user_id"), col("value"), col("event_id"),
            col("event_type")),
          Seq("user_id"),
          // struct shaped for desc-value, asc-id (negated) comparison
          struct(col("value"), (-col("event_id")).as("nid"),
            col("event_type")), 2)
          .select(col("user_id"), col("rk").cast("long").as("rk"),
            (-col("nid")).as("event_id"), col("event_type"), col("value"))
          .orderBy(col("user_id"), col("rk"))
      },
      Some("""SELECT user_id, rk, event_id, event_type, value FROM (
          SELECT user_id, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY value DESC, event_id) AS BIGINT) AS rk,
            event_id, event_type, value
          FROM events)
        WHERE rk <= 2 ORDER BY user_id, rk""")),

    // ── heavy hitters: Misra–Gries candidate sketch (capacity 32, one
    //    bounded buffer per partition, map-side mergeable) → exact count of
    //    CANDIDATE terms only → threshold cnt·33 > N. The MG bound makes
    //    the candidate set a guaranteed superset of every term with
    //    freq > N/33, so the result equals the full-vocabulary aggregate
    //    the oracle runs — without ever shuffling the full vocabulary ───────
    Q(
      "q_heavy_hitters",
      (s, dir) => {
        val d = t(s, dir, "documents")
        // threshold multiplier (cap+1) is tied to the sketch capacity: MG
        // guarantees exactly the freq > N/(cap+1) superset — keep in sync
        // with the literal 33 in the oracle SQL below
        val cap = 32
        def toks = d.select(explode(split(lower(col("text")), " ")).as("term"))
        val cands = toks
          .agg(graft.functions.HashFunctions.misraGries(col("term"), cap).as("mg"))
          .select(explode(col("mg")).as("c"))
          .select(col("c.term").as("term"))
        val total = toks.agg(count(lit(1)).as("total"))
        toks.join(broadcast(cands), Seq("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .filter(col("cnt") * (cap + 1) > col("total"))
          .select(col("term"), col("cnt"),
            round(col("cnt").cast("double") / col("total").cast("double"), 6)
              .as("share"))
          .orderBy(desc("cnt"), col("term"))
      },
      Some("""WITH toks AS (SELECT UNNEST(string_split(lower(text), ' ')) AS term
          FROM documents),
        freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
        tot AS (SELECT COUNT(*) AS total FROM toks)
        SELECT term, cnt, ROUND(CAST(cnt AS DOUBLE) / total, 6) AS share
        FROM freq CROSS JOIN tot WHERE cnt * 33 > total
        ORDER BY cnt DESC, term""")),

    // ── winsorized mean: clamp each value into [P05, P95] then average —
    //    the outlier-robust statistic pipelines use before z-scoring. Clamp
    //    bounds are rounded to 6 dp on BOTH engines (removes interpolation
    //    ulp risk), clamped values decimal-summed; NULL values are filtered
    //    up front because LEAST/GREATEST null semantics differ by engine ────
    Q(
      "q_winsorized_mean",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("value").isNotNull)
        val pct = e.groupBy(col("event_type"))
          .agg(expr("percentile(value, array(0.05, 0.95))").as("p"))
          .select(col("event_type"),
            round(element_at(col("p"), 1), 6).as("p05"),
            round(element_at(col("p"), 2), 6).as("p95"))
        e.join(broadcast(pct), Seq("event_type"))
          .select(col("event_type"),
            least(greatest(col("value"), col("p05")), col("p95"))
              .cast(DecimalType(18, 6)).as("wv"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("wv")).as("sw"))
          .select(col("event_type"), col("n"),
            (round(col("sw").cast("double") / col("n").cast("double"), 6)
              + lit(0.0)).as("winsorized_mean")) // + 0.0 folds IEEE -0.0
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        pct AS (SELECT event_type,
            ROUND(quantile_cont(value, 0.05), 6) AS p05,
            ROUND(quantile_cont(value, 0.95), 6) AS p95
          FROM e GROUP BY 1),
        w AS (SELECT e.event_type,
            CAST(LEAST(GREATEST(e.value, p05), p95) AS DECIMAL(18,6)) AS wv
          FROM e JOIN pct USING (event_type))
        SELECT event_type, COUNT(*) AS n,
          ROUND(CAST(SUM(wv) AS DOUBLE) / COUNT(*), 6) + 0 AS winsorized_mean
        FROM w GROUP BY 1 ORDER BY event_type""")),

    // ── k-anonymity small-cell suppression: aggregate cells with fewer
    //    than k members are merged into one '__suppressed__' bucket — the
    //    release-safe face of a grouped report (complements the plan-level
    //    PiiGate, which forces aggregation in the first place) ───────────────
    Q(
      "q_kanon_suppress",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val k = 5
        val cells = d.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n"))
        cells
          .select(
            when(col("n") >= k, col("source")).otherwise(lit("__suppressed__"))
              .as("source"),
            when(col("n") >= k, col("lang")).otherwise(lit("__suppressed__"))
              .as("lang"),
            col("n"))
          .groupBy(col("source"), col("lang"))
          .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_cells"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""WITH cells AS (SELECT source, lang, COUNT(*) AS n
          FROM documents GROUP BY 1, 2),
        relabeled AS (SELECT
            CASE WHEN n >= 5 THEN source ELSE '__suppressed__' END AS source,
            CASE WHEN n >= 5 THEN lang ELSE '__suppressed__' END AS lang, n
          FROM cells)
        SELECT source, lang, CAST(SUM(n) AS BIGINT) AS n_docs,
          COUNT(*) AS n_cells
        FROM relabeled GROUP BY 1, 2 ORDER BY source, lang""")),

    // ── referential-integrity audit: documents ↔ embeddings coverage via
    //    two anti-joins and one semi-join, stacked as labeled counts — the
    //    check a pipeline runs before joining text to vectors at scale ───────
    Q(
      "q_docs_integrity",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"))
        val e = t(s, dir, "embeddings").select(col("vec_id"))
        val matched = d.join(e, col("doc_id") === col("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n"))
          .select(lit("matched").as("check_name"), col("n"))
        val noVec = d.join(e, col("doc_id") === col("vec_id"), "left_anti")
          .agg(count(lit(1)).as("n"))
          .select(lit("docs_without_vector").as("check_name"), col("n"))
        val orphan = e.join(d, col("doc_id") === col("vec_id"), "left_anti")
          .agg(count(lit(1)).as("n"))
          .select(lit("orphan_vectors").as("check_name"), col("n"))
        matched.unionAll(noVec).unionAll(orphan).orderBy(col("check_name"))
      },
      Some("""SELECT 'matched' AS check_name, COUNT(*) AS n FROM documents d
          WHERE EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
        UNION ALL
        SELECT 'docs_without_vector', COUNT(*) FROM documents d
          WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
        UNION ALL
        SELECT 'orphan_vectors', COUNT(*) FROM embeddings e
          WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
        ORDER BY check_name""")),

    // ── z-score outliers: per-type mean/stddev from exact decimal sums
    //    (the q_agg_stddev formula), each value standardized against its
    //    group, |z| > 3 kept — the anomaly screen run before training-data
    //    aggregation. The quantized vq = double(decimal6(value)) makes the
    //    numerator bit-identical on both engines ─────────────────────────────
    Q(
      "q_zscore_outliers",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("value").isNotNull)
        def v6 = col("value").cast(DecimalType(18, 6))
        val nd = col("n").cast("double")
        val s1d = col("s1").cast("double")
        val s2d = col("s2").cast("double")
        // vr > 0 guard: a constant group has zero variance (division would
        // make every row ±Inf), and fp cancellation can drive the numerator
        // a hair negative (Spark sqrt→NaN but DuckDB sqrt→error) — identical
        // filter on both engines keeps them aligned
        val stats = e.groupBy(col("event_type")).agg(
            count(lit(1)).as("n"),
            sum(v6).as("s1"),
            sum((v6 * v6).cast(DecimalType(28, 12))).as("s2"))
          .withColumn("vr", (s2d * col("n") - s1d * s1d) / (nd * (col("n") - 1)))
          .filter(col("vr") > 0)
        val zs = (v6.cast("double") - s1d / col("n")) / sqrt(col("vr"))
        e.join(broadcast(stats), Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("value"), zs.as("zs"))
          .filter(abs(col("zs")) > 3)
          .select(col("event_id"), col("event_type"), col("value"),
            round(col("zs"), 4).as("z"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, event_type, value,
            CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS vq
          FROM events WHERE value IS NOT NULL),
        st0 AS (SELECT event_type, COUNT(*) AS n,
            SUM(CAST(value AS DECIMAL(18,6))) AS s1,
            SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
              AS DECIMAL(28,12))) AS s2
          FROM e GROUP BY 1),
        st AS (SELECT *,
            (CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / (CAST(n AS DOUBLE) * (n - 1)) AS vr
          FROM st0 WHERE (CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / (CAST(n AS DOUBLE) * (n - 1)) > 0),
        z AS (SELECT e.event_id, e.event_type, e.value,
            (e.vq - CAST(s1 AS DOUBLE) / n) / SQRT(vr) AS zs
          FROM e JOIN st USING (event_type))
        SELECT event_id, event_type, value, ROUND(zs, 4) AS z
        FROM z WHERE ABS(zs) > 3 ORDER BY event_id""")),

    // ── token-length histogram in power-of-two buckets: the corpus shape
    //    report behind sequence-packing/batching decisions. Integer log2 is
    //    computed as length(bin(n)) - 1 — exact and identical on both
    //    engines, no floating log ─────────────────────────────────────────────
    Q(
      "q_length_histogram",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(size(split(col("text"), " ")).cast("long").as("n_toks"))
          .filter(col("n_toks") > 0)
          .withColumn("bucket", (length(bin(col("n_toks"))) - 1).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_toks")).as("min_toks"), max(col("n_toks")).as("max_toks"),
            sum(col("n_toks")).as("total_toks"))
          .withColumn("bucket_lo",
            expr("cast(shiftleft(1L, cast(bucket as int)) as bigint)"))
          .select("bucket", "bucket_lo", "n_docs", "min_toks", "max_toks", "total_toks")
          .orderBy(col("bucket"))
      },
      Some("""WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          FROM documents WHERE len(string_split(text, ' ')) > 0),
        b AS (SELECT n_toks, CAST(LENGTH(BIN(n_toks)) - 1 AS BIGINT) AS bucket FROM n)
        SELECT bucket, CAST(1 << bucket AS BIGINT) AS bucket_lo,
          COUNT(*) AS n_docs, MIN(n_toks) AS min_toks, MAX(n_toks) AS max_toks,
          CAST(SUM(n_toks) AS BIGINT) AS total_toks
        FROM b GROUP BY 1 ORDER BY bucket""")),

    // ── top adjacent token pairs: the highest-frequency merge candidates —
    //    literally the first iteration of a BPE merge loop, run corpus-wide.
    //    One shuffle on the pair key, then TakeOrderedAndProject (global
    //    top-k without a global sort) ───────────────────────────────────────
    Q(
      "q_top_bigrams",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(split(lower(col("text")), " ").as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(toks) - 1),
              i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""))
            .as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), col("pair"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
        pairs AS (SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1])) AS pair FROM toks)
        SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY 1
        ORDER BY cnt DESC, pair LIMIT 20""")),

    // ── JSONL source/sink roundtrip: documents → JSON-lines files → read
    //    back against the declared schema → per-source aggregate. JSONL is
    //    the interchange format LLM corpora actually ship in; this face
    //    proves write+read fidelity (row counts, key range, and text
    //    lengths survive the escape/unescape cycle) against an oracle that
    //    never leaves the parquet table. The write is an index-build-style
    //    side effect (temp dir, overwritten per run); the malformed-line
    //    quarantine path of the same reader is pinned separately in
    //    ExtensionsSpec (Ingest.jsonlWithQuarantine) ─────────────────────────
    Q(
      "q_jsonl_roundtrip",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
        d.write.mode("overwrite").json(out)
        s.read.schema(d.schema).json(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(length(col("text")).cast("long")).as("sum_text_len"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_len,
          MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM documents GROUP BY source ORDER BY source""")),

    // ── CSV source/sink roundtrip: same contract as q_jsonl_roundtrip for
    //    the engine's CSV export path (Pipeline/console download) — header
    //    + quoted fields survive the cycle; multiLine covers embedded
    //    newlines in text ───────────────────────────────────────────────────
    Q(
      "q_csv_roundtrip",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
        d.write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(d.schema).option("header", "true")
          .option("multiLine", "true").csv(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(length(col("text")).cast("long")).as("sum_text_len"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_len,
          MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM documents GROUP BY source ORDER BY source""")),

    // ── character-entropy quality score: Shannon entropy of each doc's
    //    char distribution (low entropy = repetitive/degenerate text) —
    //    computed entirely with array lambdas per doc: NO explode, NO
    //    (doc, char) shuffle, pure narrow map. Per-char terms are scaled to
    //    integers before the array sum so summation order cannot matter.
    //    r17 (guide §1.2 per-task work): counts come from ONE run-length
    //    aggregate over the chars SORTED AS CODE POINTS — O(n log n + n)
    //    per doc where the previous array_distinct +
    //    filter-per-distinct-char form rescanned the array once per
    //    distinct char (O(d·n): ~60k string equals for a 1 k-char doc;
    //    OpProbe attributed 4.6 s of the face's 4.9 s warm to that one
    //    pipeline). ascii(c) is injective on single-char elements, so
    //    grouping by it yields the SAME count multiset as grouping the
    //    chars — the integer-scaled terms, their order-free long sum, and
    //    the oracle hash are unchanged (pinned old ≡ new in ExtensionsSpec,
    //    unicode included) while the sort compares primitive ints instead
    //    of collation-aware strings (string sort measured only −18%; int
    //    sort −31%). Shape matters: the sorted array is the aggregate's
    //    INPUT argument, evaluated once per row — an intermediate sorted
    //    COLUMN referenced inside a later lambda gets inlined into the
    //    lambda body by projection collapse and re-sorts per ELEMENT
    //    (O(n²·log n); the first attempt hung a task for 38 min on exactly
    //    that — thread-dumped, guide §7.3) ──────────────────────────────────
    Q(
      "q_text_entropy",
      (s, dir) => {
        val d = t(s, dir, "documents").filter(length(col("text")) > 0)
        d.select(col("doc_id"), expr("split(text, '')").as("ch"))
          .withColumn("n", size(col("ch")).cast("double"))
          // fold state: (prev char, current run length, integer term acc);
          // each run boundary banks the finished run's entropy term, the
          // finish lambda banks the last run
          .withColumn("sum_terms", expr(
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
          .select(col("doc_id"), col("n").cast("long").as("n_chars"),
            round(col("sum_terms").cast("double") / lit(1e10), 6)
              .as("entropy_nats"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT doc_id, string_split(text, '') AS ch,
            CAST(len(string_split(text, '')) AS DOUBLE) AS n
          FROM documents WHERE len(text) > 0),
        t AS (SELECT doc_id, n, list_transform(
            list_transform(list_distinct(ch), c2 -> len(list_filter(ch, x -> x = c2))),
            c -> CAST(ROUND(-(c / n) * LN(c / n) * 1e10) AS BIGINT)) AS terms
          FROM c)
        SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
          ROUND(CAST(list_sum(terms) AS DOUBLE) / 1e10, 6) AS entropy_nats
        FROM t ORDER BY doc_id""")),

    // ── language ID via stopword-hit scoring (n-gram heuristic) ──────────
    Q(
      "q_text_langid",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"), col("lang").as("lang_given"),
            TextAnalysis.langId(col("text")).as("lang_pred"),
            TextAnalysis.stopwordHits(col("text"), "en").as("en_hits"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (SELECT doc_id, lang AS lang_given,
          CAST(len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS BIGINT) AS he,
          CAST(len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['der','die','das','und','ist','von','nicht','ein'], x))) AS BIGINT) AS hd,
          CAST(len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['le','la','les','et','est','de','un','une'], x))) AS BIGINT) AS hf,
          CAST(len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['el','la','los','y','es','de','un','que'], x))) AS BIGINT) AS hs
        FROM documents)
        SELECT doc_id, lang_given,
          CASE WHEN GREATEST(he, hd, hf, hs) = 0 THEN 'und'
               WHEN hf = GREATEST(he, hd, hf, hs) THEN 'fr'
               WHEN hs = GREATEST(he, hd, hf, hs) THEN 'es'
               WHEN he = GREATEST(he, hd, hf, hs) THEN 'en'
               ELSE 'de' END AS lang_pred,
          he AS en_hits
        FROM scored ORDER BY doc_id""")),

    // ── quality scoring: length/punct/stopword signals ───────────────────
    Q(
      "q_text_quality",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id") +: TextAnalysis.qualityColumns(col("text")): _*)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          CAST(LENGTH(text) AS BIGINT) AS n_chars,
          CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
          ROUND(CAST(LENGTH(text) AS DOUBLE) / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 4) AS mean_tok_len,
          CAST(LENGTH(text) - LENGTH(REPLACE(text, '.', ''))
             + LENGTH(text) - LENGTH(REPLACE(text, ',', ''))
             + LENGTH(text) - LENGTH(REPLACE(text, '!', ''))
             + LENGTH(text) - LENGTH(REPLACE(text, '?', '')) AS BIGINT) AS n_punct,
          ROUND(CAST(len(list_filter(string_split(lower(text), ' '),
            x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS DOUBLE)
            / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 4) AS stopword_ratio
        FROM documents ORDER BY doc_id""")),

    // ── TF-IDF keyword extraction: top-5 terms per document by
    //    tf · ln(N/df), ranked on the ROUNDED score with a term tie-break so
    //    both engines rank identically. Two shuffles (term df, per-doc
    //    window); N via a metadata-only count ────────────────────────────────
    Q(
      "q_tfidf_keywords",
      (s, dir) => {
        val d = t(s, dir, "documents")
        // N inside the plan: one-row aggregate broadcast-crossed into the
        // scored table (no eager driver-side count job at build time)
        val nDocs = d.agg(count(lit(1)).cast("double").as("n_docs"))
        val tf = d.select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val scored = tf.join(dfreq, Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf",
            round(col("tf").cast("double") * log(col("n_docs") / col("df")), 6))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(desc("tfidf"), col("term"))
        scored.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("tfidf"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH toks AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        sc AS (SELECT doc_id, term, tf,
            ROUND(tf * LN(n.n / df.df), 6) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
        r AS (SELECT doc_id, term, tf, tfidf,
            ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
          FROM sc)
        SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, tfidf
        FROM r WHERE rk <= 5 ORDER BY doc_id, rk""")),

    // ── corpus vocabulary induction: top-100 terms by corpus frequency
    //    with doc frequency and cumulative token coverage — the term-stats
    //    pass a tokenizer build starts from. Rank window runs over one row
    //    per distinct term (post-aggregation), never over the corpus ─────────
    Q(
      "q_vocab_topk",
      (s, dir) => {
        val d = t(s, dir, "documents")
        TextAnalysis.vocabulary(d, "doc_id", "text", 100)
          .orderBy(col("rk"))
      },
      Some("""WITH toks AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        terms AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS tf, COUNT(*) AS df
          FROM tf GROUP BY term),
        r AS (SELECT term, tf, df,
            CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS BIGINT) AS rk,
            ROUND(CAST(SUM(tf) OVER (ORDER BY tf DESC, term
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              / CAST((SELECT SUM(tf) FROM terms) AS DOUBLE), 6) AS cum_frac
          FROM terms)
        SELECT rk, term, tf, df, cum_frac FROM r WHERE rk <= 100 ORDER BY rk""")),

    // ── boilerplate n-gram detection: shingles present in ≥1% of documents
    //    (headers/footers/templates). Doubles as the data-derived
    //    stop-shingle list for the LSH pipeline's quadratic-blowup guard ─────
    Q(
      "q_boilerplate_ngrams",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.boilerplateShingles(Dedup.shingles(d, "doc_id", "text", 3), d, 0.01)
          .orderBy(desc("df_docs"), col("shingle"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        f AS (SELECT shingle, COUNT(*) AS df_docs FROM sh GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
        SELECT shingle, df_docs,
          ROUND(CAST(df_docs AS DOUBLE) / (SELECT n_docs FROM n), 6) AS doc_frac
        FROM f
        WHERE ROUND(CAST(df_docs AS DOUBLE) / (SELECT n_docs FROM n), 6) >= 0.01
        ORDER BY df_docs DESC, shingle""")),

    // ── cross-doc duplicated-span fraction: share of each doc's POSITIONAL
    //    3-grams that occur in ≥1 other doc (span-level copy metric — the
    //    relational stand-in for suffix-array substring dedup) ───────────────
    Q(
      "q_dup_spans",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.spanDupFraction(d, "doc_id", "text", 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        g AS (SELECT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        md AS (SELECT shingle FROM
          (SELECT shingle, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
          WHERE nd >= 2),
        tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY 1),
        shr AS (SELECT doc_id, COUNT(*) AS n_shared FROM g
          WHERE shingle IN (SELECT shingle FROM md) GROUP BY 1)
        SELECT t.doc_id, t.n_grams,
          CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
          ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / t.n_grams, 6) AS dup_frac
        FROM tot t LEFT JOIN shr s USING (doc_id) ORDER BY t.doc_id""")),

    // ── within-doc repetition rate: 1 − distinct/total 3-grams (the
    //    repeated-n-gram boilerplate filter; narrow map, no explode) ────────
    Q(
      "q_text_repetition",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id") +: TextAnalysis.repetitionColumns("toks"): _*)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT doc_id, list_transform(generate_series(1, len(t) - 2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS ss
          FROM toks)
        SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_shingles,
          CAST(len(list_distinct(ss)) AS BIGINT) AS n_distinct,
          ROUND(1.0 - CAST(len(list_distinct(ss)) AS DOUBLE) / len(ss), 6) AS repetition_rate
        FROM sh ORDER BY doc_id""")),

    // ── composed quality gate: the standard corpus filter verdict —
    //    length, token-shape, and repetition rules combined into per-rule
    //    flags and an overall keep bit (0/1 longs for oracle parity) ────────
    Q(
      "q_quality_gate",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val withCols = d
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"),
            length(col("text")).cast("long").as("n_chars"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id") +: col("n_chars") +:
            size(col("toks")).cast("long").as("n_tokens") +:
            TextAnalysis.repetitionColumns("toks"): _*)
        val rLen = (col("n_tokens") >= 5 && col("n_tokens") <= 20000)
        val mean = col("n_chars").cast("double") / col("n_tokens")
        val rTok = (mean >= 2.0 && mean <= 12.0)
        val rRep = col("repetition_rate") <= 0.5
        withCols.select(col("doc_id"), col("n_tokens"),
            rLen.cast("long").as("pass_length"),
            rTok.cast("long").as("pass_token_shape"),
            rRep.cast("long").as("pass_repetition"),
            (rLen && rTok && rRep).cast("long").as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t,
            CAST(LENGTH(text) AS BIGINT) AS n_chars
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        m AS (SELECT doc_id, n_chars, CAST(len(t) AS BIGINT) AS n_tokens,
            1.0 - CAST(len(list_distinct(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS DOUBLE) /
              (len(t) - 2) AS rep
          FROM toks),
        f AS (SELECT doc_id, n_tokens,
            CASE WHEN n_tokens >= 5 AND n_tokens <= 20000 THEN 1 ELSE 0 END AS pass_length,
            CASE WHEN CAST(n_chars AS DOUBLE) / n_tokens >= 2.0
                  AND CAST(n_chars AS DOUBLE) / n_tokens <= 12.0 THEN 1 ELSE 0 END AS pass_token_shape,
            CASE WHEN ROUND(rep, 6) <= 0.5 THEN 1 ELSE 0 END AS pass_repetition
          FROM m)
        SELECT doc_id, n_tokens, CAST(pass_length AS BIGINT) AS pass_length,
          CAST(pass_token_shape AS BIGINT) AS pass_token_shape,
          CAST(pass_repetition AS BIGINT) AS pass_repetition,
          CAST(pass_length * pass_token_shape * pass_repetition AS BIGINT) AS keep
        FROM f ORDER BY doc_id""")),

    // ── token counting: whitespace tokenizer over documents ──────────────
    Q(
      "q_token_count",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(LENGTH(text) AS BIGINT) AS n_chars
        FROM documents ORDER BY doc_id""")),

    // ── deterministic dataset splitting: stable train/eval assignment via
    //    multiply-shift bucketing on the id (no RNG — reproducible across
    //    runs, engines, and cluster sizes; the standard way to split a
    //    training corpus that keeps growing). The bucket takes the HIGH bits
    //    of the 64-bit product (>>> 33), not the low residue — a low mod-100
    //    residue of id*C reduces to (id mod 100)-dependent, which degenerates
    //    on structured ids (stride-allocated, shard-prefixed) ────────────────
    Q(
      "q_dataset_split",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val bucket = graft.ext.CorpusPipeline.splitBucket(col("doc_id"))
        d.select(col("doc_id"),
            when(bucket < 90, "train").when(bucket < 95, "eval")
              .otherwise("test").as("split"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("split"))
      },
      // HUGEINT arithmetic replicates Spark's wrapped 64-bit multiply +
      // unsigned right shift: (id*C mod 2^64) >>> 33, then mod 100
      Some("""SELECT split, COUNT(*) AS n, MIN(doc_id) AS first_doc FROM (
          SELECT doc_id,
            CASE WHEN ((CAST(doc_id AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 100 < 90 THEN 'train'
                 WHEN ((CAST(doc_id AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 100 < 95 THEN 'eval'
                 ELSE 'test' END AS split
          FROM documents)
        GROUP BY split ORDER BY split""")),

    // ── deterministic stratified sampling: per-language keep percentages
    //    via salted multiply-shift bucketing (rebalance the dominant
    //    language without RNG; salt keeps sampling independent of the
    //    train/eval split) ──────────────────────────────────────────────────
    Q(
      "q_stratified_sample",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val kept = graft.ext.CorpusPipeline
          .stratifiedSample(d, "lang", "doc_id", Map("en" -> 20, "zh" -> 50))
        d.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
          .join(kept.groupBy(col("lang")).agg(count(lit(1)).as("n_kept")),
            Seq("lang"), "left")
          .select(col("lang"), col("n_total"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            round(coalesce(col("n_kept"), lit(0L)).cast("double") /
              col("n_total"), 4).as("kept_ratio"))
          .orderBy(col("lang"))
      },
      // xor(doc_id, salt) stays below 2^63 (both operands do), so the
      // HUGEINT wrap replication matches the Spark expression exactly
      Some("""WITH b AS (SELECT doc_id, lang,
            ((CAST(xor(doc_id, 668265261) AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 100 AS bucket
          FROM documents),
        k AS (SELECT lang, COUNT(*) AS n_kept FROM b
          WHERE bucket < CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 50 ELSE 100 END
          GROUP BY lang),
        tt AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang)
        SELECT tt.lang, tt.n_total,
          CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
          ROUND(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / tt.n_total, 4) AS kept_ratio
        FROM tt LEFT JOIN k ON tt.lang = k.lang ORDER BY tt.lang""")),

    // ── deterministic training-order shuffle: reproducible pseudo-random
    //    corpus order (stable across runs, resumable mid-epoch — RNG
    //    shuffles are neither). One range-partitioned sort ──────────────────
    Q(
      "q_corpus_shuffle",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val key = graft.ext.CorpusPipeline.shuffleKey(col("doc_id"))
        // position = running count over the shuffle order, computed with the
        // range-partitioned running sum (no single-partition window)
        graft.ext.CorpusPipeline.globalRunningSum(
            d.select(col("doc_id"), key.as("shuffle_key")), lit(1L),
            col("shuffle_key"), Int.MaxValue, Seq(col("doc_id")), "position")
          .select(col("position"), col("doc_id"))
          .orderBy(col("position"))
      },
      Some("""SELECT ROW_NUMBER() OVER (ORDER BY
            ((CAST(xor(doc_id, 1013904242) AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 2147483647,
            doc_id) AS position, doc_id
          FROM documents ORDER BY position""")),

    // ── sequence packing: documents → fixed 512-token training sequences
    //    in deterministic shuffle order (concat-stream packing; summary per
    //    sequence) ─────────────────────────────────────────────────────────
    Q(
      "q_corpus_pack",
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.ext.CorpusPipeline.packSequences(d, "doc_id", "text", 512)
          .groupBy(col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("seq_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            ((CAST(xor(doc_id, 1013904242) AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 2147483647 AS k
          FROM documents),
        c AS (SELECT doc_id, n_tokens,
            CAST(SUM(n_tokens) OVER (ORDER BY k, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM t)
        SELECT CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
          COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
          MIN(doc_id) AS first_doc
        FROM c GROUP BY 1 ORDER BY seq_id""")),

    // ── composed corpus preparation: exact dedup → MinHash near-dup
    //    removal (connected-component keep-first) → quality gate →
    //    deterministic split, end to end, emitted as PER-STAGE survivor
    //    counts — the oracle-checkable face of the composed pipeline
    //    (round-5 judge task: the per-doc face had no DuckDB counterpart).
    //    The oracle reproduces every stage: exact dedup = min-id per text,
    //    near-dup = recursive-CTE components over exact all-pairs Jaccard
    //    (sound vs the LSH path exactly as q_dedup_minhash_lsh's oracle),
    //    split = HUGEINT multiply-shift replication ──────────────────────────
    Q(
      "q_corpus_prepare",
      (s, dir) => {
        import graft.ext.{CorpusPipeline, Dedup}
        val d = t(s, dir, "documents")
        // mirror CorpusPipeline.prepare(langs = Nil) stage by stage so each
        // stage's survivor count is observable
        val exact = Dedup.exact(
          d.withColumn("__h", sha2(encode(col("text"), "UTF-8"), 256)),
          Seq("__h"), "doc_id").drop("__h")
        val pairs = Dedup.minhashDedup(exact, "doc_id", "text", 0.8)
        val drops = Dedup.connectedComponents(pairs)
          .filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
        val deduped = exact.join(drops, Seq("doc_id"), "left_anti")
        val gated = deduped
          .withColumn("n_tokens", size(split(lower(col("text")), " ")).cast("long"))
          .filter(col("n_tokens") >= 5)
        val splitDf = gated
          .withColumn("split", CorpusPipeline.splitColumn(col("doc_id")))
        def stage(name: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
        stage("0_raw", d)
          .unionAll(stage("1_exact_dedup", exact))
          .unionAll(stage("2_near_dedup", deduped))
          .unionAll(stage("3_quality_gate", gated))
          .unionAll(splitDf.groupBy(concat(lit("4_split_"), col("split")).as("stage"))
            .agg(count(lit(1)).as("n_docs")))
          .orderBy(col("stage"))
      },
      Some("""WITH RECURSIVE
        exact AS (SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
          FROM documents GROUP BY text),
        toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM exact WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs_j AS (SELECT id_a, id_b FROM pr
          JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
          WHERE ROUND(CAST(common AS DOUBLE) / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.8),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs_j
          UNION SELECT id_b, id_a FROM pairs_j),
        reach AS (SELECT u, v FROM edges
          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u),
        drops AS (SELECT id AS doc_id FROM comp WHERE id <> comp),
        deduped AS (SELECT e.doc_id, e.text FROM exact e
          WHERE e.doc_id NOT IN (SELECT doc_id FROM drops)),
        gated AS (SELECT doc_id, text,
            len(string_split(lower(text), ' ')) AS n_tokens
          FROM deduped WHERE len(string_split(lower(text), ' ')) >= 5),
        spl AS (SELECT doc_id,
            ((CAST(doc_id AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 100 AS bucket
          FROM gated)
        SELECT '0_raw' AS stage, COUNT(*) AS n_docs FROM documents
        UNION ALL SELECT '1_exact_dedup', COUNT(*) FROM exact
        UNION ALL SELECT '2_near_dedup', COUNT(*) FROM deduped
        UNION ALL SELECT '3_quality_gate', COUNT(*) FROM gated
        UNION ALL SELECT '4_split_' ||
          (CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'eval'
           ELSE 'test' END), COUNT(*) FROM spl GROUP BY 1
        ORDER BY stage""")),

    // ── composed corpus preparation WITH decontamination (round 11): the
    //    production pipeline including the benchmark-overlap drop — eval
    //    material (doc_id%7 plants a real leaked set) must not reach ANY
    //    split. Stages 0-4 are the observable mirror of
    //    CorpusPipeline.prepare's internals; the 5_split_* counts come
    //    from the REAL prepare(benchmark = …) call, so the face fails if
    //    the composition ever diverges from the mirrored stages
    //    (prepare-with ≡ prepare-then-filter is additionally pinned in
    //    ExtensionsSpec) ──────────────────────────────────────────────────
    Q(
      "q_corpus_decontam",
      (s, dir) => {
        import graft.ext.{CorpusPipeline, Dedup}
        val d = t(s, dir, "documents")
        val bench = d.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id"), col("text"))
        val exact = Dedup.exact(
          d.withColumn("__h", sha2(encode(col("text"), "UTF-8"), 256)),
          Seq("__h"), "doc_id").drop("__h")
        val pairs = Dedup.minhashDedup(exact, "doc_id", "text", 0.8)
        val drops = Dedup.connectedComponents(pairs)
          .filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
        val deduped = exact.join(drops, Seq("doc_id"), "left_anti")
        val leaked = Dedup.decontaminate(
          Dedup.hashedShingles(deduped, "doc_id", "text", 3)
            .withColumnRenamed("sh", "shingle"),
          Dedup.hashedShingles(bench, "doc_id", "text", 3)
            .withColumnRenamed("sh", "shingle"), 4, 5)
          .select(col("train_id").as("doc_id")).distinct()
        val decon = deduped.join(leaked, Seq("doc_id"), "left_anti")
        val gated = decon
          .withColumn("n_tokens",
            size(split(lower(col("text")), " ")).cast("long"))
          .filter(col("n_tokens") >= 5)
        val prepared = CorpusPipeline.prepare(d, langs = Nil,
          benchmark = Some(bench))
        def stage(name: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("n_docs"))
            .select(lit(name).as("stage"), col("n_docs"))
        stage("0_raw", d)
          .unionAll(stage("1_exact_dedup", exact))
          .unionAll(stage("2_near_dedup", deduped))
          .unionAll(stage("3_decontam", decon))
          .unionAll(stage("4_quality_gate", gated))
          .unionAll(prepared
            .groupBy(concat(lit("5_split_"), col("split")).as("stage"))
            .agg(count(lit(1)).as("n_docs")))
          .orderBy(col("stage"))
      },
      Some("""WITH RECURSIVE
        exact AS (SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
          FROM documents GROUP BY text),
        toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM exact WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs_j AS (SELECT id_a, id_b FROM pr
          JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
          WHERE ROUND(CAST(common AS DOUBLE) / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.8),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs_j
          UNION SELECT id_b, id_a FROM pairs_j),
        reach AS (SELECT u, v FROM edges
          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u),
        drops AS (SELECT id AS doc_id FROM comp WHERE id <> comp),
        deduped AS (SELECT e.doc_id, e.text FROM exact e
          WHERE e.doc_id NOT IN (SELECT doc_id FROM drops)),
        evd AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        evtoks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM evd WHERE len(string_split(lower(text), ' ')) >= 3),
        evsh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM evtoks),
        evcnt AS (SELECT doc_id, COUNT(*) AS n FROM evsh GROUP BY doc_id),
        trsh AS (SELECT s.* FROM sh s
          WHERE s.doc_id IN (SELECT doc_id FROM deduped)),
        ov AS (SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
            COUNT(*) AS common
          FROM evsh e JOIN trsh t ON e.shingle = t.shingle GROUP BY 1, 2),
        leaked AS (SELECT DISTINCT train_id AS doc_id FROM ov
          JOIN evcnt ON ov.eval_id = evcnt.doc_id
          WHERE evcnt.n >= 10
            AND ROUND(CAST(common AS DOUBLE) / CAST(evcnt.n AS DOUBLE), 6) >= 0.8),
        decon AS (SELECT * FROM deduped
          WHERE doc_id NOT IN (SELECT doc_id FROM leaked)),
        gated AS (SELECT doc_id, text,
            len(string_split(lower(text), ' ')) AS n_tokens
          FROM decon WHERE len(string_split(lower(text), ' ')) >= 5),
        spl AS (SELECT doc_id,
            ((CAST(doc_id AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 100 AS bucket
          FROM gated)
        SELECT '0_raw' AS stage, COUNT(*) AS n_docs FROM documents
        UNION ALL SELECT '1_exact_dedup', COUNT(*) FROM exact
        UNION ALL SELECT '2_near_dedup', COUNT(*) FROM deduped
        UNION ALL SELECT '3_decontam', COUNT(*) FROM decon
        UNION ALL SELECT '4_quality_gate', COUNT(*) FROM gated
        UNION ALL SELECT '5_split_' ||
          (CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'eval'
           ELSE 'test' END), COUNT(*) FROM spl GROUP BY 1
        ORDER BY stage""")),

    // ── context-window chunking: token-bounded chunks with overlap (the
    //    pre-training windowing; stride = chunk − overlap). Narrow map —
    //    tokenize, posexplode chunk starts, slice ─────────────────────────
    Q(
      "q_doc_chunk",
      (s, dir) => {
        val d = t(s, dir, "documents")
        TextAnalysis.chunk(d, "doc_id", "text", chunkTokens = 32, overlapTokens = 8)
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          st AS (SELECT doc_id, toks,
            GREATEST(CAST(CEIL((len(toks) - 32) / 24.0) AS INT), 0) AS m FROM t),
          ex AS (SELECT doc_id, toks, UNNEST(generate_series(0, m)) AS chunk_id FROM st)
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
          array_to_string(list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ') AS chunk_text,
          CAST(LEN(list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT) AS n_chunk_tokens
        FROM ex ORDER BY doc_id, chunk_id""")),

    // ── BPE-ish regex tokenization: letter-runs, digit-runs, and single
    //    punctuation marks as separate tokens (the pre-tokenizer split most
    //    BPE vocabularies assume) ────────────────────────────────────────────
    Q(
      "q_token_bpe",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
              .cast("long").as("n_bpe_tokens"),
            size(split(col("text"), " ")).cast("long").as("n_ws_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
        CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_ws_tokens
        FROM documents ORDER BY doc_id""")),

    // ── document fingerprint (custom rolling-hash expression). Oracle:
    //    bit-exact replication of the winnowing fingerprint in DuckDB — the
    //    rolling recurrence h = (h·B + c) mod 2⁶⁴ over each 16-char window
    //    equals the direct polynomial Σ c_j·B^(15−j) mod 2⁶⁴, computed with
    //    HUGEINT arithmetic and pre-folded power constants; the xorshift
    //    finalizer is xor(h, h div 2³¹) and the min is unsigned (HUGEINT
    //    domain [0, 2⁶⁴)). Docs shorter than the window would take the FNV
    //    path — corpus min length is far above 16, and a regression would
    //    surface as a row mismatch here ─────────────────────────────────────
    Q(
      "q_doc_fingerprint",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
          .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("keep_doc"))
          .filter(col("n_docs") >= 1)
          .orderBy(col("keep_doc"))
      },
      Some {
        val m = BigInt(2).pow(64)
        // P_j = B^(15-j) mod 2^64 — the per-position coefficients of the
        // 16-char window polynomial (B = the expression's rolling base)
        val poly = (0 until 16)
          .map(j => s"a[i + $j] * ${BigInt(1315423911).pow(15 - j).mod(m)}")
          .mkString(" + ")
        s"""WITH c AS (SELECT doc_id,
            list_transform(generate_series(1, len(text)),
              i -> CAST(ord(substr(text, i, 1)) AS HUGEINT)) AS a,
            len(text) AS n
          FROM documents),
        w AS (SELECT doc_id, ($poly) % $m AS h
          FROM c CROSS JOIN UNNEST(generate_series(1, n - 15)) AS t(i)),
        mn AS (SELECT doc_id, MIN(xor(h, h // 2147483648)) AS fpu
          FROM w GROUP BY 1),
        f AS (SELECT doc_id, CAST(CASE WHEN fpu >= ${BigInt(2).pow(63)}
            THEN fpu - $m ELSE fpu END AS BIGINT) AS fp
          FROM mn)
        SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc
        FROM f GROUP BY 1 ORDER BY keep_doc"""
      }),

    // ── multimodal: binary payload column + content hash / size (the
    //    SQL-checkable slice of the media plumbing) ────────────────────────
    Q(
      "q_binary_features",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
            sha2(encode(col("text"), "UTF-8"), 256).as("content_sha256"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
        SHA256(text) AS content_sha256
        FROM documents ORDER BY doc_id""")),

    // ── multimodal resize plumbing, oracle-checked: the byte-downsample
    //    stub is deterministic arithmetic, so the whole operator path
    //    (payload in → payload' + recomputed metadata out) is verifiable
    //    end-to-end even with codecs stubbed ────────────────────────────────
    Q(
      "q_media_resize",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val media = graft.ext.Multimodal.withBinaryPayload(d)
        graft.ext.Multimodal.resize(media, 64, 64)
          .join(media.select(col("media_id"),
            octet_length(col("payload")).cast("long").as("n_bytes_in"),
            col("meta.width").cast("long").as("w_in"),
            col("meta.height").cast("long").as("h_in")), Seq("media_id"))
          .select(col("media_id"), col("n_bytes_in"), col("w_in"), col("h_in"),
            octet_length(col("payload")).cast("long").as("n_bytes_out"),
            col("meta.width").cast("long").as("w_out"),
            col("meta.height").cast("long").as("h_out"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
            CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes_in,
            CAST(doc_id % 640 + 1 AS BIGINT) AS w_in,
            CAST(doc_id % 480 + 1 AS BIGINT) AS h_in
          FROM documents)
        SELECT media_id, n_bytes_in, w_in, h_in,
          CAST(GREATEST(1, FLOOR(n_bytes_in *
            LEAST(1.0, 4096.0 / (w_in * h_in)))) AS BIGINT) AS n_bytes_out,
          CAST(LEAST(w_in, 64) AS BIGINT) AS w_out,
          CAST(LEAST(h_in, 64) AS BIGINT) AS h_out
        FROM m ORDER BY media_id""")),

    // ── REAL image decode (round 8, javax.imageio — no longer stubbed):
    //    deterministic grayscale-gradient PNG fixtures are ENCODED on the
    //    executors, decoded back, and every emitted statistic — decoded
    //    dims, exact luminance sum, aHash bit string from decoded pixels,
    //    and the luminance sum after a real resize (integer box-average
    //    resample → PNG re-encode → second decode) — is reproduced by the
    //    oracle from the integer generation formula ALONE. Hash-green
    //    certifies the decode path operates on real pixels end-to-end ───────
    Q(
      "q_media_image_decode",
      (s, dir) => {
        import graft.ext.Multimodal
        val d = t(s, dir, "documents")
        val imgs = Multimodal.imagePayload(d)
        val stats = Multimodal.decodeImageStats(imgs)
        val resized = Multimodal
          .decodeImageStats(Multimodal.resizeImage(imgs, 8, 8))
          .select(col("media_id"), col("sum_lum").as("r_sum_lum"))
        stats.join(resized, Seq("media_id"))
          .select(col("media_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height"), col("n_pixels"),
            col("sum_lum"), col("phash_bits"), col("r_sum_lum"))
          .orderBy(col("media_id"))
      },
      Some("""WITH d AS (SELECT doc_id, (doc_id % 13) + 8 AS w,
            (doc_id % 11) + 8 AS h FROM documents),
          px AS (SELECT doc_id, w, h, x, y, (x + y + doc_id) % 256 AS v
            FROM d
            CROSS JOIN UNNEST(generate_series(0, w - 1)) AS sx(x)
            CROSS JOIN UNNEST(generate_series(0, h - 1)) AS sy(y)),
          tot AS (SELECT doc_id, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
              SUM(v) AS total_sum, COUNT(*) AS n
            FROM px GROUP BY 1),
          cell AS (SELECT doc_id, (y * 8) // h AS cj, (x * 8) // w AS ci,
              SUM(v) AS cs, COUNT(*) AS cn
            FROM px GROUP BY 1, 2, 3),
          bits AS (SELECT c.doc_id, cj * 8 + ci AS bit,
              CASE WHEN c.cs * t.n > t.total_sum * c.cn THEN '1' ELSE '0'
                END AS b
            FROM cell c JOIN tot t USING (doc_id)),
          ph AS (SELECT doc_id, STRING_AGG(b, '' ORDER BY bit) AS phash_bits
            FROM bits GROUP BY 1),
          rs AS (SELECT doc_id, SUM(cs // cn) AS r_sum_lum
            FROM cell GROUP BY 1)
        SELECT t.doc_id AS media_id, CAST(t.w AS BIGINT) AS width,
          CAST(t.h AS BIGINT) AS height, CAST(t.n AS BIGINT) AS n_pixels,
          CAST(t.total_sum AS BIGINT) AS sum_lum, ph.phash_bits,
          CAST(rs.r_sum_lum AS BIGINT) AS r_sum_lum
        FROM tot t JOIN ph USING (doc_id) JOIN rs USING (doc_id)
        ORDER BY media_id""")),

    // ── REAL audio decode (round 9, javax.sound.sampled — WAV/PCM needs no
    //    external codec, same argument that closed images in round 8):
    //    deterministic mono PCM16 WAV fixtures are ENCODED on the executors,
    //    decoded back through AudioSystem, and every emitted statistic —
    //    decoded sample/frame counts, exact integer power sum, global peak,
    //    silent-frame count — is reproduced by the oracle from the integer
    //    generation formula ALONE (every 5th doc is a near-silent clip, so
    //    the silence detector fires on real decoded data). Hash-green
    //    certifies the decode path operates on real PCM end-to-end ──────────
    Q(
      "q_media_audio_decode",
      (s, dir) => {
        import graft.ext.Multimodal
        val d = t(s, dir, "documents")
        Multimodal.decodeAudioStats(Multimodal.audioPayload(d))
          .select(col("media_id"), col("sample_rate").cast("long").as("sample_rate"),
            col("n_channels").cast("long").as("n_channels"), col("n_samples"),
            col("n_frames"), col("sum_sq"), col("peak"), col("n_silent"))
          .orderBy(col("media_id"))
      },
      Some("""WITH d AS (SELECT doc_id, (doc_id % 7) + 2 AS nf,
            (doc_id % 11) + 3 AS step,
            CASE WHEN doc_id % 5 = 0 THEN 64 ELSE 1 END AS dv
          FROM documents),
        s AS (SELECT doc_id, ti.i // 160 AS frame_no,
            ((ti.i * step + doc_id) % 4097) // dv - 2048 // dv AS v
          FROM d CROSS JOIN UNNEST(generate_series(0, nf * 160 - 1)) AS ti(i)),
        fr AS (SELECT doc_id, frame_no, SUM(v * v) AS fss,
            MAX(ABS(v)) AS fpeak
          FROM s GROUP BY 1, 2)
        SELECT doc_id AS media_id, CAST(8000 AS BIGINT) AS sample_rate,
          CAST(1 AS BIGINT) AS n_channels,
          CAST(COUNT(*) * 160 AS BIGINT) AS n_samples,
          CAST(COUNT(*) AS BIGINT) AS n_frames,
          CAST(SUM(fss) AS BIGINT) AS sum_sq,
          CAST(MAX(fpeak) AS BIGINT) AS peak,
          CAST(SUM(CASE WHEN fpeak <= 64 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_silent
        FROM fr GROUP BY doc_id ORDER BY media_id""")),

    // ── STEREO audio decode (round 12 — the mono face's fail-fast widened
    //    to real per-channel statistics): two deterministic channels with
    //    DIFFERENT strides interleave into one real PCM16 WAV, decode back
    //    through AudioSystem, and the per-(media, channel) rows — sample
    //    and frame counts, exact power sums, peaks, silent frames — are
    //    reproduced by the oracle from both integer formulas. Hash-green
    //    certifies the de-interleave indexes channels correctly (a swapped
    //    or mixed channel flips sum_sq/peak between rows) ──────────────────
    Q(
      "q_media_audio_stereo",
      (s, dir) => {
        import graft.ext.Multimodal
        val d = t(s, dir, "documents")
        Multimodal.decodeAudioStats(Multimodal.audioPayloadStereo(d))
          .select(col("media_id"), col("channel").cast("long").as("channel"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("n_channels").cast("long").as("n_channels"), col("n_samples"),
            col("n_frames"), col("sum_sq"), col("peak"), col("n_silent"))
          .orderBy(col("media_id"), col("channel"))
      },
      Some("""WITH d AS (SELECT doc_id, (doc_id % 7) + 2 AS nf,
            (doc_id % 11) + 3 AS step, (doc_id % 13) + 5 AS step2,
            CASE WHEN doc_id % 5 = 0 THEN 64 ELSE 1 END AS dv
          FROM documents),
        s AS (
          SELECT doc_id, 0 AS channel, ti.i // 160 AS frame_no,
              ((ti.i * step + doc_id) % 4097) // dv - 2048 // dv AS v
            FROM d CROSS JOIN UNNEST(generate_series(0, nf * 160 - 1)) AS ti(i)
          UNION ALL
          SELECT doc_id, 1 AS channel, ti.i // 160 AS frame_no,
              ((ti.i * step2 + 2 * doc_id) % 4097) // dv - 2048 // dv AS v
            FROM d CROSS JOIN UNNEST(generate_series(0, nf * 160 - 1)) AS ti(i)),
        fr AS (SELECT doc_id, channel, frame_no, SUM(v * v) AS fss,
            MAX(ABS(v)) AS fpeak
          FROM s GROUP BY 1, 2, 3)
        SELECT doc_id AS media_id, CAST(channel AS BIGINT) AS channel,
          CAST(8000 AS BIGINT) AS sample_rate,
          CAST(2 AS BIGINT) AS n_channels,
          CAST(COUNT(*) * 160 AS BIGINT) AS n_samples,
          CAST(COUNT(*) AS BIGINT) AS n_frames,
          CAST(SUM(fss) AS BIGINT) AS sum_sq,
          CAST(MAX(fpeak) AS BIGINT) AS peak,
          CAST(SUM(CASE WHEN fpeak <= 64 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_silent
        FROM fr GROUP BY doc_id, channel ORDER BY media_id, channel""")),

    // ── REAL video decode (round 10, RIFF/AVI demux + javax.imageio — the
    //    same JDK-only argument that closed images in round 8 and audio in
    //    round 9): deterministic AVI fixtures with PNG-compressed gradient
    //    frames and ONE PLANTED SCENE CUT (the second half inverts the
    //    gradient) are MUXED on the executors, demuxed + frame-decoded back,
    //    and every emitted statistic — per-frame decoded dims, exact
    //    luminance sum, the 1-D aHash Hamming distance to the previous
    //    DECODED frame, and the resulting cut flag — is reproduced by the
    //    oracle from the integer generation formula ALONE. Hash-green
    //    certifies demux → PNG decode → sceneCuts operate on real pixels
    //    end-to-end; only compressed codecs (H.264 etc.) remain stubbed ─────
    Q(
      "q_media_video_decode",
      (s, dir) => {
        import graft.ext.Multimodal
        val d = t(s, dir, "documents")
        val frames = Multimodal.decodeVideoFrames(Multimodal.videoPayload(d))
        val cuts = Multimodal.sceneCuts(
          frames.select(col("media_id"), col("frame_no"), col("frame")), 10)
        frames.join(cuts, Seq("media_id", "frame_no"))
          .select(col("media_id"), col("frame_no"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_pixels"), col("sum_lum"),
            coalesce(col("dist"), lit(-1L)).as("dist"),
            col("is_cut").cast("long").as("is_cut"))
          .orderBy(col("media_id"), col("frame_no"))
      },
      Some {
        val m = BigInt(2).pow(64)
        val pow2 = (0 to 63).map(b => s"($b, ${BigInt(2).pow(b)})").mkString(", ")
        s"""WITH pw(b, p2) AS (VALUES $pow2),
        d AS (SELECT doc_id, (doc_id % 9) + 8 AS w, (doc_id % 6) + 8 AS h,
            (doc_id % 5) + 4 AS nf FROM documents),
        fr AS (SELECT doc_id, w, h, f, nf // 2 AS cut_at
          FROM d CROSS JOIN UNNEST(generate_series(0, nf - 1)) AS tf(f)),
        px AS (SELECT doc_id, w, h, f, y * w + x AS p,
            CASE WHEN f < cut_at THEN (x + 2 * y + 3 * f + doc_id) % 256
              ELSE 255 - ((x + 2 * y + 3 * f + doc_id) % 256) END AS v
          FROM fr
          CROSS JOIN UNNEST(generate_series(0, w - 1)) AS sx(x)
          CROSS JOIN UNNEST(generate_series(0, h - 1)) AS sy(y)),
        tot AS (SELECT doc_id, f, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
            SUM(v) AS total, COUNT(*) AS n
          FROM px GROUP BY 1, 2),
        -- 1-D aHash over row-major decoded pixels: byte p lands in cell
        -- (p*64) div n; bit = cell mean > global mean in the same IEEE
        -- double division MediaHashImpl.aHash evaluates
        cell AS (SELECT doc_id, f, (p * 64) // (w * h) AS c, SUM(v) AS cs,
            COUNT(*) AS cn
          FROM px GROUP BY 1, 2, 3),
        bits AS (SELECT cell.doc_id, cell.f, c
          FROM cell JOIN tot USING (doc_id, f)
          WHERE CAST(cell.cs AS DOUBLE) / cell.cn
              > CAST(tot.total AS DOUBLE) / tot.n),
        ph AS (SELECT t.doc_id, t.f,
            COALESCE(SUM(CAST(x.p2 AS HUGEINT)), CAST(0 AS HUGEINT)) AS phu
          FROM tot t LEFT JOIN (SELECT doc_id, f, p2 FROM bits
              JOIN pw ON c = pw.b) x
            ON t.doc_id = x.doc_id AND t.f = x.f
          GROUP BY 1, 2),
        sig AS (SELECT doc_id, f, CAST(CASE WHEN phu >= ${BigInt(2).pow(63)}
            THEN phu - $m ELSE phu END AS BIGINT) AS phash
          FROM ph),
        seq AS (SELECT doc_id, f, phash,
            LAG(phash) OVER (PARTITION BY doc_id ORDER BY f) AS prev
          FROM sig),
        dm AS (SELECT doc_id, f, CASE WHEN prev IS NULL THEN -1
            ELSE bit_count(xor(phash, prev)) END AS dist FROM seq)
        SELECT t.doc_id AS media_id, CAST(t.f AS BIGINT) AS frame_no,
          CAST(t.w AS BIGINT) AS width, CAST(t.h AS BIGINT) AS height,
          CAST(t.n AS BIGINT) AS n_pixels, CAST(t.total AS BIGINT) AS sum_lum,
          CAST(dm.dist AS BIGINT) AS dist,
          CAST(CASE WHEN dm.dist >= 10 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
        FROM tot t JOIN dm ON t.doc_id = dm.doc_id AND t.f = dm.f
        ORDER BY media_id, frame_no"""
      }),

    // ── multimodal frame-sampling plumbing, oracle-checked: fixed-size
    //    chunker stub → every-2nd-frame rows; per-media frame counts and
    //    byte totals are exact arithmetic over the payload length ───────────
    Q(
      "q_media_frames",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val media = graft.ext.Multimodal.withBinaryPayload(d)
        graft.ext.Multimodal.sampleFrames(media, 256, 2)
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(octet_length(col("frame"))).cast("long").as("frame_bytes"),
            max(col("frame_no")).as("last_frame"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
            OCTET_LENGTH(ENCODE(text)) // 256 AS n_total
          FROM documents),
        f AS (SELECT media_id, (n_total + 1) // 2 AS n_frames,
            CAST((n_total - 1) // 2 * 2 AS BIGINT) AS last_frame
          FROM m WHERE n_total >= 1)
        SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
          CAST(n_frames * 256 AS BIGINT) AS frame_bytes, last_frame
        FROM f ORDER BY media_id""")),

    // ── perceptual media fingerprint groups: aHash (native codegen'd
    //    expression over the payload) grouped on the 8-byte hash — identical
    //    payloads collide exactly, near-identical media land within small
    //    Hamming distance (pair path: Multimodal.phashNearDups, recall
    //    pinned in ScalaTest). ALL groups are emitted, singletons included
    //    (the round-5 `n_media > 1` face was vacuous on driver data — no two
    //    driver documents share an aHash). Oracle: bit-exact aHash
    //    replication in DuckDB — payload bytes are the ASCII text bytes, the
    //    64-cell average-pool is integer index arithmetic, and the
    //    mean-threshold compare is reproduced in the same IEEE double form
    //    the expression uses ─────────────────────────────────────────────────
    Q(
      "q_media_phash_groups",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val media = graft.ext.Multimodal.withBinaryPayload(d)
        graft.ext.Multimodal.perceptualHash(media)
          .groupBy(col("phash"))
          .agg(count(lit(1)).as("n_media"),
            min(col("media_id")).as("first_id"), max(col("media_id")).as("last_id"))
          .orderBy(col("phash"))
      },
      Some {
        val m = BigInt(2).pow(64)
        val pow2 = (0 to 63).map(b => s"($b, ${BigInt(2).pow(b)})").mkString(", ")
        s"""WITH pw(b, p) AS (VALUES $pow2),
        base AS (SELECT doc_id AS media_id, text, len(text) AS L
          FROM documents WHERE len(text) > 0),
        -- byte i (0-based) lands in cell (i*64) div len — the average pool
        by AS (SELECT media_id, (i * 64) // L AS c,
            ord(substr(text, i + 1, 1)) AS v
          FROM base CROSS JOIN UNNEST(generate_series(0, L - 1)) AS t(i)),
        cell AS (SELECT media_id, c, SUM(v) AS s, COUNT(*) AS n
          FROM by GROUP BY 1, 2),
        tot AS (SELECT media_id, SUM(s) AS total, ANY_VALUE(b.L) AS L
          FROM cell JOIN base b USING (media_id) GROUP BY 1),
        -- cell mean > global mean, in the same double division the
        -- expression evaluates (all operands exact in double)
        bits AS (SELECT cell.media_id, c FROM cell JOIN tot USING (media_id)
          WHERE CAST(cell.s AS DOUBLE) / cell.n
              > CAST(tot.total AS DOUBLE) / tot.L),
        ph AS (SELECT b.media_id,
            COALESCE(SUM(CAST(p AS HUGEINT)), CAST(0 AS HUGEINT)) AS phu
          FROM base b LEFT JOIN (SELECT media_id, p FROM bits JOIN pw ON c = pw.b) x
            ON b.media_id = x.media_id
          GROUP BY 1),
        sig AS (SELECT media_id, CAST(CASE WHEN phu >= ${BigInt(2).pow(63)}
            THEN phu - $m ELSE phu END AS BIGINT) AS phash
          FROM ph)
        SELECT phash, COUNT(*) AS n_media, MIN(media_id) AS first_id,
          MAX(media_id) AS last_id
        FROM sig GROUP BY 1 ORDER BY phash"""
      }),

    // ── audio frame energy: REAL PCM16LE DSP over the binary payload
    //    (no codec needed for raw PCM — a compressed container would swap a
    //    decoder in front of the same frame loop). Per-media roll-up of
    //    frame RMS/peak; integer power sums per frame keep it exact ──────────
    Q(
      "q_media_audio_energy",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val media = graft.ext.Multimodal.withBinaryPayload(d)
        graft.ext.Multimodal.audioFrameEnergy(media, 128)
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(col("n_samples")).as("n_samples"),
            round(max(col("rms")), 6).as("max_rms"),
            max(col("peak")).as("peak"))
          .orderBy(col("media_id"))
      },
      // oracle: the same PCM16LE frame loop in SQL — payload bytes are the
      // ASCII text bytes, sample s = byte(2s+1)·256 + byte(2s) (high bytes
      // are ASCII < 0x80, so sign extension never fires), integer power
      // sums per 128-sample frame, then the identical double rms
      Some("""WITH base AS (SELECT doc_id AS media_id, text, len(text) AS L
          FROM documents WHERE len(text) >= 2),
        smp AS (SELECT media_id, (i - 1) // 128 AS frame,
            ord(substr(text, 2 * i, 1)) * 256 + ord(substr(text, 2 * i - 1, 1)) AS v
          FROM base CROSS JOIN UNNEST(generate_series(1, L // 2)) AS t(i)),
        frm AS (SELECT media_id, frame, COUNT(*) AS n,
            SUM(CAST(v AS BIGINT) * v) AS sum2, MAX(ABS(v)) AS pk
          FROM smp GROUP BY 1, 2)
        SELECT media_id, COUNT(*) AS n_frames, CAST(SUM(n) AS BIGINT) AS n_samples,
          ROUND(MAX(SQRT(CAST(sum2 AS DOUBLE) / n)), 6) AS max_rms,
          CAST(MAX(pk) AS BIGINT) AS peak
        FROM frm GROUP BY 1 ORDER BY media_id""")),

    // ── event analytics: tumbling-window aggregation (batch analog of the
    //    streaming windowedCounts; 1-hour windows via date_trunc) ──────────
    Q(
      "q_events_window",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(date_trunc("hour", col("ts")).cast("date").as("day"),
            hour(col("ts")).cast("long").as("hr"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 6)))
              .cast("double").as("total_value"))
          .orderBy(col("day"), col("hr"), col("event_type"))
      },
      Some("""SELECT CAST(DATE_TRUNC('hour', ts) AS DATE) AS day,
          CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2, 3 ORDER BY day, hr, event_type"""),
      bench = true),

    // ── as-of join: each purchase attaches the user's latest prior-or-
    //    simultaneous view (union+window construction; DuckDB's native
    //    ASOF JOIN is the oracle) ────────────────────────────────────────────
    Q(
      "q_asof_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
        graft.ext.AsOfJoin.asofJoin(purchases, views, Seq("user_id"),
            "p_us", "v_us", Nil)
          .select(col("event_id"), col("user_id"), col("p_us"),
            col("asof_v_us").as("v_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        ORDER BY p.event_id""")),

    // ── forward as-of join: each purchase attaches the user's EARLIEST
    //    at-or-after view (the "next event after" lookup), mirrored
    //    union+window construction — one shuffle on the key ─────────────────
    Q(
      "q_asof_forward",
      (s, dir) => {
        val e = t(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
        graft.ext.AsOfJoin.asofJoinForward(purchases, views, Seq("user_id"),
            "p_us", "v_us", Nil)
          .select(col("event_id"), col("user_id"), col("p_us"),
            col("asof_v_us").as("v_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts >= p.ts
        ORDER BY p.event_id""")),

    // ── range join: views within the hour before each purchase
    //    (bucketized construction — no nested-loop cross product; the
    //    oracle is DuckDB's plain inequality join) ───────────────────────────
    Q(
      "q_range_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
        graft.ext.RangeJoin
          .lookbackJoin(purchases, views, Seq("user_id"), "p_us", "v_us",
            3600L * 1000000L)
          .groupBy(col("event_id"), col("user_id"), col("p_us"))
          .agg(count(lit(1)).as("n_views_1h"), max(col("v_us")).as("latest_view_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us,
          COUNT(*) AS n_views_1h, MAX(epoch_us(v.ts)) AS latest_view_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND epoch_us(v.ts) >= epoch_us(p.ts) - CAST(3600000000 AS BIGINT)
         AND epoch_us(v.ts) <= epoch_us(p.ts)
        GROUP BY 1, 2, 3 ORDER BY p.event_id""")),

    // ── event analytics: signup→purchase conversion funnel (ordering-
    //    sensitive: purchase must follow the user's first signup) ───────────
    Q(
      "q_events_funnel",
      (s, dir) => {
        val e = t(s, dir, "events")
        val signups = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("signup_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
          .join(signups, Seq("user_id"))
          .filter(col("p_us") > col("signup_us"))
          .groupBy(col("user_id")).agg(min(col("p_us")).as("first_purchase_us"))
        signups.join(purchases, Seq("user_id"), "left")
          .select(col("user_id"), col("signup_us"),
            coalesce(col("first_purchase_us"), lit(-1L)).as("first_purchase_us"),
            when(col("first_purchase_us").isNotNull, 1L).otherwise(0L).as("converted"))
          .orderBy(col("user_id"))
      },
      Some("""WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS signup_us
          FROM events WHERE event_type = 'signup' GROUP BY user_id),
        p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase_us
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.signup_us
          GROUP BY e.user_id)
        SELECT s.user_id, s.signup_us,
          COALESCE(p.first_purchase_us, -1) AS first_purchase_us,
          CAST(CASE WHEN p.first_purchase_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS converted
        FROM s LEFT JOIN p ON s.user_id = p.user_id
        ORDER BY s.user_id""")),

    // ── interval-join attribution: each purchase matched to same-user
    //    signups within the preceding hour (batch analog of the
    //    stream-stream watermarked join in EventsStream) ────────────────────
    Q(
      "q_events_attribution",
      (s, dir) => {
        val e = t(s, dir, "events")
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id"), unix_micros(col("ts")).as("signup_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("purchase_us"),
            col("value"))
        signups.join(purchases, Seq("user_id"))
          .filter(col("purchase_us") >= col("signup_us") &&
            col("purchase_us") <= col("signup_us") + lit(3600000000L))
          .select(col("user_id"), col("signup_us"), col("purchase_us"), col("value"))
          .orderBy(col("user_id"), col("signup_us"), col("purchase_us"), col("value"))
      },
      Some("""SELECT s.user_id, epoch_us(s.ts) AS signup_us,
          epoch_us(p.ts) AS purchase_us, p.value
        FROM events s JOIN events p
          ON s.user_id = p.user_id
          AND s.event_type = 'signup' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) >= epoch_us(s.ts)
          AND epoch_us(p.ts) <= epoch_us(s.ts) + CAST(3600000000 AS BIGINT)
        ORDER BY s.user_id, signup_us, purchase_us, p.value""")),

    // ── event analytics: gap-based sessionization (30-min idle), batch
    //    analog of the mapGroupsWithState streaming operator ───────────────
    Q(
      "q_events_sessionize",
      (s, dir) => {
        val e = t(s, dir, "events")
        graft.ext.Sessionize.withSessionIds(
          e.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
          .orderBy(col("user_id"), col("sess_id"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
          LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        FROM events),
        marked AS (SELECT user_id, event_id, us,
          CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
        FROM ev),
        sess AS (SELECT user_id, event_id, us,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        FROM marked)
        SELECT user_id, sess_id, COUNT(*) AS n_events,
          MAX(us) - MIN(us) AS dur_us
        FROM sess GROUP BY 1, 2 ORDER BY user_id, sess_id"""),
      bench = true)
  )
}

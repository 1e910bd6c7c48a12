package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Corpus-health analytics (round 4, beyond the reference surface): the
  * audit queries a training-data pipeline runs between ingestion and
  * training — snapshot diffing, split drift, robust outlier screens,
  * bigram LM scoring, embedding health, engagement metrics, and corpus
  * balance. Every query pre-shrinks with aggregation before joining and
  * keeps windows partitioned (or bounded), so each plan survives a 100×
  * scale-up: no global sorts over raw rows, no cartesian products, no
  * driver-side state.
  *
  * Determinism policy (shared with Extensions): exact integer/decimal
  * arithmetic everywhere order can vary; IEEE double math only in final
  * per-row expressions whose shape is identical on both engines; `round`
  * before any cross-engine hash comparison of a float.
  */
object CorpusAnalytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** HUGEINT replication of MulShiftBucket for oracle SQL (wrapped 64-bit
    * multiply, unsigned shift by 33, mod 100 — see CorpusPipeline). */
  private val OracleSplitBucket =
    "((CAST(doc_id AS HUGEINT) * 2654435761) % 18446744073709551616) // 8589934592 % 100"

  val queries: Seq[Q] = Seq(
    // ── corpus snapshot diff: classify every doc across two corpus versions
    //    as added/removed/changed/unchanged by CONTENT HASH — the digests
    //    (64 bytes), not the documents, flow through the full-outer join, so
    //    the diff of two 100 TB snapshots shuffles only ids+hashes. Versions
    //    are derived deterministically from the corpus for the oracle ───────
    Q(
      "q_corpus_diff",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val vOld = d.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), sha2(encode(col("text"), "UTF-8"), 256).as("h_old"))
        val vNew = d.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), sha2(encode(
            when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")), "UTF-8"), 256).as("h_new"))
        vOld.join(vNew, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("h_old").isNull, lit("added"))
              .when(col("h_new").isNull, lit("removed"))
              .when(col("h_old") =!= col("h_new"), lit("changed"))
              .otherwise(lit("unchanged")).as("status"))
          .groupBy("status")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("status")
      },
      Some("""WITH v_old AS (SELECT doc_id, sha256(text) AS h_old
            FROM documents WHERE doc_id % 7 <> 0),
          v_new AS (SELECT doc_id,
              sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS h_new
            FROM documents WHERE doc_id % 5 <> 0)
          SELECT CASE WHEN h_old IS NULL THEN 'added'
                      WHEN h_new IS NULL THEN 'removed'
                      WHEN h_old <> h_new THEN 'changed'
                      ELSE 'unchanged' END AS status,
            COUNT(*) AS n_docs, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          FROM v_old FULL OUTER JOIN v_new USING (doc_id)
          GROUP BY 1 ORDER BY status""")),

    // ── split drift (PSI): population stability index of the token-length
    //    distribution between the train and test splits — the standard
    //    "did my split skew a feature" check. Buckets are exact integer
    //    log2 lengths; shares are Laplace-smoothed so ln() never sees 0;
    //    PSI terms are rounded then DECIMAL-summed (order-independent);
    //    the one unpartitioned window runs over ≤64 bucket rows (bounded
    //    domain — a power-of-two bucket index of a 64-bit count) ────────────
    Q(
      "q_split_drift",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val sb = graft.ext.CorpusPipeline.splitBucket(col("doc_id"))
        val bucketed = d
          .select(sb.as("sb"),
            (length(bin(size(split(col("text"), " ")).cast("long"))) - 1)
              .cast("long").as("bucket"))
          .filter(col("sb") < 90 || col("sb") >= 95)
          .select(when(col("sb") < 90, "train").otherwise("test").as("split"),
            col("bucket"))
        val counts = bucketed.groupBy("bucket")
          .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
            sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
        val k = counts.agg(count(lit(1)).as("k"),
          sum(col("n_train")).as("tot_train"), sum(col("n_test")).as("tot_test"))
        counts.crossJoin(broadcast(k))
          .select(col("bucket"), col("n_train"), col("n_test"),
            ((col("n_train") + 1).cast("double") /
              (col("tot_train") + col("k")).cast("double")).as("p"),
            ((col("n_test") + 1).cast("double") /
              (col("tot_test") + col("k")).cast("double")).as("q"))
          .select(col("bucket"), col("n_train"), col("n_test"),
            round(col("p"), 6).as("p_train"), round(col("q"), 6).as("p_test"),
            round((col("p") - col("q")) * log(col("p") / col("q")), 9)
              .cast(DecimalType(28, 9)).as("term"))
          .withColumn("psi", round(sum(col("term")).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .cast("double"), 6))
          .select(col("bucket"), col("n_train"), col("n_test"),
            col("p_train"), col("p_test"),
            round(col("term").cast("double"), 6).as("psi_term"), col("psi"))
          .orderBy("bucket")
      },
      Some(s"""WITH b AS (SELECT
            CASE WHEN $OracleSplitBucket < 90 THEN 'train'
                 WHEN $OracleSplitBucket >= 95 THEN 'test' END AS split,
            CAST(LENGTH(BIN(CAST(len(string_split(text, ' ')) AS BIGINT))) - 1
              AS BIGINT) AS bucket
          FROM documents),
        c AS (SELECT bucket,
            CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
            CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
          FROM b WHERE split IS NOT NULL GROUP BY 1),
        k AS (SELECT COUNT(*) AS k, SUM(n_train) AS tot_train,
            SUM(n_test) AS tot_test FROM c),
        p AS (SELECT bucket, n_train, n_test,
            CAST(n_train + 1 AS DOUBLE) / CAST(tot_train + k AS DOUBLE) AS p,
            CAST(n_test + 1 AS DOUBLE) / CAST(tot_test + k AS DOUBLE) AS q
          FROM c CROSS JOIN k),
        tm AS (SELECT bucket, n_train, n_test,
            ROUND(p, 6) AS p_train, ROUND(q, 6) AS p_test,
            CAST(ROUND((p - q) * LN(p / q), 9) AS DECIMAL(28,9)) AS term FROM p)
        SELECT bucket, n_train, n_test, p_train, p_test,
          ROUND(CAST(term AS DOUBLE), 6) AS psi_term,
          ROUND(CAST(SUM(term) OVER () AS DOUBLE), 6) AS psi
        FROM tm ORDER BY bucket""")),

    // ── bigram LM quality score: per-doc mean −ln P(wᵢ|wᵢ₋₁) with add-one
    //    smoothing — the conditional complement of q_unigram_logprob (a
    //    repetitive doc scores LOW here even when its unigrams are common).
    //    Bigrams via transform(sequence(...)) — no positional self-join;
    //    per-token rounds DECIMAL-summed for order independence ─────────────
    Q(
      "q_bigram_logprob",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val toks = d.select(col("doc_id"), split(lower(col("text")), " ").as("t"))
        val uni = toks.select(explode(col("t")).as("w1"))
          .groupBy("w1").agg(count(lit(1)).as("c1"))
        val vocab = uni.agg(count(lit(1)).as("v"))
        val bg = toks.filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
            .as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        bg.join(bgc, Seq("w1", "w2")).join(uni, Seq("w1"))
          .crossJoin(broadcast(vocab))
          .select(col("doc_id"),
            round(-log((col("c12") + 1).cast("double") /
              (col("c1") + col("v")).cast("double")), 6)
              .cast(DecimalType(28, 6)).as("nll"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("sum_dec"))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("sum_dec").cast("double") /
              col("n_bigrams").cast("double"), 6).as("mean_nll"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents),
          uni AS (SELECT w1, COUNT(*) AS c1 FROM
            (SELECT UNNEST(t) AS w1 FROM toks) GROUP BY 1),
          voc AS (SELECT COUNT(*) AS v FROM uni),
          bge AS (SELECT doc_id,
              UNNEST(list_transform(generate_series(1, len(t)-1), i -> t[i])) AS w1,
              UNNEST(list_transform(generate_series(1, len(t)-1), i -> t[i+1])) AS w2
            FROM toks WHERE len(t) >= 2),
          bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bge GROUP BY 1, 2),
          scored AS (SELECT doc_id,
              CAST(ROUND(-LN(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)), 6)
                AS DECIMAL(28,6)) AS nll
            FROM bge JOIN bgc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN voc)
          SELECT doc_id, COUNT(*) AS n_bigrams,
            ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
          FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ── MAD outlier screen: median/median-absolute-deviation per event
    //    type — the robust complement of q_zscore_outliers (a single wild
    //    value cannot move the estimator). Exact interpolated percentiles;
    //    the 3σ-equivalent threshold 4.4478 = 3·1.4826 is one literal so
    //    both engines evaluate the identical IEEE expression ────────────────
    Q(
      "q_mad_outliers",
      (s, dir) => {
        val e = t(s, dir, "events")
        val med = e.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = e.join(med, Seq("event_type"))
          .withColumn("absdev", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(absdev, 0.5)").as("mad"))
        dev.join(mad, Seq("event_type"))
          .withColumn("is_out",
            (col("absdev") > lit(4.4478) * col("mad")).cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(min(col("med")), 6).as("median_v"),
            round(min(col("mad")), 6).as("mad_v"),
            sum(col("is_out")).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1),
          dev AS (SELECT e.event_type, ABS(e.value - m.med) AS absdev, m.med
            FROM events e JOIN med m USING (event_type)),
          mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
            FROM dev GROUP BY 1)
          SELECT d.event_type, COUNT(*) AS n,
            ROUND(MIN(d.med), 6) AS median_v,
            ROUND(MIN(m.mad), 6) AS mad_v,
            CAST(SUM(CASE WHEN d.absdev > 4.4478 * m.mad THEN 1 ELSE 0 END)
              AS BIGINT) AS n_outliers
          FROM dev d JOIN mad m USING (event_type)
          GROUP BY 1 ORDER BY d.event_type""")),

    // ── embedding health audit: per-label vector counts, zero-norm
    //    vectors (dead encoders), and norm spread — the sanity gate before
    //    any ANN index build. Norms per vector from one posexplode pass;
    //    the label mean uses the decimal-sum pattern ─────────────────────────
    Q(
      "q_embed_audit",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val norms = e
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          .select(col("vec_id"), col("label"), col("x").cast("double").as("x"))
          .groupBy("vec_id", "label")
          .agg(sqrt(sum(col("x") * col("x"))).as("nv"))
        norms.groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("nv") === 0.0, 1L).otherwise(0L)).as("n_zero"),
            round(min(col("nv")), 6).as("min_norm"),
            round(max(col("nv")), 6).as("max_norm"),
            round(sum(round(col("nv"), 9).cast(DecimalType(28, 9)))
              .cast("double") / count(lit(1)), 6).as("mean_norm"))
          .orderBy("label")
      },
      Some("""WITH ex AS (SELECT vec_id, label, CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings CROSS JOIN
              UNNEST(generate_series(1, len(embedding))) AS s(i)),
          nrm AS (SELECT vec_id, label, SQRT(SUM(x*x)) AS nv
            FROM ex GROUP BY 1, 2)
          SELECT label, COUNT(*) AS n_vecs,
            CAST(SUM(CASE WHEN nv = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
            ROUND(MIN(nv), 6) AS min_norm, ROUND(MAX(nv), 6) AS max_norm,
            ROUND(CAST(SUM(CAST(ROUND(nv, 9) AS DECIMAL(28,9))) AS DOUBLE)
              / COUNT(*), 6) AS mean_norm
          FROM nrm GROUP BY label ORDER BY label""")),

    // ── DAU/WAU stickiness: rolling 7-day distinct users per day. The
    //    trailing-distinct is NOT decomposable from daily distincts, so each
    //    active (user, day) fans out to the ≤7 cover days it supports — a
    //    bounded explode + one distinct, never a day×user broadcast or a
    //    range self-join (the 100 TB shape for rolling UNIQUE counts) ────────
    Q(
      "q_events_dau_wau",
      (s, dir) => {
        val e = t(s, dir, "events")
        val userDays = e
          .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
        val dau = userDays.groupBy("day").agg(count(lit(1)).as("dau"))
        val cover = userDays
          .select(col("user_id"), explode(expr("sequence(0, 6)")).as("i"), col("day"))
          .select(col("user_id"), expr("date_add(day, i)").as("day"))
          .distinct()
        val wau = cover.groupBy("day").agg(count(lit(1)).as("wau"))
        dau.join(wau, Seq("day"))
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau").cast("double"), 6)
              .as("stickiness"))
          .orderBy("day")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
          dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
          cover AS (SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day
            FROM ud CROSS JOIN UNNEST(generate_series(0, 6)) AS s(i)),
          wau AS (SELECT day, COUNT(*) AS wau FROM cover GROUP BY 1)
          SELECT day, dau, wau,
            ROUND(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
          FROM dau JOIN wau USING (day) ORDER BY day""")),

    // ── corpus balance: per-source Gini coefficient of document token
    //    counts (G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over the within-source
    //    ascending sort). Rank windows are PARTITIONED by source — a
    //    distributed sort, no global window; every sum is exact integer/
    //    decimal so the only float math is the final ratio ──────────────────
    Q(
      "q_source_gini",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val nt = d.select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("x"))
        val w = Window.partitionBy("source").orderBy(col("x"), col("doc_id"))
        nt.withColumn("i", row_number().over(w).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum((col("i") * col("x")).cast(DecimalType(38, 0))).as("six"))
          .select(col("source"), col("n").as("n_docs"), col("sx").as("total_toks"),
            round((lit(2.0) * col("six").cast("double") -
              (col("n") + 1).cast("double") * col("sx").cast("double")) /
              (col("n").cast("double") * col("sx").cast("double")), 6).as("gini"))
          .orderBy("source")
      },
      Some("""WITH nt AS (SELECT source, doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS x FROM documents),
          r AS (SELECT source, x,
            CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id)
              AS BIGINT) AS i FROM nt),
          a AS (SELECT source, COUNT(*) AS n, SUM(x) AS sx,
            SUM(CAST(i * x AS DECIMAL(38,0))) AS six FROM r GROUP BY 1)
          SELECT source, CAST(n AS BIGINT) AS n_docs,
            CAST(sx AS BIGINT) AS total_toks,
            ROUND((2.0 * CAST(six AS DOUBLE) -
              CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE)) /
              (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
          FROM a ORDER BY source""")),

    // ── label-noise audit: confusion matrix between the corpus's claimed
    //    language label and the engine's language ID — the standard screen
    //    for mislabeled training data. Share is within the claimed label
    //    (window over the post-aggregation confusion cells — bounded by
    //    #langs², never the corpus) ──────────────────────────────────────────
    Q(
      "q_lang_confusion",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val cells = d
          .select(col("lang").as("lang_given"),
            graft.ext.TextAnalysis.langId(col("text")).as("lang_pred"))
          .groupBy("lang_given", "lang_pred")
          .agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("lang_given")
        cells
          .withColumn("share",
            round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 6))
          .withColumn("is_match", (col("lang_given") === col("lang_pred")).cast("long"))
          .orderBy("lang_given", "lang_pred")
      },
      Some("""WITH scored AS (SELECT lang AS lang_given,
            CAST(len(list_filter(string_split(lower(text), ' '),
              x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS BIGINT) AS he,
            CAST(len(list_filter(string_split(lower(text), ' '),
              x -> list_contains(['der','die','das','und','ist','von','nicht','ein'], x))) AS BIGINT) AS hd,
            CAST(len(list_filter(string_split(lower(text), ' '),
              x -> list_contains(['le','la','les','et','est','de','un','une'], x))) AS BIGINT) AS hf,
            CAST(len(list_filter(string_split(lower(text), ' '),
              x -> list_contains(['el','la','los','y','es','de','un','que'], x))) AS BIGINT) AS hs
          FROM documents),
        pred AS (SELECT lang_given,
            CASE WHEN GREATEST(he, hd, hf, hs) = 0 THEN 'und'
                 WHEN hf = GREATEST(he, hd, hf, hs) THEN 'fr'
                 WHEN hs = GREATEST(he, hd, hf, hs) THEN 'es'
                 WHEN he = GREATEST(he, hd, hf, hs) THEN 'en'
                 ELSE 'de' END AS lang_pred
          FROM scored),
        cells AS (SELECT lang_given, lang_pred, COUNT(*) AS n_docs
          FROM pred GROUP BY 1, 2)
        SELECT lang_given, lang_pred, n_docs,
          ROUND(CAST(n_docs AS DOUBLE) /
            SUM(n_docs) OVER (PARTITION BY lang_given), 6) AS share,
          CAST(CASE WHEN lang_given = lang_pred THEN 1 ELSE 0 END AS BIGINT) AS is_match
        FROM cells ORDER BY lang_given, lang_pred""")),

    // ── event-rate anomaly detection: hourly counts per type vs the
    //    trailing 24-hour window (RANGE frame over integer epoch-hours on
    //    PRE-AGGREGATED hourly counts — the window never sees raw events).
    //    Mean/std from exact integer power sums inside the frame, so the
    //    z-score is partitioning-independent; stddev_samp would not be ───────
    Q(
      "q_events_anomaly",
      (s, dir) => {
        val e = t(s, dir, "events")
        val hourly = e
          .select(col("event_type"), (unix_micros(col("ts")) / 3600000000L)
            .cast("long").as("hr"))
          .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("hr")
          .rangeBetween(-24, -1)
        hourly
          .withColumn("np", count(lit(1)).over(w))
          .withColumn("sp", sum(col("n")).over(w))
          .withColumn("spp", sum(col("n") * col("n")).over(w))
          .filter(col("np") >= 12)
          .withColumn("mean_prev",
            col("sp").cast("double") / col("np").cast("double"))
          .withColumn("var_prev",
            (col("spp").cast("double") - col("sp").cast("double") *
              col("sp").cast("double") / col("np").cast("double")) /
              (col("np") - 1).cast("double"))
          .withColumn("z", (col("n").cast("double") - col("mean_prev")) /
            sqrt(col("var_prev")))
          .filter(col("var_prev") > 0.0)
          .select(col("event_type"), col("hr"), col("n"), col("np").as("n_prev_hours"),
            round(col("mean_prev"), 6).as("mean_prev"),
            round(col("z"), 6).as("z"),
            (abs(col("z")) > 3.0).cast("long").as("is_anomaly"))
          .orderBy("event_type", "hr")
      },
      Some("""WITH hourly AS (SELECT event_type,
            CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        fr AS (SELECT event_type, hr, n,
            COUNT(*) OVER w AS np,
            SUM(n) OVER w AS sp,
            SUM(n * n) OVER w AS spp
          FROM hourly
          WINDOW w AS (PARTITION BY event_type ORDER BY hr
            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        st AS (SELECT event_type, hr, n, np,
            CAST(sp AS DOUBLE) / CAST(np AS DOUBLE) AS mean_prev,
            (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
              / CAST(np AS DOUBLE)) / CAST(np - 1 AS DOUBLE) AS var_prev
          FROM fr WHERE np >= 12)
        SELECT event_type, hr, n, CAST(np AS BIGINT) AS n_prev_hours,
          ROUND(mean_prev, 6) AS mean_prev,
          ROUND((CAST(n AS DOUBLE) - mean_prev) / SQRT(var_prev), 6) AS z,
          CAST(CASE WHEN ABS((CAST(n AS DOUBLE) - mean_prev) / SQRT(var_prev)) > 3.0
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        FROM st WHERE var_prev > 0.0 ORDER BY event_type, hr""")),

    // ── out-of-vocabulary rate: share of each doc's tokens outside the
    //    top-1000 corpus vocabulary — the tokenizer-coverage screen run
    //    before committing a vocab. The vocab cut is a deterministic
    //    (count DESC, term) top-k via TakeOrderedAndProject; docs join it
    //    BROADCAST (1000 rows however big the corpus) ────────────────────────
    Q(
      "q_oov_rate",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val toks = d.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("term"))
        val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), col("term")).limit(1000)
          .select(col("term"), lit(1L).as("in_v"))
        toks.join(broadcast(vocab), Seq("term"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(coalesce(col("in_v"), lit(0L))).as("n_in_vocab"))
          .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"),
            round(lit(1.0) - col("n_in_vocab").cast("double") /
              col("n_tokens").cast("double"), 6).as("oov_rate"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id,
            UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
          v AS (SELECT term FROM (SELECT term, COUNT(*) AS cnt FROM toks
            GROUP BY 1 ORDER BY cnt DESC, term LIMIT 1000)),
          j AS (SELECT t.doc_id,
              CASE WHEN v.term IS NULL THEN 0 ELSE 1 END AS iv
            FROM toks t LEFT JOIN v ON t.term = v.term)
          SELECT doc_id, COUNT(*) AS n_tokens,
            CAST(SUM(iv) AS BIGINT) AS n_in_vocab,
            ROUND(1.0 - CAST(SUM(iv) AS DOUBLE) / COUNT(*), 6) AS oov_rate
          FROM j GROUP BY 1 ORDER BY doc_id""")),

    // ── table profile: per-column null count, distinct count, min/max —
    //    the first audit run against any newly landed table. ONE scan: all
    //    24 aggregates compute in a single pass (Spark plans the multi-
    //    countDistinct as one Expand ×6 — at 100 TB swap countDistinct for
    //    approx_count_distinct to drop the expansion; the operator shape is
    //    unchanged). Numeric and temporal min/max are typed apart from
    //    string min/max so every value compares exactly across engines ─────
    Q(
      "q_profile_orders",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
        val strCols = Seq("o_orderstatus", "o_orderpriority")
        val aggs = numCols.flatMap(c => Seq(
            count(col(c)).as(s"cnt_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).cast("double").as(s"min_$c"),
            max(col(c)).cast("double").as(s"max_$c"))) ++
          strCols.flatMap(c => Seq(
            count(col(c)).as(s"cnt_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c"))) ++
          Seq(
            count(col("o_orderdate")).as("cnt_o_orderdate"),
            countDistinct(col("o_orderdate")).as("nd_o_orderdate"),
            date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
              .as("min_o_orderdate"),
            date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
              .as("max_o_orderdate"))
        val one = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
        def rowOf(c: String, num: Boolean) = struct(
          lit(c).as("col_name"),
          (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
          col(s"nd_$c").as("n_distinct"),
          (if (num) col(s"min_$c") else lit(null).cast("double")).as("min_num"),
          (if (num) col(s"max_$c") else lit(null).cast("double")).as("max_num"),
          (if (num) lit(null).cast("string") else col(s"min_$c").cast("string"))
            .as("min_str"),
          (if (num) lit(null).cast("string") else col(s"max_$c").cast("string"))
            .as("max_str"))
        val rows = numCols.map(rowOf(_, num = true)) ++
          (strCols :+ "o_orderdate").map(rowOf(_, num = false))
        one.select(explode(array(rows: _*)).as("r"))
          .select(col("r.*")).orderBy(col("col_name"))
      },
      Some {
        def num(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) - COUNT($c) AS n_nulls,
             COUNT(DISTINCT $c) AS n_distinct,
             CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             FROM orders"""
        def str(c: String, mn: String, mx: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) - COUNT($c) AS n_nulls,
             COUNT(DISTINCT $c) AS n_distinct,
             CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             $mn AS min_str, $mx AS max_str FROM orders"""
        val parts =
          Seq("o_orderkey", "o_custkey", "o_totalprice").map(num) ++
          Seq("o_orderstatus", "o_orderpriority").map(c =>
            str(c, s"MIN($c)", s"MAX($c)")) :+
          str("o_orderdate",
            "strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S')",
            "strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')")
        s"SELECT * FROM (${parts.mkString(" UNION ALL ")}) ORDER BY col_name"
      }),

    // ── PMI collocations: adjacent pairs scored by pointwise mutual
    //    information ln(p(ab)/(p(a)p(b))) — the statistically-surprising
    //    merges, vs q_top_bigrams' raw-frequency merges. Unigram/bigram
    //    tables are vocabulary-bounded; totals enter as ONE-ROW broadcast
    //    crosses; ln is applied once to an identically-associated IEEE
    //    expression then rounded, so top-k order is engine-stable ───────────
    Q(
      "q_pmi_bigrams",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val toksArr = d.select(split(lower(col("text")), " ").as("toks"))
        val uni = toksArr.select(explode(col("toks")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        val totU = uni.agg(sum(col("cnt")).cast("double").as("tu"))
        val bi = toksArr.filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(toks) - 1),
              i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"""))
            .as("p"))
          .select(col("p.w1"), col("p.w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("nab"))
        val totB = bi.agg(sum(col("nab")).cast("double").as("tb"))
        bi.filter(col("nab") >= 50)
          .join(broadcast(uni.select(col("term").as("w1"), col("cnt").as("na"))), Seq("w1"))
          .join(broadcast(uni.select(col("term").as("w2"), col("cnt").as("nb"))), Seq("w2"))
          .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
          .select(col("w1"), col("w2"), col("nab"),
            round(log((col("nab").cast("double") / col("tb")) /
              ((col("na").cast("double") / col("tu")) *
               (col("nb").cast("double") / col("tu")))), 6).as("pmi"))
          .orderBy(desc("pmi"), col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
          uni AS (SELECT term, COUNT(*) AS cnt FROM
            (SELECT UNNEST(t) AS term FROM toks) GROUP BY 1),
          tu AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tu FROM uni),
          pairs AS (SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
              i -> t[i] || ' ' || t[i+1])) AS pair FROM toks WHERE len(t) >= 2),
          bi AS (SELECT string_split(pair, ' ')[1] AS w1,
              string_split(pair, ' ')[2] AS w2, COUNT(*) AS nab
            FROM pairs GROUP BY 1, 2),
          tb AS (SELECT CAST(SUM(nab) AS DOUBLE) AS tb FROM bi)
        SELECT b.w1, b.w2, b.nab,
          ROUND(LN((CAST(b.nab AS DOUBLE) / tb) /
            ((CAST(u1.cnt AS DOUBLE) / tu) * (CAST(u2.cnt AS DOUBLE) / tu))), 6) AS pmi
        FROM bi b JOIN uni u1 ON b.w1 = u1.term JOIN uni u2 ON b.w2 = u2.term
        CROSS JOIN tu CROSS JOIN tb
        WHERE b.nab >= 50
        ORDER BY pmi DESC, w1, w2 LIMIT 20""")),

    // ── cross-source vocabulary overlap: pairwise Jaccard between each
    //    source's distinct term set. The corpus shrinks to distinct
    //    (source, term) FIRST, so the term self-join fans out at most
    //    |sources| rows per term — bounded by |sources|² overall, never
    //    corpus² (the source-similarity matrix behind mixture design) ───────
    Q(
      "q_vocab_jaccard",
      (s, dir) => {
        val st = t(s, dir, "documents")
          .select(col("source"), explode(split(lower(col("text")), " ")).as("term"))
          .distinct()
        val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val a = st.select(col("source").as("source_a"), col("term"))
        val b = st.select(col("source").as("source_b"), col("term"))
        a.join(b, Seq("term"))
          .filter(col("source_a") < col("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sizes.select(col("source").as("source_a"),
            col("n").as("na"))), Seq("source_a"))
          .join(broadcast(sizes.select(col("source").as("source_b"),
            col("n").as("nb"))), Seq("source_b"))
          .select(col("source_a"), col("source_b"), col("na"), col("nb"),
            col("n_both"),
            round(col("n_both").cast("double") /
              (col("na") + col("nb") - col("n_both")), 6).as("jaccard"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH st AS (SELECT DISTINCT source, term FROM
            (SELECT source, UNNEST(string_split(lower(text), ' ')) AS term
             FROM documents)),
          sizes AS (SELECT source, COUNT(*) AS n FROM st GROUP BY 1),
          inter AS (SELECT a.source AS source_a, b.source AS source_b,
              COUNT(*) AS n_both
            FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
            GROUP BY 1, 2)
        SELECT source_a, source_b, sa.n AS na, sb.n AS nb, n_both,
          ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = source_a
        JOIN sizes sb ON sb.source = source_b
        ORDER BY source_a, source_b""")),

    // ── typo-pair mining via deletion neighborhoods (SymSpell): terms
    //    within Levenshtein distance ≤ 2 found by equi-joining delete-≤2
    //    variants — vocabulary-bounded candidate generation (≤ 1+L+L²/2
    //    variants per term), exact-distance verification on candidates
    //    only. The oracle brute-forces all pairs; the Spark side never
    //    does ────────────────────────────────────────────────────────────────
    Q(
      "q_typo_pairs",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val terms = d
          .select(explode(split(lower(col("text")), " ")).as("term"))
          .filter(col("term").rlike("^[a-z]{3,12}$"))
          .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        graft.ext.FuzzyMatch.typoPairs(terms)
          .orderBy(col("term_a"), col("term_b"))
      },
      Some("""WITH toks AS (SELECT UNNEST(string_split(lower(text), ' ')) AS w
            FROM documents),
          v AS (SELECT w AS term, COUNT(*) AS freq FROM toks
            WHERE regexp_matches(w, '^[a-z]{3,12}$') GROUP BY 1)
        SELECT a.term AS term_a, b.term AS term_b,
          CAST(levenshtein(a.term, b.term) AS BIGINT) AS dist,
          a.freq AS freq_a, b.freq AS freq_b
        FROM v a JOIN v b ON a.term < b.term
        WHERE levenshtein(a.term, b.term) <= 2
        ORDER BY term_a, term_b""")),

    // ── prefix-filtered exact set-similarity self-join (AllPairs/PPJoin):
    //    the same pair set as q_dedup_ngram_jaccard, but candidates come
    //    only from each doc's (n − ⌈τn⌉ + 1) globally-rarest shingles, so
    //    stop-shingles never drive the join — the exact-threshold dedup
    //    shape that survives 100 TB (equality with the naive self-join is
    //    also pinned in ScalaTest) ───────────────────────────────────────────
    Q(
      "q_setsim_prefix",
      (s, dir) => {
        // shingles via ShingleIndex.shinglesFor (round 11): the STORED
        // bucket-by-shingle index when one matching `dir` is registered
        // (corpus-wide df aggregate + df join run bucket-local), the plain
        // derivation otherwise — hash-identical either way, pinned in
        // ShingleIndexSpec
        graft.ext.Dedup
          .jaccardPairsPrefix(graft.ext.ShingleIndex.shinglesFor(s, dir), 4, 5)
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

    // ── per-source document cap: keep at most K docs per source in the
    //    deterministic shuffle order (the downsampling half of mixture
    //    rebalancing — q_mixture_sample_rates computes rates, this applies
    //    a hard ceiling). Round 11: the source-partitioned rank window
    //    became the bounded top-k aggregate — a source IS a corpus-scale
    //    hot partition (corpus/|sources| rows through ONE window task at
    //    100 TB), exactly the TopKStructAgg shape; ascending order rides
    //    negated fields in the keep-largest struct. No RNG, stable across
    //    engines and cluster sizes; the oracle stays the window form ───────
    Q(
      "q_source_cap",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val key = graft.ext.CorpusPipeline.shuffleKey(col("doc_id"))
        graft.perf.Skew.topKPerKey(
          d.select(col("source"), col("doc_id"), key.as("__k")),
          Seq("source"),
          struct((-col("__k")).as("__nk"), (-col("doc_id")).as("__nid")), 40)
          .select(col("source"), (-col("__nid")).as("doc_id"),
            col("rk").cast("long").as("rn"))
          .orderBy(col("source"), col("rn"))
      },
      Some("""SELECT source, doc_id, rn FROM (
          SELECT source, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY ((CAST(xor(doc_id, 1013904242) AS HUGEINT) * 2654435761)
              % 18446744073709551616) // 8589934592 % 2147483647,
            doc_id) AS BIGINT) AS rn
          FROM documents)
        WHERE rn <= 40 ORDER BY source, rn""")),

    // ── l-diversity audit: distinct sensitive values per quasi-identifier
    //    group — the release gate that k-anonymity (q_kanon_suppress) does
    //    not cover: a large group whose sensitive attribute is constant
    //    still leaks. One aggregate; flags groups below l = 3 ────────────────
    Q(
      "q_ldiversity",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupBy(col("o_orderstatus"),
            month(col("o_orderdate")).cast("long").as("order_month"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("o_orderpriority")).as("l_distinct"))
          .withColumn("below_l3", col("l_distinct") < 3)
          .orderBy(col("o_orderstatus"), col("order_month"))
      },
      Some("""SELECT o_orderstatus, CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)
            AS order_month, COUNT(*) AS n,
          COUNT(DISTINCT o_orderpriority) AS l_distinct,
          (COUNT(DISTINCT o_orderpriority) < 3) AS below_l3
        FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, order_month""")),

    // ── asymmetric containment: ordered pairs where ≥80% of doc A's
    //    shingles appear in doc B — catches quotes/snippets/subset docs that
    //    symmetric Jaccard misses entirely. Candidates from A's rarest-
    //    shingle prefix joined against the full shingle table (the prefix
    //    principle applies to the contained side; the container has no size
    //    bound), exact verification on candidates only ──────────────────────
    Q(
      "q_doc_containment",
      (s, dir) => {
        // hashed 64-bit shingles (round 10): every shuffle in the
        // containment pipeline — df counts, the positional window, the
        // prefix⋈postings candidate join, the compact-array verify — moves
        // 8-byte longs instead of ~25-byte shingle strings, the same
        // exact-up-to-64-bit-collisions contract the minhash path already
        // runs on (the string oracle below stays valid because hash
        // equality ≡ string equality at ~n²/2⁶⁵ collision odds). Round 11:
        // sourced through ShingleIndex.shinglesFor — the stored bucketed
        // index when registered for `dir` (~3× at sf10), derived otherwise
        graft.ext.Dedup
          .containmentPairs(graft.ext.ShingleIndex.shinglesFor(s, dir),
            4, 5, minShingles = 10)
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
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, common, ca.n AS na, cb.n AS nb,
          ROUND(CAST(common AS DOUBLE) / CAST(ca.n AS DOUBLE), 6) AS containment
        FROM pairs
        JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE ca.n >= 10
          AND ROUND(CAST(common AS DOUBLE) / CAST(ca.n AS DOUBLE), 6) >= 0.8
        ORDER BY id_a, id_b""")),

    // ── DECONTAMINATION (round 10): benchmark/eval overlap detection — the
    //    mandatory pre-training step that finds eval documents leaked into
    //    the training corpus. Cross-relation containment with the prefix
    //    filter on the EVAL side only (the tiny side at 100 TB: candidates
    //    are eval-prefix ⋈ train postings, never corpus × corpus); the
    //    deterministic doc_id%7 split plants a real leaked set in the
    //    driver corpus. Hashed 64-bit shingles end-to-end; exactness vs the
    //    unfiltered cross join is pinned in ExtensionsSpec ─────────────────
    Q(
      "q_decontaminate",
      (s, dir) => {
        val sh = graft.ext.ShingleIndex.shinglesFor(s, dir)
        graft.ext.Dedup.decontaminate(
          sh.filter(pmod(col("doc_id"), lit(7)) =!= 0),
          sh.filter(pmod(col("doc_id"), lit(7)) === 0),
          4, 5, minShingles = 10)
          .orderBy(col("eval_id"), col("train_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        ev AS (SELECT * FROM sh WHERE doc_id % 7 = 0),
        tr AS (SELECT * FROM sh WHERE doc_id % 7 <> 0),
        ce AS (SELECT doc_id, COUNT(*) AS n FROM ev GROUP BY doc_id),
        ct AS (SELECT doc_id, COUNT(*) AS n FROM tr GROUP BY doc_id),
        pairs AS (SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
            COUNT(*) AS common
          FROM ev e JOIN tr t ON e.shingle = t.shingle GROUP BY 1, 2)
        SELECT eval_id, train_id, common, ce.n AS n_eval, ct.n AS n_train,
          ROUND(CAST(common AS DOUBLE) / CAST(ce.n AS DOUBLE), 6) AS containment
        FROM pairs
        JOIN ce ON eval_id = ce.doc_id JOIN ct ON train_id = ct.doc_id
        WHERE ce.n >= 10
          AND ROUND(CAST(common AS DOUBLE) / CAST(ce.n AS DOUBLE), 6) >= 0.8
        ORDER BY eval_id, train_id""")),

    // ── stored-index compaction lifecycle (round-13 judge task 1):
    //    register the bucketed shingle store, append a deterministic delta
    //    under a FIXED token (idempotent across repeat runs — a reattached
    //    index skips the re-insert), COMPACT, and read the per-doc
    //    distinct-shingle counts back from the live appended+compacted
    //    store. The DuckDB oracle derives the same counts from
    //    documents ∪ variant-docs text — so a hash-green row certifies the
    //    full chain: register → append → compact preserves the postings
    //    multiset exactly (a duplicated insert, a lost bucket, or a torn
    //    swap all shift some doc's count) ───────────────────────────────────
    Q(
      "q_index_compact",
      (s, dir) => {
        graft.ext.ShingleIndex.register(s, dir, buckets = 8)
        val delta = t(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("appended variant "), col("text")).as("text"))
        graft.ext.ShingleIndex.append(s, delta, token = Some("face-compact"))
        graft.ext.ShingleIndex.compact(s)
        graft.ext.ShingleIndex.table(s).groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, 'appended variant ' || text
          FROM documents WHERE doc_id % 10 = 0),
        toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM corpus WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks)
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ORDER BY doc_id""")),

    // ── index deletion lifecycle (round-14 judge task 1): register, retract
    //    a doc subset as a tombstone batch, and pin BOTH phases against the
    //    rebuild-from-surviving-corpus oracle — 'pending' (tombstones
    //    journaled, reads anti-join them) and 'applied' (compaction
    //    physically purged the rows and swept the journal). The pending
    //    result is collected BEFORE the compact (the lazy plan reads the
    //    very files the swap replaces). Fixed token → idempotent across
    //    runs; buckets=16 keeps a distinct identity from q_index_compact's
    //    8-bucket store, so either face ordering forces its own rewrite ───
    Q(
      "q_index_delete",
      (s, dir) => {
        graft.ext.ShingleIndex.register(s, dir, buckets = 16)
        val dead = t(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id")
        graft.ext.ShingleIndex.delete(s, dead, token = Some("face-delete"))
        def byDoc(phase: String) = graft.ext.ShingleIndex.postings(s)
          .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
          .withColumn("phase", lit(phase))
        val pendingDf = byDoc("pending")
        val pending = s.createDataFrame(
          java.util.Arrays.asList(pendingDf.collect(): _*), pendingDf.schema)
        graft.ext.ShingleIndex.compact(s)
        pending.unionByName(byDoc("applied"))
          .orderBy(col("phase"), col("doc_id"))
      },
      Some("""WITH surv AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
        toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM surv WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        agg AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
        SELECT doc_id, n_sh, 'pending' AS phase FROM agg
        UNION ALL
        SELECT doc_id, n_sh, 'applied' AS phase FROM agg
        ORDER BY phase, doc_id""")),

    // ── corpus schema EVOLUTION (round 14): append two batches whose
    //    schemas differ (the second carries a `lang` enrichment the first
    //    lacks — the routine life of a training-data corpus), pin the
    //    union-schema read ('evolved': old rows null-fill the new column —
    //    a plain one-footer read would silently drop it), compact, and pin
    //    a NAIVE schema-less read of the compacted dir ('healed': identical
    //    aggregate — proof the rewrite made every file schema-homogeneous).
    //    Fresh temp dir per run, cleaned after ─────────────────────────────
    Q(
      "q_corpus_schema_evolve",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val corpus = java.nio.file.Files
          .createTempDirectory("graft-corpus-evolve").toString
        graft.ext.CorpusStore.append(s, corpus,
          d.filter(pmod(col("doc_id"), lit(2)) === 0)
            .select("doc_id", "text", "n_chars"))
        graft.ext.CorpusStore.append(s, corpus,
          d.filter(pmod(col("doc_id"), lit(2)) === 1)
            .select("doc_id", "text", "n_chars", "lang"))
        def agg(df: org.apache.spark.sql.DataFrame, phase: String) = df
          .groupBy(coalesce(col("lang"), lit("none")).as("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
          .withColumn("phase", lit(phase))
        val evolvedDf = agg(graft.ext.CorpusStore.read(s, corpus), "evolved")
        val evolved = s.createDataFrame(
          java.util.Arrays.asList(evolvedDf.collect(): _*), evolvedDf.schema)
        graft.ext.CorpusCompact.compact(s, corpus)
        val healedDf = agg(s.read.parquet(corpus), "healed")
        val healed = s.createDataFrame(
          java.util.Arrays.asList(healedDf.collect(): _*), healedDf.schema)
        graft.perf.Measure.deleteRecursively(corpus)
        evolved.unionByName(healed).orderBy(col("phase"), col("lang"))
      },
      Some("""WITH evolved AS (SELECT doc_id,
            CASE WHEN doc_id % 2 = 1 THEN lang ELSE 'none' END AS lang,
            n_chars FROM documents),
        agg AS (SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS chars
          FROM evolved GROUP BY lang)
        SELECT lang, n_docs, chars, 'evolved' AS phase FROM agg
        UNION ALL
        SELECT lang, n_docs, chars, 'healed' AS phase FROM agg
        ORDER BY phase, lang""")),

    // ── corpus-store retraction (round-14 judge task 1, the store under
    //    the index): tombstone a doc subset in an append-mode corpus dir,
    //    pin the tombstone-aware read ('pending') AND the physically purged
    //    post-compaction dir ('applied' — read RAW, no anti-join, so the
    //    oracle match proves the rows are gone from disk) against
    //    documents-minus-deleted. Fresh temp dir per run, cleaned after ───
    Q(
      "q_corpus_retract",
      (s, dir) => {
        val corpus = java.nio.file.Files
          .createTempDirectory("graft-corpus-retract").toString
        t(s, dir, "documents").write.mode("overwrite").parquet(corpus)
        val dead = t(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(5)) === 1).select("doc_id")
        graft.ext.CorpusCompact.tombstone(s, corpus, dead,
          token = Some("face-retract"))
        def agg(df: org.apache.spark.sql.DataFrame, phase: String) = df
          .groupBy("source").agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"))
          .withColumn("phase", lit(phase))
        val pendingDf = agg(graft.ext.CorpusCompact.read(s, corpus), "pending")
        val pending = s.createDataFrame(
          java.util.Arrays.asList(pendingDf.collect(): _*), pendingDf.schema)
        graft.ext.CorpusCompact.compact(s, corpus)
        val appliedDf = agg(s.read.parquet(corpus), "applied")
        val applied = s.createDataFrame(
          java.util.Arrays.asList(appliedDf.collect(): _*), appliedDf.schema)
        graft.perf.Measure.deleteRecursively(corpus)
        pending.unionByName(applied).orderBy(col("phase"), col("source"))
      },
      Some("""WITH surv AS (SELECT * FROM documents WHERE doc_id % 5 <> 1),
        agg AS (SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS chars
          FROM surv GROUP BY source)
        SELECT source, n_docs, chars, 'pending' AS phase FROM agg
        UNION ALL
        SELECT source, n_docs, chars, 'applied' AS phase FROM agg
        ORDER BY phase, source""")),

    // ── boilerplate-pruned index screen (round-14 judge task 5): derive a
    //    template-spam corpus from the documents table (every doc prefixed
    //    with one shared boilerplate sentence — its shingles saturate at
    //    ~100% df), register the band-backed index WITH pruning, and pin
    //    (a) the stop set is non-empty, (b) the postings stay COMPLETE
    //    (count ≡ DuckDB's shingle count over the spam corpus — pruning
    //    never touches verification truth), and (c) the pruned indexed
    //    screen finds exactly the planted high-J near-dup and nothing
    //    else. Deterministic: hashes are fixed, and the plant shares ALL
    //    of its original's rare shingles (J_rare high enough that band
    //    collision is certain for these specific values — validated once,
    //    stable forever). buckets=4 keeps a distinct identity from the
    //    compact(8)/delete(16) faces, so any face order forces its own
    //    rewrite ─────────────────────────────────────────────────────────
    Q(
      "q_index_prune_screen",
      (s, dir) => {
        val boiler = "standard legal disclaimer applies to all documents in this collection"
        val spam = t(s, dir, "documents")
          .select(col("doc_id"), concat(lit(boiler + " "), col("text")).as("text"))
        val sh = graft.ext.Dedup
          .hashedShingles(spam, "doc_id", "text", 3)
          .withColumnRenamed("sh", "shingle")
        graft.ext.ShingleIndex.registerDocs(s, dir + "#pruned", sh,
          buckets = 4, withBands = true, pruneDfFrac = 0.5)
        val idx = graft.ext.ShingleIndex.liveFor(s, dir + "#pruned").get
        val stopCount = idx.stop.map(_.count()).getOrElse(0L)
        val postingRows = graft.ext.ShingleIndex.table(s).count()
        // the batch: one exact-tail near-dup of doc 0 (one token appended
        // at the END, so every rare shingle of doc 0 survives) and one
        // fresh doc that shares only boilerplate with the corpus
        val base = spam.filter(col("doc_id") === 0L).head().getString(1)
        import s.implicits._
        val batch = Seq(
          (900001L, base + " addendum"),
          (900002L, boiler + " entirely fresh content nothing shared here at all today"))
          .toDF("doc_id", "text")
        val (pairs, release) = graft.ext.Dedup.incrementalMinhashPairsIndexed(
          batch, spam.select("doc_id"), idx, "doc_id", "text", 0.8)
        val hits = pairs.select(col("delta_id"), col("corpus_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        release()
        Seq((stopCount > 0, postingRows, hits == Set((900001L, 0L))))
          .toDF("stop_nonempty", "posting_rows", "screen_exact")
      },
      Some("""WITH spam AS (SELECT doc_id,
            'standard legal disclaimer applies to all documents in this collection '
              || text AS text FROM documents),
          toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM spam WHERE len(string_split(lower(text), ' ')) >= 3),
          sh AS (SELECT DISTINCT doc_id,
              UNNEST(list_transform(generate_series(1, len(t) - 2),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
            FROM toks)
          SELECT TRUE AS stop_nonempty, COUNT(*) AS posting_rows,
            TRUE AS screen_exact FROM sh""")),

    // ── near-dup provenance matrix: exact Jaccard pairs joined back to the
    //    source dimension — which source pairs generate the duplication
    //    (cross-source dup means scraper overlap; within-source means
    //    template spam). Pairs come from the prefix-filtered exact join
    //    (row-identical to the naive self-join, pinned in ScalaTest) so the
    //    pair stage survives 100 TB. Only ids flow through the enrichment
    //    joins ──────────────────────────────────────────────────────────────
    Q(
      "q_dup_rate_by_source",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val pairs = graft.ext.Dedup
          .jaccardPairsPrefix(graft.ext.ShingleIndex.shinglesFor(s, dir), 4, 5)
          .select(col("id_a"), col("id_b"))
        // plain shuffle joins: the pair set is tiny but the (doc_id,
        // source) dimension is corpus-sized — broadcasting it would not
        // survive the 100 TB framing (AQE demotes to broadcast at small SF)
        val src = d.select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("id_a"),
            col("source").as("source_a")), Seq("id_a"))
          .join(src.select(col("doc_id").as("id_b"),
            col("source").as("source_b")), Seq("id_b"))
          .groupBy(least(col("source_a"), col("source_b")).as("source_lo"),
            greatest(col("source_a"), col("source_b")).as("source_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("source_lo"), col("source_hi"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents WHERE len(string_split(lower(text), ' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            UNNEST(list_transform(generate_series(1, len(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b FROM pr
          JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
          WHERE ROUND(CAST(common AS DOUBLE)
            / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.8)
        SELECT LEAST(da.source, db.source) AS source_lo,
          GREATEST(da.source, db.source) AS source_hi, COUNT(*) AS n_pairs
        FROM pairs
        JOIN documents da ON pairs.id_a = da.doc_id
        JOIN documents db ON pairs.id_b = db.doc_id
        GROUP BY 1, 2 ORDER BY source_lo, source_hi""")),

    // ── token-weighted length quantiles: the doc length below which half
    //    (90%) of all TOKENS sit — the batching-relevant median, which the
    //    unweighted doc median misstates badly under long-tail lengths.
    //    Lengths collapse to one row per distinct length before the
    //    cumulative window, so the window input is bounded by the length
    //    domain, not the corpus ─────────────────────────────────────────────
    Q(
      "q_weighted_median_len",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(size(split(col("text"), " ")).cast("long").as("len"))
        val perLen = d.groupBy(col("len"))
          .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("toks"))
        val w = Window.orderBy(col("len"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = perLen.withColumn("cum_toks", sum(col("toks")).over(w))
        val total = perLen.agg(sum(col("toks")).as("total_toks"))
        cum.crossJoin(broadcast(total))
          .agg(max(col("total_toks")).as("total_tokens"),
            min(when(col("cum_toks") * 2 >= col("total_toks"), col("len")))
              .as("w_median_len"),
            min(when(col("cum_toks") * 10 >= col("total_toks") * 9, col("len")))
              .as("w_p90_len"))
      },
      Some("""WITH lens AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
              AS len FROM documents),
          perlen AS (SELECT len, COUNT(*) AS n_docs,
              CAST(SUM(len) AS BIGINT) AS toks FROM lens GROUP BY 1),
          cum AS (SELECT len, toks, CAST(SUM(toks) OVER (ORDER BY len
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks FROM perlen),
          tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total_toks FROM perlen)
        SELECT MAX(total_toks) AS total_tokens,
          MIN(CASE WHEN cum_toks * 2 >= total_toks THEN len END)
            AS w_median_len,
          MIN(CASE WHEN cum_toks * 10 >= total_toks * 9 THEN len END)
            AS w_p90_len
        FROM cum CROSS JOIN tot""")),

    // ── chi-square independence test: is document language independent of
    //    source? Statistic from the |sources|×|langs|-bounded contingency
    //    table; per-cell terms rounded then decimal-summed so the result is
    //    order-independent. The pre-training question this answers: do
    //    sources need per-language mixture weights or one global set ────────
    Q(
      "q_chisq_source_lang",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val cells = d.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("o"))
        val rows = cells.groupBy(col("source")).agg(sum(col("o")).as("row_n"))
        val cols_ = cells.groupBy(col("lang")).agg(sum(col("o")).as("col_n"))
        val total = cells.agg(sum(col("o")).as("n"))
        cells.join(broadcast(rows), Seq("source"))
          .join(broadcast(cols_), Seq("lang"))
          .crossJoin(broadcast(total))
          .withColumn("e",
            col("row_n").cast("double") * col("col_n").cast("double") /
              col("n").cast("double"))
          .withColumn("term",
            round((col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e"), 9)
              .cast(DecimalType(28, 12)))
          .groupBy(col("n"))
          .agg(sum(col("term")).cast("double").as("chi2"),
            countDistinct(col("source")).as("n_sources"),
            countDistinct(col("lang")).as("n_langs"))
          .select(col("n"), col("n_sources"), col("n_langs"),
            ((col("n_sources") - 1) * (col("n_langs") - 1)).as("dof"),
            col("chi2"))
      },
      Some("""WITH cells AS (SELECT source, lang, COUNT(*) AS o
            FROM documents GROUP BY 1, 2),
          r AS (SELECT source, CAST(SUM(o) AS BIGINT) AS row_n
            FROM cells GROUP BY 1),
          c AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS col_n
            FROM cells GROUP BY 1),
          tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
          terms AS (SELECT cells.source, cells.lang, tot.n,
              CAST(ROUND((CAST(o AS DOUBLE) - CAST(row_n AS DOUBLE)
                  * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(o AS DOUBLE) - CAST(row_n AS DOUBLE)
                  * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                  / CAST(n AS DOUBLE)), 9) AS DECIMAL(28,12)) AS term
            FROM cells JOIN r USING (source) JOIN c USING (lang)
            CROSS JOIN tot)
        SELECT n, COUNT(DISTINCT source) AS n_sources,
          COUNT(DISTINCT lang) AS n_langs,
          (COUNT(DISTINCT source) - 1) * (COUNT(DISTINCT lang) - 1) AS dof,
          CAST(SUM(term) AS DOUBLE) AS chi2
        FROM terms GROUP BY n""")),

    // ── nearest-centroid classifier eval: assign every vector to its
    //    closest label centroid (cosine), emit the label×assigned confusion
    //    matrix — the fastest possible label-quality smoke for an embedding
    //    corpus. Centroids are the 4-dp decimal means (q_embed_centroid),
    //    so both engines score against identical prototypes; the dim join
    //    fans out ≤|labels| per (vector, dim) row ───────────────────────────
    Q(
      "q_centroid_confusion",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        // all sums run in exact decimals ((18,10) inputs → exact (37,20)
        // products): an argmax fed by order-dependent double sums could
        // flip the winner at a rounding boundary between engines/runs
        val cent = graft.ext.Similarity.labelCentroids(e)
          .select(col("label").cast("long").as("clabel"), col("dim"),
            col("centroid").cast(DecimalType(18, 10)).as("c"))
        val cn = cent.groupBy(col("clabel"))
          .agg(sqrt(sum((col("c") * col("c")).cast(DecimalType(38, 20)))
            .cast("double")).as("cnorm"))
        val ex = e.select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), col("label"), col("dim"),
            col("xf").cast(DecimalType(18, 10)).as("x"))
        val vn = ex.groupBy(col("vec_id"))
          .agg(sqrt(sum((col("x") * col("x")).cast(DecimalType(38, 20)))
            .cast("double")).as("vnorm"))
        val scored = ex.join(broadcast(cent), Seq("dim"))
          .groupBy(col("vec_id"), col("label"), col("clabel"))
          .agg(sum((col("x") * col("c")).cast(DecimalType(38, 20))).as("dot"))
          .join(vn, Seq("vec_id"))
          .join(broadcast(cn), Seq("clabel"))
          .withColumn("cos",
            round(col("dot").cast("double") / (col("vnorm") * col("cnorm")), 6))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(desc("cos"), col("clabel"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .groupBy(col("label"), col("clabel").as("assigned"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label"), col("assigned"))
      },
      Some("""WITH ex AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
              CAST(i - 1 AS BIGINT) AS dim,
              CAST(embedding[i] AS DECIMAL(18,10)) AS x,
              CAST(embedding[i] AS DECIMAL(28,10)) AS xd
            FROM embeddings CROSS JOIN
              UNNEST(generate_series(1, len(embedding))) AS s(i)),
          cent AS (SELECT label AS clabel, dim,
              CAST(ROUND(CAST(SUM(xd) AS DOUBLE) / COUNT(*), 4) + 0
                AS DECIMAL(18,10)) AS c
            FROM ex GROUP BY 1, 2),
          cn AS (SELECT clabel,
              SQRT(CAST(SUM(CAST(c * c AS DECIMAL(38,20))) AS DOUBLE)) AS cnorm
            FROM cent GROUP BY 1),
          vn AS (SELECT vec_id,
              SQRT(CAST(SUM(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE)) AS vnorm
            FROM ex GROUP BY 1),
          scored AS (SELECT ex.vec_id, ex.label, cent.clabel,
              ROUND(CAST(SUM(CAST(ex.x * cent.c AS DECIMAL(38,20))) AS DOUBLE)
                / (MAX(vn.vnorm) * MAX(cn.cnorm)), 6) AS cos
            FROM ex JOIN cent USING (dim)
            JOIN vn ON vn.vec_id = ex.vec_id
            JOIN cn ON cn.clabel = cent.clabel
            GROUP BY 1, 2, 3),
          best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, clabel) AS rk FROM scored)
        SELECT label, clabel AS assigned, COUNT(*) AS n
        FROM best WHERE rk = 1
        GROUP BY 1, 2 ORDER BY label, assigned""")),

    // ── Zipf fit: OLS slope of ln(freq) on ln(rank) over the term table —
    //    how power-law the vocabulary is (natural corpora sit near −1;
    //    synthetic/templated text does not). ln values are rounded to 9 dp
    //    then decimal-summed, so libm vs engine ln differences below the
    //    rounding grain cannot reach the statistic; the window runs over
    //    the vocabulary, not the corpus ─────────────────────────────────────
    Q(
      "q_zipf_slope",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val terms = d
          .select(explode(split(lower(col("text")), " ")).as("term"))
          .filter(col("term").rlike("^[a-z]+$"))
          .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        val w = Window.orderBy(desc("freq"), col("term"))
        val xy = terms.withColumn("rank", row_number().over(w).cast("long"))
          .select(
            round(log(col("rank").cast("double")), 9)
              .cast(DecimalType(18, 9)).as("x"),
            round(log(col("freq").cast("double")), 9)
              .cast(DecimalType(18, 9)).as("y"))
        val sums = xy.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("x")).cast(DecimalType(38, 18))).as("sxx"),
          sum((col("x") * col("y")).cast(DecimalType(38, 18))).as("sxy"))
        val n = col("n").cast("double")
        val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
        val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
        // rank is distinct per term, so the denominator is zero only for a
        // single-term vocabulary — NULL, not a division error
        sums.select(col("n").as("n_terms"),
          when(col("n") > 1,
            round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)).as("zipf_slope"))
      },
      Some("""WITH terms AS (SELECT w AS term, COUNT(*) AS freq FROM
            (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
          WHERE regexp_matches(w, '^[a-z]+$') GROUP BY 1),
          xy AS (SELECT
              CAST(ROUND(LN(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term)
                AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
              CAST(ROUND(LN(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
            FROM terms),
          sums AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
              SUM(CAST(x * x AS DECIMAL(38,18))) AS sxx,
              SUM(CAST(x * y AS DECIMAL(38,18))) AS sxy
            FROM xy)
        SELECT n AS n_terms,
          CASE WHEN n > 1 THEN
            ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS zipf_slope
        FROM sums""")),

    // ── dead-dimension audit: per-dimension mean/variance of the embedding
    //    corpus from exact decimal power sums — a dimension whose variance
    //    collapses carries no information and signals a broken encoder or a
    //    truncated export. Complements q_embed_audit's per-label norms ──────
    Q(
      "q_embed_dim_variance",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        // (18,10) inputs keep the square exact at (37,20) — wider inputs
        // would force Spark's precision-loss scale reduction and desync
        // the two engines' sums
        val ex = e.select(posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("dim").cast("long").as("dim"),
            col("xf").cast(DecimalType(18, 10)).as("x"))
        ex.groupBy(col("dim"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum((col("x") * col("x")).cast(DecimalType(38, 20))).as("sxx"))
          .select(col("dim"),
            round(col("sx").cast("double") / col("n").cast("double"), 6)
              .as("mean"),
            round(col("sxx").cast("double") / col("n").cast("double") -
              (col("sx").cast("double") / col("n").cast("double")) *
              (col("sx").cast("double") / col("n").cast("double")), 6)
              .as("variance"))
          .withColumn("is_dead", col("variance") < 0.0001)
          .orderBy(col("dim"))
      },
      Some("""WITH ex AS (SELECT CAST(i - 1 AS BIGINT) AS dim,
              CAST(embedding[i] AS DECIMAL(18,10)) AS x
            FROM embeddings CROSS JOIN
              UNNEST(generate_series(1, len(embedding))) AS s(i)),
          sums AS (SELECT dim, COUNT(*) AS n, SUM(x) AS sx,
              SUM(CAST(x * x AS DECIMAL(38,20))) AS sxx
            FROM ex GROUP BY 1)
        SELECT dim,
          ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
          ROUND(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS variance,
          (ROUND(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) < 0.0001)
            AS is_dead
        FROM sums ORDER BY dim""")),

    // ── lexical diversity: per-source mean type-token ratio (distinct
    //    tokens / tokens per doc) — templated or spam-heavy sources sit far
    //    below organic text. Per-doc ratios are rounded then decimal-summed
    //    so the source mean is aggregation-order-free ───────────────────────
    Q(
      "q_lexical_diversity",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("source"), split(lower(col("text")), " ").as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("source"),
            round(size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")).cast("double"), 9)
              .cast(DecimalType(18, 12)).as("ttr"),
            size(col("toks")).cast("long").as("n_toks"))
        d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("n_tokens"),
            round(sum(col("ttr")).cast("double") /
              count(lit(1)).cast("double"), 6).as("mean_ttr"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT source,
              CAST(ROUND(CAST(len(list_distinct(string_split(lower(text), ' ')))
                  AS DOUBLE)
                / CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 9)
                AS DECIMAL(18,12)) AS ttr,
              CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks
            FROM documents WHERE len(string_split(lower(text), ' ')) > 0)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
          ROUND(CAST(SUM(ttr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
            AS mean_ttr
        FROM d GROUP BY source ORDER BY source""")),

    // ── k-fold assignment: deterministic 5-fold partition from the same
    //    multiply-shift bucketing as the train/eval/test split — stable as
    //    the corpus grows, disjoint and exhaustive by construction. One
    //    narrow map + one aggregate ─────────────────────────────────────────
    Q(
      "q_cv_folds",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val fold = pmod(graft.ext.CorpusPipeline.splitBucket(col("doc_id")),
          lit(5)).cast("long")
        d.select(fold.as("fold"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_toks"))
          .groupBy(col("fold"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("fold"))
      },
      Some("""SELECT
          CAST(((CAST(doc_id AS HUGEINT) * 2654435761)
              % 18446744073709551616) // 8589934592 % 100 % 5 AS BIGINT)
            AS fold,
          COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
          MIN(doc_id) AS first_doc
        FROM documents GROUP BY 1 ORDER BY fold""")),

    // ── per-split label balance: does the deterministic split preserve the
    //    label mix? Share of each label inside train/eval/test of the
    //    embedding corpus, with the global share alongside — the eval-
    //    hygiene check before trusting any split metric ─────────────────────
    Q(
      "q_split_label_balance",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("label"),
            graft.ext.CorpusPipeline.splitColumn(col("vec_id")).as("split"))
        val bySplit = e.groupBy(col("split"), col("label"))
          .agg(count(lit(1)).as("n"))
        val splitTot = bySplit.groupBy(col("split")).agg(sum(col("n")).as("n_split"))
        bySplit.join(broadcast(splitTot), Seq("split"))
          .select(col("split"), col("label"), col("n"),
            round(col("n").cast("double") / col("n_split").cast("double"), 6)
              .as("share"))
          .orderBy(col("split"), col("label"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
            CASE WHEN ((CAST(vec_id AS HUGEINT) * 2654435761)
                % 18446744073709551616) // 8589934592 % 100 < 90 THEN 'train'
              WHEN ((CAST(vec_id AS HUGEINT) * 2654435761)
                % 18446744073709551616) // 8589934592 % 100 < 95 THEN 'eval'
              ELSE 'test' END AS split
            FROM embeddings),
          bs AS (SELECT split, label, COUNT(*) AS n FROM e GROUP BY 1, 2),
          st AS (SELECT split, CAST(SUM(n) AS BIGINT) AS n_split
            FROM bs GROUP BY 1)
        SELECT split, label, n,
          ROUND(CAST(n AS DOUBLE) / CAST(n_split AS DOUBLE), 6) AS share
        FROM bs JOIN st USING (split)
        ORDER BY split, label""")),

    // ── snapshot time travel (round 15, verdict task 7): generations
    //    freeze at the compaction that supersedes them, `readAt(g)` pins
    //    that frozen row set, and RETRACTIONS PASS THROUGH — a takedown
    //    never resurfaces via a historical read. Built live in a temp
    //    snapshot corpus: gen 1 = even docs (frozen by compaction 1),
    //    gen 2 = even ∪ odd (appends land in the current generation;
    //    frozen by compaction 2), then a pending tombstone batch hits
    //    BOTH parities. Pinned: readAt(1) ≡ even minus retracted,
    //    readAt(2) ≡ all minus retracted ≡ the current read ──────────────
    Q(
      "q_corpus_readat",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
        val corpus = java.nio.file.Files
          .createTempDirectory("graft-corpus-readat").toString
        graft.ext.CorpusStore.init(corpus)
        graft.ext.CorpusStore.append(s, corpus,
          d.filter(pmod(col("doc_id"), lit(2)) === 0))
        graft.ext.CorpusStore.compactSnapshot(s, corpus, targetFiles = 2,
          graceGenerations = 2) // gen 1 freezes (= even docs)
        graft.ext.CorpusStore.append(s, corpus,
          d.filter(pmod(col("doc_id"), lit(2)) === 1))
        graft.ext.CorpusStore.compactSnapshot(s, corpus, targetFiles = 2,
          graceGenerations = 2) // gen 2 freezes (= all docs)
        val dead = d.filter(pmod(col("doc_id"), lit(10)) <= 1)
          .select("doc_id") // both parities — every phase must lose rows
        graft.ext.CorpusCompact.tombstone(s, corpus, dead,
          token = Some("face-readat"))
        def agg(df: org.apache.spark.sql.DataFrame, phase: String) = {
          val aggDf = df.groupBy("source")
            .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
            .withColumn("phase", lit(phase))
          s.createDataFrame(
            java.util.Arrays.asList(aggDf.collect(): _*), aggDf.schema)
        }
        val out = agg(graft.ext.CorpusStore.readAt(s, corpus, 1L), "gen1")
          .unionByName(agg(graft.ext.CorpusStore.readAt(s, corpus, 2L), "gen2"))
          .unionByName(agg(graft.ext.CorpusStore.read(s, corpus), "current"))
          .orderBy(col("phase"), col("source"))
        graft.perf.Measure.deleteRecursively(corpus)
        out
      },
      Some("""WITH surv AS (SELECT * FROM documents WHERE doc_id % 10 > 1),
          g1 AS (SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM surv WHERE doc_id % 2 = 0 GROUP BY source),
          full_ AS (SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM surv GROUP BY source)
        SELECT source, n_docs, chars, 'gen1' AS phase FROM g1
        UNION ALL
        SELECT source, n_docs, chars, 'gen2' AS phase FROM full_
        UNION ALL
        SELECT source, n_docs, chars, 'current' AS phase FROM full_
        ORDER BY phase, source""")),

    // ── band-saturation auto-guard (round 15): the ZERO-KNOB register over
    //    a spam-saturated corpus under the oracle gate. Scale-independent
    //    corpus: 300 real docs × 8 boilerplate variants (2,400 spam — above
    //    the guard's 1,000-doc floor at every sf) plus the 300 originals.
    //    Pinned: the guard auto-prunes (marker records it), the stop set is
    //    non-empty, and the pruned screen still finds EXACTLY the planted
    //    true near-dup (similarity on rare shingles) while the
    //    boilerplate-only batch doc matches nothing — the screen the
    //    round-14 default path could not run at all on this shape ─────────
    Q(
      "q_index_autoprune",
      (s, dir) => {
        import s.implicits._
        val boiler = "standard legal disclaimer applies to all documents " +
          "in this collection without any exception whatsoever"
        val d = t(s, dir, "documents").orderBy("doc_id").limit(300)
          .select(col("doc_id"), col("text"))
        val spam = d
          .select(col("doc_id"), explode(expr("sequence(0, 7)")).as("v"))
          .select((col("doc_id") * 8 + col("v")).as("sid"))
          .select((col("sid") + 1000000L).as("doc_id"),
            concat(lit(boiler + " t"), col("sid").cast("string")).as("text"))
        val corpus = spam.unionByName(d)
        val sh = graft.ext.Dedup
          .hashedShingles(corpus, "doc_id", "text", 3)
          .withColumnRenamed("sh", "shingle")
        graft.ext.ShingleIndex.registerDocs(s, dir + "#autoprune", sh,
          buckets = 4, withBands = true) // zero prune knobs — the point
        val autoPruned = graft.ext.ShingleIndex.readMarker(s)
          .exists(_.contains(""""auto_prune":true"""))
        val idx = graft.ext.ShingleIndex.liveFor(s, dir + "#autoprune").get
        val stopCount = idx.stop.map(_.count()).getOrElse(0L)
        val baseRow = d.orderBy("doc_id").head()
        val (baseId, baseText) = (baseRow.getLong(0), baseRow.getString(1))
        val batch = Seq(
          (9000001L, baseText + " addendum"),
          (9000002L, boiler + " completely fresh unrelated tail content"))
          .toDF("doc_id", "text")
        val (pairs, release) = graft.ext.Dedup.incrementalMinhashPairsIndexed(
          batch, corpus.select("doc_id"), idx, "doc_id", "text", 0.8)
        val hits = pairs.select(col("delta_id"), col("corpus_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        release()
        // the seed doc may have GENUINE near-dup siblings in the corpus
        // (the testdata's dup groups vary per sf), so the pin is: the
        // plant is found, and every hit is the plant's — the
        // boilerplate-only batch doc matches nothing
        Seq((autoPruned, stopCount > 0,
          hits.contains((9000001L, baseId)) && hits.forall(_._1 == 9000001L)))
          .toDF("auto_pruned", "stop_nonempty", "screen_exact")
      },
      Some("""SELECT TRUE AS auto_pruned, TRUE AS stop_nonempty,
          TRUE AS screen_exact""")),

    // ── generation-pinned screen (round 16, verdict task 1): the corpus
    //    pins its row set per generation (q_corpus_readat), but a training
    //    run's reproducibility also needs the INDEX that screened it —
    //    compact used to destroy the prior postings/bands/stop state
    //    irrecoverably. Compactions now retire the replaced artifact set
    //    into a generation archive; liveAt(g)/postingsAt(g) rebuild that
    //    state's exact screen inputs, retractions since pass through (the
    //    readAt contract), and GC'd generations refuse loudly. Pinned
    //    here: the pinned screen re-emits the PRE-compaction screen's
    //    verdicts verbatim minus the retracted corpus doc — while the
    //    live index has moved on — and pinning a swept generation throws ──
    Q(
      "q_index_pinned_screen",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").orderBy("doc_id").limit(300)
          .select(col("doc_id"), col("text"))
        val sh = graft.ext.Dedup.hashedShingles(d, "doc_id", "text", 3)
          .withColumnRenamed("sh", "shingle")
        graft.ext.ShingleIndex.registerDocs(s, dir + "#pinned", sh,
          buckets = 4, withBands = true)
        val seeds = d.orderBy("doc_id").limit(120).collect()
        val (seedA, textA) = (seeds.head.getLong(0), seeds.head.getString(1))
        val (seedB, textB) = (seeds.last.getLong(0), seeds.last.getString(1))
        val batch = Seq((9100001L, textA + " addendum"),
          (9100002L, textB + " addendum")).toDF("doc_id", "text")
        def screen(idx: graft.ext.ShingleIndex.LiveIndex,
            ids: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
          val (pairs, release) = graft.ext.Dedup
            .incrementalMinhashPairsIndexed(batch, ids, idx,
              "doc_id", "text", 0.8)
          val out = pairs.select(col("delta_id"), col("corpus_id"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          release(); out
        }
        val p0 = screen(
          graft.ext.ShingleIndex.liveFor(s, dir + "#pinned").get,
          d.select("doc_id"))
        // retraction during generation 0, then the freeze
        graft.ext.ShingleIndex.delete(s,
          Seq(seedA).toDF("doc_id"), token = Some("pinned-kill"))
        graft.ext.ShingleIndex.compact(s)
        // the live index moves on — the pinned state must not
        graft.ext.ShingleIndex.append(s,
          d.select((col("doc_id") + 9200000L).as("doc_id"),
            concat(lit("moved-on variant "), col("text")).as("text")),
          token = Some("pinned-g1"))
        val pinnedIds = graft.ext.ShingleIndex.postingsAt(s, 0)
          .select("doc_id").distinct()
        val p1 = screen(graft.ext.ShingleIndex.liveAt(s, 0).get, pinnedIds)
        val screenPinned = p1 == p0.filterNot(_._2 == seedA)
        val retractionThrough =
          p0.exists(_._2 == seedA) && !p1.exists(_._2 == seedA)
        val bothSeedsHit =
          p0.contains((9100001L, seedA)) && p0.contains((9100002L, seedB)) &&
            p1.contains((9100002L, seedB))
        // GC: the next freeze sweeps generation 0 under the default
        // one-generation window; pinning it must refuse, not half-serve
        graft.ext.ShingleIndex.compact(s)
        val gcRefused =
          try { graft.ext.ShingleIndex.postingsAt(s, 0); false }
          catch { case _: IllegalArgumentException => true }
        Seq((bothSeedsHit, screenPinned, retractionThrough, gcRefused))
          .toDF("both_seeds_hit", "pinned_screen_identical",
            "retraction_passes_through", "gc_refuses")
      },
      Some("""SELECT TRUE AS both_seeds_hit, TRUE AS pinned_screen_identical,
          TRUE AS retraction_passes_through, TRUE AS gc_refuses""")),

    // ── cross-store run manifest (round 17, verdict task 1): round 16 made
    //    each store individually pinnable, but a training run had to record
    //    three pins by hand and nothing validated they were contemporaneous.
    //    RunManifest.capture records corpus + screen-index + ANN state as
    //    ONE named artifact — generation plus the immutable part-file
    //    listing, so even a capture taken mid-generation (appends keep
    //    landing) replays the exact capture-time state. Pinned here, end to
    //    end and under the step's lease: after maintenance moved ALL THREE
    //    stores (corpus compaction, shingle compaction, ANN retrain — and
    //    post-capture appends into every pinned generation), the loaded
    //    manifest replays the corpus read, the near-dup screen, and the
    //    ANN search bit-identically to snapshots taken at capture time;
    //    retractions journaled after capture pass through every member;
    //    and once the corpus pin falls out of retention, validate refuses
    //    loudly NAMING the member ──────────────────────────────────────────
    Q(
      "q_run_manifest",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val d = t(s, dir, "documents").orderBy("doc_id").limit(300)
          .select(col("doc_id"), col("text"))
        val batchA = d.filter(pmod(col("doc_id"), lit(3)) === 0)
        val batchB = d.filter(pmod(col("doc_id"), lit(3)) === 1)
        val batchC = d.filter(pmod(col("doc_id"), lit(3)) === 2)
        val corpus = java.nio.file.Files
          .createTempDirectory("graft-run-manifest-c").toString
        val annIdx = java.nio.file.Files
          .createTempDirectory("graft-run-manifest-a").toString
        // ── build the three stores and grow them across a step boundary ──
        graft.ext.CorpusStore.init(corpus)
        graft.ext.CorpusStore.append(s, corpus, batchA)
        graft.ext.ShingleIndex.registerDocs(s, corpus,
          graft.ext.Dedup.hashedShingles(batchA, "doc_id", "text", 3)
            .withColumnRenamed("sh", "shingle"),
          buckets = 4, withBands = true)
        graft.ext.CorpusStore.append(s, corpus, batchB)
        graft.ext.ShingleIndex.append(s, batchB, token = Some("rm-b"))
        val aBase = e.filter(pmod(col("vec_id"), lit(4)) < 2)
        val (cents, indexed) = graft.ext.AnnIndex.buildIvf(aBase,
          nCells = 16, refineIters = 1)
        graft.ext.AnnIndex.writeIvf(annIdx, cents, indexed, nCells = 16)
        graft.ext.AnnIndex.appendIvf(s, annIdx,
          e.filter(pmod(col("vec_id"), lit(4)) === 2))
        // ── the step boundary: capture under the step's lease ────────────
        val lease = graft.ext.WriterLease.acquire(corpus, "manifest-step")
        val m0 = graft.ext.RunManifest.capture(s, corpus, "run-1",
          annDirs = Seq(annIdx), lease = Some(lease))
        graft.ext.WriterLease.release(lease)
        // capture-time snapshots (collected NOW — the replay must
        // reproduce these bit-for-bit after the stores move)
        def snap(df: org.apache.spark.sql.DataFrame) = s.createDataFrame(
          java.util.Arrays.asList(df.collect(): _*), df.schema)
        def idSet(df: org.apache.spark.sql.DataFrame) =
          df.select("doc_id").collect().map(_.getLong(0)).toSet
        val corpusSnap = idSet(graft.ext.CorpusStore.read(s, corpus))
        val seeds = batchA.orderBy("doc_id").limit(2).collect()
        val probe = Seq(
          (9300001L, seeds.head.getString(1) + " addendum"),
          (9300002L, seeds.last.getString(1) + " addendum"))
          .toDF("doc_id", "text")
        def screen(idx: graft.ext.ShingleIndex.LiveIndex,
            ids: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
          val (pairs, release) = graft.ext.Dedup
            .incrementalMinhashPairsIndexed(probe, ids, idx,
              "doc_id", "text", 0.8)
          val out = pairs.select(col("delta_id"), col("corpus_id"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          release(); out
        }
        val screenSnap = screen(
          graft.ext.ShingleIndex.liveFor(s, corpus).get,
          graft.ext.CorpusStore.read(s, corpus).select("doc_id"))
        val q = e.filter(col("vec_id") < 10)
        val searchSnap = snap(
          graft.ext.AnnIndex.searchIvf(s, annIdx, q, 3, nprobe = 4))
        // ── ALL THREE stores move on: post-capture appends land in the
        //    pinned generations, then maintenance freezes/replaces them ────
        graft.ext.CorpusStore.append(s, corpus, batchC)
        graft.ext.ShingleIndex.append(s, batchC, token = Some("rm-c"))
        graft.ext.AnnIndex.appendIvf(s, annIdx,
          e.filter(pmod(col("vec_id"), lit(4)) === 3)
            .withColumn("embedding",
              expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))")))
        graft.ext.CorpusStore.compactSnapshot(s, corpus, targetFiles = 2,
          graceGenerations = 2)
        graft.ext.ShingleIndex.compact(s)
        graft.ext.AnnIndex.retrain(s, annIdx, refineIters = 1,
          retainGenerations = Some(2))
        val liveMoved =
          idSet(graft.ext.CorpusStore.read(s, corpus)) != corpusSnap &&
            graft.ext.AnnIndex.searchIvf(s, annIdx, q, 3, nprobe = 4)
              .collect().map(_.toString).toSet !=
              searchSnap.collect().map(_.toString).toSet
        // ── replay from the LOADED artifact (round-trip through disk) ────
        val m = graft.ext.RunManifest.load(corpus, "run-1")
        graft.ext.RunManifest.validate(s, m)
        val corpusReplay =
          idSet(graft.ext.RunManifest.readCorpus(s, m)) == corpusSnap
        val screenReplay = screen(
          graft.ext.RunManifest.screenIndex(s, m).get,
          graft.ext.RunManifest.readCorpus(s, m).select("doc_id")) ==
          screenSnap
        val searchReplayDf = graft.ext.RunManifest.searchAnn(
          s, m, annIdx, q, 3, nprobe = 4)
        val searchReplay = searchReplayDf.collect().map(_.toString).toSet ==
          searchSnap.collect().map(_.toString).toSet
        // ── retractions after capture pass through every member ──────────
        val deadDoc = seeds.head.getLong(0)
        graft.streaming.DocsStream.retract(s, corpus,
          Seq(deadDoc).toDF("doc_id"), token = "rm-kill")
        val deadVec = searchSnap.select("cid").head().getLong(0)
        graft.ext.AnnIndex.delete(s, annIdx, Seq(deadVec).toDF("vec_id"),
          token = Some("rm-kill"))
        val retractThrough =
          !idSet(graft.ext.RunManifest.readCorpus(s, m)).contains(deadDoc) &&
            screen(graft.ext.RunManifest.screenIndex(s, m).get,
              graft.ext.RunManifest.readCorpus(s, m).select("doc_id")) ==
              screenSnap.filterNot(_._2 == deadDoc) &&
            graft.ext.RunManifest.searchAnn(s, m, annIdx, q, 3, nprobe = 4)
              .filter(col("cid") === deadVec).count() == 0L
        // ── GC the corpus pin: refusal must NAME the member ──────────────
        graft.ext.CorpusStore.compactSnapshot(s, corpus, targetFiles = 2,
          graceGenerations = 1)
        graft.ext.CorpusStore.compactSnapshot(s, corpus, targetFiles = 2,
          graceGenerations = 1)
        val gcNamesMember =
          try { graft.ext.RunManifest.validate(s, m); false }
          catch { case ex: IllegalStateException =>
            ex.getMessage.contains("corpus") && ex.getMessage.contains(corpus)
          }
        graft.perf.Measure.deleteRecursively(annIdx)
        graft.perf.Measure.deleteRecursively(corpus)
        Seq((screenSnap.nonEmpty, liveMoved, corpusReplay, screenReplay,
          searchReplay, retractThrough, gcNamesMember))
          .toDF("screen_nonempty", "live_moved_on", "corpus_replay_identical",
            "screen_replay_identical", "search_replay_identical",
            "retraction_passes_through", "gc_refuses_naming_member")
      },
      Some("""SELECT TRUE AS screen_nonempty, TRUE AS live_moved_on,
          TRUE AS corpus_replay_identical, TRUE AS screen_replay_identical,
          TRUE AS search_replay_identical, TRUE AS retraction_passes_through,
          TRUE AS gc_refuses_naming_member"""))
  )
}

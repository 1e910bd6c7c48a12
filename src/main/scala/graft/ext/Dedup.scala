package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deduplication operators for large-scale text corpora. All are
  * DataFrame→DataFrame transformers: one shuffle per stage, no driver-side
  * state, so they scale with partition count alone.
  *
  * Scale design (100 TB):
  *  - exact dedup = single hash shuffle on the dedup key;
  *  - shingle/MinHash stages shuffle on shingle / band-bucket keys — both
  *    are high-cardinality, so partitions stay balanced;
  *  - the frequent-shingle guard (`maxShingleDocFreq`) caps the quadratic
  *    blowup of the shingle self-join: a shingle occurring in f docs emits
  *    f² candidate pairs, so stop-shingles must be dropped at scale
  *    (standard MinHash/LSH practice);
  *  - banded LSH keeps the candidate set near-linear in the number of true
  *    near-duplicates instead of all-pairs.
  */
object Dedup {

  /** In-plan sample-scale guard: crosses a ONE-ROW broadcast aggregate
    * (`statCol` named `__stat` in `stat`) into `df` and raises at runtime if
    * the statistic exceeds `bound`. The check rides the existing plan (no
    * eager driver-side count job): the aggregate is a linear pre-stage, the
    * broadcast is one row, and the first row scanned on the guarded side
    * fails the query BEFORE the quadratic join output materializes. `bound
    * <= 0` disables the guard (tests pinning exact-face equality at toy
    * scale opt out explicitly). */
  private def sampleScaleGuard(df: DataFrame, stat: DataFrame, bound: Long,
      face: String, alternative: String): DataFrame = {
    if (bound <= 0L) df
    else df.crossJoin(broadcast(stat))
      .filter(coalesce(assert_true(col("__stat") <= bound,
        concat(lit(s"$face is a sample-scale verifier (bound $bound, saw "),
          col("__stat"),
          lit(s"); use $alternative for the production path"))), lit(true)))
      .drop("__stat")
  }

  /** Exact deduplication: keep one representative row per key (the smallest
    * `orderCol`). Equivalent to `dropDuplicates` but with a deterministic
    * winner (callers pass a unique-per-group orderCol — doc_id/event_id).
    *
    * One `min_by` aggregate, NOT a rank window (round 11): the window form
    * co-locates every copy of a key in one task before ranking, so a viral
    * duplicate — the exact document this operator exists for — becomes the
    * straggler; min_by partial-aggregates map-side, reducing each key to
    * ONE candidate row per input partition before the shuffle, the same
    * bounded-buffer argument as [[graft.functions.TopKStructAgg]] at
    * k = 1 (and min_by is the codegen'd declarative form of it). */
  def exact(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(payload, col(orderCol)).as("__win"))
      .select(df.columns.map(c => col(s"__win.`$c`").as(c)): _*)
  }

  /** Distinct word n-gram shingles per document: (id, shingle).
    * Documents shorter than n tokens are dropped (no shingle exists).
    * Dedup happens per-document with array_distinct BEFORE the explode —
    * a narrow map, no global shuffle (shingle sets are per-doc, so a global
    * distinct would shuffle 100 TB for nothing). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    docs
      .select(col(idCol).as("doc_id"), split(lower(col(textCol)), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(0, size(toks) - $n), i -> " +
          (0 until n).map(j => s"toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")") +
          ")"))).as("shingle"))
  }

  /** Distinct word n-gram shingles per document, pre-hashed to 64 bits:
    * (doc_id, sh bigint). Each token is hashed ONCE (codegen'd xxhash64);
    * an n-gram's hash combines the n token hashes with position-distinct
    * rotations (rotl 21·j) + XOR — order-sensitive, no string concatenation,
    * no per-shingle re-hash of the text. Downstream set operations (distinct,
    * stop-shingle guard, MinHash base, verification joins) all key on a
    * fixed-width long; equality matches string-shingle equality up to 64-bit
    * collisions (~n²/2⁶⁵ — negligible). Same narrow-map shape as
    * [[shingles]]. */
  def hashedShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    def rotl(x: String, r: Int): String =
      if (r == 0) x else s"(shiftleft($x, $r) | shiftrightunsigned($x, ${64 - r}))"
    val combine = (0 until n)
      .map(j => rotl(s"th[i + $j]", (21 * j) % 64)).mkString(" ^ ")
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"transform(split(lower($textCol), ' '), t -> xxhash64(t))").as("th"))
      .filter(size(col("th")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(0, size(th) - $n), i -> $combine)"))).as("sh"))
  }

  /** Boilerplate n-gram detection: shingles present in at least `minDocFrac`
    * of the corpus (headers, footers, license blurbs, templated spans). The
    * output doubles as the data-derived stop-shingle list for
    * [[jaccardPairs]]'s `maxShingleDocFreq` guard — at 100 TB you compute
    * this once per corpus snapshot and anti-join it out of the shingle
    * relation before any pair enumeration. One shuffle on the shingle key;
    * the corpus size rides in-plan as a one-row broadcast aggregate.
    * Takes the DISTINCT-per-doc shingle relation from [[shingles]] (or the
    * hashed variant at scale). Returns (shingle, df_docs, doc_frac). */
  def boilerplateShingles(sh: DataFrame, docs: DataFrame,
      minDocFrac: Double): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    sh.groupBy("shingle").agg(count(lit(1)).as("df_docs"))
      .crossJoin(broadcast(n))
      .withColumn("doc_frac",
        round(col("df_docs").cast("double") / col("n_docs").cast("double"), 6))
      .filter(col("doc_frac") >= minDocFrac)
      .select(col("shingle"), col("df_docs"), col("doc_frac"))
  }

  /** Cross-document duplicated-span fraction: for each document, the share
    * of its POSITIONAL word n-grams that occur in at least one other
    * document — the span-level dedup metric (how much of this doc is
    * copied text), a cheap relational stand-in for suffix-array substring
    * dedup. Unlike [[shingles]] this keeps every position (no per-doc
    * distinct): a doc that repeats a shared span twice has both spans
    * counted. Two shuffles on the shingle key (doc-frequency, then the
    * shared-position semi-join); docs shorter than n tokens are dropped.
    * Returns (doc_id, n_grams, n_shared, dup_frac). */
  def spanDupFraction(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val gram = (0 until n).map(j => s"toks[i + $j]")
      .mkString("concat_ws(' ', ", ", ", ")")
    val pos = docs
      .select(col(idCol).as("doc_id"), split(lower(col(textCol)), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> $gram)")).as("shingle"))
    val multiDoc = pos.select("doc_id", "shingle").distinct()
      .groupBy("shingle").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("shingle")
    val totals = pos.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val shared = pos.join(multiDoc, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    totals.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_grams").cast("double"), 6).as("dup_frac"))
  }

  /** Document-frequency annotation (`__df` per row) with an optional STOP
    * set routed around the wide join — the round-14 boilerplate-pruning
    * kernel, and a pure PLAN transform: output rows and values are
    * BIT-IDENTICAL with or without `stop` (pinned in ExtensionsSpec), only
    * the physical shape changes.
    *
    * Why: the prefix operators annotate every posting with its shingle's
    * corpus df via `sh ⋈ (group-by-shingle count)`. On the stored bucketed
    * index that join is bucket-local — but a df-SATURATED shingle
    * (boilerplate: headers, license blurbs, template spam) puts its entire
    * posting list in ONE bucket/join task, the unsplittable hot key the
    * write-time skew guard measurably could not spread (raising buckets
    * only moves bystanders — BASELINE.md round-13 sf10b). With `stop`
    * (the saturated shingles, a bounded set by construction: at df ≥
    * frac·n at most 1/frac distinct shingles qualify per doc slot), hot
    * rows take a BROADCAST join instead: the shuffled/bucket-local join
    * sees only rare keys, and the hot posting mass never co-locates.
    *
    * Exactness argument: the split computes the same `__df` for every row
    * (rare dfs from the rare-only aggregate — stop rows can't change
    * another shingle's count; hot dfs from the hot-only aggregate, ≤|stop|
    * groups, map-side combined to nothing) and the union feeds the SAME
    * downstream window/filters, so every position and bound is unchanged.
    * No threshold reasoning is involved — `stop` may be ANY shingle set. */
  private[graft] def withDf(sh: DataFrame,
      stop: Option[DataFrame]): DataFrame = {
    val dfreq = (s: DataFrame) =>
      s.groupBy("shingle").agg(count(lit(1)).as("__df"))
    stop match {
      case None => sh.join(dfreq(sh), "shingle")
      case Some(st) =>
        val keys = broadcast(st.select(col("shingle")))
        val rare = sh.join(keys, Seq("shingle"), "left_anti")
        val hot = sh.join(keys, Seq("shingle"), "left_semi")
        rare.join(dfreq(rare), "shingle")
          .unionByName(hot.join(broadcast(dfreq(hot)), "shingle"))
    }
  }

  /** All-pairs n-gram Jaccard similarity ≥ threshold via a shingle
    * self-join. Exact but quadratic in co-occurring docs — a SAMPLE-SCALE
    * VERIFIER, not a production operator: the sf1 rehearsal measured the
    * naive self-join at 6.4× wall-clock for 10× rows. The production routes
    * with identical (or verified-superset) semantics are
    * [[jaccardPairsPrefix]] (exact, pinned row-identical in ScalaTest) and
    * [[minhashDedup]] (approximate candidates, exact verification). The
    * `maxDocs` guard enforces that routing at runtime: the corpus doc count
    * rides in-plan as a one-row broadcast and the query fails fast — before
    * the quadratic join output materializes — when invoked above the bound.
    * The guard DEFAULTS OFF (0) at the library API — an unbounded public
    * API stays unbounded; the registered query faces (the production entry
    * points) enable it explicitly with bound 20000.
    * `maxShingleDocFreq` (0 = off) drops stop-shingles
    * before the join; leave off for exactness, set (e.g. 1000) at scale. */
  def jaccardPairs(sh: DataFrame, threshold: Double,
      maxShingleDocFreq: Long = 0, maxDocs: Long = 0): DataFrame = {
    val pruned =
      if (maxShingleDocFreq <= 0) sh
      else {
        val freq = sh.groupBy("shingle")
          .agg(count(lit(1)).as("__df")).filter(col("__df") <= maxShingleDocFreq)
        sh.join(freq.select("shingle"), Seq("shingle"))
      }
    val guarded = sampleScaleGuard(pruned,
      sh.agg(countDistinct(col("doc_id")).as("__stat")), maxDocs,
      "Dedup.jaccardPairs", "jaccardPairsPrefix or minhashDedup")
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = guarded.select(col("doc_id").as("id_a"), col("shingle"))
    val b = pruned.select(col("doc_id").as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.select(col("doc_id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("jaccard", round(
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("na"), col("nb"), col("jaccard"))
  }

  /** Prefix-filtered exact set-similarity join (the AllPairs/PPJoin
    * candidate scheme, Bayardo et al., WWW'07; reference computes near-dup
    * over full shingle sets): identical output to [[jaccardPairs]] at the
    * same threshold, but candidates come from an equi-join restricted to
    * each doc's PREFIX — its (n − ⌈τ·n⌉ + 1) globally-rarest shingles.
    * Any pair with Jaccard ≥ τ must share a prefix shingle (pigeonhole on
    * the required overlap), so the candidate set is a superset and the
    * per-candidate exact verification makes the result exact. Common
    * shingles never drive the join, so the quadratic blow-up of the naive
    * self-join on stop-shingles disappears while exactness is kept — this
    * is the 100 TB face of exact-threshold dedup (the approximate face is
    * MinHash+LSH below).
    *
    * The threshold is taken as the rational tNum/tDen so the prefix bound
    * uses exact integer ceilings — an IEEE `ceil(0.8 × n)` can land on
    * n·τ + ε and silently shorten the prefix, breaking completeness.
    * Because the verification predicate matches the baseline's ROUNDED
    * comparison (round(J, 6) ≥ τ admits true J as low as τ − ε with
    * ε = 5·10⁻⁷), the prefix length and size filter carry ⌈ε·n⌉ units of
    * slack — computed per doc, so output equality with [[jaccardPairs]]
    * holds at EVERY set size, not just below 1/ε shingles.
    */
  /** Prefix postings of [[jaccardPairsPrefix]] — each doc's
    * (n − ⌈τn⌉ + 1 (+ε)) rarest shingles, the only rows that generate
    * candidates. Exposed for scale diagnostics: Σ_shingle C(postings, 2) is
    * the raw self-join match volume the candidate stage pays BEFORE
    * dedup/size filters. */
  def prefixPostings(sh: DataFrame, tNum: Int, tDen: Int,
      stop: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // per-doc shingles ordered rarest-first; keep only the prefix
    // (n − ⌈τn⌉ + 1, plus ⌈ε·n⌉ slack for the rounded-threshold epsilon;
    // ε = 5e-7 → slack = ceil(n / 2e6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("shingle"))
    withDf(sh, stop)
      .withColumn("__pos", row_number().over(w))
      .join(counts, "doc_id")
      .filter(col("__pos") <=
        col("n_sh") - expr(s"($tNum * n_sh + $tDen - 1) div $tDen") + 1 +
        expr("(n_sh + 1999999) div 2000000"))
      .select(col("doc_id"), col("shingle"), col("n_sh"), col("__pos"))
  }

  /** CANDIDATE stage of [[jaccardPairsPrefix]], exposed so scale
    * rehearsals can measure candidate volume (the prefix join's cost
    * driver) separately from verification: unordered (id_a, id_b) pairs
    * sharing ≥1 prefix shingle and passing the size filter. */
  def prefixCandidates(sh: DataFrame, tNum: Int, tDen: Int,
      stop: Option[DataFrame] = None): DataFrame = {
    val prefix = prefixPostings(sh, tNum, tDen, stop)
    prefix.select(col("doc_id").as("id_a"), col("shingle"),
        col("n_sh").as("na"), col("__pos").as("pa"))
      .join(prefix.select(col("doc_id").as("id_b"), col("shingle"),
        col("n_sh").as("nb"), col("__pos").as("pb")),
        Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      // size filter: τ ≤ na/nb ≤ 1/τ is necessary for true J ≥ τ;
      // ⌈ε·n⌉ tDen-units of slack keep rounded-boundary pairs at any size
      .filter(col("na") * tNum <=
        col("nb") * tDen + expr(s"$tDen * ((na + 1999999) div 2000000)") &&
        col("nb") * tNum <=
          col("na") * tDen + expr(s"$tDen * ((nb + 1999999) div 2000000)"))
      // POSITIONAL filter (PPJoin, Xiao et al. 2008): both docs' shingles
      // are ordered by the SAME global (df, shingle) total order, so for
      // the FIRST shingle a pair shares, every other common shingle sits
      // strictly after position pa in a AND after pb in b — overlap ≤
      // 1 + min(na−pa, nb−pb). J ≥ τ needs overlap·(tNum+tDen) ≥
      // tNum·(na+nb); a row failing the bound cannot be the pair's
      // first-shared row of a qualifying pair, and a qualifying pair's
      // true first-shared row always passes (the bound is valid there), so
      // keeping pairs where ANY row passes loses nothing — exact, pinned
      // against the naive join in ExtensionsSpec. Same ⌈ε·n⌉ slack as the
      // size filter for rounded-boundary pairs. Round-8 measurement: cuts
      // candidates ~5× at sf10, and verification cost with them.
      .filter((lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) +
          expr("(na + nb + 1999999) div 2000000")) * (tNum + tDen) >=
        (col("na") + col("nb")) * tNum)
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  def jaccardPairsPrefix(sh: DataFrame, tNum: Int, tDen: Int,
      stop: Option[DataFrame] = None): DataFrame = {
    val threshold = tNum.toDouble / tDen
    // cached (r17 second pass): candidates feed the verification join AND
    // the two per-side semi-join prunes below — uncached, the whole prefix
    // candidate subtree (df join + positional window + prefix self-join +
    // distinct) re-runs per reference, and the first-pass interleaved A/B
    // showed AQE stage reuse does NOT dedupe it (q_setsim_prefix warm 3.03
    // vs 1.89 s with the uncached prune). Bounded: id pairs only, near-
    // linear in true near-dups (the prefix/positional filters' design
    // goal) — the same bounded-candidate cache contract as minhashDedup's
    // `cands`.
    val cand = prefixCandidates(sh, tNum, tDen, stop).cache()
    // exact verification on candidates only, against COMPACT per-doc
    // shingle arrays: two id-keyed joins of |cand| rows each, then an
    // in-row array_intersect — shuffle volume ∝ candidates, not corpus.
    // (The round-8 shape expanded every candidate pair by doc a's full
    // shingle list and sort-merge-joined that against the corpus shingle
    // table — |cand|·n̄ skinny rows through one more shuffle; at the sf10
    // rehearsal that expansion was the whole superlinear term. Same
    // output: shingle rows are distinct per doc, so |array_intersect| is
    // exactly the old count-of-common-rows.)
    // r17 (guide §3.2): the set aggregate reads only candidate docs — a
    // broadcast semi-join against the UNION of both sides' candidate ids
    // sits below the collect_list, so the corpus-wide sorted-array build
    // (and its corpus-sized array shuffle into the verification join)
    // never happens. One shared id set, not per-side sets: the two join
    // consumers then reference an IDENTICAL aggregate subtree, which Spark
    // computes once (reused exchange) with a single broadcast build — the
    // per-side variant measured two extra serialized broadcast jobs per
    // query for no smaller aggregate. Identity: aggregating a superset of
    // each side's ids is harmless, the downstream joins are inner on ids
    // drawn from exactly this union.
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    // cached like `cand`: the aggregate feeds both join sides, and the
    // measured plan showed AQE does NOT reuse the pruned aggregate's
    // exchange across the two references (it did for the unpruned form) —
    // without this cache the candidate-sized aggregate and its semi-join
    // run twice per query. Bounded: one row per candidate doc.
    val sets = sh
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(
        sort_array(collect_list(col("shingle"))).as("__shs"),
        count(lit(1)).as("n_sh"))
      .cache()
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("__shs").as("__sa"),
        col("n_sh").as("na")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("__shs").as("__sb"),
        col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("common",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("jaccard", round(
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("na"), col("nb"), col("jaccard"))
  }

  /** Asymmetric containment detection: ordered pairs where contained doc
    * A has |A∩B|/|A| ≥ cNum/cDen — the quote/snippet/subset-document case
    * that symmetric Jaccard misses (a 50-shingle doc fully inside a
    * 5000-shingle doc has Jaccard ≈ 0.01 but containment 1.0). Candidates
    * come from joining A's (na − ⌈c·na⌉ + 1) rarest shingles against the
    * full shingle table (prefix principle applies to the contained side
    * only — the container side has no size bound), then exact verification
    * on candidates. `minShingles` drops docs too small for containment to
    * be meaningful. */
  def containmentPairs(sh: DataFrame, cNum: Int, cDen: Int,
      minShingles: Long = 10, stop: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val threshold = cNum.toDouble / cDen
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("shingle"))
    // global (df, shingle)-ordered positions for EVERY doc — the contained
    // side filters them to its prefix; the container side carries them into
    // the join so the positional bound below can prune candidate rows
    // (round-9: this was the weakest routed slope at sf10 — the container
    // side joined bare, so every hot-shingle posting became a candidate)
    val posAll = withDf(sh, stop)
      .withColumn("__pos", row_number().over(w))
      .join(counts, "doc_id")
    val prefixA = posAll
      .filter(col("n_sh") >= minShingles)
      // ⌈ε·n⌉ slack beyond n − ⌈c·n⌉ + 1: the verification compares the
      // ROUNDED containment, which admits true C down to c − 5e-7
      .filter(col("__pos") <=
        col("n_sh") - expr(s"($cNum * n_sh + $cDen - 1) div $cDen") + 1 +
        expr("(n_sh + 1999999) div 2000000"))
      .select(col("doc_id").as("id_a"), col("shingle"),
        col("n_sh").as("na"), col("__pos").as("pa"))
    val cand = prefixA
      .join(posAll.select(col("doc_id").as("id_b"), col("shingle"),
        col("n_sh").as("nb"), col("__pos").as("pb")), Seq("shingle"))
      .filter(col("id_a") =!= col("id_b"))
      // container-size bound: common ≤ nb, and qualifying needs
      // common·cDen ≥ cNum·na (minus the ⌈ε·na⌉ rounding slack) — a
      // container smaller than c·na can never contain A
      .filter((col("nb") + expr("(na + 1999999) div 2000000")) * cDen >=
        col("na") * cNum)
      // POSITIONAL bound (the PPJoin filter, asymmetric form): both docs'
      // shingles sit in the SAME global (df, shingle) order, so at a pair's
      // FIRST shared shingle every other common shingle lies strictly after
      // position pa in A and pb in B — common ≤ 1 + min(na−pa, nb−pb). A
      // qualifying pair's first-shared row is always a candidate row (its
      // A-position is minimal among common shingles, hence inside A's
      // prefix) and always passes, so keeping pairs where ANY row passes
      // loses nothing — exact, pinned against the unfiltered join in
      // ExtensionsSpec. Same ⌈ε·na⌉ slack as the size bound.
      .filter((lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) +
          expr("(na + 1999999) div 2000000")) * cDen >=
        col("na") * cNum)
      .select(col("id_a"), col("id_b"))
      .distinct()
      // cached (r17 second pass): feeds the verification join + both
      // per-side prunes; bounded id pairs — see jaccardPairsPrefix
      .cache()
    // compact-array verification (same round-8 shape as jaccardPairsPrefix):
    // shuffle ∝ candidates, not candidates × doc size; identical output
    // since per-doc shingles are distinct. r17 (guide §3.2): the set
    // aggregate is semi-join-pruned to the union of both sides' candidate
    // ids below the collect_list (one shared aggregate subtree → computed
    // once, single broadcast build — see jaccardPairsPrefix); the
    // downstream joins are inner on ids from exactly this union, so output
    // is unchanged while the corpus-wide array build disappears.
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    // cached like `cand`: the aggregate feeds both join sides, and the
    // measured plan showed AQE does NOT reuse the pruned aggregate's
    // exchange across the two references (it did for the unpruned form) —
    // without this cache the candidate-sized aggregate and its semi-join
    // run twice per query. Bounded: one row per candidate doc.
    val sets = sh
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(
        sort_array(collect_list(col("shingle"))).as("__shs"),
        count(lit(1)).as("n_sh"))
      .cache()
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("__shs").as("__sa"),
        col("n_sh").as("na")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("__shs").as("__sb"),
        col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("common",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .filter(col("common") > 0)
      .withColumn("containment",
        round(col("common").cast("double") / col("na").cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("na"), col("nb"),
        col("containment"))
  }

  /** DECONTAMINATION — benchmark/eval overlap detection, the training-data
    * pipeline's mandatory pre-training step: every (eval doc, train doc)
    * pair where the EVAL doc's shingle set is ≥ cNum/cDen contained in the
    * train doc. Complements [[contamination]] (the per-doc leaked-fraction
    * AGGREGATE — cheap screen, no attribution): run the screen first, this
    * pair-level form second to name WHICH training documents leaked. The cross-relation form of [[containmentPairs]], shaped for
    * its real-world asymmetry: the eval/benchmark corpus is TINY next to
    * the training corpus, and the prefix principle applies to the
    * contained (eval) side only — so candidates are eval-prefix shingles ⋈
    * train postings, never anything corpus × corpus, and the training side
    * is touched once for document frequencies and once for the join.
    *
    * Both relations are (doc_id, shingle); positions come from ONE shared
    * (df, shingle) global order over the union (the positional bound needs
    * both docs' positions in the same order). Returns (eval_id, train_id,
    * common, n_eval, n_train, containment) — exact; bounds are
    * candidate-pruning only (pinned vs the unfiltered cross join in
    * ExtensionsSpec). */
  def decontaminate(trainSh: DataFrame, evalSh: DataFrame, cNum: Int,
      cDen: Int, minShingles: Long = 10,
      stop: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val threshold = cNum.toDouble / cDen
    val tagged = trainSh.select(col("doc_id"), col("shingle"),
        lit(false).as("__eval"))
      .unionByName(evalSh.select(col("doc_id"), col("shingle"),
        lit(true).as("__eval")))
    val counts = tagged.groupBy("doc_id", "__eval")
      .agg(count(lit(1)).as("n_sh"))
    val w = Window.partitionBy(col("doc_id"), col("__eval"))
      .orderBy(col("__df"), col("shingle"))
    val posAll = withDf(tagged, stop)
      .withColumn("__pos", row_number().over(w))
      .join(counts, Seq("doc_id", "__eval"))
    // prefix on the EVAL side only: its (n − ⌈c·n⌉ + 1) rarest shingles
    // (+ the ⌈ε·n⌉ rounding slack of [[containmentPairs]])
    val prefixE = posAll
      .filter(col("__eval"))
      .filter(col("n_sh") >= minShingles)
      .filter(col("__pos") <=
        col("n_sh") - expr(s"($cNum * n_sh + $cDen - 1) div $cDen") + 1 +
        expr("(n_sh + 1999999) div 2000000"))
      .select(col("doc_id").as("eval_id"), col("shingle"),
        col("n_sh").as("na"), col("__pos").as("pa"))
    val cand = prefixE
      .join(posAll.filter(!col("__eval"))
        .select(col("doc_id").as("train_id"), col("shingle"),
          col("n_sh").as("nb"), col("__pos").as("pb")), Seq("shingle"))
      // container-size + positional bounds, identical to containmentPairs
      // (a train doc smaller than c·n_eval can never contain the eval doc;
      // common ≤ 1 + min(na−pa, nb−pb) in the shared order)
      .filter((col("nb") + expr("(na + 1999999) div 2000000")) * cDen >=
        col("na") * cNum)
      .filter((lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) +
          expr("(na + 1999999) div 2000000")) * cDen >=
        col("na") * cNum)
      .select(col("eval_id"), col("train_id"))
      .distinct()
      // cached (r17 second pass): feeds the verification join + both
      // per-side prunes; bounded id pairs — see jaccardPairsPrefix
      .cache()
    // r17 (guide §3.2): the TRAIN side's set aggregate is semi-join-pruned
    // to its candidate ids below the collect_list (identity: the
    // downstream join is inner on exactly these ids) — the train side is
    // the 100 TB one in this operator's design asymmetry, and the prune is
    // what keeps its sorted-array build candidate-sized instead of
    // corpus-sized. The EVAL side stays unpruned: it is tiny by the same
    // design (benchmark corpora), and a second broadcast-build job costs
    // more than the aggregate it would shrink.
    val setsE = evalSh.groupBy("doc_id").agg(
      sort_array(collect_list(col("shingle"))).as("__se"),
      count(lit(1)).as("n_eval"))
    val setsT = trainSh
      .join(broadcast(cand.select(col("train_id").as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(
        sort_array(collect_list(col("shingle"))).as("__st"),
        count(lit(1)).as("n_train"))
    cand
      .join(setsE.select(col("doc_id").as("eval_id"), col("__se"),
        col("n_eval")), Seq("eval_id"))
      .join(setsT.select(col("doc_id").as("train_id"), col("__st"),
        col("n_train")), Seq("train_id"))
      .withColumn("common",
        size(array_intersect(col("__se"), col("__st"))).cast("long"))
      .filter(col("common") > 0)
      .withColumn("containment",
        round(col("common").cast("double") / col("n_eval").cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select(col("eval_id"), col("train_id"), col("common"), col("n_eval"),
        col("n_train"), col("containment"))
  }

  /** MinHash signatures: k hash-function mins per doc in ONE typed
    * aggregate. The shingle is hashed once (codegen'd xxhash64); the k
    * per-position hashes derive from that base as a splitmix64 stream inside
    * [[graft.functions.MinHashSigAgg]] — a full-avalanche mixer per
    * position, so orderings are independent (an affine (a·h+b) mod p family
    * over an oversized modulus is nearly order-preserving and collapses
    * every position — round-1 lesson; the k-wide
    * `min(xxhash64(seed_i, shingle))` form was sound but paid k string
    * hashes per row and a k-column aggregate buffer). Deterministic, one
    * shuffle on doc_id with map-side partial merge. Returns
    * (doc_id, sig array<bigint>). */
  def minhashSignatures(sh: DataFrame, k: Int = 64): DataFrame =
    sh.groupBy("doc_id")
      .agg(HashFunctions.minhashSig(xxhash64(col("shingle")), k).as("sig"))

  /** Banded-LSH candidate pairs from MinHash signatures: docs agreeing on
    * any full band of the signature become a candidate pair. bands*rows must
    * equal the signature length. */
  def lshCandidates(sigs: DataFrame, bands: Int = 16, rows: Int = 4): DataFrame = {
    val banded = sigs.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), j -> hash(slice(sig, j * $rows + 1, $rows)))"))
      .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → signature → banded
    * candidates → exact-Jaccard verification of candidates only. At scale
    * the verification join touches only candidate docs (semi-join pushdown),
    * not the full corpus.
    *
    * `maxShingleDocFreq` (default 1000) drops stop-shingles BEFORE the
    * signature/banding stages — a shingle in f docs otherwise lands f docs
    * in one band bucket (f² candidates), so the guard is what keeps the
    * candidate set near-linear on skewed corpora. Verification still uses
    * the FULL shingle sets, so reported Jaccard stays exact; the trade is
    * recall only for pairs whose similarity rests on ubiquitous shingles
    * (stop-shingle matches are not meaningful near-dup evidence). Set 0 to
    * disable. */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, k: Int = 64,
      bands: Int = 16, rows: Int = 4, maxShingleDocFreq: Long = 1000): DataFrame = {
    // shingles arrive pre-hashed to 64 bits: every downstream stage
    // (stop-shingle guard, signature aggregate, set-size counts, candidate
    // verification) keys on a fixed-width long instead of the shingle
    // string — the cached relation is (long, long) rows and every
    // join/aggregate compares 8-byte keys. Jaccard over hashed shingles
    // equals string Jaccard up to 64-bit collisions (~n²/2⁶⁵ — negligible
    // at any corpus size that fits a cluster).
    val sh = hashedShingles(docs, idCol, textCol, n).cache()
    val forSig =
      if (maxShingleDocFreq <= 0) sh
      else {
        // the STOP set (df > cap) is small by construction (≤ corpus/cap
        // shingles can exceed the cap), so broadcast an anti-join against it
        // instead of shuffling the full shingle table against the keep set
        val drop = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxShingleDocFreq).select("sh")
        sh.join(broadcast(drop), Seq("sh"), "left_anti")
      }
    val sigs = forSig.groupBy("doc_id")
      .agg(HashFunctions.minhashSig(col("sh"), k).as("sig"))
    // cached (r17): candidates feed BOTH the verification join and the
    // semi-join prune below — uncached, the whole banding join subtree runs
    // twice per query (same reasoning as incrementalMinhashPairsIndexed's
    // cands cache). Bounded: near-dup pairs, id pairs only.
    val cands = lshCandidates(sigs, bands, rows).cache()
    // r17 (guide §3.2): verification touches candidate docs only — the
    // LeftSemi prune lives in jaccardVerify (shared by every consumer;
    // batch path = one shared union-pruned aggregate serving both join
    // sides), with the bounded-candidate broadcast contract: candidate
    // ids are near-linear in true near-dups (the banding design goal), and
    // a band-saturating corpus fails LOUDLY at the broadcast cap instead
    // of silently shuffling the corpus (the round-14 routed mitigation —
    // maxShingleDocFreq / pruneDfFrac — is the fix). Before this round the
    // per-doc sorted-array aggregates ran over the FULL corpus and were
    // broadcast whole (plans/r17/q_dedup_minhash_lsh_before.txt ops 52-64).
    jaccardVerify(cands, sh, sh, "id_a", "id_b", threshold)
  }

  /** Shared exact-Jaccard verification kernel: score candidate (left, right)
    * pairs against hashed-shingle relations (doc_id, sh) and keep pairs at
    * ≥ threshold. Used by the batch LSH pipeline (both sides = the corpus)
    * and the incremental ingest path (delta vs corpus) so threshold/rounding
    * semantics cannot diverge between them. */
  private def jaccardVerify(cands: DataFrame, shLeft: DataFrame,
      shRight: DataFrame, leftId: String, rightId: String,
      threshold: Double): DataFrame = {
    // compact-array verification (the round-8 prefix-join fix, same shape):
    // candidates join per-doc sorted hashed-shingle ARRAYS (8-byte longs)
    // and count array_intersect in-row — shuffle ∝ candidates + corpus,
    // where the previous shape expanded every candidate by doc a's full
    // shingle list (|cand|·n̄ rows) before a corpus-sized sort-merge join.
    // Output identical: per-doc shingles are distinct, and the common>0
    // guard preserves the old inner-join behavior of dropping zero-overlap
    // candidates before the threshold filter.
    // r17 (guide §3.2): each side's set aggregate reads only candidate
    // docs — a broadcast semi-join against the candidate ids sits below the
    // collect_list, so the corpus-wide array build the round-17 before-plans
    // showed never happens. Identity: the downstream joins are inner on ids
    // drawn from exactly the candidate set, and a side aggregating a
    // SUPERSET of its own ids is harmless. Callers pass `cands` CACHED
    // (each batch/query path does) so the id projections don't re-run the
    // candidate pipeline; the broadcast carries the bounded-candidate
    // contract documented at minhashDedup.
    //
    // When both sides are the SAME relation (the batch path: left = right =
    // the corpus shingles), the prune uses ONE shared id set — the union of
    // both pair sides — and ONE cached aggregate serving both joins: the
    // per-side form computed two near-identical candidate-sized aggregates
    // with two shuffle exchanges and two broadcast builds per execution
    // (ops 61-68 / 79-86 of plans/r17's intermediate minhash plan), which
    // the prefix/containment family had already measured as pure overhead
    // ("two extra serialized broadcast jobs for no smaller aggregate").
    // Cached because AQE does not reuse the pruned aggregate's exchange
    // across the two join references (same measurement as
    // jaccardPairsPrefix's `sets`); bounded: one row per candidate doc.
    // The incremental paths (delta vs corpus) keep per-side prunes — their
    // inputs differ, so there is no shared subtree to collapse.
    val (setsL, setsR) =
      if (shLeft eq shRight) {
        val candIds = cands
          .select(explode(array(col(leftId), col(rightId))).as("doc_id"))
          .distinct()
        val sets = shLeft
          .join(broadcast(candIds), Seq("doc_id"), "left_semi")
          .groupBy("doc_id").agg(
            sort_array(collect_list(col("sh"))).as("__sa"),
            count(lit(1)).as("na"))
          .cache()
        (sets,
          sets.select(col("doc_id"), col("__sa").as("__sb"),
            col("na").as("nb")))
      } else {
        def pruned(sh: DataFrame, idCol: String) =
          sh.join(broadcast(cands.select(col(idCol).as("doc_id")).distinct()),
            Seq("doc_id"), "left_semi")
        (pruned(shLeft, leftId).groupBy("doc_id").agg(
          sort_array(collect_list(col("sh"))).as("__sa"),
            count(lit(1)).as("na")),
          pruned(shRight, rightId).groupBy("doc_id").agg(
            sort_array(collect_list(col("sh"))).as("__sb"),
            count(lit(1)).as("nb")))
      }
    cands
      .join(setsL.select(col("doc_id").as(leftId), col("__sa"), col("na")),
        Seq(leftId))
      .join(setsR.select(col("doc_id").as(rightId), col("__sb"), col("nb")),
        Seq(rightId))
      .withColumn("common",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .filter(col("common") > 0)
      .withColumn("jaccard", round(
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col(leftId), col(rightId), col("jaccard"))
  }

  /** Connected components over an undirected near-dup pair list: hash-min
    * label propagation WITH pointer jumping — each round every node takes
    * the minimum label among itself and its neighbors, then follows its
    * label one hop (comp := comp's comp), so the distance to the cluster
    * minimum roughly halves per round. Convergence is O(log diameter), so
    * the default `maxIter` covers any plausible cluster; if the cap is
    * still hit the call FAILS rather than silently returning partial
    * clusters. Production dedup keeps ONE representative per duplicate
    * CLUSTER, not per pair — pairwise drops mishandle chains (a~b, b~c,
    * a≯c). Per round: two id-keyed joins + one min-aggregate — no
    * driver-side graph state (the driver loop is over ROUNDS, log-bounded,
    * not over data). Lineage is truncated by periodic localCheckpoint.
    * Returns (id, comp) where comp is the smallest id in the component. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    // both orientations from ONE pass over `pairs` (which may be a whole
    // dedup pipeline): explode, not a self-union that executes it twice.
    // localCheckpoint, not cache (r17): a cache keeps the ENTIRE upstream
    // pair-pipeline plan inside every round's logical plan, and the loop
    // re-pays analysis + cache-lookup canonicalization + AQE planning over
    // that tree once per round — measured driver-side, it dominated
    // q_dedup_cluster (stage wall ~3 s of an 18 s run). The checkpoint
    // collapses the input to a flat LogicalRDD so per-round planning cost
    // is independent of how expensive the pair pipeline's plan is. The
    // recompute-on-executor-loss trade is one the loop already makes (its
    // every-5th-round truncation and the final materialization are local
    // checkpoints too).
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("u"), col(bCol).as("v")),
        struct(col(bCol).as("u"), col(aCol).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id")).cache()
    var iter = 0
    var changed = true
    // convergence via the label-sum invariant (r17): every step is
    // non-increasing per node (propagated(id) = min(own, neighbors) ≤ own;
    // the pointer jump replaces comp c by comp(c) ≤ c), so Σcomp strictly
    // decreases iff ANY label changed — one one-row aggregate on the
    // already-materializing `next` replaces the previous per-round
    // next⋈labels comparison join (one fewer shuffle + join per round).
    // decimal(38,0) sum: a long sum overflows past ~2⁶³/max_id rows.
    // This aggregate also doubles as the materializing action (the
    // previous shape needed a separate labels.count()).
    def compSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = compSum(labels)
    try {
      while (changed && iter < maxIter) {
      val nbr = edges
        .join(labels.select(col("id").as("v"), col("comp")), Seq("v"))
        .select(col("u").as("id"), col("comp"))
      val propagated = labels.select(col("id"), col("comp")).union(nbr)
        .groupBy("id").agg(min(col("comp")).as("comp"))
      // pointer jumping: a label IS a node id — replace each comp with that
      // node's own comp, doubling propagation reach per round
      val next = propagated
        .join(propagated.select(col("id").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("comp2"), col("comp")).as("comp"))
        .cache()
      val nextSum = compSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      val prev = labels
      // truncate lineage periodically: each round's plan nests the previous
      // round's, and deep iteration would otherwise bloat planning time and
      // recovery cost at scale
      labels =
        if (iter % 5 == 4) {
          val cp = next.localCheckpoint(true)
          next.unpersist()
          cp
        } else next
      prev.unpersist()
      iter += 1
      }
      if (changed)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds; " +
            "the pair list is not a near-dup graph (diameter beyond ~2^maxIter)")
      // detach the result from executor cache: materialize via checkpoint,
      // then release the loop's cache so repeated invocations on a
      // long-lived session don't strand storage memory
      labels.localCheckpoint(true)
    } finally {
      labels.unpersist()
      // edges is a local checkpoint, not a cache — its blocks are released
      // by the ContextCleaner once unreferenced (same lifecycle as the
      // loop's every-5th-round truncation checkpoints)
    }
  }

  /** Incremental exact dedup: drop delta rows whose dedup key already
    * exists in the corpus index — the growing-corpus path (ingest batch N+1
    * without touching batch 1..N beyond an anti-join against their key
    * index). The index side only needs the key columns, so at scale it is a
    * compact table (or a bloom-filter pre-pass) rather than the corpus. */
  def incrementalExact(delta: DataFrame, corpusKeys: DataFrame,
      keys: Seq[String]): DataFrame =
    delta.join(corpusKeys.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Incremental near-dup detection: MinHash-banded candidates between the
    * DELTA and the EXISTING corpus only — no corpus self-join, so ingesting
    * a batch costs O(delta × collision rate), not O(corpus²). Candidates
    * are verified with exact Jaccard over the full shingle sets. Returns
    * (delta_id, corpus_id, jaccard) pairs at ≥ threshold; dropping matched
    * delta ids is the caller's policy (the corpus copy is the established
    * representative). In production the corpus side's signatures/bands are
    * precomputed once and stored — here they are derived inline. */
  def incrementalMinhashPairs(delta: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      n: Int = 3, k: Int = 64, bands: Int = 16, rows: Int = 4): DataFrame =
    incrementalMinhashPairsManaged(delta, corpus, idCol, textCol, threshold,
      n, k, bands, rows)._1

  /** [[incrementalMinhashPairs]] plus a cleanup thunk that unpersists the
    * two internal shingle caches. REPEATED callers (a foreachBatch ingest
    * loop) must invoke the cleanup after their terminal action, or every
    * batch pins another corpus-sized cache until the session dies. */
  def incrementalMinhashPairsManaged(delta: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      rows: Int = 4): (DataFrame, () => Unit) = {
    // one cached shingle relation per side feeds BOTH the signature/banding
    // stage and the verification joins — shingling the corpus is the
    // expensive part of an ingest batch, and must run once, not twice.
    // (A production ingest loop precomputes and stores the corpus
    // signatures instead of deriving them per batch.)
    val shD = hashedShingles(delta, idCol, textCol, n).cache()
    val shC = hashedShingles(corpus, idCol, textCol, n).cache()
    def banded(sh: DataFrame) = {
      val sigs = sh.groupBy("doc_id")
        .agg(HashFunctions.minhashSig(col("sh"), k).as("sig"))
      sigs.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), j -> hash(slice(sig, j * $rows + 1, $rows)))"))
        .as(Seq("band", "bucket")))
    }
    // cached (r17): jaccardVerify's candidate-prune references the
    // candidate set three times (two per-side id projections + the join) —
    // uncached, the banding join subtree would run per reference
    val cands = banded(shD)
      .select(col("band"), col("bucket"), col("doc_id").as("delta_id"))
      .join(banded(shC)
        .select(col("band"), col("bucket"), col("doc_id").as("corpus_id")),
        Seq("band", "bucket"))
      .select("delta_id", "corpus_id").distinct().cache()
    (jaccardVerify(cands, shD, shC, "delta_id", "corpus_id", threshold),
      () => { shD.unpersist(); shC.unpersist(); cands.unpersist(); () })
  }

  /** [[incrementalMinhashPairsManaged]] against a STORED shingle index
    * ([[ShingleIndex.liveFor]]) instead of a re-derived corpus — the
    * round-12 ingest consumer. Per-batch corpus-side work collapses from
    * (full text re-shingle + corpus-wide signature shuffle) to three scans:
    * delta bands broadcast-join the stored band relation for candidates,
    * and verification reads postings for candidate docs only. Zero
    * corpus-wide shuffles per batch — the true O(delta) ingest shape.
    *
    * `corpusIds` (the doc_ids actually IN the corpus) guards against
    * PHANTOM postings: an ingest that crashed after its index append but
    * before its corpus write leaves index entries for docs the corpus never
    * received, and on replay those phantoms would match the replayed docs
    * against themselves (Jaccard 1.0 → rejected → data loss). Restricting
    * candidates to real corpus ids makes the crash window harmless — the
    * semi-join runs on the tiny candidate set, never the postings.
    *
    * Row-identical to the derived path when index ≡ corpus (same banding
    * expression — [[ShingleIndex.bandsOf]] — same verification kernel;
    * pinned by StreamingSpec).
    *
    * Candidate-set contract (round 14, measured): the broadcast phantom
    * guard assumes candidates are DELTA-bounded — true whenever band
    * collisions mean similarity. On a band-saturating corpus (template
    * spam: docs sharing most shingles sit below the threshold but collide
    * in ~all bands) the candidate set degrades toward delta × corpus and
    * the screen FAILS LOUDLY at the broadcast (sf10b: >1 GiB of candidate
    * pairs vs a driver cap). The production mitigation is registering the
    * index with `pruneDfFrac` — the saturated shingles leave the band
    * basis and the same batch screens in ~2 s (BASELINE.md round-14). */
  def incrementalMinhashPairsIndexed(delta: DataFrame, corpusIds: DataFrame,
      idx: ShingleIndex.LiveIndex, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): (DataFrame, () => Unit) = {
    val shD = hashedShingles(delta, idCol, textCol, n).cache()
    // a pruned index bands over postings-minus-stop; the delta must band
    // over the SAME basis or its signatures live in a different space
    // than the stored ones (verification below still reads FULL postings
    // and full delta shingles — pruning never touches the exact-Jaccard
    // kernel, only which pairs become candidates)
    val bandBasisD = idx.stop.fold(
      shD.withColumnRenamed("sh", "shingle"))(st =>
      shD.withColumnRenamed("sh", "shingle")
        .join(broadcast(st.select(col("shingle"))), Seq("shingle"), "left_anti")
        .select(col("doc_id"), col("shingle")))
    val bandedD = ShingleIndex.bandsOf(
      bandBasisD, idx.k, idx.nBands, idx.rowsPerBand)
    val cands0 = broadcast(bandedD
      .select(col("band"), col("bucket"), col("doc_id").as("delta_id")))
      .join(idx.bands
        .select(col("band"), col("bucket"), col("doc_id").as("corpus_id")),
        Seq("band", "bucket"))
      .select("delta_id", "corpus_id").distinct()
    // phantom guard: only docs the corpus actually holds may reject a doc.
    // Shaped as (corpus-id scan) ⋈ broadcast(candidates) — a semi-join the
    // other way around would SHUFFLE the corpus id column per batch (the
    // plan probe caught exactly that); this way the only corpus-side work
    // is a streamed single-column scan. Corpus ids are unique, so the
    // inner join is the filter, not an expansion.
    // cached: the candidate set feeds BOTH the postings prune and the
    // verification join — uncached, the whole bands-join subtree runs
    // twice per batch (the plan probe showed the duplicate)
    val cands = corpusIds.select(col("doc_id").as("corpus_id"))
      .join(broadcast(cands0), Seq("corpus_id"))
      .select("delta_id", "corpus_id").cache()
    // verification touches postings for candidate corpus docs only —
    // jaccardVerify's shared candidate-prune (r17) broadcast-semi-joins the
    // postings scan down to candidate ids before the per-doc set aggregate
    // (previously an explicit prune here; now every consumer gets it)
    val shC = idx.postings.withColumnRenamed("shingle", "sh")
    (jaccardVerify(cands, shD, shC, "delta_id", "corpus_id", threshold),
      () => { shD.unpersist(); cands.unpersist(); () })
  }

  /** Train/eval contamination check: the fraction of each eval document's
    * shingles that occur anywhere in the training corpus — the standard
    * benchmark-leakage screen run before training. Inputs are shingle
    * relations (doc_id, key) from [[shingles]] (string key, oracle-
    * comparable) or [[hashedShingles]] (long key, the 100 TB path — the
    * distinct-train-shingle set then stays fixed-width; add a bloom-filter
    * pre-pass if even that set outgrows a shuffle). One distinct + one
    * semi-join, both on the shingle key. */
  def contamination(evalSh: DataFrame, trainSh: DataFrame,
      keyCol: String = "shingle"): DataFrame = {
    val trainSet = trainSh.select(keyCol).distinct()
    val tot = evalSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hit = evalSh.join(trainSet, Seq(keyCol), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    tot.join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
          col("n_shingles"), 6).as("contamination_rate"))
  }

  /** Exact cosine for candidate pairs: joins (id_a, id_b) back to the
    * embeddings and scores each pair — the shared verification kernel for
    * every embedding-dedup variant. Two hash joins on the id keys; the
    * corpus is never crossed with itself. */
  def cosineVerify(pairs: DataFrame, emb: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    import graft.ext.Similarity.{dot, l2norm}
    pairs
      .join(emb.select(col(idCol).as("id_a"), col(embCol).as("ea")), Seq("id_a"))
      .join(emb.select(col(idCol).as("id_b"), col(embCol).as("eb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (round(dot(col("ea"), col("eb")) / (l2norm(col("ea")) * l2norm(col("eb"))), 6)
          + lit(0.0)).as("cos")) // + 0.0 folds IEEE -0.0 to 0.0 (oracle parity)
  }

  /** Embedding-cosine near-duplicate pairs: semantic dedup over an
    * embedding column, exact at any threshold.
    *
    * Candidate generation is a dimension-index equi-join: explode each
    * vector to (id, dim, x), join on dim, and accumulate pair dot products
    * in one hash aggregation — a shuffled equi-join plan (no
    * CartesianProduct/BroadcastNestedLoop anywhere). Exact threshold-cosine
    * pairing is inherently pairwise-quadratic in WORK in the worst case
    * (every algorithm that must find pairs at cos ≥ 0.4 is), but this shape
    * distributes it: the join shuffles only (id, dim, x) tuples, the
    * aggregation is partial→final around one shuffle, and sparse/clustered
    * data collapses the intermediate naturally. For realistic near-dup
    * thresholds (≥ ~0.8) use [[embeddingNearDupsLsh]], which feeds banded
    * sign-LSH candidates into the same verifier and is near-linear.
    *
    * `maxVectors` > 0 arms the in-plan sample-scale guard (the round-7
    * routing contract, extended here after the round-8 sf10 rehearsal
    * caught this face un-guarded: the dim-join intermediate is |vecs|²
    * per dimension — 2.5·10¹⁵ rows at 200k vectors — so above sample
    * scale the query must FAIL FAST naming the production routes, not
    * run). Library default 0 = unbounded (the pre-existing public
    * contract); the registered faces arm it. */
  def embeddingNearDups(emb: DataFrame, idCol: String, embCol: String,
      threshold: Double, maxVectors: Long = 0L): DataFrame = {
    // r17 rewrite (guide §4.1): score pairs with the native in-row
    // [[Similarity.dot]] kernel over the array columns instead of the
    // exploded-dimension shape — the old form pushed n²·d/2 (dim, xa, xb)
    // rows through a dim-keyed shuffle and a pair-keyed aggregate (the
    // dominant cost of this face: ~128M shuffled rows at 2k × 64-dim).
    // The pair join broadcasts one side, which the `maxVectors` guard
    // bounds BY CONSTRUCTION (this is the sample-scale exact verifier; the
    // production routes are the LSH/ANN faces). Values: float→double
    // element conversion is exact, so per-element products are identical
    // to the old cast-then-multiply form; only the summation order changes
    // (array order, deterministic, vs shuffle order), which round(·, 6)
    // absorbs — the same tolerance the cross-engine oracle hash already
    // rests on for every fp aggregate.
    val v = emb.select(col(idCol).as("id"), col(embCol).as("e"))
    val withN = v.select(col("id"), col("e"),
      Similarity.l2norm(col("e")).as("nv"))
    // the stream side is fanned out to the core count and the build side is
    // broadcast EXPLICITLY (guide §2.5 input skew / §3.1): the sample-scale
    // corpus usually arrives as one file = one row group = one scan
    // partition, which runs the O(n²/2) dot-kernel loop on a single task
    // (OpProbe: 3.0 s of the face's 3.3 s warm in one WholeStageCodegen
    // pipeline). Both the repartition and the broadcast are bounded BY THE
    // GUARD: this face refuses corpora past `maxVectors`, so the fan-out
    // moves ≤ maxVectors rows and the broadcast holds ≤ maxVectors vectors
    // at any corpus size — the production routes are the LSH/ANN faces.
    val a = sampleScaleGuard(withN,
      emb.agg(count(lit(1)).as("__stat")), maxVectors,
      "embeddingNearDups (exact all-pairs cosine)",
      "embeddingNearDupsLsh or Similarity/AnnIndex ANN + clusterNearDupPairsBounded")
      .select(col("id").as("id_a"), col("e").as("ea"), col("nv").as("na"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = broadcast(withN.select(col("id").as("id_b"), col("e").as("eb"),
      col("nv").as("nb")))
    // the score is evaluated IN the join condition, conjunct-ordered so the
    // cheap id inequality short-circuits the dot kernel for the discarded
    // ordered half (n²/2 fewer vecdot evaluations — leaving the score to a
    // post-join filter lets pushdown PREPEND it to the id conjunct, which
    // doubles the kernel work; verified in the committed plan). The
    // re-projection below re-evaluates the score only for surviving pairs.
    val cos = round(Similarity.dot(col("ea"), col("eb")) /
      (col("na") * col("nb")), 6) + lit(0.0)
    a.join(b, col("id_a") < col("id_b") && cos >= lit(threshold))
      .select(col("id_a"), col("id_b"), cos.as("cos"))
  }

  /** SemDeDup-style cluster-bounded semantic near-dup pairs (Abbas et al.
    * 2023, arXiv:2303.09540): exact threshold-cosine pairs computed ONLY
    * within a cluster — the pair join is keyed on `clusterCol`, so per-key
    * fan-out is cluster-size², never corpus². The cluster id is whatever
    * upstream assignment exists (k-means cell, IVF cell via
    * [[Similarity.ivfAssign]], or a label); at 100 TB the cluster count
    * scales with the corpus so cluster size — and thus join fan-out —
    * stays bounded. Cross-cluster near-dups are out of contract by design
    * (that is SemDeDup's accepted recall trade for near-linear cost).
    * Returns (cluster, id_a, id_b, cos) with id_a < id_b; dropping every
    * id_b is the keep-lowest-id prune.
    *
    * SAMPLE-SCALE VERIFIER: the within-cluster pair join is quadratic in
    * cluster size, and nothing forces the upstream clustering to keep pace
    * with the corpus — the sf1 rehearsal measured 20.9× wall-clock at 10×
    * rows when the cluster count stayed fixed. The production path is
    * [[clusterNearDupPairsBounded]] (sub-bucket split, ≥97% pair recall,
    * 1.8× at 10× rows); this exact face exists to verify it at sample
    * scale. The `maxExactClusterSize` guard enforces that
    * routing: the max cluster size rides in-plan as a one-row broadcast
    * and the query fails fast when any cluster exceeds the bound. The
    * guard DEFAULTS OFF (0) at the library API — a previously unbounded
    * public API keeps its contract; the registered query face enables it
    * explicitly with bound 1024. */
  def clusterNearDupPairs(emb: DataFrame, clusterCol: String, idCol: String,
      embCol: String, threshold: Double,
      maxExactClusterSize: Long = 0): DataFrame = {
    val v = emb.select(col(clusterCol).as("cluster"), col(idCol).as("id"),
      col(embCol).as("e"))
    // guard one side only: the join cannot emit before the guarded side
    // scans, and a single one-row broadcast keeps the plan minimal
    val va = sampleScaleGuard(v,
      v.groupBy("cluster").agg(count(lit(1)).as("__cn"))
        .agg(max(col("__cn")).as("__stat")),
      maxExactClusterSize,
      "Dedup.clusterNearDupPairs (max cluster size)",
      "clusterNearDupPairsBounded")
    va.select(col("cluster"), col("id").as("id_a"), col("e").as("ea"))
      .join(v.select(col("cluster"), col("id").as("id_b"), col("e").as("eb")),
        Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cluster"), col("id_a"), col("id_b"),
        (round(Similarity.dot(col("ea"), col("eb")) /
          (Similarity.l2norm(col("ea")) * Similarity.l2norm(col("eb"))), 6)
          + lit(0.0)).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** [[clusterNearDupPairs]] with BOUNDED cluster size — the missing piece
    * the sf1 scale rehearsal exposed: when the given clustering is too
    * coarse (cluster count fixed while the corpus grows), the within-cluster
    * pair join is quadratic in cluster size (10× corpus → 100× pairs,
    * measured 20.9× wall-clock at 10× rows). Here any cluster larger than
    * `maxClusterSize` is split into `2^bits` sign-LSH sub-buckets
    * (deterministic hyperplanes, [[Similarity.lshBucket]]) sized so every
    * sub-bucket is ≤ ~maxClusterSize; the pair join is keyed on
    * (cluster, sub), so per-key fan-out — and thus total cost — stays linear
    * in corpus size no matter how coarse the input clustering is.
    *
    * Recall trade: a near-dup pair is missed only if every one of `tables`
    * independent sub-assignments separates it. For cosine ≥ 0.9 a hyperplane
    * splits a pair with prob θ/π ≤ 0.14, so with b bits per table the pair
    * survives one table with prob ≥ 0.86^b; three tables at b=3 give ≥ 97%
    * pair recall (exact dups always collide). Candidates are deduped across
    * tables BEFORE the cosine verify, so each surviving pair is scored once.
    * Small clusters (≤ maxClusterSize) get bits=0 — identical to the exact
    * path. Returns the same (cluster, id_a, id_b, cos) contract.
    */
  def clusterNearDupPairsBounded(emb: DataFrame, clusterCol: String,
      idCol: String, embCol: String, threshold: Double,
      maxClusterSize: Int = 512, dims: Int = 64, tables: Int = 3,
      sigPlanes: Int = 16): DataFrame = {
    val v = emb.select(col(clusterCol).as("cluster"), col(idCol).as("id"),
      col(embCol).as("e"))
    val sizes = v.groupBy("cluster").agg(count(lit(1)).as("n"))
    // integer arithmetic only (no fp log2) so an external oracle reproduces
    // the split exactly: nsub = ceil(n/max), bits = ceil(log2(nsub))
    val nsub = expr(s"(n + ${maxClusterSize - 1}) div $maxClusterSize")
    val bits = (1 to 20).foldLeft(when(nsub <= 1, lit(0))) { (acc, b) =>
      acc.when(nsub <= (1L << b), lit(b))
    }.otherwise(lit(20))
    // sizes is cluster-cardinality (corpus/maxClusterSize rows at most after
    // the split logic; input cluster count before it) — plain join, AQE
    // broadcasts when small, shuffles on the same key the pair join reuses
    val keyed = v.join(sizes, Seq("cluster")).withColumn("bits", bits)
    val cands = (0 until tables).map { tb =>
      val k = keyed.withColumn("sub",
        Similarity.lshBucket(col("e"), sigPlanes, dims, tb)
          .bitwiseAND(expr("shiftleft(1, bits) - 1")))
      k.select(col("cluster"), col("sub"), col("id").as("id_a"))
        .join(k.select(col("cluster"), col("sub"), col("id").as("id_b")),
          Seq("cluster", "sub"))
        .filter(col("id_a") < col("id_b"))
        .select(col("cluster"), col("id_a"), col("id_b"))
    }.reduce(_ unionByName _).distinct()
    cands
      .join(v.select(col("cluster"), col("id").as("id_a"), col("e").as("ea")),
        Seq("cluster", "id_a"))
      .join(v.select(col("cluster"), col("id").as("id_b"), col("e").as("eb")),
        Seq("cluster", "id_b"))
      .select(col("cluster"), col("id_a"), col("id_b"),
        (round(Similarity.dot(col("ea"), col("eb")) /
          (Similarity.l2norm(col("ea")) * Similarity.l2norm(col("eb"))), 6)
          + lit(0.0)).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Longest shared token spans between document pairs — the exact-substring
    * dedup signal (Lee et al. 2022, arXiv:2107.06499 find 50-token repeats;
    * this is the join-based form): positionally shingle each doc, equi-join
    * on the shingle, then gaps-and-islands per (pair, diagonal) turns
    * consecutive matching positions into runs of length run+n−1 tokens.
    *
    * Scale shape: the only corpus-sized join is shingle-keyed; shingles in
    * more than `maxDocFreq` docs (boilerplate) are dropped BEFORE the join,
    * bounding per-key fan-out. Windows partition by (pair, diagonal) —
    * bounded by the shorter doc. Returns (id_a, id_b, n_matches,
    * max_span_tokens) with id_a < id_b. */
  def sharedSpanRuns(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDocFreq: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs
      .select(col(idCol).as("id"), split(lower(col(textCol)), " ").as("t"))
      .select(col("id"), posexplode(expr(
        s"transform(sequence(1, greatest(size(t) - ${n - 1}, 0))," +
          s" i -> concat_ws(' ', slice(t, i, $n)))")).as(Seq("p0", "sh")))
      .select(col("id"), (col("p0") + 1).as("pos"), col("sh"))
    val rare = sh.select(col("sh"), col("id")).distinct()
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("sh")
    val kept = sh.join(rare, Seq("sh"))
    val pairs = kept.select(col("sh"), col("id").as("id_a"), col("pos").as("pa"))
      .join(kept.select(col("sh"), col("id").as("id_b"), col("pos").as("pb")),
        Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("d"))
    val w = Window.partitionBy("id_a", "id_b", "d").orderBy("pa")
    pairs
      .withColumn("grp", col("pa") - row_number().over(w))
      .groupBy("id_a", "id_b", "d", "grp")
      .agg(count(lit(1)).as("run"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("run")).as("n_matches"),
        (max(col("run")) + lit(n - 1)).as("max_span_tokens"))
  }

  /** Scale-path embedding dedup: multi-table sign-LSH candidates → exact
    * cosine verification of candidates only (the 100 TB shape: bucketing is
    * a narrow map, candidates come from a bucket-key self-equi-join, and
    * only candidates are scored). Approximate in recall — boundary pairs at
    * small margins above the threshold can be missed; tune (planes, tables)
    * to the threshold via 1-(1-(1-θ/π)^planes)^tables. Recall vs the exact
    * baseline is pinned in ScalaTest. */
  def embeddingNearDupsLsh(emb: DataFrame, idCol: String, embCol: String,
      threshold: Double, planes: Int = 8, dims: Int = 64,
      tables: Int = 12): DataFrame = {
    val keyed = emb.select(col(idCol).as("doc_id"),
      explode(Similarity.lshKeys(col(embCol), planes, dims, tables)).as("key"))
    val l = keyed.select(col("key"), col("doc_id").as("id_a"))
    val r = keyed.select(col("key"), col("doc_id").as("id_b"))
    val cands = l.join(r, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cosineVerify(cands, emb, idCol, embCol)
      .filter(col("cos") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit signature per doc (custom Catalyst
    * expression), banded into 4×16-bit keys so any pair within Hamming
    * distance 3 of each other shares ≥1 band (pigeonhole); verified against
    * maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc_id"),
      HashFunctions.simhash(split(lower(col(textCol)), " ")).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"), posexplode(expr(
      "transform(sequence(0, 3), j -> (sig >> (j * 16)) & 65535)"))
      .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        HashFunctions.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

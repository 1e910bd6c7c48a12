package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composed pipeline the
  * individual operators exist for: exact dedup → near-dup removal →
  * quality/language gating → deterministic split assignment. One logical
  * pass; every stage is the scale-path variant (hash dedup, MinHash-LSH
  * with the stop-shingle guard, codegen'd quality columns, multiplicative-
  * hash split — no RNG, no driver state, no cartesian anywhere).
  */
object CorpusPipeline {

  /** Multiplier for the split/sample buckets (Knuth's 2⁶⁴/φ truncation). */
  private val BucketMult = 2654435761L

  /** Salt XORed into the id for SAMPLING buckets, so sampling decisions are
    * independent of the train/eval/test split (same hash with no salt would
    * make every `< p%` sample a subset of the train split). */
  val SampleSalt = 0x27d4eb2dL

  /** Multiply-shift split bucket in [0, 100): high bits of the wrapped
    * 64-bit product id·C (Knuth multiplicative hashing), NOT the low mod-100
    * residue — `(id*C) mod 100` collapses to a function of `id mod 100`
    * (the multiplier cannot mix high bits into a low residue), which
    * degenerates on structured ids (stride-allocated, shard-prefixed,
    * multiples of 100). A native wrapping expression: ANSI-mode `col * lit`
    * throws on 64-bit overflow for realistic corpus ids. Replicable in the
    * oracle via HUGEINT `mod 2⁶⁴` arithmetic. */
  def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HashFunctions.mulShiftBucket(id, BucketMult, 33, 100)

  /** Salted bucket for deterministic sampling, independent of the split. */
  def sampleBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HashFunctions.mulShiftBucket(
      id.bitwiseXOR(lit(SampleSalt)), BucketMult, 33, 100)

  /** Salt for the training-order shuffle key (distinct from [[SampleSalt]]
    * so order is independent of sampling decisions). */
  val ShuffleSalt = 0x3c6ef372L

  /** Deterministic training-order key: a pseudo-random but reproducible
    * position for each row (multiply-shift over the salted id). Training
    * pipelines need the corpus in a shuffled order that is stable across
    * re-runs and resumable mid-epoch — RNG-based shuffles are neither.
    * Sort by (this, id); at scale this is one range-partitioned sort, or
    * use it as the write-bucket key to skip the global sort entirely. */
  def shuffleKey(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HashFunctions.mulShiftBucket(
      id.bitwiseXOR(lit(ShuffleSalt)), BucketMult, 33, Int.MaxValue)

  /** Leakage-safe TEMPORAL split: train strictly before `embargoStart`,
    * test at/after `testStart`, the embargo gap between them dropped —
    * rows whose signal could straddle the boundary (lagged features,
    * attribution windows) never reach either side (the "purged" split of
    * financial ML; De Prado 2018 ch.7). A pure column function of the
    * event time — no RNG, no state; rows outside both windows get NULL
    * and are filtered by the caller. The id-hash [[splitColumn]] is the
    * i.i.d. complement; THIS one is for time-series where random splits
    * leak the future into training. */
  def temporalSplit(ts: org.apache.spark.sql.Column, embargoStart: String,
      testStart: String): org.apache.spark.sql.Column =
    when(ts < to_timestamp(lit(embargoStart)), "train")
      .when(ts >= to_timestamp(lit(testStart)), "test")

  /** Running total of `value` (a long column) over the global
    * (bucketKey, tiebreaks) order WITHOUT a single-partition window.
    *
    * The partition id is a DETERMINISTIC equi-width bucket of `bucketKey`
    * (`key div ceil(keySpace/partitions)`), NOT `repartitionByRange`:
    * RangePartitioner samples boundaries with a seed derived from the RDD
    * id, so the offsets branch and the data branch — two physical plans —
    * can sample DIFFERENT boundaries once partitions exceed the reservoir
    * (column pruning defeats exchange reuse), silently corrupting every
    * offset. A pure function of the key cannot diverge between branches,
    * at any scale. `bucketKey` must be in [0, keySpace) and near-uniform
    * ([[shuffleKey]] is, by construction) for even partition load.
    *
    * Shuffle shape: the data moves ONCE (hash on the bucket id; the
    * within-bucket window reuses that clustering), plus a tiny partial-agg
    * pass for the ≤`partitions`-row offsets table, which is broadcast
    * back. Buckets are contiguous key ranges, so the result is exactly
    * `sum(value) OVER (ORDER BY bucketKey, tiebreaks ROWS UNBOUNDED
    * PRECEDING)` — verified against the single-window form above the
    * reservoir regime in ExtensionsSpec. */
  def globalRunningSum(df: DataFrame, value: org.apache.spark.sql.Column,
      bucketKey: org.apache.spark.sql.Column, keySpace: Long,
      tiebreaks: Seq[org.apache.spark.sql.Column], outCol: String,
      partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = (keySpace + partitions - 1) / partitions
    val withPid = df.withColumn("__v", value)
      .withColumn("__key", bucketKey)
      .withColumn("__pid", expr(s"__key div ${width}L"))
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__pt"))
      .select(col("__pid"),
        coalesce(sum(col("__pt")).over(wOff), lit(0L)).as("__offset"))
    val wIn = Window.partitionBy(col("__pid"))
      .orderBy(col("__key") +: tiebreaks: _*)
    withPid.repartition(partitions, col("__pid"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__offset") + sum(col("__v")).over(wIn))
      .drop("__pid", "__key", "__v", "__offset")
  }

  /** [[globalRunningSum]] with the key space derived FROM THE DATA: the max
    * key is a one-row aggregate broadcast-crossed into both the data and the
    * offsets branch, so the two physical plans derive the bucket width from
    * the same deterministic value and cannot disagree (the hazard the fixed
    * `keySpace` parameter exists to avoid). Use when the key domain is dense
    * but unknown ahead of time — e.g. a running sum over per-bucket
    * aggregates where bucket count grows with the corpus (found by the
    * round-6 WindowGuard audit in q_vocab_growth: its cumulative-vocab
    * window ran over corpus/50 rows in ONE partition). Keys must be ≥ 0.
    */
  def globalRunningSumAuto(df: DataFrame,
      value: org.apache.spark.sql.Column,
      bucketKey: org.apache.spark.sql.Column,
      tiebreaks: Seq[org.apache.spark.sql.Column], outCol: String,
      partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = df.agg(max(bucketKey).cast("long").as("__kmax"))
    val withPid = df.withColumn("__v", value)
      .withColumn("__key", bucketKey)
      .crossJoin(broadcast(bounds))
      .withColumn("__pid",
        expr(s"__key div ((__kmax + $partitions) div ${partitions}L)"))
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__pt"))
      .select(col("__pid"),
        coalesce(sum(col("__pt")).over(wOff), lit(0L)).as("__offset"))
    val wIn = Window.partitionBy(col("__pid"))
      .orderBy(col("__key") +: tiebreaks: _*)
    withPid.repartition(partitions, col("__pid"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__offset") + sum(col("__v")).over(wIn))
      .drop("__pid", "__key", "__v", "__kmax", "__offset")
  }

  /** Pack documents into fixed token-budget training sequences: documents
    * stream in deterministic shuffle order and each is assigned to the
    * sequence its cumulative token offset falls in (concat-stream packing —
    * a document may straddle a boundary, exactly the pretraining
    * concat-then-chunk contract; compose with `TextAnalysis.chunk` for the
    * in-sequence windows). Returns the input plus (n_tokens, seq_id) where
    * seq_id is the budget window containing the document's START offset —
    * a document longer than the budget spans into following windows, so
    * consecutive emitted seq_ids may skip (those windows hold only the
    * middle of the long document). The running token offset comes from
    * [[globalRunningSum]] — range-partitioned, never a single-partition
    * window. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    val withTok = docs.withColumn("n_tokens",
      size(split(col(textCol), " ")).cast("long"))
    globalRunningSum(withTok, col("n_tokens"),
        shuffleKey(col(idCol)), Int.MaxValue, Seq(col(idCol)), "__cum")
      .withColumn("seq_id",
        expr(s"(__cum - n_tokens) div $budgetTokens"))
      .drop("__cum")
  }

  /** Deterministic stratified sampling: keep each row with a per-stratum
    * percentage (id-hash bucketed, salted independently of the train/eval
    * split — no RNG, reproducible across runs/engines/cluster sizes, and a
    * growing corpus never resamples old rows). The standard rebalance for
    * skewed strata (dominant language, over-represented source). Narrow
    * map — no shuffle. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(sampleBucket(col(idCol)) < pct)
  }

  /** Stable split assignment via multiply-shift bucketing on the id
    * (reproducible across runs, engines, and cluster sizes — the standard
    * split for a corpus that keeps growing). Percentages are cumulative cut
    * points out of 100. */
  def splitColumn(id: org.apache.spark.sql.Column,
      trainPct: Int = 90, evalPct: Int = 5): org.apache.spark.sql.Column = {
    val bucket = splitBucket(id)
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + evalPct, "eval")
      .otherwise("test")
  }

  /** Prepare a raw document corpus for training:
    *
    *  1. exact dedup on the full text hash (keep the smallest id),
    *  2. near-dup removal via MinHash-LSH at `jaccard`: verified pairs are
    *     clustered into connected components and only the smallest id per
    *     CLUSTER survives (chain-correct keep-first-representative policy),
    *  2b. decontamination (when `benchmark` is given): drop every doc
    *     containing ≥ containNum/containDen of a benchmark document's
    *     shingle set ([[Dedup.decontaminate]]) — benchmark material never
    *     ships in any split,
    *  3. quality gate: minimum token count + language filter on the
    *     engine's language ID,
    *  4. deterministic train/eval/test split.
    *
    * Returns the surviving documents with `n_tokens`, `lang_id`, and
    * `split` columns. Shuffle profile: one hash shuffle for the exact
    * dedup, the LSH pipeline's banded shuffles, the benchmark-sized
    * decontamination join when enabled, one broadcast-able anti-join of
    * drop ids — no stage is quadratic in the corpus. */
  def prepare(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      jaccard: Double = 0.8, minTokens: Long = 5,
      langs: Seq[String] = Seq("en"),
      trainPct: Int = 90, evalPct: Int = 5,
      benchmark: Option[DataFrame] = None,
      containNum: Int = 4, containDen: Int = 5): DataFrame = {
    // 1. exact dedup: smallest id per identical text wins
    val exact = Dedup.exact(
      docs.withColumn("__h", sha2(encode(col(textCol), "UTF-8"), 256)),
      Seq("__h"), idCol).drop("__h")

    // 2. near-dup removal: cluster verified pairs into connected components
    //    and keep the smallest id per CLUSTER — pairwise drops mishandle
    //    chains (a~b, b~c, a≁c would drop both b and c yet keep neither as
    //    the b-c representative)
    val pairs = Dedup.minhashDedup(exact, idCol, textCol, jaccard)
    val nearDupDrops = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    val deduped = exact.join(nearDupDrops, Seq(idCol), "left_anti")

    // 2b. DECONTAMINATION (round 11): drop every surviving doc that
    //     contains ≥ containNum/containDen of a benchmark/eval document's
    //     shingles — benchmark material must never reach ANY split (a
    //     leaked doc in train inflates eval; in eval it double-counts), so
    //     the whole doc goes, before the gate/split stages. The benchmark
    //     relation carries the same (idCol, textCol) columns. Cost scales
    //     with benchmark size × posting rarity ([[Dedup.decontaminate]]'s
    //     eval-side-only prefix filter), never corpus² — the flag is
    //     per-document (|eval ∩ doc| / |eval|, exact verification), so
    //     composing it here is row-equivalent to running prepare and then
    //     filtering the flagged ids (pinned in ExtensionsSpec).
    val decontaminated = benchmark.fold(deduped) { ev =>
      val trainSh = Dedup.hashedShingles(deduped, idCol, textCol, 3)
        .withColumnRenamed("sh", "shingle")
      val evalSh = Dedup.hashedShingles(ev, idCol, textCol, 3)
        .withColumnRenamed("sh", "shingle")
      val leaked = Dedup.decontaminate(trainSh, evalSh, containNum, containDen)
        .select(col("train_id").as(idCol)).distinct()
      deduped.join(leaked, Seq(idCol), "left_anti")
    }

    // 3. quality + language gate, 4. split
    decontaminated
      .withColumn("n_tokens", size(split(lower(col(textCol)), " ")).cast("long"))
      .withColumn("lang_id", TextAnalysis.langId(col(textCol)))
      .filter(col("n_tokens") >= minTokens)
      .filter(if (langs.isEmpty) lit(true) else col("lang_id").isin(langs: _*))
      .withColumn("split", splitColumn(col(idCol), trainPct, evalPct))
  }
}

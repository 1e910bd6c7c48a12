package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1-scale corpus from the driver's sf0.1 parquet by 10×
  * replication with key offsetting — the round-7 scale-rehearsal input
  * (VERDICT r5 task 7).
  *
  * Design, so the scaled corpus stresses the same plans rather than a
  * degenerate copy of them:
  *  - every int64 entity key is offset by `replica * 1e9` on BOTH sides of
  *    each FK edge (orders.o_custkey and customer.c_custkey get the same
  *    stride), so referential integrity and join fan-out per key are
  *    preserved exactly — a join at sf1 does 10× the rows, not 10× the
  *    matches per key;
  *  - `region`/`nation` stay fixed (dimension tables are scale-invariant in
  *    TPC-H too), so broadcast-join eligibility is unchanged;
  *  - document TEXT is vowel-rotated per replica (`translate`, length- and
  *    distribution-preserving) so exact/near-dup structure replicates at 10×
  *    instead of every doc gaining 9 identical twins — which would turn the
  *    dedup benchmarks into a pathological all-dups corpus;
  *  - timestamps are kept: same time range at 10× density is exactly what a
  *    bigger cluster sees (more users per window), and per-user session work
  *    is unchanged because user ids are replica-disjoint.
  *
  * Scale note: replication is `posexplode` of a 10-element literal array —
  * runs entirely in the executors, no driver materialization; output is
  * repartitioned per table so file counts resemble a real lake layout.
  */
object ScaleUp {

  private val Stride = 1000000000L

  /** Offset every named int64 key column by replica*Stride. */
  private def offsetKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + col("r") * Stride))

  /** Cross-replicate n× (adds column `r` = replica index). */
  private def replicate(df: DataFrame, n: Int): DataFrame =
    df.withColumn("r", explode(lit((0 until n).toArray)))

  /** Vowel rotation for replica r (r=0 → identity). Preserves length,
    * whitespace, and character class mix; changes shingles wholesale.
    * NOTE (round-8 slope attribution): only 5 distinct rotations exist, so
    * replicas i and i+5 carry IDENTICAL text — at n=10 every doc gains one
    * exact cross-replica twin, which grows near-dup pair density with the
    * corpus. That is a legitimate corpus shape (scraper overlap), kept as
    * the default for cross-round comparability; `distinct` mode below is
    * the control with density held constant per replica. */
  private def rotateText(c: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val lower = "aeiou"; val upper = "AEIOU"
    (1 until n).foldLeft(c) { (acc, i) =>
      val rot = i % 5
      val lo = lower.drop(rot) + lower.take(rot)
      val up = upper.drop(rot) + upper.take(rot)
      when(r === i, translate(c, lower + upper, lo + up)).otherwise(acc)
    }
  }

  /** Injective per-replica text transform (`SPARK_GRAFT_TEXT_MODE=distinct`):
    * vowels rotate by r mod 5 AND consonants rotate by (r/5) mod 20 — 100
    * distinct compositions, so NO two replicas share a transform and
    * near-dup structure replicates exactly linearly (each replica is a
    * self-contained corpus with the sf0.1 duplicate density). Same
    * length/whitespace/class-mix preservation as [[rotateText]]. */
  private def rotateTextDistinct(c: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val vowels = "aeiou"; val cons = "bcdfghjklmnpqrstvwxz"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    (1 until n).foldLeft(c) { (acc, i) =>
      val from = vowels + vowels.toUpperCase + cons + cons.toUpperCase
      val to = rot(vowels, i % 5) + rot(vowels.toUpperCase, i % 5) +
        rot(cons, i / 5) + rot(cons.toUpperCase, i / 5)
      when(r === i, translate(c, from, to)).otherwise(acc)
    }
  }

  /** Injective per-replica embedding transform
    * (`SPARK_GRAFT_EMB_MODE=distinct`): rotate the vector by r mod dims
    * positions and negate when r ≥ dims — norm- and
    * distribution-preserving, but every replica points in a genuinely
    * different direction (the legacy copy mode gives each vector n−1
    * identical twins, which degenerates ANN/SemDeDup rehearsals at large
    * n). Generic column arithmetic — no per-replica branching. */
  private def rotateEmbedding(e: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dims = size(e)
    val shift = pmod(r, dims)
    val rotated = concat(
      slice(e, (shift + 1).cast("int"), (dims - shift).cast("int")),
      slice(e, lit(1), shift.cast("int")))
    when(r >= dims, transform(rotated, v => negate(v))).otherwise(rotated)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "scaledata/sf1")
    val n = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    val spark = graft.Tables.session("graft-scaleup")
    import spark.implicits._

    // SPARK_GRAFT_TABLES narrows the rewrite to a comma-list of tables
    // (default: all) — a skew-mode events corpus shares every other table
    // with its uniform sibling, so regenerate ONLY events and link the
    // rest rather than re-replicating 2 GB of identical parquet
    val only = sys.env.get("SPARK_GRAFT_TABLES")
      .map(_.split(",").map(_.trim).toSet)
    def write(name: String, df: => DataFrame, parts: Int): Unit =
      if (only.forall(_.contains(name))) {
        df.drop("r").repartition(parts)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[scaleup] wrote $name x$n")
      } else println(s"[scaleup] skipped $name (SPARK_GRAFT_TABLES)")

    graft.Tables.register(spark, src)

    // validate EVERY knob before the first write — a guard that fires
    // mid-run would leave the output dir with some tables rewritten at the
    // new scale beside stale ones from a prior run: a silently broken,
    // referentially inconsistent corpus
    val textMode = sys.env.getOrElse("SPARK_GRAFT_TEXT_MODE", "rot5")
    val embMode = sys.env.getOrElse("SPARK_GRAFT_EMB_MODE", "copy")
    val eventsMode = sys.env.getOrElse("SPARK_GRAFT_EVENTS_MODE", "uniform")
    val docsMode = sys.env.getOrElse("SPARK_GRAFT_DOCS_MODE", "normal")
    require(Set("rot5", "distinct")(textMode),
      s"SPARK_GRAFT_TEXT_MODE must be rot5|distinct, got '$textMode'")
    require(Set("normal", "boiler")(docsMode),
      s"SPARK_GRAFT_DOCS_MODE must be normal|boiler, got '$docsMode'")
    require(Set("copy", "distinct")(embMode),
      s"SPARK_GRAFT_EMB_MODE must be copy|distinct, got '$embMode'")
    require(Set("uniform", "zipf")(eventsMode),
      s"SPARK_GRAFT_EVENTS_MODE must be uniform|zipf, got '$eventsMode'")
    // the 'distinct' modes are injective only within a bounded replica
    // range (text: 5 vowel × 20 consonant rotations = 100 compositions;
    // embeddings: rotation+negation repeats at r = 2·dims) — beyond it the
    // corpus silently regrows the twin-replica density these modes exist to
    // remove, so fail fast exactly like a misspelled mode does
    require(textMode != "distinct" || n <= 100,
      s"SPARK_GRAFT_TEXT_MODE=distinct is injective only for <=100 replicas, got $n")
    if (embMode == "distinct") {
      val firstVec = spark.table("embeddings")
        .select(size(col("embedding"))).head(1)
      require(firstVec.nonEmpty, "embeddings table is empty — cannot size " +
        "the distinct-mode injectivity bound")
      val dims = firstVec(0).getInt(0)
      require(n <= 2 * dims,
        s"SPARK_GRAFT_EMB_MODE=distinct is injective only for <=${2 * dims} " +
          s"replicas at $dims dims, got $n")
    }

    // dimensions: scale-invariant, copy once
    write("region", spark.table("region"), 1)
    write("nation", spark.table("nation"), 1)

    write("customer",
      offsetKeys(replicate(spark.table("customer"), n), Seq("c_custkey")), 4)
    write("supplier",
      offsetKeys(replicate(spark.table("supplier"), n), Seq("s_suppkey")), 2)
    write("part",
      offsetKeys(replicate(spark.table("part"), n), Seq("p_partkey")), 4)
    write("orders",
      offsetKeys(replicate(spark.table("orders"), n),
        Seq("o_orderkey", "o_custkey")), 8)
    write("lineitem",
      offsetKeys(replicate(spark.table("lineitem"), n),
        Seq("l_orderkey", "l_partkey", "l_suppkey")), 32)
    // events: `uniform` keeps the generator's benign replica-disjoint user
    // axis. `zipf` (round-11 skew rehearsal) REASSIGNS each event's user to
    // a Zipf(s=1)-distributed rank drawn deterministically from the event
    // id: uniform u in [0,1) from xxhash64(event_id), rank = ⌊exp(u·lnN)⌋
    // (the s=1 inverse CDF, CDF(r) ≈ ln r / ln N), so rank 1 holds
    // ~1/lnN of ALL events — the hot-user shape real behavioral corpora
    // have and the user-bucketed advised layout must survive. Determinism:
    // same corpus every run, no RNG. Referential scope: events.user_id is
    // self-contained (behavioral operators only), so remapping it breaks
    // no FK edge; event_id/ts/value are untouched.
    val evScaled = offsetKeys(replicate(spark.table("events"), n),
      Seq("event_id", "user_id"))
    write("events",
      if (eventsMode == "uniform") evScaled
      else {
        val nUsers = spark.table("events")
          .agg(countDistinct(col("user_id"))).head().getLong(0) * n
        require(nUsers >= 2, "zipf mode needs at least 2 users")
        val u = (pmod(xxhash64(col("event_id")), lit(1000000L)).cast("double")
          + lit(0.5)) / lit(1000000.0)
        evScaled.withColumn("user_id",
          floor(exp(u * lit(math.log(nUsers.toDouble)))).cast("long") - 1L)
      }, 8)

    val docs = replicate(spark.table("documents"), n)
    // `boiler` (round-13 shingle skew rehearsal): REWRITE ~95% of documents
    // as template spam — one shared 13-token boilerplate block plus a
    // 4-token per-doc-unique tail — the web-corpus shape where every
    // boilerplate shingle appears in most documents while the per-doc
    // shingle count stays small (15), so the shingle-bucketed index's top
    // key approaches its 1/(shingles per doc) ceiling and the hot-bucket
    // guard must bind. The tail is sized so spam docs never pair under the
    // 0.8 dedup thresholds (containment 11/15 = 0.733, Jaccard 0.58) and
    // their RAREST shingles are the unique tail (df=1), keeping every
    // prefix-filtered candidate stage linear — the corpus is hot on the
    // document-frequency axis without a quadratic pair set. Deterministic
    // from doc_id, no RNG; only documents differs from the sibling corpus
    // (link the rest).
    val boilerText = lit("terms and conditions apply all rights reserved " +
      "contact us for more details")
    write("documents",
      offsetKeys(docs, Seq("doc_id"))
        .withColumn("text",
          if (textMode == "distinct") rotateTextDistinct(col("text"), col("r"), n)
          else rotateText(col("text"), col("r"), n))
        .withColumn("text",
          if (docsMode == "normal") col("text")
          else when(pmod(xxhash64(col("doc_id")), lit(20)) =!= 0,
            concat(boilerText,
              lit(" u"), col("doc_id"), lit("a u"), col("doc_id"),
              lit("b u"), col("doc_id"), lit("c u"), col("doc_id"), lit("d")))
            .otherwise(col("text"))), 8)

    val emb = offsetKeys(replicate(spark.table("embeddings"), n), Seq("vec_id"))
    write("embeddings",
      if (embMode == "distinct")
        emb.withColumn("embedding", rotateEmbedding(col("embedding"), col("r")))
      else emb, 4)

    spark.stop()
    println(s"[scaleup] done: $out (${n}x $src)")
  }
}

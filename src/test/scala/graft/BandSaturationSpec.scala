package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, ShingleIndex}

/** Band-saturation auto-guard (round 15 — closing the one way the default
  * ingest path died on realistic data): a boilerplate-spam corpus lands
  * most documents in the same LSH band buckets, so the per-batch indexed
  * screen degrades toward delta × corpus candidates (the measured sf10b
  * >1 GiB driver abort). The guard measures the top (band, bucket)
  * occupancy at WRITE time — register and compact, the two places band
  * artifacts freeze — and auto-applies the df-pruning (exactness for any
  * stop set is pinned by ExtensionsSpec) or refuses at register naming the
  * knobs. Never a mid-stream abort. */
class BandSaturationSpec extends AnyFunSuite {
  import SharedSpark._

  private def wipe(): Unit = {
    for (t <- Seq(ShingleIndex.tableName, ShingleIndex.bandsTableName)) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        t).toString)
    }
    for (d <- Seq(ShingleIndex.tombstonesDirName, ShingleIndex.stopDirName))
      graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        d).toString)
  }

  // sf10b shape, scaled to spec size: a shared 13-token boilerplate plus a
  // 2-token unique tail (15 tokens → 13 shingles, 11 pure boilerplate).
  // Two spam docs share 11 of 13 shingles → J = 11/15 ≈ 0.73: below the
  // 0.8 near-dup threshold, yet most minhash slots come from the
  // boilerplate, so band buckets saturate.
  private val boiler = "terms and conditions apply all rights reserved " +
    "please contact support for further details"

  private def spamDocs(n: Int, spamEvery20: Int = 19): DataFrame = {
    import spark.implicits._
    (1 to n).map { i =>
      if (i % 20 < spamEvery20) (i.toLong, s"$boiler tail$i ref$i")
      else (i.toLong, (0 until 20).map(w => s"d${i}w$w").mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def sh(docs: DataFrame): DataFrame =
    Dedup.hashedShingles(docs, "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle")

  private def topBucketShare(nDocs: Long): Double = {
    val r = spark.table(ShingleIndex.bandsTableName)
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx")).head()
    if (r.isNullAt(0)) 0.0 else r.getLong(0).toDouble / nDocs
  }

  test("register auto-prunes a saturated band basis; true near-dups still screen") {
    import spark.implicits._
    wipe()
    try {
      val docs = spamDocs(3000).cache()
      ShingleIndex.registerDocs(spark, "sat-tag", sh(docs), buckets = 8,
        withBands = true)
      val m = ShingleIndex.readMarker(spark).get
      assert(m.contains(""""auto_prune":true""") &&
        m.contains(s""""prune_df_frac":${ShingleIndex.AutoPruneFrac}"""),
        s"zero-knob register over a saturated corpus must auto-prune: $m")
      assert(ShingleIndex.stopSet(spark).exists(_.count() > 0),
        "the boilerplate shingles must be in the frozen stop set")
      assert(topBucketShare(3000) <= ShingleIndex.SaturationShare,
        "the rebuilt band basis must be desaturated")

      // the pruned screen COMPLETES on a spam batch and still catches a
      // genuine near-dup (one whose similarity is NOT boilerplate-only):
      // indexed pairs ≡ the derived screen's pairs on the same batch
      val normal = docs.filter(col("doc_id") % 20 === 19)
        .select("text").head().getString(0)
      val batch = ((1 to 50).map(i =>
        (100000L + i, s"$boiler fresh$i item$i")) :+
        (200000L, normal.split(" ").dropRight(1).mkString(" ") + " changed"))
        .toDF("doc_id", "text")
      val idx = ShingleIndex.liveFor(spark, "sat-tag").get
      val (pairsIdx, rel) = Dedup.incrementalMinhashPairsIndexed(
        batch, docs.select("doc_id"), idx, "doc_id", "text", 0.8)
      val gotIdx = try pairsIdx.select("delta_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet finally rel()
      val (pairsDer, relD) = Dedup.incrementalMinhashPairsManaged(
        batch, docs, "doc_id", "text", 0.8)
      val gotDer = try pairsDer.select("delta_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet finally relD()
      assert(gotIdx.exists(_._1 == 200000L),
        "a true near-dup must survive the pruned screen")
      assert(gotIdx == gotDer,
        "pruned-indexed and derived screens must agree on this corpus " +
          "(spam pairs are sub-threshold either way)")
      docs.unpersist()
    } finally wipe()
  }

  test("autoPrune=false control keeps the unpruned basis; sub-floor corpora never trip") {
    wipe()
    try {
      ShingleIndex.registerDocs(spark, "sat-off-tag", sh(spamDocs(1500)),
        buckets = 8, withBands = true, autoPrune = false)
      val m = ShingleIndex.readMarker(spark).get
      assert(!m.contains("\"auto_prune\"") &&
        !m.contains(""""prune_df_frac":"""),
        s"the A/B control binding must not prune: $m")
      // a default-knob probe of the SAME identity does not reattach the
      // unpruned artifact blindly — it re-registers through the guard
      wipe()
      // sub-floor: 400 spam docs saturate their buckets in SHARE but a
      // legitimate small corpus must never trip the guard (candidate sets
      // this size are trivial) — the absolute floor holds it off
      ShingleIndex.registerDocs(spark, "sat-small-tag", sh(spamDocs(400)),
        buckets = 8, withBands = true)
      val m2 = ShingleIndex.readMarker(spark).get
      assert(!m2.contains(""""auto_prune":true"""),
        s"a ${ShingleIndex.SaturationMinDocs}-doc floor must gate the " +
          s"guard on small corpora: $m2")
    } finally wipe()
  }

  test("pruning that cannot desaturate refuses at register, naming the knobs") {
    import spark.implicits._
    wipe()
    try {
      // two boilerplate clusters at 45% each: every cluster's shingles sit
      // BELOW the 0.5 df bound (no stop set can split them), yet each
      // cluster saturates its band buckets. rowsPerBand=1 keeps the
      // per-band collision probability at ~11/13 so the spec corpus stays
      // small; the refusal logic is geometry-independent.
      val boilerB = "this offer is subject to availability while stocks " +
        "last excluding public holidays only"
      val docs = (1 to 2800).map { i =>
        if (i % 20 == 0) (i.toLong, (0 until 20).map(w => s"d${i}w$w").mkString(" "))
        else if (i % 2 == 0) (i.toLong, s"$boiler tail$i ref$i")
        else (i.toLong, s"$boilerB tail$i ref$i")
      }.toDF("doc_id", "text")
      val e = intercept[IllegalStateException] {
        ShingleIndex.registerDocs(spark, "sat-refuse-tag", sh(docs),
          buckets = 8, withBands = true, nBands = 8, rowsPerBand = 1)
      }
      assert(e.getMessage.contains("pruneDfFrac") &&
        e.getMessage.contains("saturated"),
        s"the refusal must name the knob: ${e.getMessage}")
      // nothing half-built is reattachable: no marker, routing falls back
      assert(ShingleIndex.readMarker(spark).isEmpty ||
        !spark.catalog.tableExists(ShingleIndex.tableName))
      assert(ShingleIndex.liveFor(spark, "sat-refuse-tag").isEmpty)
    } finally wipe()
  }

  test("zero-knob ingest adopts pruning at its own compaction, mid-stream") {
    import spark.implicits._
    wipe()
    val corpus = java.nio.file.Files
      .createTempDirectory("graft-sat-ingest").toString
    try {
      // the IngestRehearsal shape: band-backed index registered over the
      // EMPTY live corpus (nothing to measure at register time), then
      // boilerplate spam arrives batch by batch. Saturation develops in
      // the stored bands; the maintenance compaction is where frozen band
      // artifacts are re-assessed, and adoption happens THERE — the
      // stream never aborts.
      ShingleIndex.registerDocs(spark, corpus,
        Seq.empty[(Long, Long)].toDF("doc_id", "shingle"),
        buckets = 4, withBands = true)
      def batch(ids: Range): DataFrame =
        ids.map(i => (i.toLong, s"$boiler tail$i ref$i"))
          .toDF("doc_id", "text")
          .withColumn("lang", lit("en")).withColumn("source", lit("t"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      val step = graft.streaming.DocsStream.ingestStep(corpus, 0.8, Some(1))
      // batch 1: empty corpus — no screen; its compact sees 2200 spam
      // docs and adopts the pruning
      step(batch(1 to 2200), 0L)
      val m = ShingleIndex.readMarker(spark).get
      assert(m.contains(""""auto_prune":true"""),
        s"the maintenance compaction must adopt pruning mid-stream: $m")
      assert(ShingleIndex.stopSet(spark).exists(_.count() > 0))
      // batch 2 screens against the now-pruned basis and completes; all
      // docs unique-tailed → all accepted
      step(batch(3001 to 3200), 1L)
      assert(graft.ext.CorpusStore.read(spark, corpus).count() == 2400L,
        "every unique-tail doc must be accepted (spam J ≈ 0.73 < 0.8)")
    } finally {
      wipe()
      graft.perf.Measure.deleteRecursively(corpus)
    }
  }
}

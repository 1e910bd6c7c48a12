package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AnnIndex, CorpusCompact, CorpusStore, ShingleIndex}

/** Generation-archive storage accounting (round-17 judge task 4): the
  * retention knob now has an operator-facing cost surface — per-generation
  * bytes, artifact pre-images held, and retired tombstone batches — on all
  * three stores, plus the standalone [[AnnIndex.setRetention]] knob. The
  * sf1 soak numbers live in BASELINE.md; this pins the listing shape. */
class RetentionAccountingSpec extends AnyFunSuite {
  import SharedSpark._

  test("AnnIndex.generations lists bytes/artifacts/tombstones per retained gen; setRetention persists") {
    import spark.implicits._
    val e = Tables(spark, sf, "embeddings")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-acct-ann").toString
    val (cents, indexed) = AnnIndex.buildIvf(
      e.filter(pmod(col("vec_id"), lit(2)) === 0), nCells = 8,
      refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 8)
    assert(AnnIndex.generations(idx).isEmpty, "fresh index: no archive")
    AnnIndex.setRetention(idx, 2)
    assert(AnnIndex.retentionSetting(idx) == 2,
      "setRetention must persist without running maintenance")
    AnnIndex.appendIvf(spark, idx,
      e.filter(pmod(col("vec_id"), lit(2)) === 1))
    AnnIndex.delete(spark, idx, Seq(1L).toDF("vec_id"),
      token = Some("acct-kill"))
    AnnIndex.compact(spark, idx) // inherits retention 2, archives gen 0
    val gens = AnnIndex.generations(idx)
    assert(gens.map(_.gen) == Seq(0))
    assert(gens.head.bytes > 0L, "the archived pre-image has real bytes")
    assert(gens.head.artifacts.contains("vectors.parquet"),
      s"a compact retires its data artifact (got ${gens.head.artifacts})")
    assert(gens.head.tombstoneBatches == 1,
      "the applied batch rides the generation it was applied at")
    AnnIndex.retrain(spark, idx, refineIters = 1) // archives gen 1 (full set)
    val gens2 = AnnIndex.generations(idx)
    assert(gens2.map(_.gen) == Seq(0, 1))
    assert(gens2.last.artifacts.toSet
      .intersect(Set("centroids.parquet", "vectors.parquet")).size == 2,
      s"a retrain retires the whole trained set (got ${gens2.last.artifacts})")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("CorpusStore.generationStats: bytes + applied batches per snap") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-acct-corpus").toString
    CorpusStore.init(dir)
    CorpusStore.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"))
    CorpusCompact.tombstone(spark, dir, Seq(1L).toDF("doc_id"),
      token = Some("acct"))
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 2)
    val stats = CorpusStore.generationStats(dir)
    assert(stats.map(_.gen) == Seq(1L, 2L))
    assert(stats.forall(_.bytes > 0L))
    assert(stats.last.appliedTombstoneBatches == 1 &&
      stats.head.appliedTombstoneBatches == 0,
      s"the applied batch is archived in the generation that applied it ($stats)")
    graft.perf.Measure.deleteRecursively(dir)
  }

  test("ShingleIndex.generations: bytes + artifacts per frozen gen") {
    import spark.implicits._
    val d = (1L to 30L).map(i => (i, s"some text content number $i with words"))
      .toDF("doc_id", "text")
    val sh = graft.ext.Dedup.hashedShingles(d, "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle")
    ShingleIndex.registerDocs(spark, "acct#shingle", sh, buckets = 2,
      withBands = true)
    assert(ShingleIndex.generations(spark).isEmpty)
    ShingleIndex.delete(spark, Seq(1L).toDF("doc_id"),
      token = Some("acct-kill"))
    ShingleIndex.compact(spark) // default persisted retention 1
    val gens = ShingleIndex.generations(spark)
    assert(gens.map(_.gen) == Seq(0))
    assert(gens.head.bytes > 0L)
    assert(gens.head.artifacts.contains("postings") &&
      gens.head.artifacts.contains("bands"),
      s"the frozen screen pre-image holds postings+bands (${gens.head.artifacts})")
    assert(gens.head.tombstoneBatches == 1)
  }
}

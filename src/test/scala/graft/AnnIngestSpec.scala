package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AnnIndex, Similarity}
import graft.streaming.VectorsStream

/** Self-maintaining vector ingest (round-15 judge task 2): the streaming
  * step appends with frozen geometry, replays self-screen to empty, the
  * drift journal the appends feed triggers the retrain MID-STREAM with no
  * operator in the loop, and a torn maintenance swap refuses the next
  * batch loudly until a rebuild heals — the DocsStream lifecycle on the
  * vector axis, end to end from the ingest path. */
class AnnIngestSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val emb = Tables(spark, sf, "embeddings").cache()
  private lazy val q10 = emb.filter(col("vec_id") < 10)

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def drifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
    .withColumn("embedding",
      expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))

  test("zero-knob ingest: replay screens to empty, compaction and retrain fire mid-stream, final state ≡ one-shot build") {
    val idx = tmp("graft-annspec-ingest")
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 2)
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)

    val step = VectorsStream.ingestStep(idx, autoMaintainFactor = Some(1))
    def storedIds(): Set[Long] = spark.read.parquet(s"$idx/vectors.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet

    // batch 1: in-distribution — appended, journaled, no retrain
    val aligned = emb.filter(pmod(col("vec_id"), lit(4)) === 2)
    step(aligned.select("vec_id", "embedding"), 0L)
    val afterB1 = storedIds()
    assert(afterB1 == (base.select("vec_id").collect().map(_.getLong(0)).toSet
      ++ aligned.select("vec_id").collect().map(_.getLong(0)).toSet))
    val phases1 = spark.read.parquet(s"$idx/drift.parquet")
      .select("phase").collect().map(_.getString(0)).toSeq
    assert(phases1.contains("build") && phases1.contains("append") &&
      !phases1.contains("retrain"),
      s"an in-distribution batch must not retrain: $phases1")
    // factor 1 → the append's cell files already tripped the compaction;
    // the maintained file count stays at the build shape
    assert(AnnIndex.fileCounts(spark, idx)("vectors.parquet") <= 2 * 16,
      "maintenance must keep the cell files bounded")

    // replay of batch 1: the cell-pruned id screen drops every row — the
    // index is unchanged with no batch-id bookkeeping
    step(aligned.select("vec_id", "embedding"), 0L)
    assert(storedIds() == afterB1, "a replayed batch must self-screen to empty")

    // batch 2: a tight novel mode — the concentration axis trips and the
    // retrain runs INSIDE the step, no operator in the loop
    step(drifted.select("vec_id", "embedding"), 1L)
    val phases2 = spark.read.parquet(s"$idx/drift.parquet")
      .select("phase").collect().map(_.getString(0)).toSeq
    assert(phases2 == Seq("retrain"),
      s"drift must trigger a mid-stream retrain that resets the journal: $phases2")

    // the self-maintained index ≡ a one-shot build over everything it
    // ingested (the q_ann_ivf_retrain pin, reached from the ingest path)
    val union = base.unionByName(aligned)
      .unionByName(drifted).select("vec_id", "embedding")
    val (c2, ix2) = AnnIndex.buildIvf(union, nCells = 16, refineIters = 1)
    val mem = Similarity.ivfSearch(c2, ix2, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet
    assert(AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet == mem,
      "self-maintained index diverged from a one-shot build")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("a torn maintenance swap refuses the next batch; rebuild heals the ingest") {
    val idx = tmp("graft-annspec-ingest-torn")
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 3)
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 8, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 8)
    // simulate a maintenance killed inside the swap window: artifacts
    // staged, sentinel dropped, exchange never finished
    AnnIndex.prepareRetrainArtifacts(spark, idx, None, 1, 4096)
    AnnIndex.beginCompactSwap(idx)
    val e = intercept[IllegalStateException] {
      VectorsStream.ingestStep(idx)(drifted.select("vec_id", "embedding"), 0L)
    }
    assert(e.getMessage.contains("mid-compaction"),
      s"the ingest must refuse a torn index loudly: ${e.getMessage}")
    // rebuild heals (the documented recovery), and the ingest resumes
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 8)
    VectorsStream.ingestStep(idx, autoMaintainFactor = None)(
      drifted.select("vec_id", "embedding"), 0L)
    assert(spark.read.parquet(s"$idx/vectors.parquet").count() ==
      base.count() + drifted.count())
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("ivfpq ingest needs the corpus thunk up front; it is evaluated only when retrain fires") {
    val idx = tmp("graft-annspec-ingest-pq")
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 2)
    val (cents, books, codes) = AnnIndex.buildIvfPq(base, nCells = 8)
    AnnIndex.writeIvfPq(idx, cents, books, codes, nCells = 8, m = 8,
      kCodes = 16, dims = 64)
    // missing thunk fails on batch ONE, not on the drift batch
    val e = intercept[IllegalArgumentException] {
      VectorsStream.ingestStep(idx)(base.select("vec_id", "embedding"), 0L) }
    assert(e.getMessage.contains("corpus"), e.getMessage)

    var evaluated = 0
    val aligned = emb.filter(pmod(col("vec_id"), lit(4)) === 2)
    def full = base.unionByName(aligned).unionByName(drifted)
      .select("vec_id", "embedding")
    val step = VectorsStream.ingestStep(idx, autoMaintainFactor = Some(8),
      corpus = Some(() => { evaluated += 1; full }))
    step(aligned.select("vec_id", "embedding"), 0L)
    assert(evaluated == 0,
      "the corpus thunk must not be evaluated while nothing drifts")
    step(drifted.select("vec_id", "embedding"), 1L)
    assert(evaluated == 1, "the drift-triggered retrain must use the thunk")
    val phases = spark.read.parquet(s"$idx/drift.parquet")
      .select("phase").collect().map(_.getString(0)).toSeq
    assert(phases == Seq("retrain"), s"ivfpq mid-stream retrain: $phases")
    graft.perf.Measure.deleteRecursively(idx)
  }
}

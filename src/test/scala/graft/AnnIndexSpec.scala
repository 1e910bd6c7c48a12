package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AnnIndex, Similarity}

/** Persisted ANN index lifecycle (round-8 task 1/8): stored-index search is
  * bit-identical to the in-memory build, and incremental append with frozen
  * artifacts neither rewrites old codes nor perturbs old-query results
  * beyond genuine new-neighbor entries. */
class AnnIndexSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val emb = Tables(spark, sf, "embeddings").cache()
  private lazy val q10 = emb.filter(col("vec_id") < 10)

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("every q_ann_* face reports identical persisted-vs-memory results") {
    for (name <- Seq("q_ann_lsh_persist", "q_ann_ivf_persist",
        "q_ann_pq_persist", "q_ann_ivfpq_persist")) {
      val rows = graft.queries.Registry.byName(name).build(spark, sf).collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      assert(rows.forall(_.getAs[Boolean]("identical")),
        s"$name: persisted search diverged from in-memory")
    }
  }

  test("face comparison kernel flags divergence (bool_and null-skip regression)") {
    // the q_ann_* faces' comparator must flip on BOTH value mismatches and
    // rows present on only one side of the full-outer join — Spark's
    // bool_and skips nulls, which once masked the missing-row case
    import spark.implicits._
    val mem = Seq((1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8), (1L, 3L, 12L, 0.7))
      .toDF("qid", "rk", "cid", "cos")
    val missingRow = mem.filter(col("rk") < 3)
    val wrongCid = mem.withColumn("cid",
      when(col("rk") === 2, lit(99L)).otherwise(col("cid")))
    def cmp(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      graft.queries.AnnFaces.compareTopKForTest(a, b, "cos")
        .select("identical").head().getBoolean(0)
    assert(cmp(mem, mem))
    assert(!cmp(mem, missingRow), "a missing rank must flip identical")
    assert(!cmp(missingRow, mem), "an extra rank must flip identical")
    assert(!cmp(mem, wrongCid), "a wrong cid must flip identical")
  }

  test("append face: frozen-encode equality and search equality hold") {
    val r = graft.queries.Registry.byName("q_ann_ivfpq_append")
      .build(spark, sf).head()
    assert(r.getAs[Boolean]("codes_identical"))
    assert(r.getAs[Boolean]("search_identical"))
    assert(r.getAs[Long]("n_codes") == emb.count())
  }

  test("append never rewrites old codes: pre-append search reproducible") {
    val base = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    val delta = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
    val idx = tmp("graft-annspec-append")
    val (cents, books, baseCodes) =
      AnnIndex.buildIvfPq(base, kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx, cents, books, baseCodes,
      nCells = 16, m = 8, kCodes = 64, dims = 64)
    val before = AnnIndex.searchIvfPq(spark, idx, q10, 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    AnnIndex.appendIvfPq(spark, idx, delta)
    // restricting the appended index to the base ids reproduces the
    // pre-append result EXACTLY: append touched no existing code files
    val (c2, b2, codes2) = AnnIndex.readIvfPq(spark, idx)
    val baseOnly = codes2.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    val after = Similarity.ivfpqSearch(c2, b2, baseOnly, q10, 3, nprobe = 8,
        m = 8, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(after == before)
  }

  test("stored-index search prunes the codes scan to the probed cell partitions") {
    val idx = tmp("graft-annspec-prune")
    val (cents, books, codes) =
      AnnIndex.buildIvfPq(emb, kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx, cents, books, codes,
      nCells = 16, m = 8, kCodes = 64, dims = 64)
    val one = emb.filter(col("vec_id") === 0)
    val pruned = AnnIndex.searchIvfPq(spark, idx, one, 3, nprobe = 2)
    // the scan must carry a literal partition filter on cell...
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a literal cell partition filter in:\n$plan")
    // ...and pruning is a semantic no-op vs the unpruned in-memory tail
    val (c2, b2, codes2) = AnnIndex.readIvfPq(spark, idx)
    val full = Similarity.ivfpqSearch(c2, b2, codes2, one, 3, nprobe = 2,
      m = 8, dims = 64)
    assert(pruned.collect().toSeq == full.collect().toSeq)
  }

  test("stored IVF search never scans the corpus embeddings at query time for ivfpq") {
    // the IVFPQ query-time plan reads codes + bounded artifacts only — the
    // raw vectors.parquet/embedding column never appears in the scan set
    val idx = tmp("graft-annspec-scan")
    val (cents, books, codes) =
      AnnIndex.buildIvfPq(emb, kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx, cents, books, codes,
      nCells = 16, m = 8, kCodes = 64, dims = 64)
    val plan = AnnIndex.searchIvfPq(spark, idx, q10, 3, nprobe = 8)
      .queryExecution.executedPlan.toString
    // POSITIVE check (an absent-artifact assertion alone is vacuous — no
    // vectors.parquet even exists in an ivfpq layout): every index file
    // the plan scans must be one of the three bounded/encoded artifacts
    val idxRefs = s"""${java.util.regex.Pattern.quote(idx)}/([a-z]+)\\.parquet""".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(idxRefs.contains("codes"), s"expected a codes scan, saw $idxRefs")
    assert(idxRefs.subsetOf(Set("codes", "centroids", "codebooks")),
      s"ivfpq search must only scan encoded/bounded artifacts, saw $idxRefs")
  }

  test("lsh compaction: keys/search identical, files shrink, kill window refuses, rebuild heals") {
    val base = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    val delta = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
    val idx = tmp("graft-annspec-compact")
    val (keys, vecs) = AnnIndex.buildLsh(base, planes = 5, tables = 12)
    AnnIndex.writeLsh(idx, keys, vecs, planes = 5, dims = 64, tables = 12)
    AnnIndex.appendLsh(spark, idx, delta)

    def keySet() = spark.read.parquet(s"$idx/keys.parquet")
      .select(col("vec_id"), col("tbl").cast("int"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    def searchSet() = AnnIndex.searchLsh(spark, idx, q10, 3).collect()
      .map(_.toString).toSet
    val keysBefore = keySet()
    val searchBefore = searchSet()
    val filesBefore = AnnIndex.fileCounts(spark, idx)
    assert(filesBefore("keys.parquet") > 12,
      s"append should fragment past one file per tbl, got $filesBefore")

    AnnIndex.compact(spark, idx)
    assert(keySet() == keysBefore, "compaction changed the key multiset")
    assert(searchSet() == searchBefore, "compaction changed search results")
    val filesAfter = AnnIndex.fileCounts(spark, idx)
    assert(filesAfter("keys.parquet") == 12,
      s"keys must compact to one file per tbl, got ${filesAfter("keys.parquet")}")
    assert(filesAfter("vectors.parquet") <= filesBefore("vectors.parquet"))

    // ivfpq: appended codes compact to one file per cell, search identical
    val idx2 = tmp("graft-annspec-compact-pq")
    val (cents, books, baseCodes) =
      AnnIndex.buildIvfPq(base, nCells = 16, kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx2, cents, books, baseCodes,
      nCells = 16, m = 8, kCodes = 64, dims = 64)
    AnnIndex.appendIvfPq(spark, idx2, delta)
    val pqBefore = AnnIndex.searchIvfPq(spark, idx2, q10, 3, nprobe = 8)
      .collect().map(_.toString).toSet
    AnnIndex.compact(spark, idx2)
    assert(AnnIndex.searchIvfPq(spark, idx2, q10, 3, nprobe = 8)
      .collect().map(_.toString).toSet == pqBefore,
      "ivfpq compaction changed search results")

    // kill window: sentinel present between swap begin and finalize — every
    // readParams-gated entry point refuses the possibly-torn index
    AnnIndex.beginCompactSwap(idx)
    intercept[IllegalStateException] { AnnIndex.searchLsh(spark, idx, q10, 3) }
    intercept[IllegalStateException] { AnnIndex.appendLsh(spark, idx, delta) }
    intercept[IllegalStateException] { AnnIndex.compact(spark, idx) }
    intercept[IllegalStateException] { AnnIndex.fileCounts(spark, idx) }
    // a full rebuild replaces every artifact and clears the sentinel
    val (k2, v2) = AnnIndex.buildLsh(emb, planes = 5, tables = 12)
    AnnIndex.writeLsh(idx, k2, v2, planes = 5, dims = 64, tables = 12)
    assert(searchSet() == searchBefore,
      "rebuild over the union must reproduce the compacted index's search")
    graft.perf.Measure.deleteRecursively(idx)
    graft.perf.Measure.deleteRecursively(idx2)
  }

  test("delete: retracted vectors leave every search immediately, compact purges the bytes, replay is a no-op") {
    val dead = emb.filter(pmod(col("vec_id"), lit(4)) === 2)
    val survivors = emb.filter(pmod(col("vec_id"), lit(4)) =!= 2)
    val deadIds = dead.select("vec_id")

    // LSH: search-after-delete must equal an in-memory search over a build
    // of the SURVIVING corpus (keys are deterministic per vector, so
    // filtering the full build's keys ≡ building from survivors)
    val idx = tmp("graft-annspec-delete-lsh")
    val (keys, vecs) = AnnIndex.buildLsh(emb, planes = 5, tables = 12)
    AnnIndex.writeLsh(idx, keys, vecs, planes = 5, dims = 64, tables = 12)
    assert(AnnIndex.delete(spark, idx, deadIds, token = Some("t1")))
    val (sk, sv) = AnnIndex.buildLsh(survivors, planes = 5, tables = 12)
    val memSurvivors = Similarity.lshSearch(sk, sv, q10, 3, planes = 5,
      dims = 64, tables = 12).collect().map(_.toString).toSet
    def searchSet() = AnnIndex.searchLsh(spark, idx, q10, 3).collect()
      .map(_.toString).toSet
    assert(searchSet() == memSurvivors,
      "post-delete search diverged from a rebuild over the survivors")

    // replay: the published token directory is the commit point
    assert(!AnnIndex.delete(spark, idx, deadIds, token = Some("t1")))
    assert(AnnIndex.pendingTombstoneBatches(idx) == Seq("t1"))

    // compact purges PHYSICALLY: keys and raw vectors no longer carry the
    // retracted ids (the takedown contract — bytes gone), batch swept,
    // search unchanged
    AnnIndex.compact(spark, idx)
    assert(AnnIndex.pendingTombstoneBatches(idx).isEmpty,
      "applied tombstone batch not swept")
    val deadSet = deadIds.collect().map(_.getLong(0)).toSet
    for (a <- Seq("keys.parquet", "vectors.parquet")) {
      val remaining = spark.read.parquet(s"$idx/$a").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(remaining.intersect(deadSet).isEmpty,
        s"$a still carries retracted vec_ids after compaction")
    }
    assert(searchSet() == memSurvivors, "compaction changed post-delete search")

    // a rebuild wipes the journal with the old artifacts
    AnnIndex.delete(spark, idx, deadIds.limit(1), token = Some("t2"))
    val (k2, v2) = AnnIndex.buildLsh(emb, planes = 5, tables = 12)
    AnnIndex.writeLsh(idx, k2, v2, planes = 5, dims = 64, tables = 12)
    assert(AnnIndex.pendingTombstoneBatches(idx).isEmpty,
      "rebuild must wipe tombstones of the replaced artifacts")

    // IVFPQ: the cell-partitioned codes path — search-after-delete equals
    // in-memory search over the surviving codes, compact purges codes
    val idx2 = tmp("graft-annspec-delete-pq")
    val (cents, books, codes) =
      AnnIndex.buildIvfPq(emb, nCells = 16, kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx2, cents, books, codes,
      nCells = 16, m = 8, kCodes = 64, dims = 64)
    assert(AnnIndex.delete(spark, idx2, deadIds, token = Some("t1")))
    val memPq = Similarity.ivfpqSearch(cents, books,
      codes.join(deadIds, Seq("vec_id"), "left_anti"),
      q10, 3, nprobe = 8, m = 8, dims = 64)
      .collect().map(_.toString).toSet
    def pqSet() = AnnIndex.searchIvfPq(spark, idx2, q10, 3, nprobe = 8)
      .collect().map(_.toString).toSet
    assert(pqSet() == memPq,
      "ivfpq post-delete search diverged from the surviving-codes search")
    AnnIndex.compact(spark, idx2)
    val remainingCodes = spark.read.parquet(s"$idx2/codes.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(remainingCodes.intersect(deadSet).isEmpty,
      "codes still carry retracted vec_ids after compaction")
    assert(pqSet() == memPq)

    graft.perf.Measure.deleteRecursively(idx)
    graft.perf.Measure.deleteRecursively(idx2)
  }

  test("maybeCompact: sustained appends stay file-bounded, search equals a one-shot build") {
    val idx = tmp("graft-annspec-maybecompact")
    val base = emb.filter(pmod(col("vec_id"), lit(7)) === 0)
    val (k0, v0) = AnnIndex.buildLsh(base, planes = 5, tables = 4)
    AnnIndex.writeLsh(idx, k0, v0, planes = 5, dims = 64, tables = 4)
    var compacted = 0
    val bound = 1 * 4 + 4 // trigger threshold + at most one more append
    for (i <- 1 to 6) {
      AnnIndex.appendLsh(spark, idx,
        emb.filter(pmod(col("vec_id"), lit(7)) === i))
      if (AnnIndex.maybeCompact(spark, idx, factor = 1)) compacted += 1
      assert(AnnIndex.fileCounts(spark, idx)("keys.parquet") <= bound,
        s"append $i: keys exceeded the maintenance bound")
    }
    assert(compacted >= 1, "sustained appends never triggered maintenance")
    // the maintained index answers exactly like a one-shot build of the
    // full corpus (LSH keys are deterministic from the stored geometry)
    val (ku, vu) = AnnIndex.buildLsh(emb, planes = 5, tables = 4)
    val mem = Similarity.lshSearch(ku, vu, q10, 3, planes = 5, dims = 64,
      tables = 4).collect().map(_.toString).toSet
    assert(AnnIndex.searchLsh(spark, idx, q10, 3).collect()
      .map(_.toString).toSet == mem,
      "maintained index diverged from a one-shot build")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("drift: aligned appends never trigger, drifted do; retrain ≡ one-shot rebuild, applies tombstones, resets the journal") {
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 2)
    val aligned = emb.filter(pmod(col("vec_id"), lit(4)) === 2)
    // the planted drift: a TIGHT novel mode (constant offset dominates every
    // dim — a new domain/model in embedding space). Its mean misfit barely
    // moves on this weakly-clustered corpus; the top-cell-share axis is
    // what must catch it (the whole point of the two-axis trigger)
    val drifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
    val idx = tmp("graft-annspec-drift")
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
    assert(AnnIndex.driftStats(spark, idx).isEmpty,
      "no appends yet — nothing to compare")

    AnnIndex.appendIvf(spark, idx, aligned)
    val s1 = AnnIndex.driftStats(spark, idx).get
    assert(s1.baselinePhase == "build" && s1.appendVecs == aligned.count())
    assert(!AnnIndex.maybeRetrain(spark, idx, errFactor = 1.5),
      s"in-distribution append must not trigger (ratio ${s1.ratio})")

    AnnIndex.appendIvf(spark, idx, drifted)
    val s2 = AnnIndex.driftStats(spark, idx).get
    assert(s2.topShare > s1.topShare && s2.topShare > 0.5,
      s"a tight novel mode must raise the concentration axis (got $s2)")

    // a pending retraction rides the retrain: physically purged + swept
    val dead = emb.filter(pmod(col("vec_id"), lit(8)) === 5).select("vec_id")
    assert(AnnIndex.delete(spark, idx, dead, token = Some("d1")))

    assert(AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      s"drifted appends must trigger a retrain (got $s2)")
    assert(AnnIndex.driftStats(spark, idx).isEmpty,
      "retrain must reset the journal to one fresh baseline")
    assert(AnnIndex.pendingTombstoneBatches(idx).isEmpty,
      "retrain must sweep the tombstone batches it applied")
    val deadSet = dead.collect().map(_.getLong(0)).toSet
    val remaining = spark.read.parquet(s"$idx/vectors.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(remaining.intersect(deadSet).isEmpty,
      "retrain must purge retracted vectors physically")

    // bit-identical to a one-shot build over the surviving union: training
    // is deterministic end-to-end, so in-place retrain loses nothing
    val union = base.unionByName(aligned).unionByName(drifted)
      .join(dead, Seq("vec_id"), "left_anti")
    val (c2, ix2) = AnnIndex.buildIvf(union, nCells = 16, refineIters = 1)
    val mem = Similarity.ivfSearch(c2, ix2, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet
    assert(AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet == mem,
      "retrained index diverged from a one-shot build over the survivors")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("retrain kill windows, ivfpq corpus contract, and family refusals") {
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 3)
    val drifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
    val union = base.unionByName(drifted)
    val idx = tmp("graft-annspec-retrain-kill")
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
    AnnIndex.appendIvf(spark, idx, drifted)
    val liveBefore = AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet

    // staging kill is FREE: artifacts staged, live index untouched
    AnnIndex.prepareRetrainArtifacts(spark, idx, None, 1, 4096)
    assert(AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet == liveBefore,
      "staging a retrain must not perturb the live index")
    // a retrain restarted over the stale staging sweeps and succeeds
    AnnIndex.retrain(spark, idx, refineIters = 1)
    val (c2, ix2) = AnnIndex.buildIvf(union, nCells = 16, refineIters = 1)
    val mem = Similarity.ivfSearch(c2, ix2, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet
    assert(AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet == mem)

    // swap kill: the sentinel refuses every drift entry point too
    AnnIndex.beginCompactSwap(idx)
    intercept[IllegalStateException] {
      AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4) }
    intercept[IllegalStateException] { AnnIndex.retrain(spark, idx) }
    intercept[IllegalStateException] { AnnIndex.driftStats(spark, idx) }
    intercept[IllegalStateException] {
      AnnIndex.maybeRetrain(spark, idx) }
    // a full rebuild heals (write path clears the sentinel)
    val (c3, ix3) = AnnIndex.buildIvf(union, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, c3, ix3, nCells = 16)
    assert(AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet == mem)

    // ivfpq: retrain NEEDS the raw corpus (codes are not invertible); the
    // journal bootstraps its baseline from the first append
    val idx2 = tmp("graft-annspec-retrain-pq")
    val pqBase = emb.filter(pmod(col("vec_id"), lit(4)) < 2)
    val pqAligned = emb.filter(pmod(col("vec_id"), lit(4)) === 2)
    val (pc, pb, pcodes) =
      AnnIndex.buildIvfPq(pqBase, nCells = 16, kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx2, pc, pb, pcodes,
      nCells = 16, m = 8, kCodes = 64, dims = 64)
    assert(AnnIndex.driftStats(spark, idx2).isEmpty,
      "ivfpq journal starts empty — no raw vectors at write time")
    AnnIndex.appendIvfPq(spark, idx2, pqAligned)
    assert(AnnIndex.driftStats(spark, idx2).isEmpty,
      "a single append IS the bootstrap baseline — nothing to compare yet")
    AnnIndex.appendIvfPq(spark, idx2, drifted)
    val s = AnnIndex.driftStats(spark, idx2).get
    assert(s.baselinePhase == "append" && s.topShare > 0.5,
      s"bootstrap baseline + drifted append must show the shift (got $s)")
    intercept[IllegalArgumentException] { AnnIndex.retrain(spark, idx2) }
    val pqUnion = pqBase.unionByName(pqAligned).unionByName(drifted)
    AnnIndex.retrain(spark, idx2, corpus = Some(pqUnion), refineIters = 1)
    val (qc, qb, qcodes) = AnnIndex.buildIvfPq(pqUnion, nCells = 16,
      kCodes = 64, refineIters = 1)
    val memPq = Similarity.ivfpqSearch(qc, qb, qcodes, q10, 3, nprobe = 8,
      m = 8, dims = 64).collect().map(_.toString).toSet
    assert(AnnIndex.searchIvfPq(spark, idx2, q10, 3, nprobe = 8)
      .collect().map(_.toString).toSet == memPq,
      "ivfpq retrain diverged from a one-shot build over the same corpus")

    // data-independent / quantizer-less families refuse loudly
    val idx3 = tmp("graft-annspec-retrain-lsh")
    val (lk, lv) = AnnIndex.buildLsh(base, planes = 5, tables = 4)
    AnnIndex.writeLsh(idx3, lk, lv, planes = 5, dims = 64, tables = 4)
    intercept[IllegalArgumentException] { AnnIndex.retrain(spark, idx3) }
    intercept[IllegalArgumentException] {
      AnnIndex.recordFit(spark, idx3, base) }

    Seq(idx, idx2, idx3).foreach(graft.perf.Measure.deleteRecursively)
  }

  test("drift recency: a long aligned prefix cannot dilute late drift below the trigger") {
    val idx = tmp("graft-annspec-recency")
    val base = emb.filter(pmod(col("vec_id"), lit(8)) < 4)
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
    // three in-distribution batches, THEN the drift arrives — the
    // sustained-ingest shape where the full-history n-weighted mean sits
    // below every threshold forever
    for (i <- 4 to 6)
      AnnIndex.appendIvf(spark, idx,
        emb.filter(pmod(col("vec_id"), lit(8)) === i))
    assert(!AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      "aligned prefix must not trigger")
    AnnIndex.appendIvf(spark, idx,
      emb.filter(pmod(col("vec_id"), lit(8)) === 7)
        .withColumn("embedding",
          expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))")))
    val d = AnnIndex.driftStats(spark, idx).get
    assert(d.topShare <= 0.5,
      s"precondition: the full-history mean IS diluted (got $d) — " +
        "the recency axis is what must fire")
    assert(d.recentShare > 0.5, s"the tail window must expose the shift: $d")
    assert(AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      "late drift behind an aligned prefix must still trigger")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("probe profile: monotone axes, full-probe recall 1, auto-nprobe honors target and budget, retrain wipes it") {
    val idx = tmp("graft-annspec-autoprobe")
    val (cents, indexed) = AnnIndex.buildIvf(emb, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
    val profile = AnnIndex.profileProbes(spark, idx, k = 10, sampleQ = 128)
    assert(profile.nonEmpty && profile.last.nprobe == profile.size,
      "one point per probed cell, densely numbered")
    assert(profile.last.recallProxy == 1.0,
      "probing every cell must cover every true neighbor — the estimator's sanity bound")
    assert(profile.sliding(2).forall(p => p.size < 2 ||
      (p(0).recallProxy <= p(1).recallProxy + 1e-12 &&
        p(0).candidatesPerQuery <= p(1).candidatesPerQuery + 1e-9)),
      "recall and candidates must be monotone in nprobe")
    // the persisted profile round-trips exactly
    assert(AnnIndex.storedProbeProfile(spark, idx).contains(profile))
    val np = AnnIndex.autoNprobe(spark, idx, k = 10, targetRecall = 0.8,
      candidateBudgetFrac = 0.5)
    val budget = 0.5 * profile.last.candidatesPerQuery
    val point = profile.find(_.nprobe == np).get
    assert(point.candidatesPerQuery <= budget + 1e-9,
      "the budget is the hard constraint")
    assert(point.recallProxy >= 0.8 ||
      profile.filter(_.candidatesPerQuery <= budget + 1e-9).lastOption
        .contains(point),
      "either the target is met, or the pick is the best recall under budget")
    // smallest-qualifying: every smaller point under budget misses the target
    assert(profile.takeWhile(_.nprobe < np)
      .filter(_.candidatesPerQuery <= budget + 1e-9)
      .forall(_.recallProxy < 0.8 || point.recallProxy < 0.8))
    // auto search ≡ fixed search at the chosen nprobe. The search k (3) is
    // the profile k — a stored k=10 curve answers a different question, so
    // the auto path re-profiles at k=3 (and the k=10 profile SURVIVES the
    // write: per-k curves coexist)
    val (auto, chosen) = AnnIndex.searchIvfAuto(spark, idx, q10, 3,
      targetRecall = 0.8, candidateBudgetFrac = 0.5)
    assert(chosen == AnnIndex.autoNprobe(spark, idx, k = 3,
      targetRecall = 0.8, candidateBudgetFrac = 0.5))
    assert(auto.collect().map(_.toString).toSet ==
      AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = chosen)
        .collect().map(_.toString).toSet)
    assert(AnnIndex.storedProbeProfile(spark, idx, 10).contains(profile),
      "a k=3 profiling must not destroy the k=10 curve")
    assert(AnnIndex.storedProbeProfile(spark, idx, 3).isDefined)
    // a retrain moves the geometry — the stale profile must not survive it
    AnnIndex.retrain(spark, idx, refineIters = 1)
    assert(AnnIndex.storedProbeProfile(spark, idx).isEmpty,
      "retrain must wipe the old geometry's probe profile")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("round-16 advice: tombstoned ids screen replays, foreign lease skips profile persist, thunk runs outside the lock, degenerate probes are deterministic") {
    import spark.implicits._
    val idx = tmp("graft-annspec-advice")
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 3)
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)

    // (a) screenExisting treats PENDING tombstones as existing: a tombstoned
    // id — even one no stored row carries (the never-reuse-ids contract) —
    // must screen out of a replayed batch; fresh ids pass
    val ghostId = 9999999L // never stored
    AnnIndex.delete(spark, idx, Seq(ghostId).toDF("vec_id"),
      token = Some("t-ghost"))
    val probeVec = emb.filter(col("vec_id") === 1).head()
      .getAs[scala.collection.Seq[Float]]("embedding")
    val batch = Seq((ghostId, probeVec), (8888888L, probeVec))
      .toDF("vec_id", "embedding")
    val screened = AnnIndex.screenExisting(spark, idx, batch)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(screened == Set(8888888L),
      s"tombstoned id must screen out, fresh id must pass — got $screened")

    // (b) an unleased profileProbes under a live FOREIGN lease serves the
    // in-memory profile but never writes into the leased store; the leased
    // caller persists as usual
    val lease = graft.ext.WriterLease.acquire(idx, "ingest-owner",
      ttlMs = 120000)
    val probeFile = java.nio.file.Paths.get(s"$idx/probe.parquet")
    val unleased = AnnIndex.profileProbes(spark, idx, k = 5, sampleQ = 32)
    assert(unleased.nonEmpty, "the in-memory profile is still served")
    assert(!java.nio.file.Files.exists(probeFile),
      "an unleased reader must not write probe.parquet under a foreign lease")
    val leased = AnnIndex.profileProbes(spark, idx, k = 5, sampleQ = 32,
      lease = Some(lease))
    assert(leased == unleased, "the profile is lease-independent")
    assert(java.nio.file.Files.exists(probeFile),
      "the lease holder's profiling persists")
    graft.ext.WriterLease.release(lease)

    // (c) maybeRetrain forces the corpus thunk OUTSIDE the AnnIndex monitor
    // (a provider that touches a synchronized entry point must not deadlock)
    // and never forces it when the trigger is quiet
    AnnIndex.appendIvf(spark, idx,
      emb.filter(pmod(col("vec_id"), lit(4)) === 3).withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))")))
    var lockHeldAtForce = true
    assert(AnnIndex.maybeRetrain(spark, idx, {
      lockHeldAtForce = Thread.holdsLock(AnnIndex)
      None // ivf retrains from its own stored vectors
    }, refineIters = 1))
    assert(!lockHeldAtForce,
      "the corpus thunk must never run under the AnnIndex lock")
    assert(!AnnIndex.maybeRetrain(spark, idx,
      { fail("quiet trigger must not force the corpus thunk"); None }),
      "no drift evidence — no retrain")

    // (d) a zero-norm query neither raises under ANSI nor diverges between
    // the probe path and the profiler: both order by cosineSimOrZero, so
    // all-ties resolve to the LOWEST cells deterministically
    val zeroQ = Seq((0L, Array.fill(64)(0.0f).toSeq))
      .toDF("vec_id", "embedding")
    val storedCents = spark.read.parquet(s"$idx/centroids.parquet")
    val lowCells = storedCents.select("cell").collect()
      .map(_.getLong(0)).sorted.take(3).toSeq
    val probed = Similarity.ivfProbes(storedCents, zeroQ, 3)
      .select("cell").collect().map(_.getLong(0)).toSeq.sorted
    assert(probed == lowCells,
      s"zero-norm query must probe the lowest cells, got $probed")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("retrain hysteresis: a modeled mode never re-fires the concentration axis; a second distinct mode fires on its first batch") {
    val idx = tmp("graft-annspec-hysteresis")
    val base = emb.filter(pmod(col("vec_id"), lit(8)) < 4)
    // tight novel modes: a constant offset dominating every dim (the
    // round-14 drift plant); ±offset are DISTINCT modes (near-antipodal)
    def mode(sel: Int, b: Double) =
      emb.filter(pmod(col("vec_id"), lit(8)) === sel)
        .withColumn("embedding",
          expr(s"transform(embedding, x -> cast(0.2 * x + $b as float))"))
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)

    AnnIndex.appendIvf(spark, idx, mode(4, 3.0))
    assert(AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      "the first batch of an unmodeled mode must fire")

    // the mode keeps arriving AFTER the retrain that modeled it — still
    // fully concentrated (a pointlike cloud gets one centroid no matter
    // its mass), but now sitting ON its centroid: a rebuild buys nothing,
    // so the damped trigger must stay quiet (the sf1 soak double-fire)
    AnnIndex.appendIvf(spark, idx, mode(5, 3.0))
    val d = AnnIndex.driftStats(spark, idx).get
    assert(d.recentShare > 0.5,
      s"precondition: the modeled mode still concentrates ($d) — " +
        "the damping, not a lucky spread, is what must hold the trigger")
    assert(d.recentErr < 0.5 * d.baselineErr,
      s"precondition: the modeled mode fits far below baseline ($d)")
    assert(!AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      s"a modeled mode must not re-fire the concentration axis ($d)")

    // a SECOND distinct mode — concentrated AND unmodeled — fires on its
    // first batch: the property a time/mass cooldown could not give
    AnnIndex.appendIvf(spark, idx, mode(6, -3.0))
    assert(AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      "a second distinct mode must fire immediately, cooldown or not")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("deletion drift: a skewed purge fires the trigger at compact; an aligned purge never does") {
    val idx = tmp("graft-annspec-purge-drift")
    // corpus = weakly-clustered base (even ids) + a tight modeled mode
    // (odd ids, constant offset), built TOGETHER — the geometry devotes
    // cells to the mode, so gutting it leaves centroids modeling deleted
    // mass. The fit journal is append-driven; without the compact-time
    // purge row this shift would never fire anything.
    val base = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val tightMode = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
    val union = base.unionByName(tightMode)
    val (cents, indexed) = AnnIndex.buildIvf(union, nCells = 16,
      refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)

    // DEEP-BUT-IMMATERIAL purge: take down ONE whole small cell (a tiny
    // source, fully gutted — depth ≈ 1, fraction ≈ nothing); journaled,
    // never fires
    val cellCounts = spark.read.parquet(s"$idx/vectors.parquet")
      .withColumn("cell", col("cell").cast("long"))
      .groupBy("cell").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val smallCell = cellCounts.minBy(_._2)._1
    assert(cellCounts.minBy(_._2)._2 < 0.05 * cellCounts.map(_._2).sum,
      "precondition: the smallest cell is a tiny source")
    AnnIndex.delete(spark, idx,
      spark.read.parquet(s"$idx/vectors.parquet")
        .withColumn("cell", col("cell").cast("long"))
        .filter(col("cell") === smallCell).select("vec_id"),
      token = Some("t-cellkill"))
    AnnIndex.compact(spark, idx)
    val d1 = AnnIndex.driftStats(spark, idx).get
    assert(d1.purges.nonEmpty && d1.purgedDepth > 0.8,
      s"a full cell takedown must journal as DEEP ($d1)")
    assert(d1.purgedFrac < 0.1,
      s"precondition: it is immaterial ($d1)")
    assert(!AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      s"a deep but immaterial purge must not fire ($d1)")

    // MATERIAL-BUT-ALIGNED purge: a 20% distribution-preserving slice —
    // the journal now holds one deep row and one material row, so the
    // FIELD-LEVEL maxes satisfy both halves of the condition while no
    // single purge does: the trigger must stay quiet (the conjunction is
    // per row — the round-16 review regression)
    AnnIndex.delete(spark, idx,
      emb.filter(pmod(col("vec_id"), lit(5)) === 4).select("vec_id"),
      token = Some("t-aligned"))
    AnnIndex.compact(spark, idx)
    val d2 = AnnIndex.driftStats(spark, idx).get
    assert(d2.purgedDepth > 0.3 && d2.purgedFrac > 0.1,
      s"precondition: the cross-row maxes DO satisfy the naive " +
        s"conjunction — the per-row rule is what must hold ($d2)")
    assert(!d2.purges.exists(p => p.depth > 0.3 && p.frac > 0.1),
      s"precondition: no single purge is both material and deep ($d2)")
    assert(!AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      s"two individually-benign purges must not jointly fire ($d2)")

    // SKEWED purge: 40% of the mode — one purge that is BOTH material and
    // deep (the mode's cells lose a large share of their mass); after the
    // compact physically removes it, the trigger must fire
    AnnIndex.delete(spark, idx,
      tightMode.filter(pmod(col("vec_id"), lit(5)) < 2).select("vec_id"),
      token = Some("t-mode"))
    AnnIndex.compact(spark, idx)
    val d3 = AnnIndex.driftStats(spark, idx).get
    assert(d3.purges.exists(p => p.depth > 0.3 && p.frac > 0.1),
      s"the skewed purge must read as material + deep in ONE row ($d3)")
    assert(AnnIndex.maybeRetrain(spark, idx, refineIters = 1),
      s"a skewed material purge must fire the retrain ($d3)")
    assert(AnnIndex.driftStats(spark, idx).isEmpty,
      "the retrain resets the journal, purge rows included")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("purge-only journal (no baseline): a material+deep takedown right " +
      "after an ivfpq build still fires — round-17 advice dead zone") {
    // writeIvfPq starts with NO journal (codes are not invertible, so the
    // build cannot measure its own fit). A takedown before any append used
    // to leave the purge unjournaled (compact only staged the journal when
    // one existed) AND driftStats returned None without a baseline — the
    // purge trigger needs neither.
    val idx = tmp("graft-annspec-purge-bootstrap")
    val base = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val tightMode = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
    val union = base.unionByName(tightMode)
    val (pc, pb, pcodes) = AnnIndex.buildIvfPq(union, nCells = 16,
      kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx, pc, pb, pcodes,
      nCells = 16, m = 8, kCodes = 64, dims = 64)
    assert(AnnIndex.driftStats(spark, idx).isEmpty, "no journal at build")
    AnnIndex.delete(spark, idx,
      tightMode.filter(pmod(col("vec_id"), lit(5)) < 2).select("vec_id"),
      token = Some("t-bootstrap-kill"))
    AnnIndex.compact(spark, idx)
    val d = AnnIndex.driftStats(spark, idx)
    assert(d.exists(s => s.baselinePhase == "none" && s.appendVecs == 0L &&
      s.purges.exists(p => p.depth > 0.3 && p.frac > 0.1)),
      s"a purge-only journal must yield stats with the purge fields ($d)")
    val survivors = union.join(
      tightMode.filter(pmod(col("vec_id"), lit(5)) < 2).select("vec_id"),
      Seq("vec_id"), "left_anti")
    assert(AnnIndex.maybeRetrain(spark, idx, corpus = Some(survivors),
      refineIters = 1),
      "the material+deep takedown must fire without any fit baseline")
    assert(AnnIndex.driftStats(spark, idx).isEmpty,
      "the retrain resets the journal")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("probe staleness: growth hides the stored curve, maybeCompact re-profiles, the auto surface re-anchors on demand") {
    val idx = tmp("graft-annspec-probestale")
    val base = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
      refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
    val p0 = AnnIndex.profileProbes(spark, idx, k = 3, sampleQ = 64)
    assert(AnnIndex.storedProbeProfile(spark, idx, 3).contains(p0),
      "a fresh profile is served")
    // frozen-geometry appends TRIPLE the corpus: same centroids, but the
    // occupancy the curve's candidates/query encodes no longer exists —
    // the stored curve must stop being served (profiles are only wiped by
    // rebuild/retrain, which never ran)
    AnnIndex.appendIvf(spark, idx, delta)
    assert(AnnIndex.storedProbeProfile(spark, idx, 3).isEmpty,
      "a tripled corpus must hide the stale curve")
    // the maintenance path re-anchors it: the append fragmented past the
    // factor, so maybeCompact compacts AND re-profiles every stored k
    assert(AnnIndex.maybeCompact(spark, idx, factor = 1))
    val refreshed = AnnIndex.storedProbeProfile(spark, idx, 3)
    assert(refreshed.isDefined, "maybeCompact must refresh the stale curve")
    assert(refreshed.get != p0,
      "the refreshed curve is a new measurement, not the stale one re-served")
    // the auto surface stays bit-identical to a fixed search at its pick
    val (auto, chosen) = AnnIndex.searchIvfAuto(spark, idx, q10, 3,
      targetRecall = 0.8, candidateBudgetFrac = 0.5)
    assert(auto.collect().map(_.toString).toSet ==
      AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = chosen)
        .collect().map(_.toString).toSet)
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("generation pinning: pinned searches reproduce superseded states, retractions pass through, GC refuses") {
    val idx = tmp("graft-annspec-genpin")
    def liveSearch() = AnnIndex.searchIvf(spark, idx, q10, 3, nprobe = 4)
      .collect().map(_.toString).toSet
    def pinned(g: Int) = AnnIndex.searchIvfAt(spark, idx, g, q10, 3,
      nprobe = 4).collect().map(_.toString).toSet
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 2)
    val aligned = emb.filter(pmod(col("vec_id"), lit(4)) === 2)
    val drifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 16,
      refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
    assert(AnnIndex.currentGeneration(idx) == 0)

    // generation 0 accumulates an append, then freezes at the compact
    AnnIndex.appendIvf(spark, idx, aligned)
    val endG0 = liveSearch()
    AnnIndex.compact(spark, idx, retainGenerations = Some(2))
    assert(AnnIndex.currentGeneration(idx) == 1)
    // generation 1 accumulates the drifted append, then a RETRAIN
    // replaces the whole trained set
    AnnIndex.appendIvf(spark, idx, drifted)
    val endG1 = liveSearch()
    AnnIndex.retrain(spark, idx, refineIters = 1, retainGenerations = Some(2))
    assert(AnnIndex.currentGeneration(idx) == 2)
    assert(liveSearch() != endG1,
      "precondition: the retrain moved the geometry — the pin is real")

    // pinned searches reproduce each superseded state exactly: gen 1 =
    // old geometry + all rows (the retrain's pre-image), gen 0 = old
    // geometry + pre-drift rows (copy-on-write: centroids resolve through
    // the retrain archive, vectors through the compact archive)
    assert(pinned(1) == endG1, "searchIvfAt(1) must be the pre-retrain search")
    assert(pinned(0) == endG0, "searchIvfAt(0) must be the end-of-gen-0 search")
    assert(pinned(2) == liveSearch(), "the current generation is the live search")

    // a retraction journaled NOW passes through every pinned view — a
    // takedown never resurfaces via a historical search
    val dead = 4L
    assert(AnnIndex.delete(spark, idx, emb.filter(col("vec_id") === dead)
      .select("vec_id"), token = Some("gp-kill")))
    val memG0 = Similarity.ivfSearch(cents,
      Similarity.ivfAssign(
        base.unionByName(aligned).filter(col("vec_id") =!= dead), cents),
      q10, 3, nprobe = 4).collect().map(_.toString).toSet
    assert(pinned(0) == memG0,
      "a pending retraction must pass through the pinned search")

    // the compact that applies the retraction RETIRES its batch into the
    // archive: pinned reads at or below the applying generation keep
    // subtracting it even after the journal is swept
    AnnIndex.compact(spark, idx, retainGenerations = Some(1))
    assert(AnnIndex.currentGeneration(idx) == 3)
    assert(AnnIndex.pendingTombstoneBatches(idx).isEmpty)
    assert(pinned(2) == liveSearch(),
      "the retired tombstone must keep passing through the gen-2 pin")

    // retention 1 swept generations 0 and 1 — pinning them refuses loudly
    // with the window and the knob named
    for (g <- Seq(0, 1)) {
      val e = intercept[IllegalArgumentException] { pinned(g) }
      assert(e.getMessage.contains("retainGenerations"), e.getMessage)
    }

    // retention is a PERSISTED store setting: an explicit window survives
    // later default-knob maintenance (the review-pass footgun — a
    // streaming ingest's maybeCompact/maybeRetrain must never GC a window
    // the operator explicitly paid to retain)
    assert(AnnIndex.retentionSetting(idx) == 1)
    AnnIndex.compact(spark, idx, retainGenerations = Some(3)) // persists 3
    AnnIndex.compact(spark, idx) // default knobs — inherits, never shrinks
    assert(AnnIndex.retentionSetting(idx) == 3)
    assert(AnnIndex.retainedGenerations(idx) == Seq(2, 3, 4),
      "a default-knob compact must honor the persisted retention window")
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("generation pinning (ivfpq): the retrained-over codes search is reproducible at its pre-image") {
    val idx = tmp("graft-annspec-genpin-pq")
    val base = emb.filter(pmod(col("vec_id"), lit(4)) < 3)
    val drifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
    val union = base.unionByName(drifted)
    val (cents, books, codes) = AnnIndex.buildIvfPq(base, nCells = 16,
      kCodes = 64, refineIters = 1)
    AnnIndex.writeIvfPq(idx, cents, books, codes, nCells = 16, m = 8,
      kCodes = 64, dims = 64)
    AnnIndex.appendIvfPq(spark, idx, drifted)
    def search() = AnnIndex.searchIvfPq(spark, idx, q10, 3, nprobe = 8)
      .collect().map(_.toString).toSet
    val endG0 = search()
    // profile BEFORE the freeze (ivfpq needs the raw corpus — codes are
    // not invertible) so the generation archives a probe curve and the
    // pinned AUTO search below can size itself as-of the pin (round 17)
    AnnIndex.profileProbes(spark, idx, k = 3, sampleQ = 64,
      corpus = Some(base.unionByName(drifted)))
    val livePick = AnnIndex.autoNprobe(spark, idx, k = 3,
      targetRecall = 0.8, candidateBudgetFrac = 0.5,
      corpus = Some(base.unionByName(drifted)))
    AnnIndex.retrain(spark, idx, corpus = Some(union), refineIters = 1,
      retainGenerations = Some(1))
    assert(search() != endG0, "precondition: the retrain moved the codes")
    assert(AnnIndex.searchIvfPqAt(spark, idx, 0, q10, 3, nprobe = 8)
      .collect().map(_.toString).toSet == endG0,
      "searchIvfPqAt(0) must reproduce the pre-retrain search")
    // pinned auto sizing on the hybrid family: the archived curve
    // re-picks the capture-time nprobe, and the pinned auto search is
    // bit-identical to the pinned fixed search at that pick
    assert(AnnIndex.autoNprobeAt(spark, idx, 0, k = 3, targetRecall = 0.8,
      candidateBudgetFrac = 0.5) == livePick,
      "the archived ivfpq curve must re-pick the capture-time nprobe")
    val (autoDf, chosen) = AnnIndex.searchIvfPqAutoAt(spark, idx, 0, q10,
      3, targetRecall = 0.8, candidateBudgetFrac = 0.5)
    assert(chosen == livePick)
    assert(autoDf.collect().map(_.toString).toSet ==
      AnnIndex.searchIvfPqAt(spark, idx, 0, q10, 3, nprobe = chosen)
        .collect().map(_.toString).toSet,
      "pinned ivfpq auto search must equal the pinned fixed search")
    graft.perf.Measure.deleteRecursively(idx)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AnnIndex, CorpusCompact, CorpusStore, RunManifest,
  ShingleIndex}

/** Cross-store run manifest (round-17 judge task 1): capture pins the
  * EXACT capture-time state (generation + immutable part-file listing) of
  * corpus / screen index / ANN indexes as one named artifact; replay
  * resolves every pinned reader from it, bit-identically, after
  * maintenance has moved the live stores — with retractions passing
  * through and loud member-naming refusal once a pin falls out of
  * retention. The oracle-gated end-to-end face is `q_run_manifest`; this
  * spec pins the artifact semantics (immutability, exact-file vs
  * generation pinning, member-naming errors, identity gates). */
class RunManifestSpec extends AnyFunSuite {
  import SharedSpark._

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private def ids(d: org.apache.spark.sql.DataFrame) =
    d.select("doc_id").collect().map(_.getLong(0)).toSet

  test("capture/load roundtrip; names are immutable run identities") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-manifest-rt").toString
    CorpusStore.init(dir)
    CorpusStore.append(spark, dir, docs(Seq((1L, "a"), (2L, "b"))))
    val m = RunManifest.capture(spark, dir, "run-a", withShingle = false)
    assert(m.corpus.gen == 1L && m.corpus.files.nonEmpty)
    assert(RunManifest.list(dir) == Seq("run-a"))
    val loaded = RunManifest.load(dir, "run-a")
    assert(loaded == m, "load must roundtrip the captured pins exactly")
    // identical re-capture (a crashed step retrying) is a no-op...
    assert(RunManifest.capture(spark, dir, "run-a",
      withShingle = false) == m)
    // ...but once the store moved, the same name refuses
    CorpusStore.append(spark, dir, docs(Seq((3L, "c"))))
    val e = intercept[IllegalStateException] {
      RunManifest.capture(spark, dir, "run-a", withShingle = false) }
    assert(e.getMessage.contains("immutable"))
    // unknown name names what IS captured
    val e2 = intercept[IllegalArgumentException] {
      RunManifest.load(dir, "nope") }
    assert(e2.getMessage.contains("run-a"))
    graft.perf.Measure.deleteRecursively(dir)
  }

  test("exact-file corpus pin replays the capture-time row set even after " +
      "later appends land in the same generation (readAt serves the " +
      "frozen superset)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-manifest-exact").toString
    CorpusStore.init(dir)
    CorpusStore.append(spark, dir, docs(Seq((1L, "a"), (2L, "b"))))
    val m = RunManifest.capture(spark, dir, "mid-gen", withShingle = false)
    // the generation keeps growing AFTER capture...
    CorpusStore.append(spark, dir, docs(Seq((3L, "late"))))
    // ...and then maintenance freezes it (gen 1 archive = {1,2,3})
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 2)
    assert(ids(RunManifest.readCorpus(spark, m)) == Set(1L, 2L),
      "the manifest must replay the CAPTURE-time rows, not the frozen " +
        "generation's superset")
    assert(ids(CorpusStore.readAt(spark, dir, 1L)) == Set(1L, 2L, 3L),
      "generation-level pinning serves the frozen state — the exact-file " +
        "pin is strictly stronger")
    // a retraction AFTER capture passes through the pinned view
    CorpusCompact.tombstone(spark, dir, docs(Seq((2L, "x"))).select("doc_id"),
      token = Some("mt"))
    assert(ids(RunManifest.readCorpus(spark, m)) == Set(1L))
    // ...including once it is APPLIED and the journal swept
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 2)
    assert(CorpusCompact.pendingTombstoneBatches(dir).isEmpty)
    assert(ids(RunManifest.readCorpus(spark, m)) == Set(1L))
    // review regression (round 17): a capture taken AFTER a
    // tombstone-applying compaction must not sweep the new generation's
    // _applied_tombs part files into the pin as data — an explicit-path
    // read has no hidden-file filter, so the listing itself must exclude
    // `_`/`.` components, or the replay resurfaces the RETRACTED doc_ids
    // as null-filled phantom rows
    val m2 = RunManifest.capture(spark, dir, "post-apply",
      withShingle = false)
    assert(m2.corpus.files.forall(f => !f.contains("_applied_tombs")),
      s"tombstone archive leaked into the pin listing: ${m2.corpus.files}")
    assert(ids(RunManifest.readCorpus(spark, m2)) == Set(1L, 3L),
      "a post-apply capture must replay the surviving rows only — never " +
        "the retracted doc_ids from the generation's own tombstone archive")
    // GC the pinned generation: validate + replay refuse NAMING the member
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 1)
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 1)
    val e = intercept[IllegalStateException] {
      RunManifest.validate(spark, m) }
    assert(e.getMessage.contains("corpus") &&
      e.getMessage.contains(dir))
    intercept[IllegalArgumentException] { RunManifest.readCorpus(spark, m) }
    graft.perf.Measure.deleteRecursively(dir)
  }

  test("ANN pin: capture-time search replays after append + retrain; " +
      "retractions pass through; GC refuses naming the ann member") {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(pmod(col("vec_id"), lit(4)) < 3)
    val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
    val q = e.filter(col("vec_id") < 8)
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-manifest-annc").toString
    val idx = java.nio.file.Files
      .createTempDirectory("graft-manifest-ann").toString
    CorpusStore.init(corpusDir)
    CorpusStore.append(spark, corpusDir, docs(Seq((1L, "a"))))
    val (cents, indexed) = AnnIndex.buildIvf(base, nCells = 8,
      refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 8)
    val m = RunManifest.capture(spark, corpusDir, "ann-run",
      annDirs = Seq(idx), withShingle = false)
    assert(m.ann.head.kind == "ivf" && m.ann.head.gen == 0)
    val atDf = AnnIndex.searchIvf(spark, idx, q, 3, nprobe = 3)
    val at = atDf.collect().map(_.toString).toSet
    val dead = atDf.select("cid").head().getLong(0)
    // the index moves on: append INTO generation 0, then retrain (gen 1)
    AnnIndex.appendIvf(spark, idx, delta)
    AnnIndex.retrain(spark, idx, refineIters = 1,
      retainGenerations = Some(2))
    val moved = AnnIndex.searchIvf(spark, idx, q, 3, nprobe = 3)
      .collect().map(_.toString).toSet
    assert(moved != at, "the live search must have moved (else the spec " +
      "proves nothing)")
    val replay = RunManifest.searchAnn(spark, m, idx, q, 3, nprobe = 3)
      .collect().map(_.toString).toSet
    assert(replay == at,
      "manifest replay must equal the capture-time search bit-for-bit — " +
        "the appended delta landed in the pinned generation and must NOT " +
        "appear")
    // a retraction after capture drops out of the pinned view
    import spark.implicits._
    AnnIndex.delete(spark, idx, Seq(dead).toDF("vec_id"),
      token = Some("manifest-kill"))
    val replay2 = RunManifest.searchAnn(spark, m, idx, q, 3, nprobe = 3)
    assert(replay2.filter(col("cid") === dead).count() == 0L,
      "a retracted vec_id must not resurface through the manifest replay")
    // wrong dir refuses naming the members
    val e3 = intercept[IllegalArgumentException] {
      RunManifest.searchAnn(spark, m, "/nope", q, 3) }
    assert(e3.getMessage.contains(idx))
    // GC the pinned generation (retention 0 sweeps the archive wholesale)
    AnnIndex.compact(spark, idx, retainGenerations = Some(0))
    val e4 = intercept[IllegalStateException] {
      RunManifest.validate(spark, m) }
    assert(e4.getMessage.contains("ann") && e4.getMessage.contains(idx))
    graft.perf.Measure.deleteRecursively(idx)
    graft.perf.Measure.deleteRecursively(corpusDir)
  }

  test("lsh + pq manifest pins: all four ANN families replay; retractions " +
      "pass through the pinned views") {
    import spark.implicits._
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(pmod(col("vec_id"), lit(4)) < 3)
    val delta = e.filter(pmod(col("vec_id"), lit(4)) === 3)
    val q = e.filter(col("vec_id") < 8)
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-manifest-lshc").toString
    CorpusStore.init(corpusDir)
    CorpusStore.append(spark, corpusDir, docs(Seq((1L, "a"))))
    // ── lsh: deterministic geometry, TWO fragmenting artifacts ──────────
    val lshIdx = java.nio.file.Files
      .createTempDirectory("graft-manifest-lsh").toString
    val (keys, vecs) = AnnIndex.buildLsh(base, planes = 5, tables = 4)
    AnnIndex.writeLsh(lshIdx, keys, vecs, planes = 5, dims = 64, tables = 4)
    // ── pq: flat codes, write-once codebooks ────────────────────────────
    val pqIdx = java.nio.file.Files
      .createTempDirectory("graft-manifest-pq").toString
    val (books, codes) = AnnIndex.buildPq(base, kCodes = 16, refineIters = 1)
    AnnIndex.writePq(pqIdx, books, codes, m = 8, kCodes = 16, dims = 64)
    val m = RunManifest.capture(spark, corpusDir, "lshpq-run",
      annDirs = Seq(lshIdx, pqIdx), withShingle = false)
    assert(m.ann.map(_.kind) == Seq("lsh", "pq"))
    assert(m.ann.head.files2.nonEmpty, "lsh pins BOTH artifacts")
    val lshAt = AnnIndex.searchLsh(spark, lshIdx, q, 3)
      .collect().map(_.toString).toSet
    val pqAt = AnnIndex.searchPq(spark, pqIdx, q, 3)
      .collect().map(_.toString).toSet
    assert(lshAt.nonEmpty && pqAt.nonEmpty, "capture-time searches return")
    // both stores move on: lsh appends (both artifacts fragment) then
    // compacts (archives the pre-images); pq retracts then compacts
    AnnIndex.appendLsh(spark, lshIdx, delta)
    AnnIndex.compact(spark, lshIdx)
    val deadVec = AnnIndex.searchPq(spark, pqIdx, q, 3)
      .select("cid").head().getLong(0)
    AnnIndex.delete(spark, pqIdx, Seq(deadVec).toDF("vec_id"),
      token = Some("lshpq-kill"))
    AnnIndex.compact(spark, pqIdx)
    // manifest round-trips through disk and replays both families
    val loaded = RunManifest.load(corpusDir, "lshpq-run")
    RunManifest.validate(spark, loaded)
    val lshReplay = RunManifest.searchAnn(spark, loaded, lshIdx, q, 3)
      .collect().map(_.toString).toSet
    assert(lshReplay == lshAt,
      "pinned lsh search must equal the capture-time search — the " +
        "appended delta landed before the freeze and must not appear")
    val pqReplay = RunManifest.searchAnn(spark, loaded, pqIdx, q, 3)
      .collect().map(_.toString).toSet
    // replay ≡ the capture-time state minus the retraction: an in-memory
    // search over the captured codes with the dead vec removed (the next
    // best candidate legitimately enters the top-k)
    val pqExpect = graft.ext.Similarity.pqSearch(books,
      codes.filter(col("vec_id") =!= deadVec), q, 3, m = 8, dims = 64)
      .collect().map(_.toString).toSet
    assert(pqReplay == pqExpect,
      "pinned pq replay must equal the capture-time codes minus the " +
        "retraction — even though the journal batch was applied and swept")
    graft.perf.Measure.deleteRecursively(lshIdx)
    graft.perf.Measure.deleteRecursively(pqIdx)
    graft.perf.Measure.deleteRecursively(corpusDir)
  }

  test("shingle pin: current-generation replay subsets to captured files; " +
      "a re-registered identity refuses") {
    import spark.implicits._
    val tag = "manifest#shingle"
    val d = docs((1L to 40L).map(i => (i, s"alpha beta gamma delta tok$i " +
      s"epsilon zeta eta theta word${i % 7} iota kappa")))
    val sh = graft.ext.Dedup.hashedShingles(d, "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle")
    ShingleIndex.registerDocs(spark, tag, sh, buckets = 2, withBands = true)
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-manifest-shc").toString
    CorpusStore.init(corpusDir)
    CorpusStore.append(spark, corpusDir, d)
    val m = RunManifest.capture(spark, corpusDir, "shingle-run")
    assert(m.shingle.isDefined)
    // the index moves on WITHIN the generation (append bumps the marker's
    // append counter but not the identity)
    val d2 = docs(Seq((900L, "completely different content here now")))
    ShingleIndex.append(spark, d2, token = Some("post-capture"))
    val idx = RunManifest.screenIndex(spark, m).get
    assert(ids(idx.postings.select("doc_id")) == (1L to 40L).toSet,
      "the pinned screen must hold exactly the capture-time docs — the " +
        "post-capture append must not appear")
    assert(ids(idx.bands.select("doc_id")) == (1L to 40L).toSet)
    // a re-register is a NEW index identity: the pin refuses
    ShingleIndex.registerDocs(spark, tag + "2", sh, buckets = 2,
      withBands = true)
    val e = intercept[Exception] { RunManifest.screenIndex(spark, m) }
    assert(e.getMessage.contains("identity") ||
      e.getMessage.contains("registered"))
    graft.perf.Measure.deleteRecursively(corpusDir)
  }
}

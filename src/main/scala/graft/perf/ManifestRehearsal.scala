package graft.perf

import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, CorpusStore, Dedup, RunManifest, ShingleIndex}

/** Run-manifest scale rehearsal (round 17 — the measurement half of the
  * cross-store manifest): capture cost, artifact size, and replay overhead
  * on the sf-sized stores, before AND after maintenance moves all three
  * (the archived-resolution path). What the numbers must support:
  *
  *   - capture is LISTING-cost: two directory walks per member (the
  *     double-read tripwire) plus one atomic file write — no data scans,
  *     no shuffles; wall should sit in O(file count), not O(rows);
  *   - the manifest artifact is small: bytes ≈ Σ file-name lengths;
  *   - a pinned replay pays the same query shape as the live path (the
  *     explicit file list replaces the directory listing) — the overhead
  *     is planner-side, bounded, and does not grow with corpus rows.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_INGEST_BATCHES
  * (corpus append batches, default 4). One JSON line. */
object ManifestRehearsal {

  import Measure.{median, time}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_INGEST_BATCHES", "4").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Measure.warehouseDir("manifest"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)
    val docs = spark.table("documents").select(col("doc_id"), col("text"))
    val emb = spark.table("embeddings")
      .select(col("vec_id"), col("embedding"))

    // ── build the three stores (batched appends → realistic file counts) ─
    val corpus = java.nio.file.Files
      .createTempDirectory("graft-manifest-rehearsal-c").toString
    val annIdx = java.nio.file.Files
      .createTempDirectory("graft-manifest-rehearsal-a").toString
    CorpusStore.init(corpus)
    (0 until nBatches).foreach(i => CorpusStore.append(spark, corpus,
      docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)))
    ShingleIndex.registerDocs(spark, corpus,
      Dedup.hashedShingles(docs, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle"),
      buckets = 16, withBands = true)
    val (cents, indexed) = AnnIndex.buildIvf(emb, refineIters = 1)
    AnnIndex.writeIvf(annIdx, cents, indexed)
    AnnIndex.setRetention(annIdx, 2)

    // ── capture + validate cost ──────────────────────────────────────────
    var m: RunManifest.Manifest = null
    val captureSec = time {
      m = RunManifest.capture(spark, corpus, "rehearsal-run",
        annDirs = Seq(annIdx))
    }
    val manifestBytes = java.nio.file.Files.size(java.nio.file.Paths.get(
      corpus, "_graft_manifests", "rehearsal-run"))
    val validateSec = time { RunManifest.validate(spark, m) }

    // ── replay vs live, pre-maintenance (pins resolve to LIVE dirs) ─────
    val q = emb.filter(col("vec_id") < 32)
    def wall(f: => org.apache.spark.sql.DataFrame): Double =
      median((1 to 3).map(_ => time { f.collect(); () }))
    val liveSearch = wall(AnnIndex.searchIvf(spark, annIdx, q, 10, 4))
    val pinSearchLive = wall(RunManifest.searchAnn(spark, m, annIdx, q, 10, 4))
    val liveRead = wall(CorpusStore.read(spark, corpus))
    val pinReadLive = wall(RunManifest.readCorpus(spark, m))

    // ── maintenance moves ALL THREE stores; replay resolves archives ────
    val maintSec = time {
      CorpusStore.compactSnapshot(spark, corpus, graceGenerations = 2)
      ShingleIndex.compact(spark)
      AnnIndex.retrain(spark, annIdx, refineIters = 1)
    }
    val pinSearchArchived = wall(RunManifest.searchAnn(spark, m, annIdx,
      q, 10, 4))
    val pinReadArchived = wall(RunManifest.readCorpus(spark, m))
    val screenOk = RunManifest.screenIndex(spark, m).isDefined

    def f2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"manifest_rehearsal","sf":"$sfDir",""" +
      s""""corpus_files":${m.corpus.files.size},""" +
      s""""shingle_files":${m.shingle.map(p =>
        p.postings.size + p.bands.size).getOrElse(0)},""" +
      s""""ann_files":${m.ann.map(p =>
        p.files.size + p.files2.size).sum},""" +
      s""""manifest_bytes":$manifestBytes,""" +
      s""""capture_sec":${f2(captureSec)},""" +
      s""""validate_sec":${f2(validateSec)},""" +
      s""""live_search_sec":${f2(liveSearch)},""" +
      s""""pin_search_live_sec":${f2(pinSearchLive)},""" +
      s""""pin_search_archived_sec":${f2(pinSearchArchived)},""" +
      s""""live_corpus_read_sec":${f2(liveRead)},""" +
      s""""pin_corpus_read_live_sec":${f2(pinReadLive)},""" +
      s""""pin_corpus_read_archived_sec":${f2(pinReadArchived)},""" +
      s""""maintenance_sec":${f2(maintSec)},""" +
      s""""screen_replay_resolves":$screenOk}""")
    Measure.deleteRecursively(annIdx)
    Measure.deleteRecursively(corpus)
    spark.stop()
  }
}

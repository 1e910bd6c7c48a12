package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-ingest rehearsal (round 13): drive the REAL near-dup ingest
  * body ([[graft.streaming.DocsStream.ingestStep]], band-backed stored
  * index) for N consecutive batches and measure per-batch wall clock as
  * the corpus + index GROW — the number the auto-maintenance exists to
  * keep flat. Two bindings, fresh JVM each (the A/B protocol):
  *
  *   SPARK_GRAFT_INGEST_MAINT=off   no compaction: every batch adds ~1
  *                                  file per postings bucket + 1 corpus
  *                                  file, and the per-batch cost drifts up
  *                                  with the file count;
  *   SPARK_GRAFT_INGEST_MAINT=on    `autoCompactFactor` wired (default 4):
  *                                  the ingest compacts its own stores
  *                                  when they fragment past factor × their
  *                                  build shape.
  *
  * Reported: median batch seconds over the FIRST and LAST `window`
  * batches (the drift), total wall, and final file counts for postings /
  * bands / corpus. Env: SPARK_GRAFT_SF_DIR (document source, sliced into
  * batches by doc_id), SPARK_GRAFT_INGEST_BATCHES (default 30),
  * SPARK_GRAFT_INGEST_FACTOR (default 4), SPARK_GRAFT_CPUS. One JSON
  * line. */
object IngestRehearsal {

  import Measure.{median, time}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_INGEST_BATCHES", "30").toInt
    val factor = sys.env.getOrElse("SPARK_GRAFT_INGEST_FACTOR", "4").toInt
    val maint = !sys.env.get("SPARK_GRAFT_INGEST_MAINT").contains("off")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.warehouse.dir",
        Measure.warehouseDir("ingest"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)
    import graft.ext.{CorpusCompact, ShingleIndex}
    import spark.implicits._

    // SPARK_GRAFT_INGEST_STORE=snap runs the identical soak on a
    // snapshot-mode corpus (round-14 task 3) — the A/B pins the
    // reader-consistency mechanism's overhead next to the flat numbers
    val storeMode = sys.env.getOrElse("SPARK_GRAFT_INGEST_STORE", "flat")
    require(Set("flat", "snap").contains(storeMode),
      s"SPARK_GRAFT_INGEST_STORE must be flat|snap, got $storeMode")
    val corpus = java.nio.file.Files
      .createTempDirectory("graft-ingest-soak").toString
    if (storeMode == "snap") graft.ext.CorpusStore.init(corpus)
    for (t <- Seq(ShingleIndex.tableName, ShingleIndex.bandsTableName)) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        t).toString)
    }
    ShingleIndex.registerDocs(spark, corpus,
      Seq.empty[(Long, Long)].toDF("doc_id", "shingle"),
      buckets = 64, withBands = true)

    // SPARK_GRAFT_INGEST_LEASE=on brackets the soak in a writer lease and
    // renews it at every batch start (round 14) — the A/B prices the
    // fencing heartbeat (one marker read + atomic rewrite per batch)
    // TTL sized per WriterLease's own guidance — above the worst batch
    // time, since the soak renews only at batch start: a batch outrunning
    // the TTL would make the next renew throw EXPIRED with no concurrent
    // writer present. 10 min default clears every observed sf10 batch.
    val leaseTtlMs = sys.env.getOrElse(
      "SPARK_GRAFT_INGEST_LEASE_TTL_MS", "600000").toLong
    val lease = if (sys.env.get("SPARK_GRAFT_INGEST_LEASE").contains("on"))
      Some(graft.ext.WriterLease.acquire(corpus, "ingest-soak", leaseTtlMs))
    else None

    val docs = spark.table("documents").select("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("soak"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val step = graft.streaming.DocsStream.ingestStep(corpus, 0.8,
      if (maint) Some(factor) else None, lease)
    val batchSec = try {
      (0 until nBatches).map { i =>
        val b = docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
        time { step(b, i.toLong) }
      }
    } finally lease.foreach(graft.ext.WriterLease.release)

    val window = math.max(3, nBatches / 10)
    val (pf, bf) = ShingleIndex.fileCounts(spark)
    val cf = CorpusCompact.fileCount(graft.ext.CorpusStore.resolve(corpus))
    def f2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"ingest_soak","sf":"$sfDir","batches":$nBatches,""" +
      s""""maintenance":$maint,"factor":$factor,"store":"$storeMode",""" +
      s""""lease":${lease.isDefined},""" +
      s""""first_batches_sec":${f2(median(batchSec.take(window)))},""" +
      s""""last_batches_sec":${f2(median(batchSec.takeRight(window)))},""" +
      s""""total_sec":${f2(batchSec.sum)},""" +
      s""""files":{"postings":$pf,"bands":$bf,"corpus":$cf}}""")
    Measure.deleteRecursively(corpus)
    spark.stop()
  }
}

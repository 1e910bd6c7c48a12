package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion-cost rehearsal (round-14 judge task 1d): what do PENDING
  * tombstones cost readers of the stored shingle index, and does the
  * compaction that applies them return reads to baseline?
  *
  * Protocol: register the band-backed index over the sf documents corpus,
  * measure two routed read shapes at baseline, journal
  * `SPARK_GRAFT_TOMB_BATCHES` (default 10) delete batches of ~1% of the
  * corpus each (every batch adds one anti-join input to every
  * tombstone-aware read), re-measure with the journal pending, compact
  * (applies + sweeps), re-measure. The two read shapes:
  *
  *   - `screen`: one indexed ingest-screen batch
  *     ([[graft.ext.Dedup.incrementalMinhashPairsIndexed]] over
  *     [[graft.ext.ShingleIndex.liveFor]] — the per-batch cost a streaming
  *     consumer pays forever);
  *   - `dfagg`: the postings document-frequency aggregate over
  *     [[graft.ext.ShingleIndex.postings]] (the widest corpus-shaped scan
  *     every dedup face starts with).
  *
  * Medians over `SPARK_GRAFT_TOMB_RUNS` (default 3) runs per phase. One
  * JSON line. Own warehouse root (Measure.warehouseDir) — safe to run
  * concurrently with Verify. */
object TombstoneRehearsal {

  import Measure.{median, sink, time}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_TOMB_BATCHES", "10").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_TOMB_RUNS", "3").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_TOMB_BUCKETS", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.warehouse.dir", Measure.warehouseDir("tombstone"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)
    import graft.ext.{Dedup, ShingleIndex}

    // fresh registration every run: the rehearsal measures read phases, so
    // the write must not be amortized away into a stale reattach of a
    // previous run's (already deleted-from) index
    for (t <- Seq(ShingleIndex.tableName, ShingleIndex.bandsTableName)) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        t).toString)
    }
    Measure.deleteRecursively(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      ShingleIndex.tombstonesDirName).toString)
    val docs = spark.table("documents")
    ShingleIndex.registerDocs(spark, sfDir,
      ShingleIndex.derive(spark, sfDir), buckets, withBands = true)

    val docIds = docs.select("doc_id")
    val delta = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))

    def screenOnce(): Unit = {
      val idx = ShingleIndex.liveFor(spark, sfDir).getOrElse(
        throw new IllegalStateException("index not live"))
      val (pairs, release) = Dedup.incrementalMinhashPairsIndexed(
        delta, docIds, idx, "doc_id", "text", 0.8)
      try sink(pairs) finally release()
    }
    def dfaggOnce(): Unit =
      sink(ShingleIndex.postings(spark).groupBy("shingle")
        .agg(count(lit(1)).as("__df")).filter(col("__df") > 1000000))

    def phase(): (Double, Double) = (
      median((1 to runs).map(_ => time(screenOnce()))),
      median((1 to runs).map(_ => time(dfaggOnce()))))

    val (screen0, dfagg0) = phase()

    // journal nBatches delete batches, ~1% of the corpus each (disjoint)
    (0 until nBatches).foreach { i =>
      ShingleIndex.delete(spark,
        docs.filter(pmod(col("doc_id"), lit(100)) === i).select("doc_id"),
        token = Some(s"reh-$i"))
    }
    val (screenP, dfaggP) = phase()

    val compactSec = ShingleIndex.compact(spark)
    require(ShingleIndex.pendingTombstoneBatches(spark).isEmpty,
      "compaction must sweep the applied journal")
    val (screenA, dfaggA) = phase()
    val (pf, bf) = ShingleIndex.fileCounts(spark)

    def f2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"tombstone_read_cost","sf":"$sfDir",""" +
      s""""tomb_batches":$nBatches,"runs":$runs,"buckets":$buckets,""" +
      s""""screen_sec":{"baseline":${f2(screen0)},"pending":${f2(screenP)},""" +
      s""""applied":${f2(screenA)}},""" +
      s""""dfagg_sec":{"baseline":${f2(dfagg0)},"pending":${f2(dfaggP)},""" +
      s""""applied":${f2(dfaggA)}},""" +
      s""""compact_sec":${f2(compactSec)},""" +
      s""""files":{"postings":$pf,"bands":$bf}}""")
    spark.stop()
  }
}

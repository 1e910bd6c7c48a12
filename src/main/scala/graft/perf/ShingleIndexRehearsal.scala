package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, ShingleIndex}

/** Stored shingle index at scale (round-11 judge task 1, measurement
  * half): one timed index write, a timed marker reattach (must be ~0),
  * the three routed dedup operators measured on the STORED bucketed
  * relation vs the plain per-query derivation, and the O(delta) append
  * cost for a 1% document delta. CorpusLayoutRehearsal measured the
  * containment face on a rehearsal-scoped bucketed table last round
  * (~2.3×); this main measures the PRODUCTION mode (ShingleIndex routing)
  * across all three operators. One JSON line.
  *
  * Env: SPARK_GRAFT_SF_DIR (default scaledata/sf10), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_ADV_BUCKETS (default 64),
  * SPARK_GRAFT_ADV_RUNS (default 3).
  *
  * SPARK_GRAFT_SHINGLE_MODE (round 12 — the triangle-sweep fresh-JVM
  * lesson applied here): `all` (default) runs everything in one JVM;
  * `stored` / `derived` measure ONLY that binding's three operators so an
  * A/B can run each binding in its own JVM (shared-JVM ordering favors
  * whichever binding runs second — JIT, code cache, broadcast reuse;
  * round-12's in-JVM decontaminate numbers inverted round-11's, which is
  * what this knob exists to settle). `stored` reattaches (or writes) the
  * index first; `derived` touches no index state. */
object ShingleIndexRehearsal {

  import Measure.{sink, time, median}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_ADV_BUCKETS", "64").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_ADV_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.warehouse.dir",
        Measure.warehouseDir("shingle-index"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)

    val mode = sys.env.getOrElse("SPARK_GRAFT_SHINGLE_MODE", "all")
    // SPARK_GRAFT_SHINGLE_PRUNE=<frac> (round-14 task 5): register with a
    // boilerplate df bound — bands build over postings-minus-stop (the
    // screen's candidate axis) and the prefix ops take the stop set as the
    // exact broadcast df-split. 0 = off (the control binding).
    val pruneFrac = sys.env.getOrElse("SPARK_GRAFT_SHINGLE_PRUNE", "0").toDouble
    // SPARK_GRAFT_SHINGLE_AUTOPRUNE=off disables the round-15 band-
    // saturation auto-guard — the A/B control binding that reproduces the
    // round-14 prune-off behavior (the measured sf10b driver abort). The
    // DEFAULT binding now runs the guard: zero knobs must be green.
    val autoPruneOn =
      !sys.env.get("SPARK_GRAFT_SHINGLE_AUTOPRUNE").contains("off")
    require(Set("all", "stored", "derived", "compact").contains(mode),
      s"SPARK_GRAFT_SHINGLE_MODE must be all|stored|derived|compact, got $mode")

    // SPARK_GRAFT_SHINGLE_MODE=compact (round 13 — the append-fragmentation
    // telemetry the compact operator exists to bound): fresh band-backed
    // index, N append batches (SPARK_GRAFT_APPENDS, default 20 × ~1% of the
    // corpus each), then file counts + the per-batch indexed ingest-screen
    // latency BEFORE and AFTER one compaction. One JSON line, then exit
    // (fresh-JVM protocol — run this in its own JVM like stored/derived).
    if (mode == "compact") {
      import graft.ext.ShingleIndex.{tableName, bandsTableName}
      for (t <- Seq(tableName, bandsTableName)) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        Measure.deleteRecursively(java.nio.file.Paths.get(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
          t).toString)
      }
      val writeSec = ShingleIndex.registerDocs(spark, sfDir,
        ShingleIndex.derive(spark, sfDir), buckets, withBands = true,
        pruneDfFrac = pruneFrac, autoPrune = autoPruneOn)
      val docs = spark.table("documents")
      val nAppends = sys.env.getOrElse("SPARK_GRAFT_APPENDS", "20").toInt
      val appendSec = (0 until nAppends).map { i =>
        // disjoint deterministic ~1% slices with fresh ids per batch
        val delta = docs.filter(pmod(col("doc_id"), lit(100)) === i)
          .select((col("doc_id") + (i + 1) * 10000000000L).as("doc_id"),
            concat(lit(s"append batch $i variant "), col("text")).as("text"))
        time { ShingleIndex.append(spark, delta, token = Some(s"frag-$i")) }
      }.sum
      val batch = docs.limit(1000)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(lit("ingest batch variant "), col("text")).as("text"))
        .cache()
      batch.count()
      // the live corpus id set = original docs + every appended batch's ids
      // (the production shape: ingest keeps a corpus table; the phantom
      // guard reads only its id column)
      val corpusIds = (0 until nAppends)
        .map(i => docs.filter(pmod(col("doc_id"), lit(100)) === i)
          .select((col("doc_id") + (i + 1) * 10000000000L).as("doc_id")))
        .foldLeft(docs.select(col("doc_id")))(_ unionByName _)
      def screen(): Double = time {
        val (pairs, rel) = Dedup.incrementalMinhashPairsIndexed(
          batch, corpusIds, ShingleIndex.liveFor(spark, sfDir).get,
          "doc_id", "text", 0.8)
        try sink(pairs) finally rel()
      }
      screen() // warm
      val screenBefore = median((1 to runs).map(_ => screen()))
      val (pfB, bfB) = ShingleIndex.fileCounts(spark)
      val compactSec = time { ShingleIndex.compact(spark) }
      val (pfA, bfA) = ShingleIndex.fileCounts(spark)
      screen() // warm the post-compaction file listing
      val screenAfter = median((1 to runs).map(_ => screen()))
      batch.unpersist()
      def f1(v: Double) =
        BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
      // surface whether the guard auto-pruned (marker field), so the A/B
      // JSON lines carry the binding that actually ran
      val autoPruned = ShingleIndex.readMarker(spark)
        .exists(_.contains(""""auto_prune":true"""))
      println(s"""{"metric":"shingle_index_compact","sf":"$sfDir",""" +
        s""""buckets":$buckets,"runs":$runs,"appends":$nAppends,""" +
        s""""prune":$pruneFrac,"auto_prune":$autoPruned,""" +
        s""""write_sec":${f1(writeSec)},"append_total_sec":${f1(appendSec)},""" +
        s""""files_before":{"postings":$pfB,"bands":$bfB},""" +
        s""""files_after":{"postings":$pfA,"bands":$bfA},""" +
        s""""compact_sec":${f1(compactSec)},""" +
        s""""screen_before_sec":${f1(screenBefore)},""" +
        s""""screen_after_sec":${f1(screenAfter)}}""")
      spark.stop()
      return
    }

    // fresh index: wipe any prior rehearsal state, time the write, then
    // time the DDL reattach after dropping only the catalog entry.
    // `stored` mode reattaches an existing on-disk index instead of
    // rewiping, so the A/B protocol pays the write once; `derived` mode
    // touches no index state at all.
    // SPARK_GRAFT_SHINGLE_GUARD=off disables the write-time hot-bucket
    // guard (round-13 A/B control: requested buckets verbatim vs the
    // guard's raised count on a boilerplate-heavy corpus). The marker
    // identity is the REQUESTED count, so wipe the warehouse between
    // bindings — a guard-off probe would otherwise reattach the raised
    // files
    val guardOn = !sys.env.get("SPARK_GRAFT_SHINGLE_GUARD").contains("off")
    val (writeSec, reattach) =
      if (mode == "derived") (0.0, 0.0)
      else if (mode == "stored") {
        (ShingleIndex.register(spark, sfDir, buckets, guard = guardOn,
          pruneDfFrac = pruneFrac, autoPrune = autoPruneOn), 0.0)
      } else {
        spark.sql(s"DROP TABLE IF EXISTS ${ShingleIndex.tableName}")
        Measure.deleteRecursively(java.nio.file.Paths.get(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
          ShingleIndex.tableName).toString)
        val w = ShingleIndex.register(spark, sfDir, buckets)
        spark.sql(s"DROP TABLE ${ShingleIndex.tableName}")
        (w, time { ShingleIndex.register(spark, sfDir, buckets) })
      }

    // stored binding with pruning: the prefix ops take the stored stop
    // set as the exact df-split (bit-identical output, hot keys broadcast)
    def stopFor(stored: Boolean): Option[DataFrame] =
      if (stored && pruneFrac > 0) ShingleIndex.stopSet(spark) else None
    def ops(sh: => DataFrame, stored: Boolean): Seq[(String, () => DataFrame)] = Seq(
      ("containment", () => Dedup.containmentPairs(sh, 4, 5,
        minShingles = 10, stop = stopFor(stored))),
      ("setsim_prefix", () => Dedup.jaccardPairsPrefix(sh, 4, 5,
        stop = stopFor(stored))),
      ("decontaminate", () => Dedup.decontaminate(
        sh.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        sh.filter(pmod(col("doc_id"), lit(7)) === 0), 4, 5,
        minShingles = 10, stop = stopFor(stored))))

    def measure(sh: => DataFrame, stored: Boolean): Seq[(String, Double)] =
      ops(sh, stored).map { case (name, q) =>
        sink(q()) // warm
        name -> median((1 to runs).map(_ => time(sink(q()))))
      }
    // stored first (shinglesFor routes onto the registered index), then
    // the derived control (explicit derivation, same session)
    val storedT = if (mode != "derived")
      measure(ShingleIndex.shinglesFor(spark, sfDir), stored = true) else Nil
    val derivedT = if (mode != "stored")
      measure(ShingleIndex.derive(spark, sfDir), stored = false) else Nil

    if (mode != "all") {
      def obj0(kvs: Seq[(String, Double)]): String =
        kvs.map { case (k, v) =>
          "\"" + k + "\":" + BigDecimal(v).setScale(1,
            BigDecimal.RoundingMode.HALF_UP) }.mkString("{", ",", "}")
      // surface the write-time skew diagnosis (eff_buckets + telemetry)
      // straight from the marker, so the A/B JSON lines carry the binding.
      // Stored mode only — the derived binding touches no index state, and
      // printing a leftover marker's fields would attribute another
      // binding's diagnosis to it
      val skew = ShingleIndex.readMarker(spark).filter(_ => mode == "stored")
        .map { m =>
        Seq("eff_buckets", "bucket_key_top_share", "hot_ratio").flatMap(f =>
          s""""$f":([0-9.]+)""".r.findFirstMatchIn(m)
            .map(x => s""""$f":${x.group(1)}""")).mkString(",")
      }.filter(_.nonEmpty).fold("")("," + _)
      println(s"""{"metric":"shingle_index_$mode","sf":"$sfDir",""" +
        s""""buckets":$buckets,"runs":$runs,"guard":$guardOn,""" +
        s""""prune":$pruneFrac$skew,""" +
        s""""stored_sec":${obj0(storedT)},"derived_sec":${obj0(derivedT)}}""")
      spark.stop()
      return
    }

    // O(delta) append: 1% new docs (fresh ids, text perturbed)
    val docs = spark.table("documents")
    val delta = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(lit("appended variant "), col("text")).as("text"))
    val nDelta = delta.count()
    val appendSec = time { ShingleIndex.append(spark, delta) }

    // round-12 task 2 — the appended index's CONSUMER: per-batch near-dup
    // ingest screen, derived (re-shingle the whole corpus per batch, the
    // pre-round-12 ingestNearDup shape) vs indexed (stored postings+bands,
    // zero corpus-wide shuffles per batch). Band-backed registration is
    // timed separately so write_sec stays comparable across rounds.
    val bandsWriteSec = ShingleIndex.registerDocs(spark, sfDir,
      ShingleIndex.derive(spark, sfDir), buckets, withBands = true)
    val idx = ShingleIndex.liveFor(spark, sfDir).get
    val batch = docs.limit(1000)
      .select((col("doc_id") + 2000000000L).as("doc_id"),
        concat(lit("ingest batch variant "), col("text")).as("text"))
      .cache()
    val nBatch = batch.count()
    val corpusIds = docs.select("doc_id")
    def ingestDerived(): Double = time {
      val (pairs, rel) = Dedup.incrementalMinhashPairsManaged(
        batch, docs, "doc_id", "text", 0.8)
      try sink(pairs) finally rel()
    }
    def ingestIndexed(): Double = time {
      val (pairs, rel) = Dedup.incrementalMinhashPairsIndexed(
        batch, corpusIds, idx, "doc_id", "text", 0.8)
      try sink(pairs) finally rel()
    }
    ingestIndexed(); val ingestIdxSec = median((1 to runs).map(_ => ingestIndexed()))
    ingestDerived(); val ingestDerSec = median((1 to runs).map(_ => ingestDerived()))
    batch.unpersist()

    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) =>
        "\"" + k + "\":" + BigDecimal(v).setScale(1,
          BigDecimal.RoundingMode.HALF_UP) }.mkString("{", ",", "}")
    def f1(v: Double) =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"shingle_index","sf":"$sfDir",""" +
      s""""buckets":$buckets,"runs":$runs,""" +
      s""""write_sec":${f1(writeSec)},"reattach_sec":${f1(reattach)},""" +
      s""""stored_sec":${obj(storedT)},"derived_sec":${obj(derivedT)},""" +
      s""""append_docs":$nDelta,"append_sec":${f1(appendSec)},""" +
      s""""bands_write_sec":${f1(bandsWriteSec)},"ingest_batch_docs":$nBatch,""" +
      s""""ingest_derived_sec":${f1(ingestDerSec)},""" +
      s""""ingest_indexed_sec":${f1(ingestIdxSec)}}""")
    spark.stop()
  }
}

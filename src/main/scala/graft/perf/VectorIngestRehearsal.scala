package graft.perf

import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity, WriterLease}

/** Sustained VECTOR-ingest rehearsal (round 15 — the measurement half of
  * the self-maintaining ANN ingest): drive the real
  * [[graft.streaming.VectorsStream.ingestStep]] for N consecutive batches
  * against a stored IVF index — an in-distribution prefix, then drifted
  * batches (the constant-offset tight-mode plant) — and measure what the
  * maintenance loop buys: per-batch wall, whether/when the drift trigger
  * fires MID-SOAK with no operator in the loop, final file counts, and the
  * end-state search quality (recall@10 vs brute force over the final
  * corpus; candidates/query from the stored occupancy) per query
  * population.
  *
  * Two bindings, fresh JVM each (the A/B protocol):
  *   SPARK_GRAFT_VEC_MAINT=off  append-only: geometry frozen forever,
  *                              files fragment, drifted probe mass grows;
  *   SPARK_GRAFT_VEC_MAINT=on   (default) maybeCompact + maybeRetrain run
  *                              inside every step under the writer lease.
  *
  * Env: SPARK_GRAFT_SF_DIR (embeddings source), SPARK_GRAFT_VEC_BATCHES
  * (default 12), SPARK_GRAFT_VEC_DRIFT_FRAC (fraction of TRAILING batches
  * that are drifted; default 0.4), SPARK_GRAFT_INGEST_FACTOR (default 4),
  * SPARK_GRAFT_CPUS. One JSON line. */
object VectorIngestRehearsal {

  import Measure.{median, sink, time}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_VEC_BATCHES", "12").toInt
    val driftFrac =
      sys.env.getOrElse("SPARK_GRAFT_VEC_DRIFT_FRAC", "0.4").toDouble
    val factor = sys.env.getOrElse("SPARK_GRAFT_INGEST_FACTOR", "4").toInt
    val maint = !sys.env.get("SPARK_GRAFT_VEC_MAINT").contains("off")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Measure.warehouseDir("vec-ingest"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)
    val e = spark.table("embeddings").select(col("vec_id"), col("embedding"))

    // base = 40% of the corpus; the rest streams in nBatches slices, the
    // trailing driftFrac of which are the tight-mode plant (offset applied
    // per-slice, ids untouched — slices are disjoint by construction)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-vec-soak").toString
    val base = e.filter(pmod(col("vec_id"), lit(5)) < 2).cache()
    sink(base)
    val streamed = e.filter(pmod(col("vec_id"), lit(5)) >= 2)
    // firstDrifted == nBatches (driftFrac 0) is the no-drift control
    val firstDrifted = math.max(1, (nBatches * (1.0 - driftFrac)).toInt)
    // hash-sliced, NOT pmod(vec_id, nBatches): the base split is already
    // a vec_id modulus, and a batch count sharing a factor with 5 would
    // silently empty some slices (10 batches -> slices 0,1,5,6 empty)
    def batch(i: Int) = {
      val slice = streamed.filter(
        pmod(xxhash64(col("vec_id")), lit(nBatches)) === i)
      if (i >= firstDrifted) slice.withColumn("embedding",
        expr("transform(embedding, x -> cast(0.2 * x + 3.0 as float))"))
      else slice
    }

    val buildSec = time {
      val (cents, indexed) = AnnIndex.buildIvf(base, refineIters = 1)
      AnnIndex.writeIvf(idx, cents, indexed)
    }
    val nCells = AnnIndex.readParams(spark, idx)._2

    // round 17: the probe-cost rebalance axis rides the soak when
    // SPARK_GRAFT_VEC_REBALANCE=on — (k=10, recall 0.8, budget 10% of the
    // index per query), the autoNprobe defaults. The drift retrain at the
    // first drifted batch models the mode with ~its then-share of
    // centroids; the mode's LATER batches grow those few cells while the
    // hysteresis (correctly) stays silent — the probe-cost trigger is the
    // mechanism that pays the one extra rebuild once the hot cells exceed
    // the whole per-query budget.
    val rebal = sys.env.get("SPARK_GRAFT_VEC_REBALANCE").contains("on")
    // round 17: SPARK_GRAFT_VEC_RETAIN pins the persisted retention window
    // BEFORE the stream, so every in-step maintenance op archives its
    // pre-images — the generation-archive growth + GC walk is then part of
    // what this soak measures (archive accounting in the output line)
    sys.env.get("SPARK_GRAFT_VEC_RETAIN")
      .foreach(r => AnnIndex.setRetention(idx, r.toInt))
    val lease = WriterLease.acquire(idx, "vec-soak", ttlMs = 600000L)
    val step = graft.streaming.VectorsStream.ingestStep(idx,
      autoMaintainFactor = if (maint) Some(factor) else None,
      lease = Some(lease),
      rebalance = if (rebal) Some((10, 0.8, 0.1)) else None)
    // a retrain resets the journal to one 'retrain' baseline — counting
    // baseline-timestamp changes counts the retrains (bounded read);
    // rebalance-triggered ones are distinguished by the epoch marker
    def baselineTs(): Long = spark.read.parquet(s"$idx/drift.parquet")
      .orderBy(col("ts"), col("tok")).select(col("ts")).head().getLong(0)
    var lastTs = baselineTs()
    var lastRebal = AnnIndex.lastRebalanceGeneration(idx)
    var retrains = 0
    var rebalances = 0
    val retrainAt = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rebalanceAt = scala.collection.mutable.ArrayBuffer.empty[Int]
    val batchSec = try {
      (0 until nBatches).map { i =>
        val s = time { step(batch(i), i.toLong) }
        val ts = baselineTs()
        val rb = AnnIndex.lastRebalanceGeneration(idx)
        // batch-granularity sampling limit, stated rather than hidden: a
        // drift retrain AND a rebalance firing in the SAME batch are one
        // observable baseline move (the rebalance's reset overwrites the
        // drift retrain's) and are counted as the rebalance — the two are
        // distinguishable only per-batch, not within one
        if (rb != lastRebal) { rebalances += 1; rebalanceAt += i; lastRebal = rb }
        else if (ts != lastTs) { retrains += 1; retrainAt += i }
        lastTs = ts
        s
      }
    } finally WriterLease.release(lease)

    // end-state quality: recall@10 vs brute force over the FINAL corpus,
    // base and drifted query populations separated; candidates/query at
    // the fixed default nprobe (the comparable axis across bindings)
    val finalCorpus = base
      .unionByName((0 until nBatches).map(batch).reduce(_ unionByName _))
      .cache()
    sink(finalCorpus)
    val qBase = base.filter(col("vec_id") < 10)
    // reduceOption: the driftFrac=0 control has no drifted batches, and
    // the quality stage must not throw away a completed soak over it
    val qDrift = (firstDrifted until nBatches).map(batch)
      .reduceOption(_ unionByName _).map(_.limit(10))
    val qry = qDrift.fold(qBase)(qBase.unionByName(_)).cache()
    val driftIds = qDrift.fold(Set.empty[Long])(
      _.select("vec_id").collect().map(_.getLong(0)).toSet)
    val exact = Similarity.cosineTopK(finalCorpus, qry, 10)
      .select(col("qid"), col("cid")).cache()
    sink(exact)
    val isDrift = if (driftIds.isEmpty) lit(false)
      else col("qid").isin(driftIds.toSeq: _*)
    val recall = Similarity.recallAtK(
      AnnIndex.searchIvf(spark, idx, qry, 10, nprobe = 4), exact)
      .groupBy(isDrift.as("d")).agg(avg(col("recall_at_k")).as("r"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val (cents, stored) = AnnIndex.readIvf(spark, idx)
    val occ = stored.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
    val cand = Similarity.ivfProbes(cents, qry, 4)
      .join(occ, Seq("cell"))
      .groupBy(col("qid")).agg(sum(col("occ")).as("cand"))
      .groupBy(isDrift.as("d")).agg(avg(col("cand")).as("c"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val files = AnnIndex.fileCounts(spark, idx)("vectors.parquet")
    // end-state probe economics: can the stored curve meet the default
    // recall target inside the default candidate budget? (the condition
    // the rebalance trigger exists to restore)
    val endProfile = AnnIndex.profileProbes(spark, idx, k = 10)
    val endBudget = 0.1 * endProfile.last.candidatesPerQuery
    val budgetMetEnd = endProfile.exists(p =>
      p.candidatesPerQuery <= endBudget + 1e-9 && p.recallProxy >= 0.8)
    val (_, occTotal, occMax, _) = AnnIndex.occupancy(spark, idx)
    val gens = AnnIndex.generations(idx)

    val window = math.max(2, nBatches / 4)
    def f2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def f3(v: Double) =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"vec_ingest_soak","sf":"$sfDir",""" +
      s""""batches":$nBatches,"first_drifted_batch":$firstDrifted,""" +
      s""""maintenance":$maint,"factor":$factor,"n_cells":$nCells,""" +
      s""""build_sec":${f2(buildSec)},""" +
      s""""first_batches_sec":${f2(median(batchSec.take(window)))},""" +
      s""""last_batches_sec":${f2(median(batchSec.takeRight(window)))},""" +
      s""""total_sec":${f2(batchSec.sum)},""" +
      s""""retrains":$retrains,"retrain_at_batches":[${retrainAt.mkString(",")}],""" +
      s""""rebalance":$rebal,"rebalances":$rebalances,""" +
      s""""rebalance_at_batches":[${rebalanceAt.mkString(",")}],""" +
      s""""budget_met_end":$budgetMetEnd,""" +
      s""""hot_cell_frac_end":${f3(occMax.toDouble / math.max(1L, occTotal))},""" +
      s""""final_files":$files,""" +
      s""""retention":${AnnIndex.retentionSetting(idx)},""" +
      s""""live_bytes":${Measure.dirBytes(idx) - gens.map(_.bytes).sum},""" +
      s""""archive_generations":${gens.size},""" +
      s""""archive_bytes":${gens.map(_.bytes).sum},""" +
      s""""archive_tomb_batches":${gens.map(_.tombstoneBatches).sum},""" +
      s""""recall_base":${f3(recall.getOrElse(false, 0.0))},""" +
      s""""recall_drift":${f3(recall.getOrElse(true, 0.0))},""" +
      s""""cand_base":${f2(cand.getOrElse(false, 0.0))},""" +
      s""""cand_drift":${f2(cand.getOrElse(true, 0.0))}}""")
    Measure.deleteRecursively(idx)
    spark.stop()
  }
}

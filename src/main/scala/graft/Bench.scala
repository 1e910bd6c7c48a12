package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Benchmark main (driver contract): runs the headline query set on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Headline = queries flagged bench=true in the registry: the shuffle-heavy
  * relational spine (pricing summary, 5-table join, top-k, doc-flow hop,
  * window rank) plus the scale-path extension operators (exact dedup,
  * MinHash-LSH, brute-force KNN, event windows, sessionization).
  *
  * Measurement hygiene:
  *  - the action is a no-op foreachPartition SINK, not count() — count()
  *    lets Catalyst prune projected expressions, under-measuring
  *    projection-heavy queries; the sink materializes every row;
  *  - per query, one COLD run (first execution after the session warmup)
  *    followed by THREE warm re-runs whose per-query MEDIAN is
  *    reported as queries_warm — two rounds of cross-round comparisons were
  *    spent attributing ambient-load spikes on the shared box, and a median
  *    of three absorbs a single co-tenant burst where the old single warm
  *    sample amplified it. NOTE for cross-round cold comparisons: from
  *    round 8 the runs interleave per query (cold N executes after the
  *    warm repeats of queries < N — marginally hotter JIT/page cache than
  *    the round-≤7 all-colds-first order), so the warm medians, not the
  *    cold column, are the robust cross-round series;
  *  - the 1-minute system load average is sampled before and after the
  *    measured section (loadavg_start/loadavg_end) so a noisy run is
  *    attributable from the JSON alone: if loadavg >> cpus, trust the
  *    medians, not the cold column.
  */
object Bench {

  /** Materialize every row without collecting to the driver. */
  private def sink(df: DataFrame): Unit =
    df.foreachPartition((it: Iterator[org.apache.spark.sql.Row]) => {
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
    })

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle partitions default to the core count (right for the per-round
    // sf0.1 run) but are independently overridable: at rehearsal scales the
    // partition COUNT must track data volume, not cores, or per-partition
    // shuffle blocks outgrow memory and spill (the knob the 100 TB sizing
    // guidance is about — see the round-8 sf10 dedup re-run in BASELINE.md)
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_QUERIES overrides the headline set (comma-separated
    // registry names) — used by the scale rehearsal to time the dedup/ANN
    // paths that aren't in the per-round headline run
    val headline = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(list) =>
        val byName = Registry.byName
        list.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map(byName)
      case None => Registry.all.filter(_.bench)
    }
    // warmup: register views, touch parquet footers, and run one cheap query
    // through every shared execution path (scan → broadcast join → shuffle
    // agg → window → sort) so first-measured-query timings bill the QUERY,
    // not the JVM's first JIT of Spark's codegen/shuffle/parquet machinery
    Tables.register(spark, sfDir)
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("r_regionkey").orderBy("n_nationkey")
      spark.table("nation")
        .join(broadcast(spark.table("region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_regionkey", "n_nationkey").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(w))
        .orderBy("r_regionkey", "rk")
        .foreachPartition((it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
      // the extension pipelines JIT a DISJOINT operator set (explode,
      // posexplode, array transforms, object-hash aggregate, in-memory
      // cache); push a micro-corpus through them so measured cold times bill
      // each query's data work, not the JVM's first compile of those paths
      val microDocs = spark.table("documents").limit(64)
      graft.ext.Dedup.minhashDedup(microDocs, "doc_id", "text", 0.8)
        .foreachPartition((it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
      val microEmb = spark.table("embeddings").limit(16)
      graft.ext.Similarity.cosineTopK(microEmb, microEmb.limit(2), 2)
        .foreachPartition((it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
    }

    // a failing query reports -1, not a plausible-looking elapsed time —
    // silent failures would skew cross-round BASELINE.md comparisons
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getClass.getName}: ${e.getMessage}")
          -1.0
      }
    }

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val load0 = osBean.getSystemLoadAverage

    // SPARK_GRAFT_BENCH_WARM_RUNS trims the warm repeats (e.g. the sf10
    // rehearsal, where 3 repeats of a minutes-long query buy little)
    val warmRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM_RUNS", "3").toInt
    // per query: 1 cold + `warmRuns` warm samples, consecutively (the warm
    // runs re-execute a freshly built plan — nothing is spark-cached between
    // runs, so warm isolates JIT + page-cache state, exactly the ambient
    // regime the median is defending)
    val samples = headline.map(q =>
      q.name -> (0 to warmRuns).map(_ => time(sink(q.build(spark, sfDir)))))
    val cold = samples.map { case (n, s) => n -> s.head }
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0 else ok(ok.length / 2)
    }
    val warm = samples.map { case (n, s) => n -> median(s.tail) }

    // ── advised-layout pass (round 10): re-measure the relational spine ON
    //    the advisor's bucketed layout (Tables.registerAdvised swaps the
    //    standing views; the queries run UNCHANGED). The one-time layout
    //    write is reported separately (write_sec — amortized across every
    //    later query in a real deployment, and 0 on marker reattach), never
    //    folded into query time. SPARK_GRAFT_ADVISED=off skips the pass. ──
    val advisedSpine =
      Seq("q_pricing_summary", "q_join_multi_hop", "q_topk_revenue",
        "q_docflow_hop", "q_events_window", "q_events_sessionize")
    val advised: Option[(Double, Seq[(String, Double)], Seq[(String, Double)])] =
      if (sys.env.getOrElse("SPARK_GRAFT_ADVISED", "on") == "off") None
      else {
        val spine = headline.filter(q => advisedSpine.contains(q.name))
        if (spine.isEmpty) None
        else try {
          // bucket count is its OWN knob (SPARK_GRAFT_ADV_BUCKETS, default
          // 64 to match the sf10 rehearsals that justified the layout) —
          // reusing shuffle partitions here conflated the two: changing
          // parallelism between runs silently invalidated the layout marker
          // (full rewrite) and benched an unrehearsed bucket count
          val advBuckets =
            sys.env.getOrElse("SPARK_GRAFT_ADV_BUCKETS", "64").toInt
          val writeSec =
            Tables.registerAdvised(spark, sfDir, advBuckets)
          val s = spine.map(q =>
            q.name -> (0 to warmRuns).map(_ => time(sink(q.build(spark, sfDir)))))
          Some((writeSec, s.map { case (n, x) => n -> x.head },
            s.map { case (n, x) => n -> median(x.tail) }))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] advised pass failed: ${e.getMessage}")
          None
        }
      }
    val load1 = osBean.getSystemLoadAverage

    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // totals count successful runs only; failed queries stay visible as -1
    // in the per-query maps
    val total = cold.map(_._2).filter(_ >= 0).sum
    val totalWarm = warm.map(_._2).filter(_ >= 0).sum
    // explicit measurement contract (round-9 judge task 7): the cold column
    // is a SINGLE interleaved sample per query — a forked-fresh-JVM cold
    // median would multiply driver bench time ~4× for a number no cross-
    // round comparison should use anyway. The robust cross-round series is
    // queries_warm/total_warm (median of `warm_runs`); two rounds of noise
    // attribution were spent learning that, so the JSON now says it.
    val advisedJson = advised.map { case (writeSec, aCold, aWarm) =>
      s""","advised":{"write_sec":$writeSec,"queries":${obj(aCold)},""" +
        s""""queries_warm":${obj(aWarm)},""" +
        s""""total_warm":${aWarm.map(_._2).filter(_ >= 0).sum},""" +
        // scale-floor note (round-13 judge task 6): without it, a flat-file
        // reader mistakes the sub-1M-row docflow/join inversion for a
        // regression — the advised layout's wins are rehearsed at sf10
        s""""scale_floor_note":"bucketing pins file splits and task """ +
        s"""placement, which dominates under ~1M rows, so advised can """ +
        s"""trail plain at this sf; the same binding measures 2-2.5x """ +
        s"""wins at sf10 (BASELINE.md round-10 scoping rule)"}"""
    }.getOrElse("")
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${obj(cold)},"queries_warm":${obj(warm)},""" +
      s""""total_warm":$totalWarm,"warm_runs":$warmRuns,""" +
      s""""cold_contract":"single-sample-interleaved; compare rounds on queries_warm/total_warm medians",""" +
      s""""loadavg_start":$load0,"loadavg_end":$load1,"sf":"$sfDir"""" +
      advisedJson + "}"
    // the driver parses this from stdout amid sbt noise (round-5 BENCH
    // parsed:null) — emit it BOTH as a file and as a lone stdout line
    // printed after the session stops (no further log interleaving)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
    println(json)
  }
}

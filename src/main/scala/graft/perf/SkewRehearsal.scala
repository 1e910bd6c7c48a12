package graft.perf

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.TableLayout

/** Skew rehearsal (round-11 judge task 4): every behavioral measurement so
  * far ran on the generator's benign user distribution; real event corpora
  * are Zipf-distributed, and the advised user-bucketed layout pins hot
  * keys to single buckets that AQE cannot re-split (bucketed scans bypass
  * skew-join splitting). This main measures the behavioral operator set on
  * a `SPARK_GRAFT_EVENTS_MODE=zipf` corpus (ScaleUp), on BOTH bindings:
  *
  *  - sessionize / session paths / per-user rank — user-partitioned
  *    windows: a hot user is ONE window partition on either binding, so
  *    the interesting number is whether bucketing makes it worse;
  *  - hot-axis aggregation (the q_skew_salted_agg shape) — partial
  *    aggregation should make groupBy skew-immune; measured to confirm;
  *  - hot-key join (events ⋈ per-user dim) — plain gets AQE skew
  *    splitting, bucketed does not; plus [[Skew.saltedJoin]] as the
  *    mitigation candidate on both bindings.
  *
  * Straggler attribution, not just wall clock: a SparkListener records
  * every task duration; per query we report the worst per-stage
  * max/median task ratio over stages with ≥ 8 tasks and max ≥ 1 s (small
  * stages make the ratio meaningless).
  *
  * Env: SPARK_GRAFT_SF_DIR (default scaledata/sf10z), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_ADV_BUCKETS (default 64),
  * SPARK_GRAFT_ADV_RUNS (default 3). One JSON line.
  */
object SkewRehearsal {

  import Measure.{sink, time, median}

  private final class TaskStats extends SparkListener {
    private val q =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) { q.add((t.stageId, t.taskInfo.duration)); () }
    def reset(): Unit = q.clear()
    /** Worst max/median task-duration ratio across qualifying stages. */
    def worstStraggler(): Double = {
      import scala.jdk.CollectionConverters._
      q.asScala.toSeq.groupBy(_._1).values
        .map(_.map(_._2).sorted)
        .filter(ds => ds.length >= 8 && ds.last >= 1000)
        .map(ds => ds.last.toDouble / math.max(1L, ds(ds.length / 2)))
        .foldLeft(1.0)(math.max)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf10z")
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
      .config("spark.sql.warehouse.dir",
        Measure.warehouseDir("skew"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    graft.Tables.register(spark, sfDir)

    // skew context: how hot IS the hot key in this corpus
    val hist = spark.table("events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(1)
      .collect()(0)
    val total = spark.table("events").count()
    val topShare = hist.getLong(1).toDouble / total

    // advised binding: events bucketed by user_id (rehearsal-scoped write,
    // no marker — this is a measurement, not the production mode)
    spark.sql("DROP TABLE IF EXISTS skew_adv_events")
    Measure.deleteRecursively(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "skew_adv_events").toString)
    val writeSec = time {
      graft.model.PartitionAdvisor.writeLayout(spark.table("events"),
        TableLayout("events", Nil, Seq("user_id"), buckets,
          "user axis under zipf skew"), "skew_adv_events")
    }

    def events(adv: Boolean): DataFrame =
      if (adv) spark.table("skew_adv_events") else spark.table("events")

    // round-12 task 3 — the session-window guard: sessions are per-user
    // and semantically unsplittable, so the only scale lever is capping
    // pathological users at ingest. Cap self-sizes to the p99.9 of the
    // per-user event count (legitimate users keep everything; only the
    // Zipf head clips), applied here corpus-wide — the batch stand-in for
    // the per-batch cap the streaming ingest wires
    // (EventsStream.rollupStep / DocsStream.routeStep maxPer* options).
    val cap = math.max(1L, spark.table("events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .agg(expr("percentile_approx(n, 0.999)")).collect()(0).getLong(0))
    def cappedEvents(adv: Boolean): DataFrame = Skew.capPerKey(
      events(adv), Seq("user_id"),
      Seq(negate(unix_micros(col("ts"))), negate(col("event_id"))), cap.toInt)

    // SPARK_GRAFT_SKEW_MODE=capbatch (round 12): the cap's PRODUCTION
    // placement is per-ingest-batch (rollupStep maxPerUser / routeStep
    // maxPerSource), not corpus-wide — measure the guard's cost at batch
    // size: a ~10% deterministic slice of the stream, scanned bare vs
    // capped vs capped-then-rolled-up (the actual sink shape). One JSON
    // line, then exit (fresh-JVM protocol).
    if (sys.env.get("SPARK_GRAFT_SKEW_MODE").contains("capbatch")) {
      val batch = spark.table("events")
        .filter(pmod(xxhash64(col("event_id")), lit(10)) === 0)
      val nBatch = batch.count()
      def rollupOf(b: DataFrame) = b
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("value").cast("decimal(18,6)").as("v"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      def cappedBatch = Skew.capPerKey(batch, Seq("user_id"),
        Seq(negate(unix_micros(col("ts"))), negate(col("event_id"))), cap.toInt)
      sink(batch); sink(cappedBatch); sink(rollupOf(cappedBatch)) // warm
      val scanSec = median((1 to runs).map(_ => time(sink(batch))))
      val capSec = median((1 to runs).map(_ => time(sink(cappedBatch))))
      val foldPlain = median((1 to runs).map(_ => time(sink(rollupOf(batch)))))
      val foldCapped = median((1 to runs).map(_ => time(sink(rollupOf(cappedBatch)))))
      def f3(v: Double) =
        BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      println(s"""{"metric":"skew_capbatch","sf":"$sfDir","runs":$runs,""" +
        s""""cap":$cap,"batch_rows":$nBatch,""" +
        s""""batch_scan_sec":${f3(scanSec)},"batch_cap_sec":${f3(capSec)},""" +
        s""""rollup_plain_sec":${f3(foldPlain)},""" +
        s""""rollup_capped_sec":${f3(foldCapped)}}""")
      spark.stop()
      return
    }

    // keptShare is a full-corpus pass (cap + count) used only by the full
    // mode's JSON line — computed AFTER the capbatch early-return so the
    // fresh-JVM per-batch measurement neither pays it nor pre-warms the
    // cap code path before its own measurements
    val keptShare = cappedEvents(adv = false).count().toDouble / total

    def sessionizeOf(ev: DataFrame): DataFrame =
      graft.ext.Sessionize.withSessionIds(
        ev.select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us")))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("s_us"),
          max(col("us")).as("e_us"))
    def sessionize(adv: Boolean): DataFrame = sessionizeOf(events(adv))

    def pathsOf(ev: DataFrame): DataFrame = {
      val sess = graft.ext.Sessionize.withSessionIds(
        ev.select(col("user_id"), col("event_id"),
          col("event_type"), unix_micros(col("ts")).as("us")))
      val ws = Window.partitionBy(col("user_id"), col("sess_id"))
        .orderBy(col("us"), col("event_id"))
      sess.withColumn("rn", row_number().over(ws))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"), col("sess_id"))
        .agg(array_join(expr("transform(array_sort(collect_list(" +
          "struct(rn, event_type))), x -> x.event_type)"), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
    }
    def paths(adv: Boolean): DataFrame = pathsOf(events(adv))

    def userRank(adv: Boolean): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("value"), col("event_id"))
      events(adv).withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("user_id"), col("rk"), col("event_type"), col("value"))
    }

    // the window-cliff MITIGATION candidate: a small-k rank window is
    // expressible as k partial-aggregate passes (max of an order-struct,
    // then max below the previous winner) — partial aggregation combines
    // map-side, so the hot user never forms one giant window partition on
    // EITHER binding. Same rows as userRank for k=2 (struct order =
    // (value desc, event_id asc) via negated id).
    def userRankAgg(adv: Boolean): DataFrame = {
      val ev = events(adv).select(col("user_id"),
        struct(col("value"), negate(col("event_id")).as("nid"),
          col("event_type")).as("o"))
      val r1 = ev.groupBy(col("user_id")).agg(max(col("o")).as("o1"))
      val r2 = ev.join(r1, Seq("user_id"))
        .filter(col("o") < col("o1"))
        .groupBy(col("user_id")).agg(max(col("o")).as("o2"))
      def emit(o: org.apache.spark.sql.Column, rk: Int) =
        Seq(col("user_id"), lit(rk).as("rk"),
          o.getField("event_type").as("event_type"),
          o.getField("value").as("value"))
      r1.select(emit(col("o1"), 1): _*)
        .unionAll(r2.select(emit(col("o2"), 2): _*))
    }

    def hotAgg(adv: Boolean): DataFrame =
      events(adv).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))

    def userDim(adv: Boolean): DataFrame =
      events(adv).groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("cohort_day"))

    def hotJoin(adv: Boolean): DataFrame =
      events(adv).join(userDim(adv), Seq("user_id"))
        .groupBy(col("cohort_day")).agg(count(lit(1)).as("n"))

    def hotJoinSalted(adv: Boolean): DataFrame =
      Skew.saltedJoin(events(adv).select(col("user_id"), col("ts")),
          userDim(adv), "user_id", 16)
        .groupBy(col("cohort_day")).agg(count(lit(1)).as("n"))

    // the PRODUCTION mitigation: the library's bounded top-k aggregate
    // (Skew.topKPerKey / TopKStructAgg) — one pass for any k, vs the
    // k-pass max trick above
    def userRankTopKOf(ev: DataFrame): DataFrame =
      Skew.topKPerKey(
        ev.select(col("user_id"), col("value"), col("event_id"),
          col("event_type")),
        Seq("user_id"),
        struct(col("value"), negate(col("event_id")).as("nid"),
          col("event_type")), 2)
        .select(col("user_id"), col("rk"), col("event_type"), col("value"))
    def userRankTopK(adv: Boolean): DataFrame = userRankTopKOf(events(adv))

    val queries: Seq[(String, Boolean => DataFrame)] = Seq(
      ("sessionize", sessionize), ("paths", paths),
      ("sessionize_capped", adv => sessionizeOf(cappedEvents(adv))),
      ("paths_capped", adv => pathsOf(cappedEvents(adv))),
      ("user_rank", userRank),
      ("user_rank_agg", userRankAgg), ("user_rank_topk", userRankTopK),
      ("hot_agg", hotAgg), ("hot_join", hotJoin),
      ("hot_join_salted", hotJoinSalted))

    // the mitigations must be row-identical to the window form before
    // their timings mean anything
    val winForm = userRank(adv = false)
    require(userRankAgg(adv = false).exceptAll(winForm).isEmpty &&
      winForm.exceptAll(userRankAgg(adv = false)).isEmpty,
      "user_rank_agg diverges from the window form")
    val topkForm = userRankTopK(adv = false)
      .select(col("user_id"), col("rk").cast("int").as("rk"),
        col("event_type"), col("value"))
    val winCols = winForm.select(col("user_id"), col("rk"),
      col("event_type"), col("value"))
    require(topkForm.exceptAll(winCols).isEmpty &&
      winCols.exceptAll(topkForm).isEmpty,
      "user_rank_topk diverges from the window form")

    def measure(adv: Boolean): (Seq[(String, Double)], Seq[(String, Double)]) = {
      val rows = queries.map { case (name, q) =>
        sink(q(adv)) // warm (JIT + page cache); straggler read on warm runs
        stats.reset()
        val med = median((1 to runs).map(_ => time(sink(q(adv)))))
        (name -> med, name -> stats.worstStraggler())
      }
      (rows.map(_._1), rows.map(_._2))
    }
    val (plainT, plainS) = measure(adv = false)
    val (advT, advS) = measure(adv = true)

    // round-12 task 4: the write-time skew guard's RAISED layout, measured.
    // Raising cannot split the hot key (hash bucketing is per-key); it
    // sheds the bystander keys out of the hot bucket — the hot task's load
    // drops toward the irreducible hotShare floor and everything else
    // gains parallelism. Measured on the per-user window queries (the
    // cliff's victims).
    val guard = graft.model.PartitionAdvisor.skewGuard(
      spark.table("events"), "user_id", buckets)
    val (raisedT, raisedS) =
      if (!guard.hot) (Seq.empty[(String, Double)], Seq.empty[(String, Double)])
      else {
        spark.sql("DROP TABLE IF EXISTS skew_adv_events_raised")
        Measure.deleteRecursively(java.nio.file.Paths.get(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
          "skew_adv_events_raised").toString)
        graft.model.PartitionAdvisor.writeLayout(spark.table("events"),
          TableLayout("events", Nil, Seq("user_id"), guard.effectiveBuckets,
            "guard-raised user axis"), "skew_adv_events_raised")
        val ev = spark.table("skew_adv_events_raised")
        val rq: Seq[(String, () => DataFrame)] = Seq(
          ("sessionize", () => sessionizeOf(ev)),
          ("paths", () => pathsOf(ev)),
          ("user_rank_topk", () => userRankTopKOf(ev)))
        val rows = rq.map { case (name, q) =>
          sink(q())
          stats.reset()
          val med = median((1 to runs).map(_ => time(sink(q()))))
          (name -> med, name -> stats.worstStraggler())
        }
        (rows.map(_._1), rows.map(_._2))
      }

    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) =>
        "\"" + k + "\":" + BigDecimal(v).setScale(3,
          BigDecimal.RoundingMode.HALF_UP) }.mkString("{", ",", "}")
    println(s"""{"metric":"skew_rehearsal","sf":"$sfDir",""" +
      s""""buckets":$buckets,"runs":$runs,""" +
      s""""top_user_share":${BigDecimal(topShare).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)},"n_events":$total,""" +
      s""""user_cap_p999":$cap,"cap_kept_share":${BigDecimal(keptShare)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""adv_write_sec":${BigDecimal(writeSec).setScale(1,
        BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""plain_sec":${obj(plainT)},"advised_sec":${obj(advT)},""" +
      s""""plain_straggler":${obj(plainS)},"advised_straggler":${obj(advS)},""" +
      s""""guard_hot":${guard.hot},"guard_eff_buckets":${guard.effectiveBuckets},""" +
      s""""raised_sec":${obj(raisedT)},"raised_straggler":${obj(raisedS)}}""")
    spark.stop()
  }
}

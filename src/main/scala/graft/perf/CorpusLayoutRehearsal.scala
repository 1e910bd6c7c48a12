package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.TableLayout

/** Advisor layouts BEYOND the relational spine (round-10 judge task 8):
  * apply the write-once-shuffle-never treatment to the EVENTS and DEDUP
  * corpora and measure which routed non-relational faces inherit their
  * zero-Exchange plans for free.
  *
  *  - events bucketed by `user_id`: every user-partitioned window —
  *    sessionization, session paths, per-user ranking — currently opens
  *    with `Exchange hashpartitioning(user_id)`; a bucketed scan satisfies
  *    that distribution at the file layout, so the window runs
  *    shuffle-free (the same argument as the header⋈item join, applied to
  *    `Window.partitionBy`).
  *  - the hashed-shingle relation bucketed by `shingle`: the containment
  *    pipeline's document-frequency aggregate and its df join both key on
  *    `shingle` over the CORPUS-sized relation — the two widest shuffles
  *    a bucketed shingle index removes (the positional window and the
  *    prefix⋈postings join re-key mid-pipeline and keep theirs).
  *
  * Methodology identical to [[AdvisorRehearsal]]: one timed layout write,
  * per-query medians over both bindings, shuffle-Exchange counts from the
  * UNWRAPPED AQE-final plan. One JSON line.
  *
  * Env: SPARK_GRAFT_SF_DIR (default scaledata/sf10), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_ADV_BUCKETS (default 64),
  * SPARK_GRAFT_ADV_RUNS (default 3).
  */
object CorpusLayoutRehearsal {

  import Measure.{sink, time, median}

  private def finalPlanString(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }

  private def shuffleExchanges(df: DataFrame): Int =
    "Exchange (hash|range|Single)".r.findAllIn(finalPlanString(df)).length

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
        Measure.warehouseDir("corpus-layout"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)

    def rewrite(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        name).toString)
    }

    // ── layout writes (timed — the cost the layouts amortize) ─────────────
    // the shingle relation is itself derived; materialize it ONCE as the
    // plain control so both bindings read the same stored corpus and the
    // comparison isolates LAYOUT, not derivation
    val sh = graft.ext.Dedup
      .hashedShingles(spark.table("documents"), "doc_id", "text", 3)
      .withColumnRenamed("sh", "shingle")
    rewrite("plain_shingles")
    rewrite("adv_shingles")
    rewrite("adv_events")
    val writeT = Seq(
      "plain_shingles" -> time {
        sh.write.format("parquet").saveAsTable("plain_shingles")
      },
      "adv_shingles" -> time {
        graft.model.PartitionAdvisor.writeLayout(sh,
          TableLayout("shingles", Nil, Seq("shingle"), buckets,
            "containment/minhash candidate axis"), "adv_shingles")
      },
      "adv_events" -> time {
        graft.model.PartitionAdvisor.writeLayout(spark.table("events"),
          TableLayout("events", Nil, Seq("user_id"), buckets,
            "the user-partitioned window axis"), "adv_events")
      })

    // ── the query set, parameterized by binding ───────────────────────────
    def events(advised: Boolean): DataFrame =
      if (advised) spark.table("adv_events") else spark.table("events")

    def sessionize(adv: Boolean): DataFrame =
      graft.ext.Sessionize.withSessionIds(
        events(adv).select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us")))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("s_us"),
          max(col("us")).as("e_us"))

    def paths(adv: Boolean): DataFrame = {
      val sess = graft.ext.Sessionize.withSessionIds(
        events(adv).select(col("user_id"), col("event_id"),
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

    def userRank(adv: Boolean): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("value"), col("event_id"))
      events(adv).withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("user_id"), col("rk"), col("event_type"), col("value"))
    }

    def containment(adv: Boolean): DataFrame =
      graft.ext.Dedup.containmentPairs(
        spark.table(if (adv) "adv_shingles" else "plain_shingles"),
        4, 5, minShingles = 10)

    val queries: Seq[(String, Boolean => DataFrame)] = Seq(
      ("sessionize", sessionize), ("paths", paths), ("user_rank", userRank),
      ("containment", containment))

    def measure(advised: Boolean): (Seq[(String, Double)], Seq[(String, Int)]) = {
      val both = queries.map { case (name, q) =>
        val warm = q(advised)
        sink(warm)
        val ex = shuffleExchanges(warm)
        (name -> median((1 to runs).map(_ => time(sink(q(advised))))),
          name -> ex)
      }
      (both.map(_._1), both.map(_._2))
    }
    val (plainT, plainEx) = measure(advised = false)
    val (advT, advEx) = measure(advised = true)

    def objD(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def objI(kvs: Seq[(String, Int)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json = s"""{"metric":"corpus_layout","sf":"$sfDir","buckets":$buckets,""" +
      s""""runs":$runs,"write_sec":${objD(writeT)},""" +
      s""""plain_sec":${objD(plainT)},"advised_sec":${objD(advT)},""" +
      s""""plain_exchanges":${objI(plainEx)},"advised_exchanges":${objI(advEx)}}"""
    spark.stop()
    println(json)
  }
}

package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TableLayout

/** Advisor-layout scale rehearsal (round-9 judge task 1): write the sf10
  * corpus ONCE through [[graft.model.PartitionAdvisor.writeLayout]]-style
  * bucketed+partitioned tables, then re-run the header⋈item relational
  * spine against BOTH layouts and show — in the AQE-final physical plans,
  * not in prose — that the write-time shuffle removes every query-time
  * Exchange on the bucketed axis and that hive partitioning prunes
  * directories at the scan.
  *
  * The layouts are the advisor's BKPF/BSEG recommendation transposed onto
  * the TPC-H-shaped corpus (orders = document header, lineitem = document
  * items, the declared 145-edge join graph's canonical header⋈item shape):
  *   - orders:   partition by o_year (GJAHR analog — bounded domain),
  *               bucket by o_orderkey (BELNR analog, the PK/join axis)
  *   - lineitem: bucket by l_orderkey (same axis, same count → co-located)
  *   - customer: bucket by c_custkey (its dominant declared join axis)
  *
  * Queries (each timed over both layouts, Exchange-counted from the
  * executed AQE-final plan):
  *   - recon:   per-document item rollup ⋈ header — the R2R header↔lines
  *     reconciliation shape; bucketed: agg AND join need no Exchange
  *   - join3:   customer⋈orders⋈lineitem revenue rollup — bucketed: the
  *     header⋈item half co-locates, only the custkey hop shuffles
  *   - docflow: EXISTS semi-join header→items — bucketed: no Exchange
  *   - prune:   one-year slice rollup — partitioned: directory-level
  *     PartitionFilters instead of a full scan
  *
  * One JSON line: write costs, per-query medians and Exchange counts per
  * layout, plus the pruning evidence (files read). The bucketed tables are
  * session-catalog managed (in-memory catalog) — the rehearsal is
  * self-contained per invocation; the write cost is reported, not hidden.
  *
  * Env: SPARK_GRAFT_SF_DIR (default scaledata/sf10), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_ADV_BUCKETS (default 64),
  * SPARK_GRAFT_ADV_RUNS (default 3).
  */
object AdvisorRehearsal {

  import Measure.{sink, time, median}

  /** The executed plan's FINAL tree as text: the AQE wrapper's toString
    * prints BOTH "Final Plan" and "Initial Plan" sections once AQE has
    * modified anything, which would double-count every node — unwrap first
    * (same rule as PlanDigest). */
  private def finalPlanString(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }

  /** Shuffle Exchanges in the executed (AQE-final) plan — Broadcast
    * exchanges are excluded: broadcasting a small side is the PLAN WE WANT,
    * only hash/range/single-partition shuffles are the write-once-
    * shuffle-never target. */
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
      .config("spark.ui.enabled", "false")
      // composite-key joins over single-column buckets co-partition only
      // with this off (rows with equal full keys share a bucket — correct,
      // shuffle-free); see AdvisorSpec
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.warehouse.dir", Measure.warehouseDir("advisor"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)

    // ── write the advised layout once (timed — the cost the layout buys
    //    its query savings with) ───────────────────────────────────────────
    val layouts = Seq(
      ("orders", spark.table("orders").withColumn("o_year",
        year(col("o_orderdate"))),
        TableLayout("orders", Seq("o_year"), Seq("o_orderkey"), buckets,
          "GJAHR-analog partition + BELNR-analog bucket")),
      ("lineitem", spark.table("lineitem"),
        TableLayout("lineitem", Nil, Seq("l_orderkey"), buckets,
          "BSEG item side of the header join axis")),
      ("customer", spark.table("customer"),
        TableLayout("customer", Nil, Seq("c_custkey"), buckets,
          "dominant declared join axis")))
    val writeT = layouts.map { case (name, df, layout) =>
      // the in-memory catalog forgets tables between sessions but their
      // warehouse locations persist — clear both or the managed-table
      // write fails with LOCATION_ALREADY_EXISTS on any re-run
      spark.sql(s"DROP TABLE IF EXISTS adv_$name")
      Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), s"adv_$name").toString)
      name -> time {
        graft.model.PartitionAdvisor.writeLayout(df, layout, s"adv_$name")
      }
    }

    // ── the query set, parameterized by layout binding ────────────────────
    def bind(advised: Boolean)(name: String): DataFrame =
      if (advised) spark.table(s"adv_$name") else spark.table(name)

    def recon(t: String => DataFrame): DataFrame = {
      val items = t("lineitem").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"),
          sum(col("l_extendedprice")).as("amount"),
          count(lit(1)).as("n_lines"))
      t("orders").join(items, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("qty"),
          col("amount"), col("n_lines"))
    }

    def join3(t: String => DataFrame): DataFrame =
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"))
        .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"))
        .agg(sum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_lines"))

    def docflow(t: String => DataFrame): DataFrame =
      t("orders").join(
        t("lineitem").filter(col("l_shipdate") > lit("1995-06-01"))
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")

    def prune(t: String => DataFrame, advised: Boolean): DataFrame = {
      val o = t("orders")
      val sliced = if (advised) o.filter(col("o_year") === 1995)
        else o.filter(year(col("o_orderdate")) === 1995)
      sliced.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    }

    val queries: Seq[(String, Boolean => DataFrame)] = Seq(
      ("recon", adv => recon(bind(adv))),
      ("join3", adv => join3(bind(adv))),
      ("docflow", adv => docflow(bind(adv))),
      ("prune", adv => prune(bind(adv), adv)))

    def measure(advised: Boolean): (Seq[(String, Double)], Seq[(String, Int)]) = {
      // the warm-up execution doubles as the Exchange-count source — its
      // finalized AQE plan is the same one the timed repeats re-derive
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

    // pruning evidence: the advised one-year scan must carry o_year INSIDE
    // a non-empty PartitionFilters bracket — a bare contains() would pass
    // vacuously on "PartitionFilters: []" plus o_year in the read schema
    val prunedPlan = {
      val df = prune(bind(advised = true), advised = true)
      sink(df); finalPlanString(df)
    }
    val partitionFilterShown =
      "PartitionFilters: \\[[^\\]]*o_year".r.findFirstIn(prunedPlan).isDefined

    def objD(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def objI(kvs: Seq[(String, Int)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json = s"""{"metric":"advisor_layout","sf":"$sfDir","buckets":$buckets,""" +
      s""""runs":$runs,"write_sec":${objD(writeT)},""" +
      s""""plain_sec":${objD(plainT)},"advised_sec":${objD(advT)},""" +
      s""""plain_exchanges":${objI(plainEx)},"advised_exchanges":${objI(advEx)},""" +
      s""""partition_filter_in_plan":$partitionFilterShown}"""
    spark.stop()
    println(json)
  }
}

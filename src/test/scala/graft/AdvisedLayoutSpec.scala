package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The advised layout as a production storage mode (round-10 task 1):
  * `Tables.registerAdvised` must (a) keep every view's data and schema
  * identical to the plain binding, (b) give the header⋈item spine its
  * proven zero-Exchange plans — CI-pinned here so a regression in bucket
  * join planning fails the build, not the next sf10 rehearsal — and
  * (c) reattach an already-written layout from its marker instead of
  * rewriting. */
class AdvisedLayoutSpec extends AnyFunSuite {
  import SharedSpark._

  /** AQE-final plan text (the wrapper's toString prints Final+Initial once
    * AQE rewrites — unwrap or every node double-counts). */
  private def finalPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ()) // finalize AQE stages
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  /** Shuffle Exchanges only — BroadcastExchange is the plan we want for
    * small sides and doesn't count against write-once-shuffle-never. */
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range|Single)".r.findAllIn(finalPlan(df)).length

  private def recon: DataFrame = {
    val items = spark.table("lineitem").groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))
    spark.table("orders")
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("qty"),
        col("n_lines"))
  }

  private def docflow: DataFrame =
    spark.table("orders").join(
      spark.table("lineitem").filter(col("l_quantity") > 10)
        .select(col("l_orderkey")),
      col("o_orderkey") === col("l_orderkey"), "left_semi")

  // document order: the header⋈item half co-locates on the bucketed
  // orderkey axis (0 Exchanges), then ONE Exchange redistributes the joined
  // rows to the bucketed customer side, whose distribution the final
  // custkey aggregation reuses. (Custkey-join-first costs 3: the joined
  // output loses the bucket distribution before each later hop.)
  private def join3: DataFrame =
    spark.table("orders")
      .join(spark.table("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(spark.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))

  test("registerAdvised: schema/data-invariant views, pinned Exchange counts, marker reattach") {
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // plain baselines BEFORE the swap
      Tables.register(spark, sf)
      val plainSchemas = Seq("orders", "lineitem", "customer", "events")
        .map(n => n -> spark.table(n).schema).toMap
      val plainCounts = plainSchemas.keys
        .map(n => n -> spark.table(n).count()).toMap
      val plainRecon = recon.orderBy(col("o_orderkey")).collect()

      val writeSec = Tables.registerAdvised(spark, sf, buckets = 4)
      assert(writeSec > 0.0, "first registration must write the layout")

      // (a) the advised mode is invisible to query code: same schema
      // (o_year stays internal), same rows
      plainSchemas.foreach { case (n, s) =>
        assert(spark.table(n).schema == s, s"$n schema changed under advised")
        assert(spark.table(n).count() == plainCounts(n))
      }
      assert(recon.orderBy(col("o_orderkey")).collect()
        .sameElements(plainRecon), "advised recon rows diverge from plain")

      // (b) pinned plans — broadcast off so co-location, not broadcast,
      // must carry the join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(shuffles(recon) == 0,
        s"header⋈item recon must be shuffle-free:\n${finalPlan(recon)}")
      assert(shuffles(docflow) == 0,
        s"docflow semi-join must be shuffle-free:\n${finalPlan(docflow)}")
      // join3: ONLY the custkey hop survives (orders arrive bucketed by
      // o_orderkey, the c_custkey join must re-distribute them + the
      // customer side reads bucketed → exactly 2 hash Exchanges would mean
      // the orderkey hop regressed; the custkey hop needs one for orders)
      val j3 = shuffles(join3)
      assert(j3 == 1, s"join3 expected exactly the custkey Exchange, got $j3:\n${finalPlan(join3)}")
      // events bucketed by user_id: the sessionization window's required
      // distribution is satisfied at the file layout — zero Exchanges
      // (the CorpusLayoutRehearsal mechanism, CI-pinned through the
      // production registration path)
      val sess = graft.ext.Sessionize.withSessionIds(
        spark.table("events").select(col("user_id"), col("event_id"),
          org.apache.spark.sql.functions.unix_micros(col("ts")).as("us")))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"))
      assert(shuffles(sess) == 0,
        s"user-bucketed sessionize must be shuffle-free:\n${finalPlan(sess)}")

      // (c) reattach: drop the catalog entries (external tables — files
      // stay), re-register → marker hits, zero write cost, plans still hold
      Seq("adv_orders", "adv_lineitem", "adv_customer", "adv_events")
        .foreach(t => spark.sql(s"DROP TABLE $t"))
      val writeSec2 = Tables.registerAdvised(spark, sf, buckets = 4)
      assert(writeSec2 == 0.0, s"reattach must not rewrite (spent $writeSec2 s)")
      assert(shuffles(recon) == 0, "reattached layout lost its bucket spec")
      assert(spark.table("orders").count() == plainCounts("orders"))

      // a bucket-count change invalidates the marker → rewrite, never a
      // silent mis-specced reattach (bucket ids live in file names)
      val writeSec3 = Tables.registerAdvised(spark, sf, buckets = 2)
      assert(writeSec3 > 0.0, "changed bucket count must force a rewrite")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      Seq("adv_orders", "adv_lineitem", "adv_customer", "adv_events")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Tables.registerPlain(spark, sf) // later suites must see plain views
    }
  }
}

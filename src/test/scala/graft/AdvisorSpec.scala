package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.data.SapFixtures
import graft.model.{Catalog, PartitionAdvisor}

/** Catalog-driven partitioning advisor (round-8 task 7): layout
  * recommendations derive from the declared join graph, the canonical FI
  * example lands on BUKRS/GJAHR + BELNR, and a headline header⋈item join
  * over advisor-bucketed fixture tables runs with NO Exchange. */
class AdvisorSpec extends AnyFunSuite {
  import SharedSpark._

  lazy val fixtures = SapFixtures.register(spark)
  private lazy val layouts =
    PartitionAdvisor.advise().map(l => l.table.toUpperCase -> l).toMap

  test("FI document tables get the canonical BUKRS/GJAHR + BELNR layout") {
    val bseg = layouts("BSEG")
    assert(bseg.partitionCols.map(_.toUpperCase).toSet == Set("BUKRS", "GJAHR"),
      s"BSEG partition: ${bseg.partitionCols}")
    assert(bseg.bucketCols.map(_.toUpperCase) == Seq("BELNR"),
      s"BSEG bucket: ${bseg.bucketCols}")
    val bkpf = layouts("BKPF")
    assert(bkpf.partitionCols.map(_.toUpperCase).toSet == Set("BUKRS", "GJAHR"))
    assert(bkpf.bucketCols.map(_.toUpperCase) == Seq("BELNR"))
    // header and item agree on bucket count → their join co-locates
    assert(bkpf.buckets == bseg.buckets || bkpf.buckets % bseg.buckets == 0 ||
      bseg.buckets % bkpf.buckets == 0)
  }

  test("every join-graph table with a wide key gets a bucket recommendation") {
    val recs = PartitionAdvisor.advise()
    assert(recs.size >= 40, s"only ${recs.size} tables covered")
    val degs = PartitionAdvisor.joinDegrees(Catalog.Model)
    // no recommended column is catalog-unknown, and every bucket col is a
    // wide key with join or PK evidence
    for (l <- recs; t = Catalog.Model.tableByName(l.table.toUpperCase)) {
      val names = t.columns.map(_.name.toUpperCase).toSet
      assert((l.partitionCols ++ l.bucketCols)
        .forall(c => names(c.toUpperCase)), s"${l.table}: unknown column")
      for (c <- l.bucketCols)
        assert(degs.contains((l.table.toUpperCase, c.toUpperCase)) ||
          t.primaryKey.map(_.toUpperCase).contains(c.toUpperCase))
    }
  }

  test("advisor-layout fixture tables join header<->item with no Exchange") {
    fixtures
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // joining on a SUPERSET of the bucket key (BUKRS, BELNR, GJAHR over
    // BELNR buckets) co-partitions only with this knob off — rows with
    // equal full keys share a BELNR bucket, so the join is still correct
    // and shuffle-free; Spark's conservative default guards against skew
    val prevReq = spark.conf
      .get("spark.sql.requireAllClusterKeysForCoPartition", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      // fixture-sized bucket count; the advisor's structural 512 is a lake
      // default, not a 2k-row test setting
      val n = 4
      PartitionAdvisor.writeLayout(spark.table("BKPF"),
        layouts("BKPF").copy(buckets = n), "adv_bkpf")
      PartitionAdvisor.writeLayout(spark.table("BSEG"),
        layouts("BSEG").copy(buckets = n), "adv_bseg")
      val joined = spark.table("adv_bkpf").as("h")
        .join(spark.table("adv_bseg").as("i"),
          Seq("BUKRS", "BELNR", "GJAHR")) // superset of the bucket key
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"advisor-bucketed join must not shuffle:\n$physical")
      assert(joined.count() == spark.table("BSEG").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevReq)
      spark.sql("DROP TABLE IF EXISTS adv_bkpf")
      spark.sql("DROP TABLE IF EXISTS adv_bseg")
    }
  }

  test("write-time skew guard: a planted hot key raises buckets and lands in the marker") {
    import org.apache.spark.sql.functions._
    // unit surface first: benign key → no raise; hot key → power-of-2 raise
    val ev = Tables(spark, sf, "events")
    val benign = PartitionAdvisor.skewGuard(ev, "user_id", 4)
    assert(!benign.hot && benign.effectiveBuckets == 4,
      s"fixture user axis should be benign, got $benign")
    val hotDf = ev.withColumn("user_id",
      when(pmod(col("event_id"), lit(5)) =!= 0, lit(-1L))
        .otherwise(col("user_id")))
    val hot = PartitionAdvisor.skewGuard(hotDf, "user_id", 4)
    assert(hot.hot && hot.topShare > 0.7 && hot.hotRatio > 2.0,
      s"planted 80% key not diagnosed: $hot")
    assert(hot.effectiveBuckets == 8, // ceil(3.2/2)=2 → next pow2 = 2 → 4×2
      s"expected a 2x raise, got $hot")

    // production path: a corpus dir whose events table carries the hot key
    val tmp = java.nio.file.Files.createTempDirectory("graft-skewdir")
    try {
      for (n <- Tables.names if n != "events")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sf/$n.parquet"),
          tmp.resolve(s"$n.parquet"))
      hotDf.coalesce(1).write.parquet(tmp.resolve("events.parquet").toString)

      val writeSec = Tables.registerAdvised(spark, tmp.toString, buckets = 4)
      assert(writeSec > 0.0)
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      def marker(t: String): String = java.nio.file.Files.readString(
        java.nio.file.Paths.get(warehouse, t, "_graft_layout"))
      // the hot axis is recorded and the layout was written RAISED
      val m = marker("adv_events")
      assert(m.contains(""""eff_buckets":8"""), s"adv_events marker: $m")
      assert(""""bucket_key_top_share":0\.(7|8)""".r
        .findFirstIn(m).isDefined, s"top share missing/wrong in: $m")
      assert(m.contains(""""hot_ratio":3."""), s"hot ratio missing in: $m")
      // benign tables keep the requested count
      assert(marker("adv_orders").contains(""""eff_buckets":4"""))
      val desc = spark.sql("DESCRIBE FORMATTED adv_events").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc.get("Num Buckets").exists(_.trim == "8"),
        s"table not written at the raised count: ${desc.get("Num Buckets")}")

      // reattach honors the RAISED count without re-scanning
      spark.sql("DROP TABLE adv_events")
      val writeSec2 = Tables.registerAdvised(spark, tmp.toString, buckets = 4)
      assert(writeSec2 == 0.0, s"reattach must not rewrite (spent $writeSec2)")
      val desc2 = spark.sql("DESCRIBE FORMATTED adv_events").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc2.get("Num Buckets").exists(_.trim == "8"),
        "reattach lost the raised bucket count")
      // the raised layout still satisfies the per-user window distribution
      val sess = graft.ext.Sessionize.withSessionIds(
        spark.table("events").select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us")))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"))
      sess.queryExecution.toRdd.foreach(_ => ())
      val plan = sess.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(!"Exchange (hash|range|Single)".r.findFirstIn(plan).isDefined,
        s"raised bucketing broke the window distribution:\n$plan")
    } finally {
      Seq("adv_orders", "adv_lineitem", "adv_customer", "adv_events")
        .foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $t")
          graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
            spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
            t).toString)
        }
      Tables.registerPlain(spark, sf) // later suites must see plain views
      graft.perf.Measure.deleteRecursively(tmp.toString)
    }
  }
}

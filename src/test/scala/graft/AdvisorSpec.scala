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
}

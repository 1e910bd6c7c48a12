package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.perf.Bucketing

/** Bucketed co-located joins: the write-once-shuffle-never pattern. */
class BucketingSpec extends AnyFunSuite {
  import SharedSpark._

  test("same-bucketed tables join without any Exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables(spark, sf, "lineitem"),
        "b_lineitem", Seq("l_orderkey"), 4)
      Bucketing.writeBucketed(Tables(spark, sf, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", Seq("l_orderkey"), 4)
      val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders",
        Seq("l_orderkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle:\n$physical")
      assert(joined.count() == Tables(spark, sf, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}

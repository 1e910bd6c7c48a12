package graft
import graft.queries.Registry
object PlanDiff {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("plandiff", "8")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val names = Seq("q_pricing_summary","q_join_multi_hop","q_topk_revenue",
      "q_docflow_hop","q_window_rank","q_dedup_exact","q_events_sessionize")
    val dirs = sys.env.get("SPARK_GRAFT_PLANDIFF_DIRS")
      .map(_.split(',').map(_.trim).toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1"))
    for (sf <- dirs; n <- names) {
      val df = Registry.byName(n).build(spark, sf)
      df.foreachPartition((it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
      val plan = df.queryExecution.executedPlan.toString
      def cnt(p: String) = p.r.findAllIn(plan).length
      println(s"PLANDIFF|$sf|$n|bhj=${cnt("BroadcastHashJoin")}|smj=${cnt("SortMergeJoin")}|" +
        s"shj=${cnt("ShuffledHashJoin")}|bnlj=${cnt("BroadcastNestedLoopJoin")}|" +
        s"coalesced=${cnt("AQEShuffleRead coalesced")}|skew=${cnt("skewed")}")
    }
    spark.stop()
  }
}

package graft

import graft.queries.Registry

/** Prints a one-line physical-plan digest per bench query (shuffle /
  * broadcast / codegen-span counts + scan pushdown evidence) for
  * BASELINE.md's regression-attribution table. Dev tool, not shipped API. */
object PlanDigest {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("digest", "8")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = Registry.all.filter(_.bench).map(_.name)
    for (name <- names) {
      val plan = Registry.byName(name).build(spark, sf)
        .queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).size
      val shuffles = n("Exchange hashpartitioning") + n("Exchange rangepartitioning") +
        n("Exchange SinglePartition")
      val digest = Seq(
        "shuffles" -> shuffles,
        "broadcasts" -> n("BroadcastExchange"),
        "codegen_spans" -> n("WholeStageCodegen"),
        "sorts" -> n("\\bSort\\b"),
        "bnlj" -> n("BroadcastNestedLoop"),
        "cartesian" -> n("CartesianProduct"))
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
      println(s"DIGEST $name: $digest")
    }
    spark.stop()
  }
}

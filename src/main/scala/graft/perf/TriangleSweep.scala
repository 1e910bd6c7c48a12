package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Triangle candidate-stage decision sweep (round-11 judge task 6): the
  * TriangleSplit diagnostic named the 228M-candidate closing-edge
  * semi-join as the next lever with two candidate moves —
  *
  *  1. the BLOOM FPP tradeoff: halving fpp halves surviving candidates
  *     but doubles the broadcast bloom (bits ∝ m·ln(1/fpp)) — swept at
  *     0.02 / 0.01 / 0.005;
  *  2. the STRUCTURAL move: store the oriented edge relation bucketed by
  *     `s` ([[graft.ext.GraphOps.triangleCountFrom]]) — the adjacency
  *     groupBy(s) reads co-located AND the semi-join's eo side arrives
  *     pre-distributed, making that shuffle one-sided (the 228M candidate
  *     side still moves; eo's m rows do not).
  *
  * Exactness is pinned in-run: every variant must produce the SAME count.
  * One JSON line. Env: SPARK_GRAFT_SF_DIR (default scaledata/sf10),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS,
  * SPARK_GRAFT_ADV_BUCKETS (default 64). */
object TriangleSweep {

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
      // single-column-bucket co-partitioning for the (b,c) semi-join
      // against the s-bucketed store (the AdvisorSpec-pinned setting)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.warehouse.dir",
        Measure.warehouseDir("triangle-sweep"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)

    // co-purchase edges + the degree orientation, derived once (the sweep
    // isolates the KERNEL; TriangleSplit already measured derivation)
    val li = spark.table("lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("v")),
        Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val uLow = col("du") <= col("dv")
    val eo = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(when(uLow, col("u")).otherwise(col("v")).as("s"),
        when(uLow, col("v")).otherwise(col("u")).as("t"),
        when(uLow, col("dv")).otherwise(col("du")).as("dt"))
      .cache()
    val m = eo.count()
    println(s"[sweep] oriented edges m=$m")

    def run(label: String, rel: org.apache.spark.sql.DataFrame,
        fpp: Double): (String, Double, Long) = {
      var tri = 0L
      val sec = time {
        tri = graft.ext.GraphOps.triangleCountFrom(rel, m, fpp)
          .collect().head.getLong(0)
      }
      println(s"[sweep] $label fpp=$fpp sec=$sec tri=$tri")
      (label, sec, tri)
    }

    // SPARK_GRAFT_SWEEP_VARIANT isolates ONE variant per JVM: the first
    // all-in-one run measured 325/522/494 s for fpp 0.02/0.01/0.005 in
    // run order — non-monotone in candidate count and ordered by run
    // position, the shared-JVM contamination signature (cache + GC state
    // accumulate across variants). Fresh-JVM-per-variant is the honest
    // protocol; the all-variants mode remains for smoke use.
    val variant = sys.env.get("SPARK_GRAFT_SWEEP_VARIANT")
    def f3(v: Double) =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)

    variant match {
      case Some(v) if v.startsWith("fpp_") =>
        val f = v.stripPrefix("fpp_").toDouble
        val (_, sec, tri) = run(v, eo, f)
        println(s"""{"metric":"triangle_sweep_variant","variant":"$v",""" +
          s""""sf":"$sfDir","m":$m,"sec":${f3(sec)},"triangles":$tri}""")
      case Some("bucketed") =>
        spark.sql("DROP TABLE IF EXISTS tri_eo_bucketed")
        Measure.deleteRecursively(java.nio.file.Paths.get(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
          "tri_eo_bucketed").toString)
        val writeSec = time {
          eo.write.bucketBy(buckets, "s").sortBy("s")
            .format("parquet").saveAsTable("tri_eo_bucketed")
        }
        eo.unpersist()
        val (_, sec, tri) = run("bucketed_eo", spark.table("tri_eo_bucketed"), 0.01)
        println(s"""{"metric":"triangle_sweep_variant","variant":"bucketed",""" +
          s""""sf":"$sfDir","m":$m,"write_sec":${f3(writeSec)},""" +
          s""""sec":${f3(sec)},"triangles":$tri}""")
      case Some(other) =>
        sys.error(s"unknown SPARK_GRAFT_SWEEP_VARIANT '$other'")
      case None =>
        val sweeps = Seq(0.02, 0.01, 0.005).map(f =>
          f -> run(s"fpp_$f", eo, f))
        spark.sql("DROP TABLE IF EXISTS tri_eo_bucketed")
        Measure.deleteRecursively(java.nio.file.Paths.get(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
          "tri_eo_bucketed").toString)
        val writeSec = time {
          eo.write.bucketBy(buckets, "s").sortBy("s")
            .format("parquet").saveAsTable("tri_eo_bucketed")
        }
        eo.unpersist()
        val stored = run("bucketed_eo", spark.table("tri_eo_bucketed"), 0.01)
        val counts = (sweeps.map(_._2._3) :+ stored._3).distinct
        require(counts.size == 1,
          s"variants disagree on the triangle count: $counts")
        println(s"""{"metric":"triangle_sweep","sf":"$sfDir","m":$m,""" +
          s""""buckets":$buckets,"triangles":${stored._3},""" +
          sweeps.map { case (f, (_, s, _)) => s""""sec_fpp_$f":${f3(s)}""" }
            .mkString(",") +
          s""","bucketed_write_sec":${f3(writeSec)},""" +
          s""""sec_bucketed_fpp_0.01":${f3(stored._2)}}""")
    }
    spark.stop()
  }
}

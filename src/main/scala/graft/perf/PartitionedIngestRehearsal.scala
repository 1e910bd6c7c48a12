package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained ingest into a HIVE-PARTITIONED store (round-14 judge task 2 —
  * the advised events shape: date-partitioned appends): every micro-batch
  * appends ~1 file into EVERY date partition it touches, so per-leaf file
  * counts grow with batch count and the per-batch reader probe (a
  * partition-grouped aggregate over the layout) degrades into file
  * listing. The A/B mirrors IngestRehearsal's protocol, fresh JVM per
  * binding:
  *
  *   SPARK_GRAFT_PART_MAINT=off  appends only — files per leaf grow 1:1
  *                               with batches;
  *   SPARK_GRAFT_PART_MAINT=on   [[graft.ext.CorpusCompact
  *                               .maybeCompactPartitioned]] after each
  *                               batch (factor SPARK_GRAFT_PART_FACTOR,
  *                               default 4) — only leaves past factor ×
  *                               target rewrite, compaction cost BILLED to
  *                               this side's batch times.
  *
  * Reported: median batch seconds over the first and last `window`
  * batches, total wall, leaf count, max files per leaf, and a row-count
  * integrity check. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_PART_BATCHES
  * (default 20), SPARK_GRAFT_CPUS. One JSON line. */
object PartitionedIngestRehearsal {

  import Measure.{median, sink, time}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_PART_BATCHES", "20").toInt
    val factor = sys.env.getOrElse("SPARK_GRAFT_PART_FACTOR", "4").toInt
    val maint = !sys.env.get("SPARK_GRAFT_PART_MAINT").contains("off")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.warehouse.dir",
        Measure.warehouseDir("partitioned-ingest"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.register(spark, sfDir)
    import graft.ext.CorpusCompact

    val dir = java.nio.file.Files
      .createTempDirectory("graft-part-ingest").toString
    val events = spark.table("events")
      .withColumn("event_date", to_date(col("ts")))

    val batchSec = (0 until nBatches).map { i =>
      val b = events.filter(pmod(col("event_id"), lit(nBatches)) === i)
      time {
        // one executor-side slice per batch keeps the append realistic
        // (~1 file per touched date partition per batch)
        b.repartition(1).write.mode("append")
          .partitionBy("event_date").parquet(dir)
        // the reader a maintained layout exists for: partition-grouped scan
        sink(spark.read.parquet(dir).groupBy("event_date")
          .agg(count(lit(1)).as("n"), sum(col("value")).as("v")))
        if (maint) {
          CorpusCompact.maybeCompactPartitioned(spark, dir, factor,
            targetFilesPerPartition = 1)
          ()
        }
      }
    }

    val leaves = CorpusCompact.leafDirs(dir)
    val maxLeafFiles = leaves.map(CorpusCompact.fileCount).max
    val rowsOk =
      spark.read.parquet(dir).count() == events.count()
    val window = math.max(3, nBatches / 10)
    def f2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"partitioned_ingest","sf":"$sfDir",""" +
      s""""batches":$nBatches,"maintenance":$maint,"factor":$factor,""" +
      s""""first_batches_sec":${f2(median(batchSec.take(window)))},""" +
      s""""last_batches_sec":${f2(median(batchSec.takeRight(window)))},""" +
      s""""total_sec":${f2(batchSec.sum)},""" +
      s""""leaves":${leaves.size},"max_leaf_files":$maxLeafFiles,""" +
      s""""rows_ok":$rowsOk}""")
    Measure.deleteRecursively(dir)
    spark.stop()
  }
}

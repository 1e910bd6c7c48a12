package graft.perf

import org.apache.spark.sql.DataFrame

/** Bucketed-table utilities: pre-shuffle once at write time so that every
  * subsequent equi-join/aggregation on the bucket keys is co-located — the
  * standard way to amortize the dominant shuffle of a 100 TB fact table
  * that is joined repeatedly on the same key.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Joins between two
    * tables bucketed on the same keys with the same bucket count run with NO
    * Exchange on either side. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` as a hive-partitioned parquet directory tree
    * (`.../col=value/part-*.parquet`). At 100 TB the partition columns are
    * the coarse pruning axes a corpus is always filtered on (source, lang,
    * snapshot date): a reader filtering on them touches only the matching
    * directories — zero I/O for the rest, before any row-group statistics
    * apply. Keep partition cardinality bounded (≤ thousands of directories);
    * high-cardinality keys belong in bucketing, not partitioning. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Idempotent partitioned write: DYNAMIC partition overwrite replaces
    * only the partitions present in `df`, leaving the rest of the tree
    * untouched — re-running a failed or duplicated batch converges to the
    * same state instead of appending twice (the exactly-once story for
    * batch corpus refreshes; streaming ingest gets it from checkpoints).
    * The conf is set per-write and restored afterwards. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Co-located equi-join of two same-bucketed tables. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}

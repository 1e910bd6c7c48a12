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

  /** Co-located equi-join of two same-bucketed tables. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}

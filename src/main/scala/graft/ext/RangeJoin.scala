package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the second classic operator Spark plans poorly
  * (a naive theta join degenerates to BroadcastNestedLoop). Bucketized
  * construction: quantize time into buckets of the window width, explode the
  * probe side into the (at most two) buckets its window overlaps, equi-join
  * on (key, bucket), then apply the exact range predicate. The cross product
  * never materializes; cost is an equi-join whose key includes the bucket —
  * the formulation that survives 100 TB.
  */
object RangeJoin {

  /** Pairs (l, r) with the same `keys` where
    * `l.leftPoint - window <= r.rightPoint <= l.leftPoint`.
    * Both point columns must be numeric (e.g. epoch micros);
    * `window` in the same unit. */
  def lookbackJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftPoint: String, rightPoint: String, window: Long): DataFrame = {
    val lBuckets = left.withColumn("__bucket",
      explode(array_distinct(array(
        floor((col(leftPoint) - window) / window),
        floor(col(leftPoint) / window)))))
    val rBuckets = right.withColumn("__bucket",
      floor(col(rightPoint) / window))
    lBuckets.join(rBuckets, keys :+ "__bucket")
      .filter(col(rightPoint) >= col(leftPoint) - window &&
        col(rightPoint) <= col(leftPoint))
      .drop("__bucket")
  }
}

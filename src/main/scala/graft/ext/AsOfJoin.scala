package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark SQL lacks natively (SURVEY custom-operator
  * preference (a): compose built-ins before reaching for a SparkStrategy).
  *
  * For every left row, attach the latest right row with the same key whose
  * timestamp is <= the left timestamp. Implemented with the union+window
  * construction: tag both sides, sort within each key by (ts, side), and
  * carry the last right payload forward — ONE shuffle on the key, no range
  * cross join, no per-key collect. This is the formulation that survives
  * 100 TB: cost is a sort within key partitions, identical to any windowed
  * aggregation. (DuckDB's native ASOF JOIN is the oracle for it.)
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest-at-or-before row attaches)
    * @param keys      equi-key columns present on both sides
    * @param leftTs    left timestamp column (orderable)
    * @param rightTs   right timestamp column
    * @param rightVals right columns to carry, exposed as asof_<name>
    * @return matched left rows + asof_<rightTs> + asof_<vals> (inner
    *         semantics: left rows with no earlier right row are dropped)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val payloadFields = s"asof_$rightTs" +: rightVals.map(v => s"asof_$v")
    val payload = struct(
      (col(rightTs).as(s"asof_$rightTs") +:
        rightVals.map(v => col(v).as(s"asof_$v"))): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val rTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        payload.as("__payload")): _*)
    val lTagged = left.select(
      (left.columns.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__payload")): _*)

    // right rows sort before left rows at equal timestamps (<= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select((left.columns.map(col) ++
        payloadFields.map(f => col("__match").getField(f).as(f))): _*)
  }

  /** Forward as-of join: for every left row, attach the EARLIEST right row
    * with the same key whose timestamp is >= the left timestamp (the "next
    * event after" lookup — next maintenance after a failure, next view after
    * a purchase). Same union+window construction as [[asofJoin]], mirrored:
    * left rows sort before right rows at equal timestamps (so >= includes
    * ties) and the first right payload in the forward-unbounded frame is the
    * match. ONE shuffle on the key — identical scale behavior. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val payloadFields = s"asof_$rightTs" +: rightVals.map(v => s"asof_$v")
    val payload = struct(
      (col(rightTs).as(s"asof_$rightTs") +:
        rightVals.map(v => col(v).as(s"asof_$v"))): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val rTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__side") :+
        payload.as("__payload")): _*)
    val lTagged = left.select(
      (left.columns.map(col) :+ col(leftTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(payloadType).as("__payload")): _*)

    // left rows sort before right rows at equal timestamps (>= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match", first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0 && col("__match").isNotNull)
      .select((left.columns.map(col) ++
        payloadFields.map(f => col("__match").getField(f).as(f))): _*)
  }
}

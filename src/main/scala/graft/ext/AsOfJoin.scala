package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark SQL lacks natively (SURVEY custom-operator
  * preference (a): compose built-ins before reaching for a SparkStrategy).
  *
  * For every left row, attach the latest right row with the same key whose
  * timestamp is <= the left timestamp (backward), or the earliest right row
  * at-or-after it (forward). Implemented with the union+window construction:
  * tag both sides, sort within each key by (ts, side, payload), and carry
  * the nearest right payload across the frame — ONE shuffle on the key, no
  * range cross join, no per-key collect. This is the formulation that
  * survives 100 TB: cost is a sort within key partitions, identical to any
  * windowed aggregation. (DuckDB's native ASOF JOIN is the oracle for it.)
  *
  * Both directions share one core; they differ only in which side sorts
  * first at a tied timestamp, the frame direction, and first-vs-last payload
  * pick. When several right rows tie on (key, ts), the payload struct is the
  * final sort key, so the pick is deterministic: backward takes the largest
  * payload, forward the smallest (field-lexicographic, rightTs first).
  */
object AsOfJoin {

  private def asofCore(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      forward: Boolean): DataFrame = {
    val payloadFields = s"asof_$rightTs" +: rightVals.map(v => s"asof_$v")
    val payload = struct(
      (col(rightTs).as(s"asof_$rightTs") +:
        rightVals.map(v => col(v).as(s"asof_$v"))): _*)
    val payloadType = right.select(payload).schema.head.dataType

    // backward: right rows sort before left at equal ts (<= includes ties);
    // forward: left rows sort before right (>= includes ties)
    val (rightSide, leftSide) = if (forward) (1, 0) else (0, 1)
    val rTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(rightSide).as("__side") :+
        payload.as("__payload")): _*)
    val lTagged = left.select(
      (left.columns.map(col) :+ col(leftTs).as("__ts") :+ lit(leftSide).as("__side") :+
        lit(null).cast(payloadType).as("__payload")): _*)

    // __payload as the last sort key makes tied-(ts, side) right rows pick
    // deterministically; left rows are all-null there and unaffected
    val ordered = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__payload"))
    val w =
      if (forward) ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick =
      if (forward) first(col("__payload"), ignoreNulls = true)
      else last(col("__payload"), ignoreNulls = true)

    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match", pick.over(w))
      .filter(col("__side") === leftSide && col("__match").isNotNull)
      .select((left.columns.map(col) ++
        payloadFields.map(f => col("__match").getField(f).as(f))): _*)
  }

  /** Backward as-of join.
    * @param left      probe side
    * @param right     reference side (its latest-at-or-before row attaches)
    * @param keys      equi-key columns present on both sides
    * @param leftTs    left timestamp column (orderable)
    * @param rightTs   right timestamp column
    * @param rightVals right columns to carry, exposed as asof_<name>
    * @return matched left rows + asof_<rightTs> + asof_<vals> (inner
    *         semantics: left rows with no earlier right row are dropped)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame =
    asofCore(left, right, keys, leftTs, rightTs, rightVals, forward = false)

  /** Forward as-of join: for every left row, attach the EARLIEST right row
    * with the same key whose timestamp is >= the left timestamp (the "next
    * event after" lookup — next maintenance after a failure, next view after
    * a purchase). Same construction and scale behavior as [[asofJoin]]. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame =
    asofCore(left, right, keys, leftTs, rightTs, rightVals, forward = true)
}

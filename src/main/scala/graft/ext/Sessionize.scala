package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE session definition: gap-based per-user sessions over a
  * (us, event_id)-total-ordered log. One construction shared by every
  * batch consumer (sessionization summary, concurrency sweep, journey
  * paths) so the gap constant and tiebreak order cannot drift apart;
  * the streaming face with identical semantics is
  * [[graft.streaming.EventsStream.sessionize]]'s state machine.
  */
object Sessionize {

  /** Append `sess_id` (1-based per user; replaced if already present) to an
    * event frame carrying `user_id`, `event_id`, and epoch-micros `us`;
    * other columns pass through untouched (scratch columns use collision-
    * safe names). One user-partitioned window pass. */
  def withSessionIds(e: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("__sess_prev_us", lag(col("us"), 1).over(w))
      .withColumn("__sess_new",
        when(col("__sess_prev_us").isNull ||
          col("us") - col("__sess_prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("__sess_new")).over(wc))
      .drop("__sess_prev_us", "__sess_new")
  }
}

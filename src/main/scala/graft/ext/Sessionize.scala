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

  /** Append `sess_id` (1-based per user) to an event frame carrying
    * `user_id`, `event_id`, and epoch-micros `us`; other columns pass
    * through. One user-partitioned window pass. */
  def withSessionIds(e: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wc))
      .drop("prev_us", "new_sess")
  }
}

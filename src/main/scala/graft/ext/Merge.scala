package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch change-data-capture merge — the `MERGE INTO` / SCD Type-1 shape
  * without a table format: fold a change log into a keyed snapshot, latest
  * change per key wins, tombstones delete.
  *
  * Scale design (100 TB): the change log is pre-shrunk to ONE row per key
  * with a single partial-aggregable `max_by` pass (no window, no sort)
  * before it ever meets the snapshot, so the merge itself is one
  * key-partitioned full-outer join. On a real cluster the snapshot is
  * bucketed/partitioned by the key, making the join co-located — the
  * snapshot never reshuffles across daily merges; only the (much smaller)
  * folded delta moves. Re-running the same delta converges to the same
  * state (idempotent), the property that makes retry-on-failure safe.
  */
object Merge {

  /** Latest-wins upsert of `changes` into `snapshot`.
    *
    * @param snapshot  current state: one row per `key`, carrying `valueCol`
    * @param changes   change log: many rows per `key`; `ord` is a TOTAL
    *                  order within a key (ties would make "latest"
    *                  nondeterministic), `isDelete` marks tombstones
    * @return one row per surviving key: key, value, and `op` ∈
    *         {inserted, updated, kept} — keys whose latest change is a
    *         tombstone are dropped
    */
  def upsertLatest(snapshot: DataFrame, changes: DataFrame, key: String,
      valueCol: String, ord: Column, isDelete: Column): DataFrame = {
    val delta = changes
      .groupBy(col(key))
      .agg(max_by(col(valueCol), ord).as("__new_value"),
        max_by(isDelete, ord).as("__deleted"))
    snapshot
      .select(col(key), col(valueCol).as("__old_value"))
      .join(delta, Seq(key), "full_outer")
      .filter(col("__deleted").isNull || !col("__deleted"))
      .select(col(key),
        coalesce(col("__new_value"), col("__old_value")).as(valueCol),
        when(col("__old_value").isNull, lit("inserted"))
          .when(col("__new_value").isNull, lit("kept"))
          .otherwise(lit("updated")).as("op"))
  }
}

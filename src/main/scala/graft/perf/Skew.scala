package graft.perf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY north-star scale notes).
  *
  * Spark's AQE handles moderate skew automatically (skew-join splitting);
  * explicit salting remains necessary when one join key dominates so heavily
  * that even split partitions hot-spot, or when AQE is unavailable (e.g.
  * streaming joins). The salted join trades a `factor`× replication of the
  * small side for an even redistribution of the big side's hot keys.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `factor` ways: the big side
    * gets a deterministic per-row salt; the small side is replicated once
    * per salt value. Result is row-identical to the unsalted inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 0)
    // deterministic salt: hash of the whole row spread across `factor`
    // buckets (rand() would also be correct for an inner join but breaks
    // replayability)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N heavy keys of a column with their frequencies — the diagnostic
    * used to decide whether salting is needed at all. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(topN)
}

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

  /** Skew-immune per-key top-k: `row_number() OVER (PARTITION BY keys
    * ORDER BY …) <= k` rewritten as ONE bounded aggregate
    * ([[graft.functions.TopKStructAgg]] — a k-element heap that partial-
    * aggregation combines map-side, so a Zipf-hot key never forms a giant
    * window partition; SkewRehearsal measured the window form at 13.7×
    * max/median task skew and this form at 1.0×).
    *
    * `order` is a struct column shaped for DESCENDING-first comparison
    * (put the ranking value first; negate an id for an ascending
    * tiebreak). Returns the key columns, `rk` (1-based), and the struct's
    * fields, row-identical to the window form (pinned in ExtensionsSpec).
    * At small scale Catalyst may still prefer the window; this form is
    * for the corpus whose key histogram ([[keyHistogram]]) says otherwise. */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      order: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val fields = {
      // resolve the struct's field names through a zero-row plan probe
      val probe = df.select(order.as("__o")).schema("__o").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      probe.fields.map(_.name).toSeq
    }
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.TopKFunctions.topKStruct(order, k).as("__topk"))
      .select(keys.map(col) :+
        posexplode(col("__topk")).as(Seq("__pos", "__row")): _*)
      .select(keys.map(col) ++
        Seq((col("__pos") + 1).cast("int").as("rk")) ++
        fields.map(f => col(s"__row.$f").as(f)): _*)
  }

  /** Ingest-time per-key row CAP: keep at most `k` rows per key, dropping
    * the rest — the guard for operators whose per-key work is semantically
    * unsplittable (session windows: a hot user IS one window partition on
    * any layout, bucketed or not, and AQE cannot split it; SkewRehearsal's
    * measured honest limit). Built on the same bounded heap as
    * [[topKPerKey]], so the cap itself is skew-immune: a pathological key
    * reduces to k rows per input partition BEFORE the shuffle.
    *
    * `orderCols` pick WHICH k rows survive, descending-first (the
    * [[topKPerKey]] convention — negate a column to keep the smallest);
    * ties beyond `orderCols` are broken by the remaining columns' values,
    * so the survivor set is deterministic, never scheduler-dependent. All
    * original columns come back unchanged; every column must be orderable
    * (the aggregate's analysis check refuses maps by name).
    *
    * DATA-LOSS CONTRACT: rows beyond k per key are gone — this is a
    * deliberate completeness-for-boundedness trade the CALLER owns. Run
    * [[keyHistogram]] first and pick k above the legitimate-user quantile
    * so only pathological keys (bots, test rigs, log loops) are clipped;
    * report the clipped share ([[graft.perf.SkewRehearsal]] does). */
  def capPerKey(df: DataFrame, keys: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], k: Int): DataFrame = {
    val payloadCols = df.columns.toSeq
    val order = struct((orderCols :+
      struct(payloadCols.map(col): _*).as("__row")): _*)
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.TopKFunctions.topKStruct(order, k).as("__topk"))
      .select(explode(col("__topk")).as("__o"))
      .select(payloadCols.map(c => col(s"__o.__row.$c").as(c)): _*)
  }
}

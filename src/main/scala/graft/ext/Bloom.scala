package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter prefilter for incremental set membership — the runtime-
  * filter pattern applied to corpus ingest: a new batch only anti-joins
  * the corpus key index for rows the filter says MIGHT be present; rows
  * the filter rejects are definitely new and skip the shuffle entirely.
  * At steady state almost every incoming row is new, so the expensive
  * anti-join runs over a small suspected-duplicate slice instead of the
  * whole delta.
  *
  * Round-9 rework: the original form was a FIXED 2^17-bit bitset embedded
  * as an array-of-longs plan literal — bounded, but silently SATURATED
  * past ~30k corpus keys (every probe true → the prefilter degrades to a
  * no-op: still correct, invisible to every correctness oracle, pure
  * performance cliff — the same failure class the sf10 triangle sweep
  * caught in `stat.bloomFilter`'s conf clamp). The filter is now an
  * optimally-sized `org.apache.spark.util.sketch.BloomFilter` (bits ∝
  * corpus count at the requested fpp; one binary literal, so plan size
  * and codegen stay flat no matter how large the filter grows) built
  * through Spark's own BloomFilterAggregate with the runtime-filter size
  * clamps raised to the measured optimum, and probed through the
  * codegen'd `BloomFilterMightContain` — the exact machinery Spark's
  * injected runtime filters use, with the sizing made explicit.
  * Deterministic: keys are hashed with codegen'd xxhash64 before
  * insertion and probe.
  */
object Bloom {

  /** Serializes the conf-mutation window in [[build]]: the runtime-filter
    * size caps are SESSION-GLOBAL, so two concurrent builds could race the
    * raise/restore and one would silently saturate — the exact invisible
    * failure class the sizing rework exists to prevent. Build throughput is
    * one aggregate job; serializing it costs nothing next to the scan. */
  private val buildLock = new Object

  /** Build an optimally-sized bloom over `key` (any column; hashed with
    * xxhash64). `expectedItems <= 0` (the default) sizes from a bounded
    * corpus count. The runtime-filter confs that silently clamp
    * BloomFilterAggregate geometry (4M items / 64M bits by default —
    * saturation, not an error, past them) are raised to this build's
    * optimum and restored; the mutation window is serialized per-JVM
    * ([[buildLock]]) so overlapping builds can't revert each other's raised
    * caps mid-aggregate. */
  def build(df: DataFrame, key: Column, expectedItems: Long = 0L,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val spark = df.sparkSession
    val n = math.max(if (expectedItems > 0) expectedItems else df.count(), 1L)
    val neededBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(n, fpp)
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> n.toString,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" ->
        neededBits.toString)
    buildLock.synchronized {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        df.stat.bloomFilter(xxhash64(key), n, fpp)
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** Membership probe as a pure Column: Spark's codegen'd
    * BloomFilterMightContain over the serialized filter (ONE binary
    * literal — a Scala UDF here costs a boxed call per probed row, the
    * measured wall-clock floor of the sf10 triangle sweep). No false
    * negatives by construction. */
  def mightContain(bloom: org.apache.spark.util.sketch.BloomFilter)(
      key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes,
          org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(xxhash64(key))))
  }

  /** Incremental exact dedup with a Bloom prefilter: rows of `delta` whose
    * `keyCols` the filter rejects are NEW by construction; only the
    * suspected-duplicate remainder anti-joins `corpusKeys`. Result is
    * identical to the plain anti-join (the filter has no false negatives);
    * only the shuffle volume changes.
    *
    * `expectedItems` sizes the filter without a corpus count() job —
    * steady-state ingest callers that already track corpus size should pass
    * it so each batch pays one scan (the bloom aggregate), not two. The
    * default 0 falls back to counting. */
  def incrementalExact(delta: DataFrame, corpusKeys: DataFrame,
      keyCols: Seq[String], fpp: Double = 0.01,
      expectedItems: Long = 0L): DataFrame = {
    val keyOf: DataFrame => Column = df =>
      concat_ws("", keyCols.map(df.col): _*)
    val bloom = build(corpusKeys, keyOf(corpusKeys),
      expectedItems = expectedItems, fpp = fpp)
    val probe = mightContain(bloom)(keyOf(delta))
    val definitelyNew = delta.filter(!probe)
    val suspected = delta.filter(probe)
      .join(corpusKeys.select(keyCols.map(col): _*), keyCols, "left_anti")
    definitelyNew.unionByName(suspected)
  }
}

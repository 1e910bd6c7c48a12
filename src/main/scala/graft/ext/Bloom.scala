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
  * The filter is deterministic (k indexes per key from the codegen'd
  * `xxhash64(key, seed)`) and is built as a bounded bit-position set — at
  * most m bits regardless of corpus size — so collecting it to the driver
  * and embedding it as a plan literal is exactly as cheap as Spark's own
  * injected runtime filters. No custom expression: both build and probe
  * compile to existing codegen'd functions.
  */
object Bloom {

  /** Number of 64-bit words backing an m-bit filter. */
  private def words(m: Int): Int = (m + 63) / 64

  /** Build an m-bit, k-hash Bloom bitset over `key` (any column; hashed
    * with xxhash64). One narrow map + one bounded distinct — the shuffle
    * carries at most m integers. */
  def build(df: DataFrame, key: Column, m: Int = 1 << 17, k: Int = 4): Array[Long] = {
    require(m > 0 && m % 64 == 0 && k > 0)
    val bits = df
      .select(explode(array((0 until k).map(i =>
        pmod(xxhash64(key, lit(i)), lit(m.toLong))): _*)).as("bit"))
      .distinct()
      .collect()
      .map(_.getLong(0))
    val bs = new Array[Long](words(m))
    bits.foreach(b => bs((b / 64).toInt) |= (1L << (b % 64).toInt))
    bs
  }

  /** Membership probe as a pure Column expression: true if every one of
    * the k bits for `key` is set. Compiles to element_at + shifts over the
    * embedded bitset literal — whole-stage codegen, no UDF. */
  def mightContain(bitset: Array[Long], m: Int = 1 << 17, k: Int = 4)(key: Column): Column = {
    require(bitset.length == words(m))
    val litSet = array(bitset.map(lit(_)): _*)
    // single-bit masks as a 64-literal lookup (shift functions take only
    // constant shift amounts at the Column layer)
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    (0 until k).map { i =>
      val bit = pmod(xxhash64(key, lit(i)), lit(m.toLong))
      val word = element_at(litSet, (bit / 64).cast("int") + 1)
      val mask = element_at(masks, pmod(bit, lit(64L)).cast("int") + 1)
      word.bitwiseAND(mask) === mask
    }.reduce(_ && _)
  }

  /** Incremental exact dedup with a Bloom prefilter: rows of `delta` whose
    * `keyCols` the filter rejects are NEW by construction; only the
    * suspected-duplicate remainder anti-joins `corpusKeys`. Result is
    * identical to the plain anti-join (the filter has no false negatives);
    * only the shuffle volume changes. */
  def incrementalExact(delta: DataFrame, corpusKeys: DataFrame,
      keyCols: Seq[String], m: Int = 1 << 17, k: Int = 4): DataFrame = {
    val keyOf: DataFrame => Column = df =>
      concat_ws("", keyCols.map(df.col): _*)
    val bs = build(corpusKeys, keyOf(corpusKeys), m, k)
    val probe = mightContain(bs, m, k)(keyOf(delta))
    val definitelyNew = delta.filter(!probe)
    val suspected = delta.filter(probe)
      .join(corpusKeys.select(keyCols.map(col): _*), keyCols, "left_anti")
    definitelyNew.unionByName(suspected)
  }
}

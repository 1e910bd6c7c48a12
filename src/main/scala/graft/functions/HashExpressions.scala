package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a over UTF-8 bytes — a deterministic, dependency-free base
  * hash shared by the SimHash and fingerprint expressions. Public algorithm
  * (Fowler–Noll–Vo). */
object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }
}

/** SimHash over a token array: per token, a 64-bit hash votes ±1 on each bit
  * position; the sign of each accumulated position becomes the output bit.
  * Near-duplicate documents produce signatures at small Hamming distance.
  * (Charikar 2002, public algorithm; the reference engine has no analog —
  * this is a north-star extension operator.)
  *
  * Implemented as a native Catalyst Expression (SURVEY §2 preference order:
  * custom Expression over UDF). CodegenFallback keeps it simple; the per-row
  * cost is O(tokens) either way and the expression is still
  * partition-parallel.
  */
/** Row-level kernels, kept as object methods so generated Java code can call
  * them through the static forwarders (graft.functions.SimHashImpl.hash). */
object SimHashImpl {
  def hash(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Fnv64.hashBytes(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def rollingMin(s: UTF8String, k: Int): Long = {
    val str = s.toString
    if (str.length < k) return Fnv64.hashBytes(str.getBytes("UTF-8"))
    val Base = 1315423911L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + str.charAt(i); i += 1 }
    var minH = h ^ (h >>> 31)
    i = k
    while (i < str.length) {
      h = (h - str.charAt(i - k) * pow) * Base + str.charAt(i)
      val mixed = h ^ (h >>> 31)
      if (java.lang.Long.compareUnsigned(mixed, minH) < 0) minH = mixed
      i += 1
    }
    minH
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHashImpl.hash(input.asInstanceOf[ArrayData])
  // native codegen: a static kernel call — keeps the containing operator
  // inside whole-stage codegen (CodegenFallback would break the span)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.hash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Content-defined document fingerprint: the minimum of a 64-bit rolling
  * polynomial hash over all k-length character windows (a winnowing-style
  * fingerprint; Schleimer et al. 2003, public algorithm). Equal fingerprints
  * are a cheap first-pass duplicate signal that is robust to content
  * reordering at window granularity.
  */
case class RollingMinHash64(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHashImpl.rollingMin(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.rollingMin($c, $k)")
  override protected def withNewChildInternal(c: Expression): RollingMinHash64 =
    copy(child = c)
}

/** Average-hash (aHash) perceptual fingerprint of a binary media payload:
  * the payload is average-pooled into 64 cells (the stand-in for an 8×8
  * grayscale downsample — with real codecs the pooling would run over
  * decoded pixels; the pooling/threshold shape is the actual aHash
  * algorithm, public and standard) and each cell emits one bit by
  * comparing its mean against the global mean. Local edits perturb few
  * cells, so near-identical media land at small Hamming distance —
  * the binary-payload analog of SimHash for text. */
object MediaHashImpl {
  def aHash(payload: Array[Byte]): Long = {
    if (payload == null || payload.length == 0) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Int](64)
    val len = payload.length
    var i = 0
    while (i < len) {
      val c = ((i.toLong * 64) / len).toInt
      sums(c) += (payload(i) & 0xff)
      counts(c) += 1
      i += 1
    }
    var total = 0L
    var c = 0
    while (c < 64) { total += sums(c); c += 1 }
    val globalMean = total.toDouble / len
    var out = 0L
    c = 0
    while (c < 64) {
      if (counts(c) > 0 && sums(c).toDouble / counts(c) > globalMean)
        out |= (1L << c)
      c += 1
    }
    out
  }
}

case class MediaHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    MediaHashImpl.aHash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaHashImpl.aHash($c)")
  override protected def withNewChildInternal(c: Expression): MediaHash64 = copy(c)
}

/** Multiply-shift bucket: `((x * mult) >>> shift) % mod` in WRAPPING 64-bit
  * arithmetic (Knuth multiplicative hashing — the well-mixed HIGH bits of
  * the product). A native expression rather than column arithmetic because
  * Spark 4 runs ANSI mode by default: `col * lit` THROWS on 64-bit overflow,
  * so the plain-expression form works on test-sized ids and fails on
  * realistic corpus ids (> ~2³²). JVM long multiply wraps, matching the
  * HUGEINT `mod 2⁶⁴` replication used in oracle SQL. */
case class MulShiftBucket(child: Expression, mult: Long, shift: Int, mod: Int)
  extends UnaryExpression {
  require(shift > 32 && shift < 64 && mod > 0)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ((input.asInstanceOf[Long] * mult) >>> shift) % mod
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"((($c * ${mult}L) >>> $shift) % $mod)")
  override protected def withNewChildInternal(c: Expression): MulShiftBucket =
    copy(child = c)
}

/** Row kernel for the MinHash signature aggregate: from one 64-bit base hash
  * per shingle, derive the k per-position hashes as a splitmix64 stream
  * (Steele et al. 2014, public algorithm: state += golden-gamma, output =
  * murmur-style finalizer) and min-fold them into the buffer. The finalizer
  * is a full-avalanche bijective mixer, so per-position orderings behave as
  * independent random permutations of shingle space — unlike an affine
  * (a·h+b) mod p family over an oversized modulus, which is nearly
  * order-preserving and collapses every position (round-1 lesson). Doing the
  * mixing on the BASE hash means the shingle string is hashed once per row,
  * not k times. */
object MinHashImpl {
  final val Gamma = 0x9e3779b97f4a7c15L

  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e9b5L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def update(buf: Array[Long], base: Long): Unit = {
    var s = base
    var i = 0
    while (i < buf.length) {
      s += Gamma
      val h = mix(s)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
  }
}

/** MinHash signature as ONE typed aggregate (`array<bigint>` of k mins)
  * instead of k independent `min(xxhash64(seed_i, shingle))` columns. Same
  * contract as the k-aggregate form, but: (a) the shingle is hashed once per
  * row, with k cheap integer mixes replacing k full string hashes, and
  * (b) the aggregation is a single small object buffer instead of a k-column
  * codegen'd buffer — the k-wide form dominated plan compile time at small
  * SF and per-row cost at scale. Partial aggregation (map-side combine)
  * still applies: buffers merge elementwise. */
case class MinHashSigAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(k > 0)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashImpl.update(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashSigAgg =
    copy(child = c)
}

/** Misra–Gries heavy-hitters sketch over a string column (NOT Space-Saving:
  * MG decrements all counters and its counts are LOWER bounds; Space-Saving
  * replaces the min counter and over-estimates — don't swap the semantics):
  * one bounded map of `capacity` counters per aggregation buffer. Any term
  * with true frequency > N/(capacity+1) is GUARANTEED to survive (the
  * classic MG bound), so downstream exact verification over the candidate
  * set yields the exact heavy-hitter answer without a full-vocabulary
  * aggregate — the sketch→verify pattern this repo uses for MinHash too.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS'12): sum counters by key, then subtract the (capacity+1)-th
  * largest counter from all and drop the non-positives. Partial (map-side)
  * aggregation therefore stays correct under any partitioning.
  *
  * Counts in the sketch are LOWER BOUNDS, not exact frequencies — callers
  * should treat the output as a candidate set.
  */
/** Shared Misra–Gries row kernels — used by both the batch typed aggregate
  * ([[MisraGriesAgg]]) and the streaming state machine
  * (graft.streaming.EventsStream.heavyHitters), so batch and stream apply
  * ONE sketch semantics. */
object MisraGries {
  type Buf = scala.collection.mutable.HashMap[String, Long]

  /** One MG increment: bump, insert under capacity, else decrement-all. */
  def add(buf: Buf, term: String, capacity: Int): Unit =
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1)
      case None if buf.size < capacity => buf.update(term, 1L)
      case None => // decrement-all step: every live counter pays one
        val dead = List.newBuilder[String]
        buf.mapValuesInPlace { (k, c) => if (c == 1) { dead += k; 0L } else c - 1 }
        dead.result().foreach(buf.remove)
    }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): sum by key,
    * subtract the (capacity+1)-th largest counter, drop non-positives. */
  def mergeInto(a: Buf, b: Buf, capacity: Int): Buf = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      val cut = a.values.toArray.sortBy(-_).apply(capacity)
      val dead = List.newBuilder[String]
      a.mapValuesInPlace { (k, c) => if (c <= cut) { dead += k; 0L } else c - cut }
      dead.result().foreach(a.remove)
    }
    a
  }
}

case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    scala.collection.mutable.HashMap[String, Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(capacity > 0)

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def createAggregationBuffer(): Buf = scala.collection.mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) MisraGries.add(buf, v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = MisraGries.mergeInto(a, b, capacity)

  override def eval(buf: Buf): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toArray
    val byteArrs = entries.map { case (t, _) => t.getBytes("UTF-8") }
    val bb = java.nio.ByteBuffer.allocate(
      4 + byteArrs.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(byteArrs).foreach { case ((_, c), tb) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf: Buf = scala.collection.mutable.HashMap.empty
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      buf.update(new String(tb, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cnt", LongType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object HashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** SimHash of an array<string> token column. */
  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Winnowing-style rolling min-hash fingerprint of a string column. */
  def fingerprint(text: Column, k: Int = 16): Column =
    ColumnBridge.column(RollingMinHash64(ColumnBridge.expression(text), k))

  /** aHash perceptual fingerprint of a binary media payload. */
  def mediaHash(payload: Column): Column =
    ColumnBridge.column(MediaHash64(ColumnBridge.expression(payload)))

  /** Overflow-safe multiply-shift bucket in [0, mod). The input is coerced
    * to LongType at the Column layer so interpreted and codegen'd paths see
    * the same child type (the bare expression assumes a long child). */
  def mulShiftBucket(x: Column, mult: Long, shift: Int, mod: Int): Column =
    ColumnBridge.column(
      MulShiftBucket(ColumnBridge.expression(x.cast("long")), mult, shift, mod))

  /** MinHash signature aggregate over a 64-bit base-hash column: k
    * splitmix64-derived mins in one pass. Use with
    * `groupBy(doc).agg(minhashSig(xxhash64(col("shingle")), 64))`. */
  def minhashSig(baseHash: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashSigAgg(ColumnBridge.expression(baseHash), k).toAggregateExpression())

  /** Misra–Gries heavy-hitters candidate sketch: array<struct<term,cnt>>
    * of at most `capacity` candidates; every term with true frequency
    * > N/(capacity+1) is guaranteed present. Counts are lower bounds —
    * join back to exact counts for the final answer. */
  def misraGries(term: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(term), capacity).toAggregateExpression())

  /** Hamming distance between two 64-bit signatures (composed built-ins —
    * stays inside codegen). */
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }
}

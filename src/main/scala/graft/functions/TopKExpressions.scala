package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate — the SKEW-IMMUNE form of a
  * `row_number() OVER (PARTITION BY key ORDER BY …) <= k` filter.
  *
  * The window form must co-locate every row of a key in ONE task before
  * ranking; under a Zipf key distribution the hot key becomes a straggler
  * no engine can split (AQE cannot break a window partition, and a
  * bucketed layout pins it harder — measured 13.7× max/median task ratio
  * in graft.perf.SkewRehearsal). This aggregate keeps a bounded k-element
  * min-heap per PARTIAL buffer instead: map-side combine reduces the hot
  * key to one k-row buffer per input partition BEFORE the shuffle, so the
  * reducer merges (partitions × k) rows regardless of how hot the key is
  * — straggler ratio 1.0 by construction (SkewRehearsal's
  * user_rank_agg/user_rank_topk rows).
  *
  * Semantics: keeps the k LARGEST struct values in the struct's natural
  * (field-by-field) ordering; callers encode direction inside the struct
  * (descending value = the value itself first; ascending tiebreak on an
  * id = the negated id — the same shaping a multi-key ORDER BY compiles
  * to). Output is `array<struct>` sorted descending, so element i is rank
  * i+1. Deterministic for distinct struct values; ties are broken by the
  * caller's tiebreak field exactly as in the window form.
  */
case class TopKStructAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    scala.collection.mutable.PriorityQueue[InternalRow]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(k > 0, "top_k_struct: k must be positive")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ord: Ordering[InternalRow] =
    InterpretedOrdering.forSchema(structType.fields.map(_.dataType))
  // PriorityQueue dequeues the MAX of its ordering; reversed, the head is
  // the smallest kept row — the eviction candidate
  private lazy val minFirst: Ordering[InternalRow] = ord.reverse

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_struct expects an orderable non-empty struct, got $other")
  }

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[InternalRow] =
    scala.collection.mutable.PriorityQueue.empty[InternalRow](minFirst)

  // ownership projection for kept rows: child.eval on a struct-building
  // expression returns a GenericInternalRow whose variable-length fields
  // (UTF8String, binary) still POINT INTO the operator's reused input
  // buffer — a shallow row.copy() clones the reference array, not the
  // bytes, and the kept "row" silently mutates when the scan reuses the
  // buffer (caught by capPerKey's wide-payload round-trip: a content_hash
  // came back as a window into later rows' bytes). Projecting to an
  // UnsafeRow and copying owns every byte; numeric-only structs never hit
  // the alias, which is why the small rank/KNN structs were clean.
  private lazy val ownProj =
    UnsafeProjection.create(structType.fields.map(_.dataType))

  /** Bounded offer: rows are deep-copied ONLY when kept. */
  private def offer(buf: scala.collection.mutable.PriorityQueue[InternalRow],
      row: InternalRow, owned: Boolean): Unit =
    if (buf.size < k) buf.enqueue(if (owned) row else ownProj(row).copy())
    else if (ord.compare(row, buf.head) > 0) {
      buf.dequeue()
      buf.enqueue(if (owned) row else ownProj(row).copy())
    }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[InternalRow],
      input: InternalRow): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow], owned = false)
    buf
  }

  override def merge(
      a: scala.collection.mutable.PriorityQueue[InternalRow],
      b: scala.collection.mutable.PriorityQueue[InternalRow]): scala.collection.mutable.PriorityQueue[InternalRow] = {
    b.foreach(offer(a, _, owned = true)) // b's rows are already copies
    a
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray.sorted(minFirst) // ascending-by-reverse = descending
    new GenericArrayData(arr.map(identity[Any]))
  }

  // serialization: length-prefixed UnsafeRow bytes of a 1-field wrapper row
  // holding the struct (UnsafeProjection handles every orderable type)
  private lazy val wrapProj = UnsafeProjection.create(Array[DataType](structType))
  override def serialize(buf: scala.collection.mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map { r =>
      val u = wrapProj(new GenericInternalRow(Array[Any](r)))
      u.getBytes // copies
    }
    val bb = java.nio.ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val u = new UnsafeRow(1)
      u.pointTo(rowBytes, len)
      buf.enqueue(u.getStruct(0, structType.size).copy())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "top_k_struct"
  override def withNewMutableAggBufferOffset(o: Int): TopKStructAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKStructAgg =
    copy(child = c)
}

object TopKFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Top-k rows per group as a sorted `array<struct>` — see
    * [[TopKStructAgg]] for the skew contract. Use with
    * `groupBy(key).agg(topKStruct(struct(desc-shaped fields…), k))`. */
  def topKStruct(order: Column, k: Int): Column =
    ColumnBridge.column(
      TopKStructAgg(ColumnBridge.expression(order), k).toAggregateExpression())
}

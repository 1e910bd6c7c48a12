package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Row-level vector kernels as static methods so generated Java calls them
  * directly (the SimHashImpl pattern). Each mirrors the higher-order-
  * function expression it replaces EXACTLY — same left-to-right IEEE fold
  * from 0, same null semantics (null element or length mismatch → null,
  * like zip_with's padding) — so swapping implementations cannot move a
  * single bit in any oracle-checked result. The point of going native:
  * `aggregate`/`zip_with` lambdas are interpreted per element (closure
  * dispatch per term, no whole-stage codegen); these run as one tight JVM
  * loop per row inside the codegen'd stage. */
object VecKernelsImpl {

  /** Σ aᵢ·bᵢ in index order, accumulated from 0.0 (the
    * [[graft.ext.Similarity.dot]] contract). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** round(Σ (aᵢ-bᵢ)² · 1e6) as long — the scaled-integer squared-L2 the
    * PQ kernels rank by. The rounding reproduces Spark's
    * `round(expr, 0).cast("long")` on a double EXACTLY:
    * BigDecimal.valueOf(d) (shortest-repr) → setScale(0, HALF_UP) →
    * double → truncating long cast. */
  def l2sqScaled(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    val rounded = java.math.BigDecimal.valueOf(s * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    java.lang.Long.valueOf(rounded.toLong)
  }

  /** Σ aᵢ·bᵢ over long arrays (int8-quantized kernels) — exact integer
    * arithmetic, order-independent by construction. */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** Native float/double dot product: array<float|double> × array<float|
  * double> → double. Value-identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`. */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernelsImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDot")
      s"""java.lang.Double $r = graft.functions.VecKernelsImpl.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(left = l, right = r)
}

/** Native scaled squared-L2: array<float|double> × array<float|double> →
  * bigint. Value-identical to
  * `round(aggregate(zip_with(a, b, (x, y) -> pow(double(x) - double(y), 2)),
  * 0.0, +) * 1e6).cast("long")`. */
case class VecL2SqScaled(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq_scaled expects array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernelsImpl.l2sqScaled(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecL2")
      s"""java.lang.Long $r = graft.functions.VecKernelsImpl.l2sqScaled(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecL2SqScaled = copy(left = l, right = r)
}

/** Native long dot product: array<bigint> × array<bigint> → bigint.
  * Value-identical to
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +)`. */
case class VecDotLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_long expects array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernelsImpl.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotL")
      s"""java.lang.Long $r = graft.functions.VecKernelsImpl.dotLong($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDotLong = copy(left = l, right = r)
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface registration for the engine's native Catalyst expressions:
  * after `install`, pure-SQL users (spark.sql, the CLI, the HTTP API) can
  * call the same codegen'd kernels the DataFrame API uses — no UDF wrapper,
  * no serialization boundary. Installed automatically by
  * [[graft.GraftExtensions]] next to the HANA dialect functions.
  *
  * Static parameters (k, capacity, multiplier…) must be literals: these
  * expressions specialize their buffers and codegen on the constant, so a
  * column-valued parameter cannot be supported.
  */
object GraftFunctions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) =>
      if (v < Int.MinValue || v > Int.MaxValue) throw new IllegalArgumentException(
        s"$name out of int range: $v")
      else v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got: $other")
  }

  private def arity(name: String, want: Int, e: Seq[Expression]): Unit =
    if (e.size != want) throw new IllegalArgumentException(
      s"$name expects $want args, got ${e.size}")

  private def longLit(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got: $other")
  }

  // once-per-session: repeat installs are no-ops, so the hot SQL path
  // (HanaDialect.sql calls install on every statement) neither re-registers
  // nor spams "replaced a previously registered function" warnings. Weak
  // keys — a retired session must not be pinned by this guard.
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def install(spark: SparkSession): Unit = {
    if (installed.put(spark, java.lang.Boolean.TRUE) != null) return
    val reg = spark.sessionState.functionRegistry
    def register(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")

    // simhash64(tokens array<string>) → bigint
    register("simhash64") { e => arity("simhash64", 1, e); SimHash64(e.head) }

    // rolling_minhash64(text[, k]) → bigint (winnowing fingerprint)
    register("rolling_minhash64") {
      case Seq(text) => RollingMinHash64(text, 16)
      case Seq(text, k) => RollingMinHash64(text, intLit(k, "k"))
      case e => throw new IllegalArgumentException(
        s"rolling_minhash64 expects 1-2 args, got ${e.size}")
    }

    // media_hash64(payload binary) → bigint (aHash perceptual fingerprint)
    register("media_hash64") { e => arity("media_hash64", 1, e); MediaHash64(e.head) }

    // mulshift_bucket(x, mult, shift, mod) → int in [0, mod)
    register("mulshift_bucket") { e =>
      arity("mulshift_bucket", 4, e)
      MulShiftBucket(
        org.apache.spark.sql.catalyst.expressions.Cast(
          e(0), org.apache.spark.sql.types.LongType),
        longLit(e(1), "mult"), intLit(e(2), "shift"), intLit(e(3), "mod"))
    }

    // minhash_sig(base_hash, k) → array<bigint>: aggregate, k mins
    register("minhash_sig") { e =>
      arity("minhash_sig", 2, e); MinHashSigAgg(e(0), intLit(e(1), "k"))
    }

    // misra_gries(term, capacity) → array<struct<term,cnt>>: aggregate
    register("misra_gries") { e =>
      arity("misra_gries", 2, e); MisraGriesAgg(e(0), intLit(e(1), "capacity"))
    }

    // top_k_struct(o struct, k) → array<struct> (desc): bounded aggregate,
    // the skew-immune rank-window replacement
    register("top_k_struct") { e =>
      arity("top_k_struct", 2, e); TopKStructAgg(e(0), intLit(e(1), "k"))
    }

    // vec_dot(a array<float|double>, b) → double: codegen'd in-order fold
    register("vec_dot") { e => arity("vec_dot", 2, e); VecDot(e(0), e(1)) }

    // vec_dot_long(a array<bigint>, b) → bigint: exact integer dot
    register("vec_dot_long") { e =>
      arity("vec_dot_long", 2, e); VecDotLong(e(0), e(1))
    }
  }
}

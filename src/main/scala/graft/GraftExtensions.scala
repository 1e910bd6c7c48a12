package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.governance.PiiGate

/** Spark-native installation point: inject the engine into ANY SparkSession
  * via config — no wrapper API required:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Installs (1) the PII governance gate as an analyzer check rule — every
  * query on the session, SQL or DataFrame API, passes through it with no way
  * to route around — and (2) the function surface: the HANA dialect
  * functions (HanaDialect.install) and the engine's native Catalyst kernels
  * (GraftFunctions.install: simhash64, rolling_minhash64, media_hash64,
  * mulshift_bucket, minhash_sig, misra_gries). All are temp functions, not
  * parser changes, matching SURVEY §4's conclusion that the reference needs
  * no custom SparkStrategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectCheckRule { session =>
      // also ensure the dialect + native-kernel functions exist on any
      // session the extension is installed into
      graft.sql.HanaDialect.install(session)
      graft.functions.GraftFunctions.install(session)
      (plan: LogicalPlan) => PiiGate.checkPlan(plan)
    }
  }
}

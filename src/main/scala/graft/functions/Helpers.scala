package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by the query library.
  *
  * Oracle-parity policy (see tools/check.py): every numeric that reaches a
  * query's output is either
  *   - an exact integer (`BIGINT` both sides),
  *   - a DOUBLE produced by exact decimal arithmetic: cast the double
  *     *inputs* to DecimalType before aggregating (exact, order-independent
  *     on both engines), then cast the FINAL output to DOUBLE on both sides.
  *     Never output a DECIMAL column — the driver's hash canonicalizes
  *     decimals through float repr, so a trailing-zero decimal string
  *     ('51171.90') breaks the hash even when the engines agree exactly.
  *     The sums here stay under 2^53 ulp-units, so the double is exact and
  *     repr-stable on both engines. Or
  *   - a ratio: exact decimal sums → cast to double → IEEE arithmetic →
  *     `round(_, n)` — deterministic on both engines.
  * Raw double aggregation is avoided because float addition is
  * order-dependent and a 32-thread shuffle does not sum in DuckDB's order.
  */
object Helpers {

  /** Money semantics: TPC-H prices/amounts are 2-decimal values stored as
    * doubles; the decimal cast recovers the exact value. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Quantities: integer-valued doubles in this corpus; 3 decimals matches
    * the reference's QUAN(13,3) convention (SURVEY §1.3). */
  def qty(c: Column): Column = c.cast(DecimalType(18, 3))

  /** SAP sign convention (SURVEY §1.3): amounts are stored positive and a
    * debit/credit indicator flips the sign (`SHKZG='H'` → negative). On the
    * TPC-H corpus the analog indicator is `l_returnflag='R'` (returned →
    * negative contribution). Reference: sap_sql_engine.py:577-579.
    */
  def signedAmount(indicator: Column, amount: Column, negateOn: String = "H"): Column =
    when(indicator === negateOn, -amount).otherwise(amount)

  /** Horizontal (cross-column) sum with NULL-as-zero — the reference's
    * HSL01..HSL16 / WKG001..WKG012 period-bucket pattern (SURVEY §2.4,
    * sap_semantic_model.json:7211-7221). */
  def horizontalSum(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c, lit(0))).reduce(_ + _)

  /** Open-item test: NULL or empty string (reference AUGDT convention,
    * SURVEY §2.2). */
  def isOpen(c: Column): Column = c.isNull || c === ""

  /** Soft-delete standing filter (reference LOEKZ='X', SURVEY §2.2). */
  def notDeleted(c: Column): Column = c.isNull || c =!= "X"

  /** Aging bucket per the reference's FBL5N aging template
    * (sap_semantic_model.json:7635-7645): days past due → named bucket.
    * `asOf` is an injected fixed date — the reference pins 'now' for
    * determinism (expand_sap_test_db.py:102). */
  def agingBucket(daysPastDue: Column): Column =
    when(daysPastDue <= 0, "Not yet due")
      .when(daysPastDue.between(1, 30), "1-30 days")
      .when(daysPastDue.between(31, 60), "31-60 days")
      .when(daysPastDue.between(61, 90), "61-90 days")
      .otherwise("Over 90 days")

  /** Custom sort key for aging buckets (ORDER BY CASE pattern, §2.5). */
  def agingBucketOrder(bucket: Column): Column =
    when(bucket === "Not yet due", 0)
      .when(bucket === "1-30 days", 1)
      .when(bucket === "31-60 days", 2)
      .when(bucket === "61-90 days", 3)
      .otherwise(4)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Helpers._

/** SURVEY.md §2.4-2.6: aggregations, sorts/limits, scalar-function catalog,
  * plus window analytics (beyond the reference surface — SURVEY §2.5 notes
  * windows are absent there; they are first-class here).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Fixed "as-of" date for aging — the reference pins 'now' for determinism
    * (expand_sap_test_db.py:102 pins 2026-03-06). */
  val AsOf = "2001-06-01"

  val queries: Seq[Q] = Seq(
    // ── §2.4 GROUP BY on an expression (reference GROUP BY SUBSTR(OBJNR,7))
    Q(
      "q_agg_groupby_expr",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.groupBy(year(col("o_orderdate")).cast("long").as("order_year"),
            substring(col("o_orderpriority"), 1, 1).as("prio_class"))
          .agg(count(lit(1)).as("n"),
            sum(money(col("o_totalprice"))).cast(DecimalType(38, 2)).as("total"))
          .orderBy(col("order_year"), col("prio_class"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
        SUBSTR(o_orderpriority, 1, 1) AS prio_class,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
        FROM orders GROUP BY 1, 2 ORDER BY order_year, prio_class""")),

    // ── §2.4 HAVING (reference "Purchase orders over threshold value") ───
    Q(
      "q_agg_having",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(col("l_suppkey"))
          .agg(sum(money(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("total_spend"),
            count(lit(1)).as("n_lines"))
          .filter(col("total_spend") > lit(50000).cast(DecimalType(18, 2)))
          .orderBy(desc("total_spend"), col("l_suppkey"))
      },
      Some("""SELECT l_suppkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_spend,
        COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) > CAST(50000 AS DECIMAL(18,2))
        ORDER BY total_spend DESC, l_suppkey""")),

    // ── §2.4 conditional aggregation / pivot-by-CASE (reference
    //    actual-vs-plan WRTTP='04' vs '01', sap_semantic_model.json:7537) ─
    Q(
      "q_agg_conditional_pivot",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
          .agg(
            sum(when(col("l_returnflag") === "R", money(col("l_extendedprice")))
              .otherwise(lit(0).cast(DecimalType(18, 2))))
              .cast(DecimalType(38, 2)).as("returned_amt"),
            sum(when(col("l_returnflag") =!= "R", money(col("l_extendedprice")))
              .otherwise(lit(0).cast(DecimalType(18, 2))))
              .cast(DecimalType(38, 2)).as("kept_amt"),
            count(lit(1)).as("n"))
          .orderBy(col("ship_year"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS returned_amt,
        CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS kept_amt,
        COUNT(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY ship_year""")),

    // ── §2.5 ORDER BY a CASE expression + aging buckets (reference FBL5N
    //    aging template, sap_semantic_model.json:7635-7645) ───────────────
    Q(
      "q_aging_buckets",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val open = o.filter(col("o_orderstatus") === "O")
          .withColumn("days_past_due",
            datediff(lit(AsOf).cast("date"), to_date(col("o_orderdate"))).cast("long"))
          .withColumn("aging_bucket", agingBucket(col("days_past_due")))
        open.groupBy(col("aging_bucket"))
          .agg(count(lit(1)).as("n_orders"),
            sum(money(col("o_totalprice"))).cast(DecimalType(38, 2)).as("open_amount"))
          .orderBy(agingBucketOrder(col("aging_bucket")))
      },
      Some(s"""SELECT aging_bucket, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS open_amount
        FROM (
          SELECT o_totalprice,
            CASE WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') <= 0 THEN 'Not yet due'
                 WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') BETWEEN 1 AND 30 THEN '1-30 days'
                 WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') BETWEEN 31 AND 60 THEN '31-60 days'
                 WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '$AsOf') BETWEEN 61 AND 90 THEN '61-90 days'
                 ELSE 'Over 90 days' END AS aging_bucket
          FROM orders WHERE o_orderstatus = 'O')
        GROUP BY aging_bucket
        ORDER BY CASE aging_bucket WHEN 'Not yet due' THEN 0 WHEN '1-30 days' THEN 1
          WHEN '31-60 days' THEN 2 WHEN '61-90 days' THEN 3 ELSE 4 END""")),

    // ── window: rank-per-group (row_number, deterministic tie-break) ─────
    Q(
      "q_window_rank",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val rev = l.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("s_suppkey"), col("s_name"))
          .agg(sum(money(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("revenue"))
        val w = Window.partitionBy(col("n_name"))
          .orderBy(desc("revenue"), col("s_suppkey"))
        rev.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 2)
          .select(col("n_name"), col("rk"), col("s_suppkey"), col("s_name"), col("revenue"))
          .orderBy(col("n_name"), col("rk"))
      },
      Some("""SELECT n_name, rk, s_suppkey, s_name, revenue FROM (
        SELECT n_name, s_suppkey, s_name, revenue,
          CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS BIGINT) AS rk
        FROM (
          SELECT n_name, s_suppkey, s_name,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name, s_suppkey, s_name))
        WHERE rk <= 2 ORDER BY n_name, rk"""),
      bench = true)
  )
}

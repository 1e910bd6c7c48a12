package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Helpers._

/** SURVEY.md §2.1-2.3 + flagship: scans, projection/filter/predicates, joins.
  *
  * Every query returns only hash-stable types (BIGINT, DECIMAL with a pinned
  * scale, STRING, DATE) and carries a deterministic ORDER BY — see
  * Helpers' oracle-parity policy.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** q_like_computed's r17 plan rewrite, factored for the adversarial-input
    * spec: per-part family size under `p2.p_name LIKE
    * CONCAT(SUBSTR(p1.p_name,1,4), '%')`. When the 4-char prefix is
    * full-length and metacharacter-free the predicate is exactly
    * "first four chars equal", so the family size is a per-prefix COUNT
    * attached by an equi-join (guide §2.3 aggregate-before-join: n +
    * |prefixes| work); rows whose prefix is short or carries %/_/\\ keep
    * the general LIKE nested loop, making the rewrite exact for ANY input
    * (the residual branch is bounded by data shape — zero rows on the
    * driver corpus). Output ≡ the naive |part|² LIKE join + groupBy
    * (pinned in RelationalRewriteSpec and by the oracle hash). */
  private[graft] def likePrefixFamily(part: DataFrame,
      part2: DataFrame): DataFrame = {
    val pref = substring(col("p_name"), 1, 4)
    val safe = (length(col("p_name")) >= 4) &&
      instr(pref, "%") === 0 && instr(pref, "_") === 0 &&
      instr(pref, "\\") === 0
    val famCounts = part2
      .groupBy(substring(col("p_name"), 1, 4).as("__pref"))
      .agg(count(lit(1)).as("__fam"))
    val safeSide = part.filter(coalesce(safe, lit(false)))
      .select(col("p_partkey"), pref.as("__pref"))
      .join(famCounts, Seq("__pref"))
      .select(col("p_partkey"), col("__fam").as("family_size"))
    val p1u = part.filter(!coalesce(safe, lit(false))).as("p1")
    val unsafeSide = p1u
      .join(part2.as("p2"),
        expr("p2.p_name LIKE CONCAT(SUBSTR(p1.p_name, 1, 4), '%')"))
      .groupBy(col("p1.p_partkey").as("p_partkey"))
      .agg(count(lit(1)).as("family_size"))
    safeSide.unionAll(unsafeSide)
  }

  val queries: Seq[Q] = Seq(
    // ── flagship: TPC-H Q1-style pricing summary ─────────────────────────
    // SURVEY §2.4 SUM/COUNT + conditional arithmetic; the reference's
    // trial-balance-shaped "one pass, many aggregates" pattern.
    Q(
      "q_pricing_summary",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // exact decimal sums internally; final cast to DOUBLE because the
            // driver's hash canonicalizes through float repr (trailing-zero
            // decimal strings break it) — see oracle-parity policy in Helpers
            sum(qty(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(money(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - money(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // ── §2.2 projection + aliasing to business names + computed column ───
    Q(
      "q_projection_alias",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(
          col("o_orderkey").as("order_id"),
          upper(col("o_orderpriority")).as("priority"),
          money(col("o_totalprice")).cast("double").as("total"),
          (money(col("o_totalprice")) * lit(0.10).cast(DecimalType(18, 2)))
            .cast("double").as("fee"))
          .orderBy(col("order_id"))
      },
      Some("""SELECT o_orderkey AS order_id,
        UPPER(o_orderpriority) AS priority,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.10 AS DECIMAL(18,2)) AS DOUBLE) AS fee
        FROM orders ORDER BY order_id""")),

    // ── §2.2 equality + range predicates (string + date) ─────────────────
    Q(
      "q_filter_range",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O" &&
            col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") <= lit("1996-06-30"))
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("order_date"),
            money(col("o_totalprice")).cast("double").as("total"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <= TIMESTAMP '1996-06-30 00:00:00'
        ORDER BY o_orderkey""")),

    // ── §2.2 BETWEEN (numeric) ───────────────────────────────────────────
    Q(
      "q_between",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.filter(col("p_size").between(10, 25) &&
            col("p_retailprice").between(500.0, 1500.0))
          .select(col("p_partkey"), col("p_name"),
            col("p_size").cast("long").as("p_size"),
            money(col("p_retailprice")).cast("double").as("price"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, CAST(p_size AS BIGINT) AS p_size,
        CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM part
        WHERE p_size BETWEEN 10 AND 25 AND p_retailprice BETWEEN 500.0 AND 1500.0
        ORDER BY p_partkey""")),

    // ── §2.2 LIKE with literal pattern ───────────────────────────────────
    Q(
      "q_like_pattern",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.filter(col("p_name").like("%small%") || col("p_name").like("blue%"))
          .select(col("p_partkey"), col("p_name"), col("p_brand"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, p_brand FROM part
        WHERE p_name LIKE '%small%' OR p_name LIKE 'blue%'
        ORDER BY p_partkey""")),

    // ── §2.2 LIKE with computed pattern (reference: OBJNR LIKE
    //    SUBSTR(s.OBJNR,1,8)||'%', sap_semantic_model.json:7679-7690) ─────
    Q(
      "q_like_computed",
      (s, dir) => {
        // r17 rewrite (guide §2.3/§3): the computed pattern
        // CONCAT(SUBSTR(p_name,1,4), '%') is a LITERAL prefix test
        // whenever the 4-char prefix is full-length and free of LIKE
        // metacharacters (%, _, \) — for those rows "p2 LIKE pref%" is
        // exactly "first four chars equal", so family_size is a plain
        // per-prefix COUNT attached by an equi-join: n + |prefixes| work
        // where the naive form nested-loops |part|² LIKE evaluations
        // (365 s at sf0.1; O(n²) at scale). Rows whose prefix is short or
        // carries a metacharacter (none in this corpus — the branch is
        // bounded by data shape, not corpus size) keep the general LIKE
        // nested loop, so the rewrite is exact for ANY input. Oracle SQL
        // keeps the naive join; hash-verified identical.
        likePrefixFamily(t(s, dir, "part"), t(s, dir, "part"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p1.p_partkey AS p_partkey, COUNT(*) AS family_size
        FROM part p1 JOIN part p2
          ON p2.p_name LIKE CONCAT(SUBSTR(p1.p_name, 1, 4), '%')
        GROUP BY p1.p_partkey ORDER BY p_partkey""")),

    // ── §2.2 IN (value list) ─────────────────────────────────────────────
    Q(
      "q_in_list",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(money(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── §2.2 IS NULL / empty-string open-item test (reference AUGDT) ─────
    // The corpus has no stored NULLs, so the open marker is synthesized with
    // NULLIF — exercising NULLIF/COALESCE/IS NULL exactly as the reference's
    // `AUGDT IS NULL OR AUGDT = ''` convention.
    Q(
      "q_null_open_items",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.withColumn("clearing_doc", nullif(col("o_orderstatus"), lit("O")))
          .filter(col("clearing_doc").isNull || col("clearing_doc") === "")
          .select(col("o_orderkey"),
            coalesce(col("clearing_doc"), lit("OPEN")).as("status"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, COALESCE(NULLIF(o_orderstatus,'O'), 'OPEN') AS status
        FROM orders
        WHERE NULLIF(o_orderstatus,'O') IS NULL OR NULLIF(o_orderstatus,'O') = ''
        ORDER BY o_orderkey""")),

    // ── §2.3 inner equi-join chain over 5 tables (TPC-H Q5 shape);
    //    small dims broadcast, fact-side shuffle only on o_custkey ────────
    Q(
      "q_join_multi_hop",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
            col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
          .groupBy(col("n_name"))
          .agg(sum(money(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - money(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      bench = true),

    // ── §2.3 left outer join with miss detection (reference text lookups) ─
    Q(
      "q_join_left",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        c.join(urgent, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(count(col("o_orderkey")).as("n_urgent"),
            sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long").as("n_miss"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_urgent,
        CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_miss
        FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
          ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // ── §2.3 anti-join (reference "not yet delivered" NOT IN pattern) ────
    Q(
      "q_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ── §2.3 semi-join (EXISTS) ──────────────────────────────────────────
    Q(
      "q_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(money(col("o_totalprice")) >
          lit(400000).cast(DecimalType(18, 2))).select(col("o_custkey"))
        c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND CAST(o.o_totalprice AS DECIMAL(18,2)) > CAST(400000 AS DECIMAL(18,2)))
        ORDER BY c_custkey""")),

    // ── §2.4 signed aggregation (reference SHKZG debit/credit convention:
    //    CASE WHEN SHKZG='H' THEN -DMBTR ELSE DMBTR END; here the return
    //    flag 'R' negates) ─────────────────────────────────────────────────
    Q(
      "q_agg_signed",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        l.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(sum(signedAmount(col("l_returnflag"), money(col("l_extendedprice")), "R"))
            .cast("double").as("net_amount"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN -CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS net_amount
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_suppkey, s_name ORDER BY s_suppkey""")),

    // ── §2.5 Top-K (ORDER BY ... DESC LIMIT k, deterministic tie-break) ──
    Q(
      "q_topk_revenue",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") < lit("1997-01-01"))
          .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
          .agg(sum(money(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - money(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(desc("revenue"), col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, o_orderkey LIMIT 10"""),
      bench = true),

    // ── §2.1 row cap + has_more lookahead (reference fetchmany(200)+1;
    //    sap_sql_engine.py:1284-1287) ───────────────────────────────────────
    Q(
      "q_scan_limit_hasmore",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        // this corpus has duplicate (l_orderkey, l_linenumber) pairs, so the
        // sort must include every selected column to be a total order —
        // otherwise the 201-row cut is nondeterministic across engines
        l.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            money(col("l_extendedprice")).cast("double").as("price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("price"))
          .limit(201)
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM lineitem ORDER BY l_orderkey, l_linenumber, price LIMIT 201""")),

    // ── §2.3 composite-key join (reference BSEG→BSIK on
    //    BUKRS+BELNR+GJAHR): aggregate per (orderkey, suppkey), join back on
    //    both keys to pick the max-priced line ─────────────────────────────
    Q(
      "q_join_composite_key",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val agg = l.groupBy(col("l_orderkey").as("k_orderkey"), col("l_suppkey").as("k_suppkey"))
          .agg(max(money(col("l_extendedprice"))).as("max_price"),
            count(lit(1)).as("n_lines"))
        l.join(agg,
            col("l_orderkey") === col("k_orderkey") &&
            col("l_suppkey") === col("k_suppkey") &&
            money(col("l_extendedprice")) === col("max_price"))
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            col("max_price").cast("double").as("max_price"), col("n_lines"))
          .orderBy(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"))
      },
      Some("""SELECT l.l_orderkey, l.l_suppkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
        CAST(a.max_price AS DOUBLE) AS max_price, a.n_lines
        FROM lineitem l
        JOIN (SELECT l_orderkey AS k_orderkey, l_suppkey AS k_suppkey,
                MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS max_price,
                COUNT(*) AS n_lines
              FROM lineitem GROUP BY 1, 2) a
          ON l.l_orderkey = a.k_orderkey AND l.l_suppkey = a.k_suppkey
         AND CAST(l.l_extendedprice AS DECIMAL(18,2)) = a.max_price
        ORDER BY l.l_orderkey, l.l_suppkey, l_linenumber""")),

    // ── §2.3 self-join with role aliases (reference HRP1000 3×; here
    //    nation plays supplier-nation and customer-nation, TPC-H Q7 shape) ─
    Q(
      "q_join_self_roles",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val su = t(s, dir, "supplier")
        val n1 = t(s, dir, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation").select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
          .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
          .groupBy(col("supp_nation"), col("cust_nation"))
          .agg(sum(money(col("l_extendedprice"))).cast("double").as("volume"),
            count(lit(1)).as("n"))
          .filter(col("n") >= 20)
          .orderBy(col("supp_nation"), col("cust_nation"))
      },
      Some("""SELECT supp_nation, cust_nation, volume, n FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume,
          COUNT(*) AS n
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        GROUP BY n1.n_name, n2.n_name)
        WHERE n >= 20 ORDER BY supp_nation, cust_nation""")),

    // ── §2.3 correlated scalar subquery (reference R2R CO reconciliation,
    //    sap_semantic_model.json:7868-7879). Catalyst decorrelates this via
    //    RewriteCorrelatedScalarSubquery — run through spark.sql directly ──
    Q(
      "q_scalar_subquery",
      (s, dir) => {
        Tables.register(s, dir)
        s.sql("""SELECT p_partkey, p_brand, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
          FROM part p
          WHERE CAST(p_retailprice AS DECIMAL(18,2)) =
            (SELECT MAX(CAST(p2.p_retailprice AS DECIMAL(18,2)))
             FROM part p2 WHERE p2.p_brand = p.p_brand)
          ORDER BY p_partkey""")
      },
      Some("""SELECT p_partkey, p_brand, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM part p
        WHERE CAST(p_retailprice AS DECIMAL(18,2)) =
          (SELECT MAX(CAST(p2.p_retailprice AS DECIMAL(18,2)))
           FROM part p2 WHERE p2.p_brand = p.p_brand)
        ORDER BY p_partkey""")),

    // ── §2.3 document-flow hop (reference VBFA EXISTS-in-ON rewrite:
    //    materialize the flow table between the two ends). Order→line→
    //    supplier is the analog chain; no EXISTS-in-ON needed once the hop
    //    is an explicit join ────────────────────────────────────────────────
    Q(
      "q_docflow_hop",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"),
            countDistinct(col("s_suppkey")).as("n_suppliers"),
            min(to_date(col("l_shipdate"))).as("first_ship"),
            max(to_date(col("l_shipdate"))).as("last_ship"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, COUNT(*) AS n_lines,
        COUNT(DISTINCT s_suppkey) AS n_suppliers,
        MIN(CAST(l_shipdate AS DATE)) AS first_ship,
        MAX(CAST(l_shipdate AS DATE)) AS last_ship
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderkey ORDER BY o_orderkey"""),
      bench = true),

    // ── §2.3 disjunctive join condition (reference LEFT JOIN ... ON a OR
    //    EXISTS(...); falls back to BNLJ — fine when one side is tiny) ─────
    Q(
      "q_disjunctive_join",
      (s, dir) => {
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        su.join(broadcast(n),
            col("s_nationkey") === col("n_nationkey") || col("n_name") === "FRANCE",
            "left")
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(col("n_nationkey")).as("n_matches"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, COUNT(n_nationkey) AS n_matches
        FROM supplier LEFT JOIN nation
          ON s_nationkey = n_nationkey OR n_name = 'FRANCE'
        GROUP BY s_suppkey, s_name ORDER BY s_suppkey""")),

    // ── §2.5 multi-key ORDER BY with mixed direction ─────────────────────
    Q(
      "q_orderby_multi",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(col("o_orderkey"), col("o_orderstatus"),
            money(col("o_totalprice")).cast("double").as("total"))
          .orderBy(col("o_orderstatus").asc, col("total").desc, col("o_orderkey").asc)
          .limit(50)
      },
      Some("""SELECT o_orderkey, o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        FROM orders ORDER BY o_orderstatus ASC, total DESC, o_orderkey ASC LIMIT 50""")),

    // ── §2.5 UNION ALL with literal stage labels (reference o2c/p2p
    //    pipeline dashboards, sap_semantic_model.json:7774-7786) ──────────
    Q(
      "q_union_all_stacked",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def stage(label: String, status: String) =
          o.filter(col("o_orderstatus") === status)
            .agg(count(lit(1)).as("n"),
              sum(money(col("o_totalprice"))).cast("double").as("total"))
            .select(lit(label).as("stage"), col("n"), col("total"))
        stage("1. Open", "O")
          .unionAll(stage("2. Partial", "P"))
          .unionAll(stage("3. Fulfilled", "F"))
          .orderBy(col("stage"))
      },
      Some("""SELECT stage, n, total FROM (
        SELECT '1. Open' AS stage, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total FROM orders WHERE o_orderstatus='O'
        UNION ALL
        SELECT '2. Partial', COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderstatus='P'
        UNION ALL
        SELECT '3. Fulfilled', COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderstatus='F'
      ) ORDER BY stage"""))
  )
}

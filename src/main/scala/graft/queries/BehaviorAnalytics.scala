package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-5 behavioral / time-series operators: interval coverage merging
  * (gaps-and-islands), trailing-window burst profiling, CUSUM change-point
  * detection, daily-series autocorrelation, and per-user behavioral
  * entropy. Same determinism policy as the rest of the repo: integer power
  * sums until the one final double division, ln-terms scaled to integers
  * before summation, explicit tie-breaks on every argmax.
  */
object BehaviorAnalytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(
    // ── gaps-and-islands: merge each customer's overlapping 30-day order
    //    coverage windows [o_orderdate, +30d) into maximal islands — the
    //    classic interval-union (subscription coverage, validity ranges).
    //    One customer-partitioned sort; island boundary = start strictly
    //    after the running max of all previous ends (contiguous intervals
    //    merge). Equal (start, end) duplicates make the running max
    //    order-insensitive, so the flags are deterministic ─────────────────
    Q(
      "q_interval_merge",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_custkey"),
          col("o_orderdate").cast("date").as("start_d"),
          date_add(col("o_orderdate").cast("date"), 30).as("end_d"))
        val w = Window.partitionBy("o_custkey").orderBy("start_d", "end_d")
        val prevMax = max(col("end_d"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        val isl = o
          .withColumn("new_island",
            when(prevMax.isNull || col("start_d") > prevMax, 1L).otherwise(0L))
          .withColumn("island",
            sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("o_custkey", "island")
          .agg(min("start_d").as("i_start"), max("end_d").as("i_end"))
        isl.groupBy("o_custkey")
          .agg(count(lit(1)).as("n_islands"),
            sum(datediff(col("i_end"), col("i_start")).cast("long"))
              .as("covered_days"),
            min("i_start").as("first_start"), max("i_end").as("last_end"))
          .orderBy("o_custkey")
      },
      Some("""WITH iv AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS start_d,
              CAST(o_orderdate AS DATE) + 30 AS end_d FROM orders),
          f AS (SELECT o_custkey, start_d, end_d,
              CASE WHEN MAX(end_d) OVER (PARTITION BY o_custkey
                  ORDER BY start_d, end_d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR start_d > MAX(end_d) OVER (PARTITION BY o_custkey
                  ORDER BY start_d, end_d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
            FROM iv),
          g AS (SELECT o_custkey, start_d, end_d,
              SUM(new_island) OVER (PARTITION BY o_custkey
                ORDER BY start_d, end_d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM f),
          i AS (SELECT o_custkey, island, MIN(start_d) AS i_start,
              MAX(end_d) AS i_end
            FROM g GROUP BY 1, 2)
        SELECT o_custkey, COUNT(*) AS n_islands,
          CAST(SUM(datediff('day', i_start, i_end)) AS BIGINT) AS covered_days,
          MIN(i_start) AS first_start, MAX(i_end) AS last_end
        FROM i GROUP BY 1 ORDER BY o_custkey""")),

    // ── trailing-1h burst profile: each user's max event count in any
    //    trailing 3600 s window, and when that peak first occurred — the
    //    rate-anomaly / bot screen. A RANGE frame on epoch micros (counts
    //    every row in (t−1h, t], duplicate timestamps included, so the
    //    value is order-independent); peak time = MIN(us) at the max,
    //    an explicit total-order tie-break ──────────────────────────────────
    Q(
      "q_user_burst",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-3599999999L, 0)
        val b = e.withColumn("burst", count(lit(1)).over(w))
          .withColumn("mb", max(col("burst")).over(Window.partitionBy("user_id")))
        b.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            max(col("burst")).as("max_burst_1h"),
            min(when(col("burst") === col("mb"), col("us"))).as("peak_us"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
          b AS (SELECT user_id, us,
              COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS burst
            FROM e),
          m AS (SELECT user_id, us, burst,
              MAX(burst) OVER (PARTITION BY user_id) AS mb FROM b)
        SELECT user_id, COUNT(*) AS n_events, MAX(burst) AS max_burst_1h,
          MIN(CASE WHEN burst = mb THEN us END) AS peak_us
        FROM m GROUP BY 1 ORDER BY user_id""")),

    // ── CUSUM change-point: for each event type, the day where the
    //    cumulative deviation of daily counts from the series mean peaks —
    //    the level-shift detector (deploy broke a metric: WHEN?). Scaled
    //    CUSUM S'_t = D·Σ_{i≤t}n_i − t·N stays in exact integers (D = #days,
    //    N = total), so the argmax needs no float compare; tie → earliest
    //    day. Observed days only — compose with q_events_gapfill when zero
    //    days must count ─────────────────────────────────────────────────────
    Q(
      "q_events_cusum",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
        val wd = Window.partitionBy("event_type").orderBy("day")
        val scored = daily
          .withColumn("run", sum(col("n")).over(wd.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("t", row_number().over(wd))
          .withColumn("dd", count(lit(1)).over(Window.partitionBy("event_type")))
          .withColumn("tot", sum(col("n")).over(Window.partitionBy("event_type")))
          .withColumn("s", col("dd") * col("run") - col("t") * col("tot"))
        val wr = Window.partitionBy("event_type")
          .orderBy(desc("abs_s"), col("day"))
        scored.withColumn("abs_s", abs(col("s")))
          .withColumn("rn", row_number().over(wr))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("day").as("change_day"),
            round(col("s").cast("double") / col("dd").cast("double"), 6)
              .as("cusum_peak"),
            col("dd").cast("long").as("n_days"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              COUNT(*) AS n
            FROM events GROUP BY 1, 2),
          scored AS (SELECT event_type, day,
              SUM(n) OVER (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
              COUNT(*) OVER (PARTITION BY event_type) AS dd,
              SUM(n) OVER (PARTITION BY event_type) AS tot
            FROM daily),
          s AS (SELECT event_type, day, dd,
              dd * run - t * tot AS s,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY ABS(dd * run - t * tot) DESC, day) AS rn
            FROM scored)
        SELECT event_type, day AS change_day,
          ROUND(CAST(s AS DOUBLE) / CAST(dd AS DOUBLE), 6) AS cusum_peak,
          CAST(dd AS BIGINT) AS n_days
        FROM s WHERE rn = 1 ORDER BY event_type""")),

    // ── daily-series autocorrelation at lag 1 and lag 7: Pearson r over
    //    (n_t, n_{t−lag}) pairs of each type's daily counts — persistence
    //    (lag 1) and weekly seasonality (lag 7) in one pass. All sums are
    //    exact integers; the single double division happens once per
    //    (type, lag); zero-variance series → NULL via NULLIF. Pairs are
    //    formed over OBSERVED days (lag = offset in the day-ordered series);
    //    gap-fill first when calendar-lag semantics are needed ───────────────
    Q(
      "q_events_autocorr",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
        val wd = Window.partitionBy("event_type").orderBy("day")
        val lagged = daily
          .withColumn("b1", lag(col("n"), 1).over(wd))
          .withColumn("b7", lag(col("n"), 7).over(wd))
        def r(b: String) = {
          val n = sum(when(col(b).isNotNull, 1L)).cast("double")
          val sx = sum(when(col(b).isNotNull, col("n"))).cast("double")
          val sy = sum(col(b)).cast("double")
          val sxy = sum(col("n") * col(b)).cast("double")
          val sxx = sum(when(col(b).isNotNull, col("n") * col("n"))).cast("double")
          val syy = sum(col(b) * col(b)).cast("double")
          round((n * sxy - sx * sy) /
            nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), lit(0.0)), 6)
        }
        lagged.groupBy("event_type")
          .agg(sum(when(col("b1").isNotNull, 1L)).as("n_pairs_lag1"),
            r("b1").as("r_lag1"),
            sum(when(col("b7").isNotNull, 1L)).as("n_pairs_lag7"),
            r("b7").as("r_lag7"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              COUNT(*) AS n
            FROM events GROUP BY 1, 2),
          lagged AS (SELECT event_type, n,
              LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS b1,
              LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS b7
            FROM daily)
        SELECT event_type,
          COUNT(b1) AS n_pairs_lag1,
          ROUND((COUNT(b1) * SUM(CASE WHEN b1 IS NOT NULL THEN n * b1 END)
              - SUM(CASE WHEN b1 IS NOT NULL THEN n END) * SUM(b1))
            / NULLIF(SQRT(COUNT(b1) * SUM(CASE WHEN b1 IS NOT NULL THEN n * n END)
                - SUM(CASE WHEN b1 IS NOT NULL THEN n END)
                  * SUM(CASE WHEN b1 IS NOT NULL THEN n END))
              * SQRT(COUNT(b1) * SUM(CASE WHEN b1 IS NOT NULL THEN b1 * b1 END)
                - SUM(b1) * SUM(b1)), 0.0), 6) AS r_lag1,
          COUNT(b7) AS n_pairs_lag7,
          ROUND((COUNT(b7) * SUM(CASE WHEN b7 IS NOT NULL THEN n * b7 END)
              - SUM(CASE WHEN b7 IS NOT NULL THEN n END) * SUM(b7))
            / NULLIF(SQRT(COUNT(b7) * SUM(CASE WHEN b7 IS NOT NULL THEN n * n END)
                - SUM(CASE WHEN b7 IS NOT NULL THEN n END)
                  * SUM(CASE WHEN b7 IS NOT NULL THEN n END))
              * SQRT(COUNT(b7) * SUM(CASE WHEN b7 IS NOT NULL THEN b7 * b7 END)
                - SUM(b7) * SUM(b7)), 0.0), 6) AS r_lag7
        FROM lagged GROUP BY 1 ORDER BY event_type""")),

    // ── per-user behavioral entropy: Shannon entropy of each user's
    //    event-type distribution — the diversity screen (H≈0 = single-
    //    purpose bot, high H = organic mix). Same integer-scaled-ln-term
    //    policy as q_text_entropy: each type's term is rounded to 1e-10
    //    BEFORE the sum, so summation order cannot matter ───────────────────
    Q(
      "q_user_entropy",
      (s, dir) => {
        val c = t(s, dir, "events")
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        val u = c.withColumn("n",
          sum(col("c")).over(Window.partitionBy("user_id")))
        u.select(col("user_id"), col("n"),
            (-(col("c").cast("double") / col("n").cast("double")) *
              log(col("c").cast("double") / col("n").cast("double")) * lit(1e10))
              .as("term"))
          .select(col("user_id"), col("n"),
            round(col("term")).cast("long").as("ti"))
          .groupBy("user_id")
          .agg(max(col("n")).cast("long").as("n_events"),
            count(lit(1)).as("n_types"),
            round(sum(col("ti")).cast("double") / lit(1e10), 6)
              .as("entropy_nats"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS c
            FROM events GROUP BY 1, 2),
          u AS (SELECT user_id, c,
              SUM(c) OVER (PARTITION BY user_id) AS n FROM c),
          terms AS (SELECT user_id, n,
              CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e10) AS BIGINT)
                AS ti
            FROM u)
        SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
          COUNT(*) AS n_types,
          ROUND(CAST(SUM(ti) AS DOUBLE) / 1e10, 6) AS entropy_nats
        FROM terms GROUP BY 1 ORDER BY user_id""")),

    // ── order backlog over time (event sourcing): +1 on each order's open
    //    day, −1 the day after its last line ships; daily net + running
    //    backlog. The running sum is a GLOBAL window but only over the
    //    bounded day domain (the per-order work — max ship date — is a
    //    keyed aggregate). Orders whose lines never ship stay open ──────────
    Q(
      "q_orders_backlog",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey").as("ok"),
          col("o_orderdate").cast("date").as("od"))
        val lastShip = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate").cast("date")).as("cd"))
        val opens = o.select(col("od").as("day"), lit(1L).as("d"))
        // join per ORDER ROW (not per key) so duplicate orderkeys pair a
        // close with every open they produced
        val closes = o.join(lastShip, col("ok") === col("l_orderkey"))
          .select(date_add(col("cd"), 1).as("day"), lit(-1L).as("d"))
        val daily = opens.union(closes).groupBy("day")
          .agg(sum(col("d")).as("net"))
        daily.withColumn("backlog", sum(col("net"))
            .over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("day"), col("net"), col("backlog"))
          .orderBy("day")
      },
      Some("""WITH o AS (SELECT o_orderkey AS ok,
              CAST(o_orderdate AS DATE) AS od FROM orders),
          ls AS (SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS cd
            FROM lineitem GROUP BY 1),
          deltas AS (SELECT od AS day, 1 AS d FROM o
            UNION ALL
            SELECT ls.cd + 1 AS day, -1 AS d
            FROM o JOIN ls ON ls.l_orderkey = o.ok),
          daily AS (SELECT day, CAST(SUM(d) AS BIGINT) AS net
            FROM deltas GROUP BY 1)
        SELECT day, net,
          CAST(SUM(net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS backlog
        FROM daily ORDER BY day""")),

    // ── mergeable-sketch distinct rollup: per-(type, day) HLL sketches of
    //    user_id, merged per type — the 100 TB path for distinct counts
    //    over rollups (exact distincts don't merge; sketches do, same
    //    re-aggregation shape as q_rollup_incremental). The estimate is
    //    sketch-implementation-specific, so the oracle-checkable face is the
    //    EXACT distinct count plus an in-query error-bound check on the
    //    merged estimate (|est − exact| ≤ 5%·exact — the default lgK=12
    //    sketch runs ~1.6% rsd); the oracle reproduces exact + TRUE ──────────
    Q(
      "q_hll_rollup",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"), col("ts").cast("date").as("day"),
            col("user_id"))
        val daily = e.groupBy("event_type", "day")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val merged = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            hll_sketch_estimate(hll_union_agg(col("sk")))
              .as("__est"))
        val exact = e.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("distinct_users_exact"))
        merged.join(exact, Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("distinct_users_exact"),
            (abs(col("__est") - col("distinct_users_exact")).cast("double") <=
              lit(0.05) * col("distinct_users_exact").cast("double"))
              .as("within_5pct"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
          COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
          COUNT(DISTINCT user_id) AS distinct_users_exact,
          TRUE AS within_5pct
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ── Theil–Sen robust trend: per event type, the MEDIAN of all pairwise
    //    slopes of the daily-count series — outlier-resistant where OLS
    //    (q_trend_slope) is not; the pair set is day-domain-bounded
    //    (|days|²/2 per type, independent of row count at any scale).
    //    Slopes are rounded to 1e-10 before ranking so the median pick is
    //    engine-stable; even pair counts average the two middle slopes ──────
    Q(
      "q_theilsen_slope",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
        val a = daily.select(col("event_type"), col("day").as("da"), col("n").as("na"))
        val b = daily.select(col("event_type"), col("day").as("db"), col("n").as("nb"))
        val pairs = a.join(b, Seq("event_type"))
          .filter(col("da") < col("db"))
          .select(col("event_type"),
            round((col("nb") - col("na")).cast("double") /
              datediff(col("db"), col("da")).cast("double"), 10).as("slope"),
            col("da"), col("db"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("slope"), col("da"), col("db"))
        val ranked = pairs
          .withColumn("rn", row_number().over(w))
          .withColumn("m", count(lit(1)).over(Window.partitionBy("event_type")))
        ranked.filter(col("rn") === expr("(m + 1) div 2") ||
            col("rn") === expr("m div 2 + 1"))
          .groupBy("event_type")
          .agg(max(col("m")).cast("long").as("n_pairs"),
            round(avg(col("slope")), 6).as("theilsen_slope"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              COUNT(*) AS n
            FROM events GROUP BY 1, 2),
          pairs AS (SELECT a.event_type,
              ROUND(CAST(b.n - a.n AS DOUBLE)
                / CAST(datediff('day', a.day, b.day) AS DOUBLE), 10) AS slope,
              a.day AS da, b.day AS db
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.day < b.day),
          ranked AS (SELECT event_type, slope,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY slope, da, db) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS m
            FROM pairs)
        SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_pairs,
          ROUND(AVG(slope), 6) AS theilsen_slope
        FROM ranked
        WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        GROUP BY 1 ORDER BY event_type""")),

    // ── bounce rate: share of single-event sessions per day (day of the
    //    session's first event) — the engagement-quality headline. Sessions
    //    are the shared 1800 s-gap definition (q_events_sessionize);
    //    integer counts until the one final division ─────────────────────────
    Q(
      "q_bounce_rate",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        val sess = graft.ext.Sessionize.withSessionIds(e)
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"))
        sess.groupBy(timestamp_micros(col("start_us")).cast("date").as("day"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
          .select(col("day"), col("n_sessions"), col("n_bounce"),
            round(col("n_bounce").cast("double") /
              col("n_sessions").cast("double"), 6).as("bounce_rate"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
              LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts), event_id) AS prev_us
            FROM events),
          marked AS (SELECT user_id, event_id, us,
              CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
                THEN 1 ELSE 0 END AS new_sess
            FROM ev),
          sess AS (SELECT user_id, us,
              CAST(SUM(new_sess) OVER (PARTITION BY user_id
                ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS sess_id
            FROM marked),
          agg AS (SELECT user_id, sess_id, COUNT(*) AS n_events,
              MIN(us) AS start_us
            FROM sess GROUP BY 1, 2)
        SELECT CAST(make_timestamp(start_us) AS DATE) AS day,
          COUNT(*) AS n_sessions,
          CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_bounce,
          ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
        FROM agg GROUP BY 1 ORDER BY day""")),

    // ── point-in-time (leakage-safe) feature join: each purchase is joined
    //    to the SCD2 state version that was valid ONE HOUR BEFORE it — the
    //    feature-store PIT lookup that prevents label leakage (joining the
    //    state AT the event would see the event itself). Rides the as-of
    //    kernel: one key shuffle, no range cross join; versions sharing a
    //    valid_from collapse to the highest version first so the pick is
    //    deterministic on any corpus ──────────────────────────────────────────
    Q(
      "q_pit_join",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val versions = e
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w).isNull ||
              col("event_type") =!= lag(col("event_type"), 1).over(w), 1L)
              .otherwise(0L))
          .withColumn("version",
            sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("version"))
          .agg(max(col("event_type")).as("state"),
            min(col("us")).as("valid_from_us"))
        val wd = Window.partitionBy(col("user_id"), col("valid_from_us"))
          .orderBy(desc("version"))
        val dedup = versions.withColumn("rn", row_number().over(wd))
          .filter(col("rn") === 1).drop("rn")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            (col("us") - 3600000000L).as("lookup_us"))
        graft.ext.AsOfJoin.asofJoin(purchases, dedup, Seq("user_id"),
            "lookup_us", "valid_from_us", Seq("state", "version"))
          .select(col("user_id"), col("event_id"), col("lookup_us"),
            col("asof_state").as("state_1h_before"),
            col("asof_version").cast("long").as("version"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
              event_id FROM events),
          r AS (SELECT *, CASE WHEN lag(event_type) OVER
                (PARTITION BY user_id ORDER BY us, event_id)
                IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg FROM e),
          runs AS (SELECT user_id, event_type, us,
              SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
            FROM r),
          v0 AS (SELECT user_id, version, MAX(event_type) AS state,
              MIN(us) AS valid_from_us
            FROM runs GROUP BY 1, 2),
          v AS (SELECT user_id, version, state, valid_from_us FROM v0
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, valid_from_us
              ORDER BY version DESC) = 1),
          p AS (SELECT user_id, event_id, epoch_us(ts) - 3600000000 AS lookup_us
            FROM events WHERE event_type = 'purchase')
        SELECT p.user_id, p.event_id, p.lookup_us,
          v.state AS state_1h_before, CAST(v.version AS BIGINT) AS version
        FROM p ASOF JOIN v
          ON p.user_id = v.user_id AND p.lookup_us >= v.valid_from_us
        ORDER BY p.user_id, p.event_id""")),

    // ── vocabulary growth curve (Heaps' law raw material): docs in id-order
    //    buckets of 50; a term's first bucket = min bucket containing it;
    //    per bucket the NEW-term count and running vocabulary/doc totals.
    //    First-seen is a min-aggregate (order-independent), the curve a
    //    running sum over the bounded bucket domain — no per-doc scan state ──
    Q(
      "q_vocab_growth",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(expr("doc_id div 50").as("bucket"), col("doc_id"),
            explode(array_distinct(split(lower(col("text")), " "))).as("term"))
          .filter(length(col("term")) > 0)
        val firstSeen = d.groupBy("term").agg(min(col("bucket")).as("fb"))
        val newPerBucket = firstSeen.groupBy(col("fb").as("bucket"))
          .agg(count(lit(1)).as("n_new_terms"))
        val docsPerBucket = t(s, dir, "documents")
          .groupBy(expr("doc_id div 50").as("bucket"))
          .agg(count(lit(1)).as("n_docs"))
        // bucket count grows with the corpus (one per 50 docs), so the
        // cumulative curve uses the range-partitioned two-pass running sum,
        // not a single-partition window (round-6 WindowGuard audit finding)
        val joined = docsPerBucket.join(newPerBucket, Seq("bucket"), "left")
          .select(col("bucket"), col("n_docs"),
            coalesce(col("n_new_terms"), lit(0L)).as("n_new_terms"))
        val c1 = graft.ext.CorpusPipeline.globalRunningSumAuto(
          joined, col("n_docs"), col("bucket"), Seq.empty, "docs_cum")
        graft.ext.CorpusPipeline.globalRunningSumAuto(
            c1, col("n_new_terms"), col("bucket"), Seq.empty, "vocab_cum")
          .select(col("bucket"), col("n_docs"), col("n_new_terms"),
            col("docs_cum"), col("vocab_cum"))
          .orderBy("bucket")
      },
      Some("""WITH toks AS (SELECT doc_id // 50 AS bucket, doc_id,
              UNNEST(list_distinct(string_split(lower(text), ' '))) AS term
            FROM documents),
          fs AS (SELECT term, MIN(bucket) AS fb FROM toks
            WHERE len(term) > 0 GROUP BY 1),
          np AS (SELECT fb AS bucket, COUNT(*) AS n_new_terms
            FROM fs GROUP BY 1),
          dp AS (SELECT doc_id // 50 AS bucket, COUNT(*) AS n_docs
            FROM documents GROUP BY 1)
        SELECT dp.bucket AS bucket, dp.n_docs,
          COALESCE(np.n_new_terms, 0) AS n_new_terms,
          CAST(SUM(dp.n_docs) OVER (ORDER BY dp.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS docs_cum,
          CAST(SUM(COALESCE(np.n_new_terms, 0)) OVER (ORDER BY dp.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS vocab_cum
        FROM dp LEFT JOIN np ON np.bucket = dp.bucket
        ORDER BY dp.bucket"""))
  )
}

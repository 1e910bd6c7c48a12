package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-stream analytics beyond the reference surface (round 4): the
  * queries a training-data/telemetry pipeline runs against an append-only
  * event log — latest-state extraction, cohort retention, activity streaks,
  * semi-structured JSON properties, exact correlation. All are single-pass
  * DataFrame plans: aggregations pre-shrink inputs before any join or
  * window, so each op is one or two key-shuffles regardless of corpus size.
  */
object EventsAnalytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Total-order key for "latest event wins": zero-padded fixed-width
    * (epoch_us, event_id) string — lexicographic == numeric, and both
    * engines' max_by/arg_max accept a string ordering key (neither accepts
    * a struct). event_id breaks duplicate-timestamp ties deterministically.
    */
  private def touchKey(us: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lpad(us.cast("string"), 20, "0"), lpad(id.cast("string"), 12, "0"))

  val queries: Seq[Q] = Seq(
    // ── latest-state extraction: one row per user with the last event's
    //    attributes via max_by (single partial-aggregable pass — no sort,
    //    no window; the 100 TB shape for "current state from a log") ──────
    Q(
      "q_events_last_touch",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), unix_micros(col("ts")).as("us"))
        val key = touchKey(col("us"), col("event_id"))
        e.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("us")).as("first_us"),
            max(col("us")).as("last_us"),
            max_by(col("event_type"), key).as("last_type"),
            max_by(col("value"), key).as("last_value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS us,
            concat(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
                   lpad(CAST(event_id AS VARCHAR), 12, '0')) AS k
          FROM events)
        SELECT user_id, COUNT(*) AS n_events,
          MIN(us) AS first_us, MAX(us) AS last_us,
          arg_max(event_type, k) AS last_type,
          arg_max(value, k) AS last_value
        FROM ev GROUP BY user_id ORDER BY user_id""")),

    // ── weekly cohort retention: users bucketed by first-active week; for
    //    each (cohort, week offset) the share still active. Input shrinks to
    //    distinct (user, week) BEFORE the self-join, so the join is over
    //    user-weeks, not raw events ────────────────────────────────────────
    Q(
      "q_events_retention",
      (s, dir) => {
        val e = t(s, dir, "events")
        val userWeeks = e.select(col("user_id"),
            expr("datediff(cast(ts as date), date '1970-01-01') div 7").as("wk"))
          .distinct()
        val cohorts = userWeeks.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cohort_wk"))
        val joined = userWeeks.join(cohorts, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
          .agg(count(lit(1)).as("n_users"))
        val wSize = Window.partitionBy(col("cohort_wk"))
        joined
          .withColumn("cohort_size",
            max(when(col("wk_offset") === 0L, col("n_users"))).over(wSize))
          .select(col("cohort_wk"), col("wk_offset"), col("n_users"),
            col("cohort_size"),
            round(col("n_users").cast("double") / col("cohort_size").cast("double"), 6)
              .as("retention"))
          .orderBy(col("cohort_wk"), col("wk_offset"))
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
            DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
          FROM events),
        cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY 1),
        g AS (SELECT cohort_wk, wk - cohort_wk AS wk_offset, COUNT(*) AS n_users
          FROM uw JOIN cohorts USING (user_id) GROUP BY 1, 2)
        SELECT cohort_wk, wk_offset, n_users,
          MAX(CASE WHEN wk_offset = 0 THEN n_users END)
            OVER (PARTITION BY cohort_wk) AS cohort_size,
          ROUND(CAST(n_users AS DOUBLE) /
            CAST(MAX(CASE WHEN wk_offset = 0 THEN n_users END)
              OVER (PARTITION BY cohort_wk) AS DOUBLE), 6) AS retention
        FROM g ORDER BY cohort_wk, wk_offset""")),

    // ── gaps-and-islands: consecutive-day activity streaks per user.
    //    day_n − row_number() is constant within a run of consecutive days;
    //    the window runs over per-user DISTINCT days (bounded, pre-shrunk) ─
    Q(
      "q_events_streaks",
      (s, dir) => {
        val e = t(s, dir, "events")
        val days = e.select(col("user_id"),
            datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
              .cast("long").as("day_n"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day_n"))
        val streaks = days
          .withColumn("grp", col("day_n") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
        streaks.groupBy(col("user_id"))
          .agg(sum(col("len")).as("active_days"),
            count(lit(1)).as("n_streaks"),
            max(col("len")).as("longest_streak"))
          .orderBy(col("user_id"))
      },
      Some("""WITH days AS (SELECT DISTINCT user_id,
            DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_n
          FROM events),
        marked AS (SELECT user_id, day_n,
            day_n - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_n) AS grp
          FROM days),
        streaks AS (SELECT user_id, grp, COUNT(*) AS len
          FROM marked GROUP BY 1, 2)
        SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
          COUNT(*) AS n_streaks, MAX(len) AS longest_streak
        FROM streaks GROUP BY user_id ORDER BY user_id""")),

    // ── semi-structured properties: pull a typed value out of the JSON
    //    props column (codegen'd path expression — no UDF) and aggregate.
    //    At 100 TB the extraction is a narrow map fused into the scan ──────
    Q(
      "q_json_extract",
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            countDistinct(col("k")).as("distinct_k"),
            round(sum(col("k")).cast("double") / count(lit(1)).cast("double"), 6)
              .as("avg_k"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (SELECT event_type,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        SELECT event_type, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k,
          COUNT(DISTINCT k) AS distinct_k,
          ROUND(CAST(SUM(k) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_k
        FROM ev GROUP BY event_type ORDER BY event_type""")),

    // ── exact Pearson correlation (value vs hour-of-day) from exact power
    //    sums: integer/decimal partials are order-independent, so the
    //    result is identical under any partitioning; the IEEE tail is the
    //    same expression shape on both engines ─────────────────────────────
    Q(
      "q_corr",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"),
            hour(col("ts")).cast("long").as("h"),
            col("value").cast(DecimalType(18, 6)).as("v"))
        val sums = e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("h")).as("sh"),
            sum(col("h") * col("h")).as("shh"),
            sum(col("v")).as("sv"),
            sum((col("v") * col("v")).cast(DecimalType(38, 12))).as("svv"),
            sum((col("h").cast(DecimalType(18, 6)) * col("v"))
              .cast(DecimalType(38, 12))).as("shv"))
        sums.select(col("event_type"), col("n"),
            round(
              (col("n").cast("double") * col("shv").cast("double") -
                col("sh").cast("double") * col("sv").cast("double")) /
              sqrt(
                (col("n").cast("double") * col("shh").cast("double") -
                  col("sh").cast("double") * col("sh").cast("double")) *
                (col("n").cast("double") * col("svv").cast("double") -
                  col("sv").cast("double") * col("sv").cast("double"))), 6)
              .as("corr_h_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (SELECT event_type,
            CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
            CAST(value AS DECIMAL(18,6)) AS v FROM events),
        sums AS (SELECT event_type, COUNT(*) AS n,
            CAST(SUM(h) AS BIGINT) AS sh, CAST(SUM(h*h) AS BIGINT) AS shh,
            SUM(v) AS sv,
            SUM(CAST(v*v AS DECIMAL(38,12))) AS svv,
            SUM(CAST(CAST(h AS DECIMAL(18,6)) * v AS DECIMAL(38,12))) AS shv
          FROM ev GROUP BY 1)
        SELECT event_type, n,
          ROUND((CAST(n AS DOUBLE) * CAST(shv AS DOUBLE) -
                 CAST(sh AS DOUBLE) * CAST(sv AS DOUBLE)) /
            SQRT((CAST(n AS DOUBLE) * CAST(shh AS DOUBLE) -
                  CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)) *
                 (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) -
                  CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))), 6) AS corr_h_value
        FROM sums ORDER BY event_type""")),

    // ── event-transition matrix: first-order Markov counts/probabilities
    //    between consecutive event types per user. The window is partitioned
    //    by user (never global) and the transition table it feeds is bounded
    //    by |event_type|² — the navigation/behavior model a telemetry
    //    pipeline derives from a raw log ───────────────────────────────────
    Q(
      "q_events_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val pairs = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
        val cnt = pairs
          .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val wf = Window.partitionBy(col("from_type"))
        cnt
          .withColumn("p",
            round(col("n").cast("double") / sum(col("n")).over(wf), 6))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH ordered AS (SELECT user_id, event_type,
            LAG(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS prev
          FROM events),
        cnt AS (SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
          FROM ordered WHERE prev IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
          ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
        FROM cnt ORDER BY from_type, to_type""")),

    // ── duplicate-event screen: at-least-once delivery leaves near-identical
    //    retransmissions — count events arriving within 1 s of the previous
    //    SAME (user, type) event. One window partitioned by (user, type);
    //    output is bounded by |event_type| ──────────────────────────────────
    Q(
      "q_events_dup_screen",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("us"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("dt_us", col("us") - lag(col("us"), 1).over(w))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("dt_us") <= 1000000L, 1L).otherwise(0L)).as("n_dups"))
          .select(col("event_type"), col("n_events"), col("n_dups"),
            round(col("n_dups").cast("double") /
              col("n_events").cast("double"), 6).as("dup_rate"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type,
            epoch_us(ts) - LAG(epoch_us(ts)) OVER (
              PARTITION BY user_id, event_type
              ORDER BY epoch_us(ts), event_id) AS dt_us
          FROM events)
        SELECT event_type, COUNT(*) AS n_events,
          CAST(COALESCE(SUM(CASE WHEN dt_us <= 1000000 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_dups,
          ROUND(CAST(COALESCE(SUM(CASE WHEN dt_us <= 1000000 THEN 1 ELSE 0 END), 0)
              AS DOUBLE) / COUNT(*), 6) AS dup_rate
        FROM d GROUP BY event_type ORDER BY event_type""")),

    // ── out-of-orderness audit: how late do events arrive behind the
    //    per-user high-water mark (event_id = arrival order)? The lateness
    //    distribution is what a watermark delay is CHOSEN from — p95/max
    //    here bound the state a streaming job must retain. Window is
    //    user-partitioned (never global); percentiles run on the tiny
    //    per-type aggregate ─────────────────────────────────────────────────
    Q(
      "q_events_lateness",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val late = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("late_us",
            greatest(lit(0L), coalesce(max(col("us")).over(w), col("us")) - col("us")))
        late.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
            round(percentile(col("late_us"), lit(0.5)), 4).as("p50_late_us"),
            round(percentile(col("late_us"), lit(0.95)), 4).as("p95_late_us"),
            max(col("late_us")).as("max_late_us"))
          .withColumn("late_rate",
            round(col("n_late").cast("double") / col("n_events").cast("double"), 6))
          .orderBy(col("event_type"))
      },
      Some("""WITH lat AS (SELECT event_type,
            GREATEST(0, COALESCE(MAX(epoch_us(ts)) OVER (PARTITION BY user_id
                ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              epoch_us(ts)) - epoch_us(ts)) AS late_us
          FROM events)
        SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
          ROUND(quantile_cont(late_us, 0.5), 4) AS p50_late_us,
          ROUND(quantile_cont(late_us, 0.95), 4) AS p95_late_us,
          MAX(late_us) AS max_late_us,
          ROUND(CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS late_rate
        FROM lat GROUP BY event_type ORDER BY event_type""")),

    // ── time-to-conversion distribution: delay between each user's first
    //    signup and first post-signup purchase. Both sides pre-shrink to one
    //    row per user (min_by aggregates — no window over raw events); the
    //    percentile runs over the converted-user table ──────────────────────
    Q(
      "q_time_to_convert",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("signup_us"))
        // earliest purchase STRICTLY AFTER the signup: join then aggregate
        val conv = ev.filter(col("event_type") === "purchase")
          .join(signups, Seq("user_id"))
          .filter(col("us") > col("signup_us"))
          .groupBy(col("user_id"), col("signup_us"))
          .agg(min(col("us")).as("purchase_us"))
          .withColumn("delay_h",
            (col("purchase_us") - col("signup_us")).cast("double") / lit(3.6e9))
        conv.agg(count(lit(1)).as("n_converted"),
            round(percentile(col("delay_h"), lit(0.5)), 4).as("p50_h"),
            round(percentile(col("delay_h"), lit(0.9)), 4).as("p90_h"),
            round(max(col("delay_h")), 4).as("max_h"))
      },
      Some("""WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS signup_us
            FROM events WHERE event_type = 'signup' GROUP BY 1),
          conv AS (SELECT e.user_id, s.signup_us, MIN(epoch_us(e.ts)) AS purchase_us
            FROM events e JOIN s USING (user_id)
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.signup_us
            GROUP BY 1, 2),
          d AS (SELECT CAST(purchase_us - signup_us AS DOUBLE) / 3.6e9 AS delay_h
            FROM conv)
        SELECT COUNT(*) AS n_converted,
          ROUND(quantile_cont(delay_h, 0.5), 4) AS p50_h,
          ROUND(quantile_cont(delay_h, 0.9), 4) AS p90_h,
          ROUND(MAX(delay_h), 4) AS max_h
        FROM d""")),

    // ── SCD Type-2 history: compress the per-user change log into validity
    //    intervals [valid_from, valid_to) with a current flag — the
    //    dimension-history build every warehouse runs on a CDC feed. One
    //    user-partitioned window pass over (us, event_id)-total-ordered
    //    events; no self-join ───────────────────────────────────────────────
    Q(
      "q_events_scd2",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val runs = e
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w).isNull ||
              col("event_type") =!= lag(col("event_type"), 1).over(w), 1L)
              .otherwise(0L))
          .withColumn("version",
            sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        val hist = runs.groupBy(col("user_id"), col("version"))
          .agg(max(col("event_type")).as("state"),
            min(col("us")).as("valid_from_us"),
            count(lit(1)).as("n_events"))
        val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
        hist
          .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wv))
          .withColumn("is_current", col("valid_to_us").isNull)
          .select(col("user_id"), col("version"), col("state"),
            col("valid_from_us"), col("valid_to_us"), col("n_events"),
            col("is_current"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
          r AS (SELECT *, CASE WHEN lag(event_type) OVER
                (PARTITION BY user_id ORDER BY us, event_id)
                IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg FROM e),
          runs AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
              ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS version FROM r),
          hist AS (SELECT user_id, version, MAX(event_type) AS state,
              MIN(us) AS valid_from_us, COUNT(*) AS n_events
            FROM runs GROUP BY 1, 2)
        SELECT user_id, version, state, valid_from_us,
          lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
            AS valid_to_us,
          n_events,
          (lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
            IS NULL) AS is_current
        FROM hist ORDER BY user_id, version""")),

    // ── calendar gap-fill: daily counts per type with missing days emitted
    //    as zero — the resample step before any time-series model. The spine
    //    is a ONE-ROW (min,max) aggregate exploded through sequence(); its
    //    cross with the |types|-row dimension is bounded by definition ──────
    Q(
      "q_events_gapfill",
      (s, dir) => {
        val e = t(s, dir, "events")
        val daily = e.groupBy(col("ts").cast("date").as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val days = e.agg(min(col("ts").cast("date")).as("lo"),
            max(col("ts").cast("date")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val types = e.select(col("event_type")).distinct()
        days.crossJoin(broadcast(types))
          .join(daily, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS lo,
              MAX(CAST(ts AS DATE)) AS hi FROM events),
          days AS (SELECT CAST(UNNEST(generate_series(lo, hi,
              INTERVAL 1 DAY)) AS DATE) AS day FROM b),
          types AS (SELECT DISTINCT event_type FROM events),
          daily AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT d.day AS day, t.event_type, COALESCE(daily.n, 0) AS n
        FROM days d CROSS JOIN types t
        LEFT JOIN daily ON daily.day = d.day AND daily.event_type = t.event_type
        ORDER BY d.day, t.event_type""")),

    // ── time-weighted average: each observation holds until the next one,
    //    so the mean weights values by their holding time — the correct
    //    summary for irregularly-sampled state (sensor readings, balances).
    //    One user-partitioned lead() window; decimal-summed numerator ───────
    Q(
      "q_events_twa",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("value"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val dt = e.withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
          .filter(col("dt").isNotNull)
        dt.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dt")).as("span_us"),
            sum((col("value").cast(DecimalType(18, 6)) * col("dt"))
              .cast(DecimalType(38, 6))).as("num"))
          .select(col("user_id"), col("n_intervals"), col("span_us"),
            round(col("num").cast("double") / col("span_us").cast("double"), 6)
              .as("twa_value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, value, epoch_us(ts) AS us, event_id
            FROM events),
          d AS (SELECT user_id, value,
              lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
                AS dt
            FROM e),
          k AS (SELECT * FROM d WHERE dt IS NOT NULL)
        SELECT user_id, COUNT(*) AS n_intervals,
          CAST(SUM(dt) AS BIGINT) AS span_us,
          ROUND(CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * dt
              AS DECIMAL(38,6))) AS DOUBLE)
            / CAST(SUM(dt) AS DOUBLE), 6) AS twa_value
        FROM k GROUP BY user_id ORDER BY user_id""")),

    // ── PageRank centrality of the event-type transition graph (which
    //    state is the user flow's hub). Edge extraction is one window pass
    //    over the log; the iteration runs on the |types|²-bounded edge
    //    list in scaled-integer arithmetic (bit-identical across engines
    //    and partitionings — see graft.ext.GraphOps). Oracle: the same 10
    //    supersteps unrolled as chained CTEs ────────────────────────────────
    Q(
      "q_events_pagerank",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val edges = e.withColumn("src", lag(col("event_type"), 1).over(w))
          .filter(col("src").isNotNull)
          .groupBy(col("src"), col("event_type").as("dst"))
          .agg(count(lit(1)).as("w"))
        graft.ext.GraphOps.pageRankScaled(edges, iters = 10, dampPct = 85)
          .select(col("node").as("event_type"),
            (col("r").cast("double") / lit(1e12)).as("rank"))
          .orderBy(col("event_type"))
      },
      Some {
        val base = """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
              event_id FROM events),
          tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS src, event_type AS dst FROM e),
          ed AS (SELECT src, dst, COUNT(*) AS w FROM tr
            WHERE src IS NOT NULL GROUP BY 1, 2),
          outw AS (SELECT src, SUM(w) AS ow FROM ed GROUP BY 1),
          p AS (SELECT ed.src, ed.dst, (ed.w * 1000000) // outw.ow AS p6
            FROM ed JOIN outw USING (src)),
          nodes AS (SELECT src AS node FROM ed
            UNION SELECT dst FROM ed),
          nn AS (SELECT COUNT(*) AS n FROM nodes),
          it0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r
            FROM nodes)"""
        val iters = (1 to 10).map { k =>
          s"""it$k AS (SELECT nd.node,
              15000000000000 // (100 * (SELECT n FROM nn)) +
              ((COALESCE(s.s18, 0) // 1000000) * 85) // 100 AS r
            FROM nodes nd LEFT JOIN (
              SELECT p.dst AS node, SUM(p.p6 * prev.r) AS s18
              FROM p JOIN it${k - 1} prev ON prev.node = p.src
              GROUP BY p.dst) s ON s.node = nd.node)"""
        }.mkString(",\n          ")
        base + ",\n          " + iters +
          """
        SELECT node AS event_type, CAST(r AS DOUBLE) / 1e12 AS rank
        FROM it10 ORDER BY event_type"""
      }),

    // ── bucketized interval-overlap join: per-user daily activity spans
    //    against a derived nightly maintenance window [02:00, 04:00) — the
    //    "which sessions does the deploy window hit" query. Both interval
    //    sets carry their day as an equi-key, so the overlap test runs
    //    inside a hash join partition — no inequality-driven nested loop,
    //    the same bucketing idea as graft.ext.RangeJoin ─────────────────────
    Q(
      "q_interval_overlap",
      (s, dir) => {
        val e = t(s, dir, "events")
        val spans = e.groupBy(col("user_id"), col("ts").cast("date").as("day"))
          .agg(min(unix_micros(col("ts"))).as("lo"),
            max(unix_micros(col("ts"))).as("hi"))
        val win = spans.select(col("day")).distinct()
          .select(col("day"),
            (unix_micros(col("day").cast("timestamp")) + lit(7200000000L)).as("win_lo"),
            (unix_micros(col("day").cast("timestamp")) + lit(14400000000L)).as("win_hi"))
        spans.join(win, Seq("day"))
          .filter(col("lo") < col("win_hi") && col("win_lo") < col("hi"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_affected"),
            sum(least(col("hi"), col("win_hi")) - greatest(col("lo"), col("win_lo")))
              .as("total_overlap_us"))
          .orderBy(col("day"))
      },
      Some("""WITH spans AS (SELECT user_id, CAST(ts AS DATE) AS day,
              MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
            FROM events GROUP BY 1, 2),
          win AS (SELECT DISTINCT day,
              epoch_us(CAST(day AS TIMESTAMP)) + 7200000000 AS win_lo,
              epoch_us(CAST(day AS TIMESTAMP)) + 14400000000 AS win_hi
            FROM spans)
        SELECT s.day AS day, COUNT(*) AS n_affected,
          CAST(SUM(LEAST(s.hi, w.win_hi) - GREATEST(s.lo, w.win_lo)) AS BIGINT)
            AS total_overlap_us
        FROM spans s JOIN win w ON s.day = w.day
        WHERE s.lo < w.win_hi AND w.win_lo < s.hi
        GROUP BY s.day ORDER BY s.day""")),

    // ── windowed funnel: signup → purchase within 72 h (attribution
    //    window) — unlike q_time_to_convert, a late purchase does NOT
    //    count. Both sides pre-shrink to one row per user before the
    //    join ────────────────────────────────────────────────────────────────
    Q(
      "q_funnel_window_72h",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("signup_us"))
        val converted = ev.filter(col("event_type") === "purchase")
          .join(signups, Seq("user_id"))
          .filter(col("us") > col("signup_us") &&
            col("us") <= col("signup_us") + lit(259200000000L))
          .select(col("user_id")).distinct()
        signups.agg(count(lit(1)).as("n_signups"))
          .crossJoin(broadcast(converted.agg(count(lit(1)).as("n_converted"))))
          .select(col("n_signups"), col("n_converted"),
            round(col("n_converted").cast("double") /
              col("n_signups").cast("double"), 6).as("conversion_72h"))
      },
      Some("""WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS signup_us
            FROM events WHERE event_type = 'signup' GROUP BY 1),
          c AS (SELECT COUNT(DISTINCT e.user_id) AS n_converted
            FROM events e JOIN s USING (user_id)
            WHERE e.event_type = 'purchase'
              AND epoch_us(e.ts) > s.signup_us
              AND epoch_us(e.ts) <= s.signup_us + 259200000000)
        SELECT (SELECT COUNT(*) FROM s) AS n_signups, c.n_converted,
          ROUND(CAST(c.n_converted AS DOUBLE) /
            CAST((SELECT COUNT(*) FROM s) AS DOUBLE), 6) AS conversion_72h
        FROM c""")),

    // ── weekly churn: users active in week w with no activity in w+1.
    //    Input pre-shrinks to distinct user-weeks; churn is one anti-join
    //    against the same table shifted a week. The last observed week is
    //    excluded (its successor is unobservable, not churned) ──────────────
    Q(
      "q_events_churn",
      (s, dir) => {
        val uw = t(s, dir, "events")
          .select(col("user_id"),
            expr("datediff(cast(ts as date), date '1970-01-01') div 7").as("wk"))
          .distinct()
        val nextWk = uw.select(col("user_id"), (col("wk") - 1L).as("wk"))
        val churned = uw.join(nextWk, Seq("user_id", "wk"), "left_anti")
          .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
        val active = uw.groupBy(col("wk")).agg(count(lit(1)).as("n_active"))
        val maxWk = uw.agg(max(col("wk")).as("max_wk"))
        active.join(churned, Seq("wk"), "left")
          .crossJoin(broadcast(maxWk))
          .filter(col("wk") < col("max_wk"))
          .select(col("wk"), col("n_active"),
            coalesce(col("n_churned"), lit(0L)).as("n_churned"),
            round(coalesce(col("n_churned"), lit(0L)).cast("double") /
              col("n_active").cast("double"), 6).as("churn_rate"))
          .orderBy(col("wk"))
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
              DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
            FROM events),
          ch AS (SELECT a.wk, COUNT(*) AS n_churned FROM uw a
            LEFT JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + 1
            WHERE b.user_id IS NULL GROUP BY 1),
          act AS (SELECT wk, COUNT(*) AS n_active FROM uw GROUP BY 1)
        SELECT act.wk AS wk, n_active, COALESCE(ch.n_churned, 0) AS n_churned,
          ROUND(CAST(COALESCE(ch.n_churned, 0) AS DOUBLE)
            / CAST(n_active AS DOUBLE), 6) AS churn_rate
        FROM act LEFT JOIN ch ON act.wk = ch.wk
        WHERE act.wk < (SELECT MAX(wk) FROM uw) ORDER BY wk""")),

    // ── new vs returning users per day: one distinct (user, day) pass plus
    //    a broadcast of per-user first-seen days — the daily growth
    //    decomposition every product dashboard leads with ────────────────────
    Q(
      "q_events_new_returning",
      (s, dir) => {
        val ud = t(s, dir, "events")
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
        val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
        ud.join(first, Seq("user_id"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"))
          .select(col("day"), col("n_users"), col("n_new"),
            (col("n_users") - col("n_new")).as("n_returning"))
          .orderBy(col("day"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
          f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1)
        SELECT day, COUNT(*) AS n_users,
          CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new,
          COUNT(*) - CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning
        FROM ud JOIN f USING (user_id)
        GROUP BY day ORDER BY day""")),

    // ── audience overlap between event types: distinct (type, user) pairs
    //    self-joined on user — the fan-out per user is ≤ |types|, so the
    //    join is corpus-linear; output is |types|²-bounded. Jaccard and
    //    overlap coefficient per type pair ──────────────────────────────────
    Q(
      "q_audience_overlap",
      (s, dir) => {
        val tu = t(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
        val sizes = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val a = tu.select(col("event_type").as("type_a"), col("user_id"))
        val b = tu.select(col("event_type").as("type_b"), col("user_id"))
        a.join(b, Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sizes.select(col("event_type").as("type_a"),
            col("n").as("na"))), Seq("type_a"))
          .join(broadcast(sizes.select(col("event_type").as("type_b"),
            col("n").as("nb"))), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("na"), col("nb"), col("n_both"),
            round(col("n_both").cast("double") /
              (col("na") + col("nb") - col("n_both")).cast("double"), 6).as("jaccard"),
            round(col("n_both").cast("double") /
              least(col("na"), col("nb")).cast("double"), 6).as("overlap_coef"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
          sz AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
          ov AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              COUNT(*) AS n_both
            FROM tu a JOIN tu b ON a.user_id = b.user_id
              AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT type_a, type_b, sa.n AS na, sb.n AS nb, n_both,
          ROUND(CAST(n_both AS DOUBLE) / CAST(sa.n + sb.n - n_both AS DOUBLE), 6)
            AS jaccard,
          ROUND(CAST(n_both AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 6)
            AS overlap_coef
        FROM ov JOIN sz sa ON sa.event_type = type_a
        JOIN sz sb ON sb.event_type = type_b
        ORDER BY type_a, type_b""")),

    // ── activity concentration (Pareto): share of all events generated by
    //    users at or above the P90 per-user event count. Per-user counts are
    //    one shuffle; the threshold is a ONE-ROW exact percentile broadcast
    //    back — no global sort of users ─────────────────────────────────────
    Q(
      "q_pareto_concentration",
      (s, dir) => {
        val cnt = t(s, dir, "events")
          .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        val thr = cnt.agg(
          round(percentile(col("cnt"), lit(0.9)), 4).as("p90"),
          count(lit(1)).as("n_users"),
          sum(col("cnt")).as("n_events"))
        cnt.crossJoin(broadcast(thr))
          .filter(col("cnt").cast("double") >= col("p90"))
          .groupBy(col("p90"), col("n_users"), col("n_events"))
          .agg(count(lit(1)).as("n_top_users"),
            sum(col("cnt")).as("top_events"))
          .select(col("p90"), col("n_users"), col("n_top_users"),
            round(col("top_events").cast("double") /
              col("n_events").cast("double"), 6).as("event_share"))
      },
      Some("""WITH cnt AS (SELECT user_id, COUNT(*) AS cnt FROM events
            GROUP BY 1),
          thr AS (SELECT ROUND(quantile_cont(cnt, 0.9), 4) AS p90,
              COUNT(*) AS n_users, CAST(SUM(cnt) AS BIGINT) AS n_events
            FROM cnt)
        SELECT thr.p90, thr.n_users,
          COUNT(*) AS n_top_users,
          ROUND(CAST(SUM(cnt.cnt) AS DOUBLE) / CAST(thr.n_events AS DOUBLE), 6)
            AS event_share
        FROM cnt CROSS JOIN thr
        WHERE CAST(cnt.cnt AS DOUBLE) >= thr.p90
        GROUP BY thr.p90, thr.n_users, thr.n_events""")),

    // ── per-type OLS trend: slope/intercept/R² of value over epoch day,
    //    from exact integer/decimal power sums (one partial-aggregable
    //    pass — the q_corr pattern extended to the full regression line).
    //    The IEEE tail runs the identical expression on both engines ────────
    Q(
      "q_trend_slope",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"),
            // day index from the corpus epoch (2024-01-01), not 1970: keeps
            // the x·v decimal product inside DuckDB's DECIMAL(18) multiply
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long").as("x"),
            col("value").cast(DecimalType(18, 6)).as("v"))
        val sums = e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("v")).as("sv"),
            sum((col("v") * col("v")).cast(DecimalType(38, 12))).as("svv"),
            sum((col("x").cast(DecimalType(18, 6)) * col("v"))
              .cast(DecimalType(38, 12))).as("sxv"),
            // variance guards as min/max equality — countDistinct would
            // force an Expand that replicates the aggregation input
            (min(col("x")) < max(col("x"))).as("vx"),
            (min(col("v")) < max(col("v"))).as("vv"))
        val n = col("n").cast("double")
        val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
        val sv = col("sv").cast("double"); val svv = col("svv").cast("double")
        val sxv = col("sxv").cast("double")
        // a type observed on a single day (or with constant value) has no
        // defined regression line — emit NULL, not Inf/NaN
        sums.select(col("event_type"), col("n"),
            when(col("vx"),
              round((n * sxv - sx * sv) / (n * sxx - sx * sx), 6)).as("slope"),
            when(col("vx"),
              round((sv * sxx - sx * sxv) / (n * sxx - sx * sx), 6)).as("intercept"),
            when(col("vx") && col("vv"),
              round((n * sxv - sx * sv) * (n * sxv - sx * sv) /
                ((n * sxx - sx * sx) * (n * svv - sv * sv)), 6)).as("r2"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (SELECT event_type,
            DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
            CAST(value AS DECIMAL(18,6)) AS v FROM events),
          sums AS (SELECT event_type, COUNT(*) AS n,
              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x*x) AS BIGINT) AS sxx,
              SUM(v) AS sv,
              SUM(CAST(v*v AS DECIMAL(38,12))) AS svv,
              SUM(CAST(CAST(x AS DECIMAL(18,6)) * v AS DECIMAL(38,12))) AS sxv,
              (MIN(x) < MAX(x)) AS vx, (MIN(v) < MAX(v)) AS vv
            FROM ev GROUP BY 1)
        SELECT event_type, n,
          CASE WHEN vx THEN
            ROUND((CAST(n AS DOUBLE) * CAST(sxv AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sv AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS slope,
          CASE WHEN vx THEN
            ROUND((CAST(sv AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sxv AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS intercept,
          CASE WHEN vx AND vv THEN
            ROUND((CAST(n AS DOUBLE) * CAST(sxv AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sv AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxv AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sv AS DOUBLE))
              / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                  - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))), 6) END AS r2
        FROM sums ORDER BY event_type""")),

    // ── two-proportion z-test (A/B): heavy-purchaser conversion (≥14
    //    purchases) of the even user-id cohort vs the odd one. All inputs
    //    are exact integer counts from one per-user pass; the z statistic's
    //    IEEE tail is the same expression on both engines, and degenerate
    //    pools (p = 0 or 1, zero pooled variance) emit NULL instead of a
    //    division error. The experimentation primitive every product
    //    pipeline ends at ────────────────────────────────────────────────────
    Q(
      "q_ab_test",
      (s, dir) => {
        val pu = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
          .select(pmod(col("user_id"), lit(2)).as("variant"),
            when(col("np") >= 14, 1L).otherwise(0L).as("conv"))
        val agg = pu.agg(
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("conv_a"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("conv_b"))
        val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
        val ca = col("conv_a").cast("double"); val cb = col("conv_b").cast("double")
        val pooled = (ca + cb) / (na + nb)
        agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          when(col("conv_a") + col("conv_b") > 0L &&
              col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
            round((ca / na - cb / nb) /
              sqrt(pooled * (lit(1.0) - pooled) *
                (lit(1.0) / na + lit(1.0) / nb)), 4))
            .as("z"))
      },
      Some("""WITH pu AS (SELECT user_id % 2 AS variant,
              CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                >= 14 THEN 1 ELSE 0 END AS conv
            FROM events GROUP BY user_id),
          agg AS (SELECT
              CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
              CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
              CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
            FROM pu)
        SELECT n_a, conv_a, n_b, conv_b,
          CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
            ROUND((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
              / SQRT((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                  / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                  / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 4)
          END AS z
        FROM agg""")),

    // ── EWMA smoothing of daily counts per type, α = 1/4 in scaled-integer
    //    recursion (sₜ = (xₜ·10⁶ + 3·sₜ₋₁) div 4) — deterministic where a
    //    float recursion is not. The fold runs over the ≤|days| per-type
    //    daily aggregate collected into one bounded array, not over raw
    //    events ──────────────────────────────────────────────────────────────
    Q(
      "q_ewma_daily",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("cnt"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            expr("""aggregate(
                transform(array_sort(collect_list(struct(day, cnt))), p -> p.cnt),
                -1L,
                (acc, x) -> IF(acc < 0L, x * 1000000L,
                  (x * 1000000L + 3L * acc) div 4L))""").as("s_scaled"))
          .select(col("event_type"), col("n_days"),
            round(col("s_scaled").cast("double") / lit(1e6), 6).as("ewma_last"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              COUNT(*) AS cnt FROM events GROUP BY 1, 2)
        SELECT event_type, COUNT(*) AS n_days,
          ROUND(CAST(list_reduce(list_prepend(-1, list(cnt ORDER BY day)),
              (acc, x) -> CASE WHEN acc < 0 THEN x * 1000000
                ELSE (x * 1000000 + 3 * acc) // 4 END) AS DOUBLE)
            / 1e6, 6) AS ewma_last
        FROM daily GROUP BY event_type ORDER BY event_type""")),

    // ── day-of-week seasonality profile: share of each type's events per
    //    weekday. The weekday comes from pure integer arithmetic
    //    ((epoch_day + 4) mod 7, 0 = Sunday) — engine dow functions
    //    disagree on numbering, integers cannot ─────────────────────────────
    Q(
      "q_events_seasonality",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"),
            pmod(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
              .cast("long") + 4L, lit(7L)).as("dow"))
        val byDow = e.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n"))
        val tot = byDow.groupBy(col("event_type")).agg(sum(col("n")).as("n_type"))
        byDow.join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("dow"), col("n"),
            round(col("n").cast("double") / col("n_type").cast("double"), 6)
              .as("share"))
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""WITH e AS (SELECT event_type,
              (DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7
                AS dow
            FROM events),
          d AS (SELECT event_type, dow, COUNT(*) AS n FROM e GROUP BY 1, 2),
          tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type
            FROM d GROUP BY 1)
        SELECT event_type, dow, n,
          ROUND(CAST(n AS DOUBLE) / CAST(n_type AS DOUBLE), 6) AS share
        FROM d JOIN tot USING (event_type)
        ORDER BY event_type, dow""")),

    // ── peak concurrency sweep-line: sessions (the q_events_sessionize
    //    30-min-gap definition) become ±1 boundary events; the running sum
    //    of boundaries in time order is the live-session count and its max
    //    is the day's peak. Sessions are clipped to days (bounded fan-out
    //    over covered days) so the sweep window is DAY-partitioned — never
    //    one global sort. Starts sort before ends at the same microsecond,
    //    so a one-event session still registers ────────────────────────────
    Q(
      "q_sessions_concurrency",
      (s, dir) => {
        val e = t(s, dir, "events")
        val sess = graft.ext.Sessionize.withSessionIds(
          e.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        val dayUs = 86400000000L
        val clipped = sess
          .select(col("user_id"), col("sess_id"), col("s_us"), col("e_us"),
            explode(sequence(expr(s"s_us div ${dayUs}L"),
              expr(s"e_us div ${dayUs}L"))).as("d"))
          .select(col("user_id"), col("sess_id"), col("d"),
            greatest(col("s_us"), col("d") * dayUs).as("lo"),
            least(col("e_us"), col("d") * dayUs + (dayUs - 1)).as("hi"))
        val pts = clipped
          .select(col("d"), col("lo").as("us"), lit(1L).as("delta"),
            col("user_id"), col("sess_id"))
          .union(clipped.select(col("d"), col("hi").as("us"),
            lit(-1L).as("delta"), col("user_id"), col("sess_id")))
        val sweep = Window.partitionBy(col("d"))
          .orderBy(col("us"), desc("delta"), col("user_id"), col("sess_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pts.withColumn("live", sum(col("delta")).over(sweep))
          .groupBy(col("d"))
          .agg((count(lit(1)) / 2).cast("long").as("n_sessions"),
            max(col("live")).as("peak_concurrent"))
          .select(date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
            .as("day"), col("n_sessions"), col("peak_concurrent"))
          .orderBy(col("day"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            LAG(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events),
        marked AS (SELECT user_id, event_id, us,
            CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
          FROM ev),
        sess0 AS (SELECT user_id, event_id, us,
            CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS sess_id
          FROM marked),
        sess AS (SELECT user_id, sess_id, MIN(us) AS s_us, MAX(us) AS e_us
          FROM sess0 GROUP BY 1, 2),
        clipped AS (SELECT user_id, sess_id, d,
            GREATEST(s_us, d * 86400000000) AS lo,
            LEAST(e_us, d * 86400000000 + 86399999999) AS hi
          FROM sess CROSS JOIN
            UNNEST(generate_series(s_us // 86400000000, e_us // 86400000000))
              AS g(d)),
        pts AS (SELECT d, lo AS us, 1 AS delta, user_id, sess_id FROM clipped
          UNION ALL
          SELECT d, hi, -1, user_id, sess_id FROM clipped),
        sw AS (SELECT d, CAST(SUM(delta) OVER (PARTITION BY d
              ORDER BY us, delta DESC, user_id, sess_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS live
          FROM pts)
        SELECT DATE '1970-01-01' + CAST(d AS INTEGER) AS day,
          CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions,
          MAX(live) AS peak_concurrent
        FROM sw GROUP BY d ORDER BY day""")),

    // ── ordered 3-step funnel: signup → first LATER click → first LATER
    //    purchase, strict event-time ordering at every step (an early
    //    purchase before the click does not count). Each step pre-shrinks
    //    to one row per user before the next join — three broadcast-sized
    //    joins, no window over raw events ───────────────────────────────────
    Q(
      "q_funnel_steps",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("s1_us"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("us") > col("s1_us"))
          .groupBy(col("user_id")).agg(min(col("us")).as("s2_us"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("us") > col("s2_us"))
          .groupBy(col("user_id")).agg(min(col("us")).as("s3_us"))
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_signup"),
            count(col("s2_us")).as("n_click_after"),
            count(col("s3_us")).as("n_purchase_after"))
          .select(col("n_signup"), col("n_click_after"), col("n_purchase_after"),
            round(col("n_click_after").cast("double") /
              col("n_signup").cast("double"), 6).as("step2_rate"),
            round(col("n_purchase_after").cast("double") /
              col("n_signup").cast("double"), 6).as("step3_rate"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
            FROM events),
          s1 AS (SELECT user_id, MIN(us) AS s1_us FROM ev
            WHERE event_type = 'signup' GROUP BY 1),
          s2 AS (SELECT ev.user_id, MIN(us) AS s2_us FROM ev JOIN s1 USING (user_id)
            WHERE event_type = 'click' AND us > s1_us GROUP BY 1),
          s3 AS (SELECT ev.user_id, MIN(us) AS s3_us FROM ev JOIN s2 USING (user_id)
            WHERE event_type = 'purchase' AND us > s2_us GROUP BY 1)
        SELECT COUNT(*) AS n_signup,
          COUNT(s2_us) AS n_click_after,
          COUNT(s3_us) AS n_purchase_after,
          ROUND(CAST(COUNT(s2_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
            AS step2_rate,
          ROUND(CAST(COUNT(s3_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
            AS step3_rate
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // ── top session journeys: the first three event types of each session
    //    (q_events_sessionize's 30-min-gap definition) folded into a path
    //    string, ranked by frequency — the "common user journeys" view.
    //    Paths are built from an explicit rank key, never collect order ─────
    Q(
      "q_session_paths",
      (s, dir) => {
        val e = t(s, dir, "events")
        val sess = graft.ext.Sessionize.withSessionIds(
          e.select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us")))
        val ws = Window.partitionBy(col("user_id"), col("sess_id"))
          .orderBy(col("us"), col("event_id"))
        sess.withColumn("rn", row_number().over(ws))
          .filter(col("rn") <= 3)
          .groupBy(col("user_id"), col("sess_id"))
          .agg(array_join(expr(
            "transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"),
            ">").as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(desc("n_sessions"), col("path"))
          .limit(20)
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
            LAG(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events),
        marked AS (SELECT *, CASE WHEN prev_us IS NULL
              OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
          FROM ev),
        sess AS (SELECT user_id, event_id, event_type, us,
            CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS sess_id
          FROM marked),
        rn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sess_id
              ORDER BY us, event_id) AS rn FROM sess),
        paths AS (SELECT user_id, sess_id,
            string_agg(event_type, '>' ORDER BY rn) AS path
          FROM rn WHERE rn <= 3 GROUP BY 1, 2)
        SELECT path, COUNT(*) AS n_sessions FROM paths
        GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""")),

    // ── inter-arrival distribution: per-type gaps between consecutive
    //    events of the SAME user — the empirical base for retry budgets and
    //    watermark delays (q_events_lateness measures disorder; this
    //    measures cadence). One user+type-partitioned lag window ────────────
    Q(
      "q_events_interarrival",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val gaps = e.withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap_us").isNotNull)
        gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            round(percentile(col("gap_us").cast("double"), lit(0.5)), 4)
              .as("p50_gap_us"),
            round(percentile(col("gap_us").cast("double"), lit(0.95)), 4)
              .as("p95_gap_us"),
            max(col("gap_us")).as("max_gap_us"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
              event_id FROM events),
          g AS (SELECT event_type,
              us - lag(us) OVER (PARTITION BY user_id, event_type
                ORDER BY us, event_id) AS gap_us
            FROM e),
          k AS (SELECT * FROM g WHERE gap_us IS NOT NULL)
        SELECT event_type, COUNT(*) AS n_gaps,
          ROUND(quantile_cont(CAST(gap_us AS DOUBLE), 0.5), 4) AS p50_gap_us,
          ROUND(quantile_cont(CAST(gap_us AS DOUBLE), 0.95), 4) AS p95_gap_us,
          MAX(gap_us) AS max_gap_us
        FROM k GROUP BY event_type ORDER BY event_type""")),

    // ── burstiness (Fano factor): variance/mean of per-day counts per
    //    type — 1 for a Poisson arrival process, ≫1 for bursty traffic.
    //    Exact integer power sums over the ≤|days| daily table; population
    //    variance, defined from two observed days up. Days with ZERO events
    //    are absent from the daily table and hence from the variance —
    //    compose with q_events_gapfill first to count them ──────────────────
    Q(
      "q_events_fano",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("c"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("c")).as("sc"),
            sum(col("c") * col("c")).as("scc"))
          .select(col("event_type"), col("n_days"),
            round(col("sc").cast("double") / col("n_days").cast("double"), 4)
              .as("mean_daily"),
            when(col("n_days") > 1,
              round((col("scc").cast("double") / col("n_days").cast("double") -
                (col("sc").cast("double") / col("n_days").cast("double")) *
                (col("sc").cast("double") / col("n_days").cast("double"))) /
                (col("sc").cast("double") / col("n_days").cast("double")), 4))
              .as("fano"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              COUNT(*) AS c FROM events GROUP BY 1, 2),
          s AS (SELECT event_type, COUNT(*) AS n_days,
              CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c*c) AS BIGINT) AS scc
            FROM daily GROUP BY 1)
        SELECT event_type, n_days,
          ROUND(CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE), 4) AS mean_daily,
          CASE WHEN n_days > 1 THEN
            ROUND((CAST(scc AS DOUBLE) / CAST(n_days AS DOUBLE)
                - (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
                  * (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)))
              / (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)), 4) END AS fano
        FROM s ORDER BY event_type""")),

    // ── session-duration distribution: one summary row over per-session
    //    durations and sizes (the shared graft.ext.Sessionize definition) —
    //    the engagement health-check next to the per-session listing
    //    (q_events_sessionize). Percentiles run over the session table, not
    //    raw events ──────────────────────────────────────────────────────────
    Q(
      "q_session_duration_dist",
      (s, dir) => {
        val e = t(s, dir, "events")
        val sess = graft.ext.Sessionize.withSessionIds(
          e.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
        sess.agg(count(lit(1)).as("n_sessions"),
            round(percentile(col("dur_us").cast("double"), lit(0.5)), 4)
              .as("p50_dur_us"),
            round(percentile(col("dur_us").cast("double"), lit(0.95)), 4)
              .as("p95_dur_us"),
            max(col("dur_us")).as("max_dur_us"),
            round(percentile(col("n_events").cast("double"), lit(0.5)), 4)
              .as("p50_events"),
            max(col("n_events")).as("max_events"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            LAG(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events),
        marked AS (SELECT user_id, event_id, us,
            CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
          FROM ev),
        sess0 AS (SELECT user_id, us,
            CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS sess_id
          FROM marked),
        sess AS (SELECT user_id, sess_id, COUNT(*) AS n_events,
            MAX(us) - MIN(us) AS dur_us
          FROM sess0 GROUP BY 1, 2)
        SELECT COUNT(*) AS n_sessions,
          ROUND(quantile_cont(CAST(dur_us AS DOUBLE), 0.5), 4) AS p50_dur_us,
          ROUND(quantile_cont(CAST(dur_us AS DOUBLE), 0.95), 4) AS p95_dur_us,
          MAX(dur_us) AS max_dur_us,
          ROUND(quantile_cont(CAST(n_events AS DOUBLE), 0.5), 4) AS p50_events,
          MAX(n_events) AS max_events
        FROM sess"""))
  )
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY §7.8 extension).
  *
  * Streams are declared as readStream → transform → writeStream; at scale
  * the same code runs against Kafka/files with executor-distributed state
  * stores. Watermarks bound state; the session operator keeps one small
  * state object per user key.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. The
    * timestamp normalization mirrors graft.Tables, but a stream needs its
    * schema up front — so probe the footer with a one-off batch read and
    * adapt to however the writer stored `ts`: TIMESTAMP(NANOS) reads as
    * long under the legacy flag (truncate to µs), timestamp[us] with no
    * zone reads as NTZ (value-preserving cast in the UTC session), plain
    * timestamps pass through. */
  def read(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the probe is best-effort: on an empty / not-yet-populated stream
    // directory the batch read cannot infer a schema — fall back to the
    // declared TimestampType so the stream can start before data arrives
    // (files landing later with a different physical type are normalized
    // on the next restart, the usual file-stream contract)
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => TimestampType }
    val reader = spark.readStream
      .schema(StructType(eventSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = tsType) else f)))
    val raw = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(dir)
    tsType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * late data (and therefore state size). */
  def windowedCounts(events: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact deduplication: drop repeated keys with watermark-bounded
    * state (the streaming face of graft.ext.Dedup.exact — same hash-partition
    * semantics, state expires past the watermark instead of growing forever). */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(keys :+ "ts")

  /** Stream-static enrichment: attach a batch-computed dimension (user
    * cohort, account tier, model split…) to the live stream by key. The
    * static side is re-planned each micro-batch — a dimension refreshed in
    * place is picked up without restarting the query — and broadcast, so
    * the stream side never shuffles. The third join family next to the
    * stateful stream-stream interval join ([[purchaseAttribution]]) and
    * the foreachBatch stream-batch pattern (DocsStream.ingestNearDup). */
  def enrich(events: DataFrame, dim: DataFrame,
      keys: Seq[String] = Seq("user_id")): DataFrame =
    events.join(broadcast(dim), keys, "left")

  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, duration_s: Long)

  /** Custom session state machine via mapGroupsWithState: per-user gap-based
    * sessions (30 min idle timeout). Demonstrates the arbitrary-stateful
    * path the built-in session_window can't always express. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          var sessions = List.empty[SessionOut]
          var cur = state.getOption
          rows.toSeq.sortBy(_._2).foreach { case (_, us) =>
            cur match {
              case Some(st) if us - st.last <= gapSeconds * 1000000L =>
                cur = Some(st.copy(last = us, n = st.n + 1))
              case Some(st) =>
                sessions ::= SessionOut(user, new java.sql.Timestamp(st.start / 1000),
                  st.n, (st.last - st.start) / 1000000L)
                cur = Some(SessionState(us, us, 1))
              case None =>
                cur = Some(SessionState(us, us, 1))
            }
          }
          cur.foreach(state.update)
          sessions.reverse
      }
      .flatMap(identity)
      .toDF()
  }

  case class FunnelState(signupUs: Long, firstPurchaseUs: Long, minPurchaseUs: Long)
  case class FunnelOut(user_id: Long, signup_us: Long, first_purchase_us: Long,
      converted: Long)

  /** Streaming signup→purchase funnel via mapGroupsWithState: per-user state
    * holds the earliest signup and the earliest post-signup purchase — the
    * continuous face of the batch `q_events_funnel`. State is one tiny object
    * per user (the batch analog's groupBy key), emitted in Update mode as
    * conversions happen.
    *
    * Out-of-order handling: purchases are NOT discarded when they arrive
    * before the user's signup is known — the state buffers the earliest
    * purchase seen so far (`minPurchaseUs`) and re-evaluates conversion
    * whenever the signup (which only ever moves earlier) arrives or moves.
    * Same-timestamp semantics match the batch query exactly: a purchase at
    * `us == signupUs` does NOT convert (strict `>`, the batch analog's
    * `p_us > signup_us` filter). The one remaining approximation vs batch is
    * inherent to bounded state: if several purchases are buffered below the
    * then-current signup and the signup later moves between them, only the
    * earliest buffered purchase is still known. */
  def funnel(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long)], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          rows.toSeq.sortBy(_._3).foreach { case (_, typ, us) =>
            typ match {
              case "signup" if st.signupUs < 0 || us < st.signupUs =>
                st = st.copy(signupUs = us)
              case "purchase" =>
                if (st.minPurchaseUs < 0 || us < st.minPurchaseUs)
                  st = st.copy(minPurchaseUs = us)
                if (st.signupUs >= 0 && us > st.signupUs &&
                    (st.firstPurchaseUs < 0 || us < st.firstPurchaseUs))
                  st = st.copy(firstPurchaseUs = us)
              case _ =>
            }
          }
          // re-evaluate against the buffered earliest purchase: a signup that
          // arrived (or moved earlier) this batch can qualify a purchase from
          // a previous batch
          if (st.signupUs >= 0 && st.minPurchaseUs > st.signupUs &&
              (st.firstPurchaseUs < 0 || st.minPurchaseUs < st.firstPurchaseUs))
            st = st.copy(firstPurchaseUs = st.minPurchaseUs)
          state.update(st)
          FunnelOut(user, st.signupUs, st.firstPurchaseUs,
            if (st.firstPurchaseUs >= 0) 1L else 0L)
      }
      .filter(_.signup_us >= 0)
      .toDF()
  }

  case class MGOut(event_type: String, term: String, cnt_lb: Long, rk: Long)

  /** Streaming heavy-hitter candidates per event type: a Misra–Gries sketch
    * held in per-key state (the SAME kernel as the batch `MisraGriesAgg` —
    * one sketch semantics for both engines' faces). Each micro-batch folds
    * its rows into the bounded counter map and emits the current candidate
    * ranking in Update mode; any term with true frequency > N/(capacity+1)
    * is guaranteed present (the MG bound), so downstream exact verification
    * can produce the exact streaming top-k without unbounded state. State is
    * one ≤capacity-entry map per event type. */
  def heavyHitters(events: DataFrame, capacity: Int = 16,
      topK: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("user_id").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[(String, String)],
            state: GroupState[Map[String, Long]]) =>
          val buf = scala.collection.mutable.HashMap
            .from(state.getOption.getOrElse(Map.empty[String, Long]))
          rows.foreach { case (_, term) =>
            graft.functions.MisraGries.add(buf, term, capacity)
          }
          state.update(buf.toMap)
          buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(topK)
            .zipWithIndex.iterator
            .map { case ((term, cnt), i) => MGOut(typ, term, cnt, i + 1L) }
      }
      .toDF()
  }

  case class Scd2State(state: String, validFromUs: Long, lastUs: Long,
      lastId: Long, nEvents: Long, version: Long)
  case class Scd2Out(user_id: Long, version: Long, state: String,
      valid_from_us: Long, valid_to_us: Long, n_events: Long)

  /** Streaming SCD Type-2 history: per-user state machine that emits a
    * CLOSED version row [valid_from, valid_to) whenever the tracked
    * attribute changes — the continuous face of the batch `q_events_scd2`
    * (the batch query additionally shows the still-open version, which a
    * stream by definition has not closed yet). State per user is one small
    * record: current attribute value, its start, the last-applied
    * (us, event_id) position, and the version counter.
    *
    * Ordering: rows are applied in (us, event_id) order within each
    * micro-batch; a cross-batch regression (an event older than the last
    * applied position) cannot be spliced into already-emitted history with
    * bounded state, so it is dropped — the same contract as a CDC consumer
    * reading a partially-ordered log with a watermark. */
  def scd2(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[Scd2State]) =>
          var closed = List.empty[Scd2Out]
          var cur = state.getOption
          rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, typ, us, id) =>
            cur match {
              case Some(st) if us < st.lastUs ||
                  (us == st.lastUs && id <= st.lastId) =>
                () // late regression below the applied position: dropped
              case Some(st) if typ == st.state =>
                cur = Some(st.copy(lastUs = us, lastId = id,
                  nEvents = st.nEvents + 1))
              case Some(st) =>
                closed ::= Scd2Out(user, st.version, st.state,
                  st.validFromUs, us, st.nEvents)
                cur = Some(Scd2State(typ, us, us, id, 1L, st.version + 1))
              case None =>
                cur = Some(Scd2State(typ, us, us, id, 1L, 1L))
            }
          }
          cur.foreach(state.update)
          closed.reverse.iterator
      }
      .toDF()
  }

  case class DebounceState(lastUs: Long, lastId: Long)
  case class DebounceOut(user_id: Long, event_type: String, event_id: Long,
      us: Long)

  /** Streaming debounce via flatMapGroupsWithState: emit only the FIRST
    * event of each same-(user, type) burst, where a burst is a CHAIN of
    * events each ≤`gapMicros` from the previous one — exactly the batch
    * `q_events_debounce` rule (gap from the previous RAW event, not from
    * the last kept one, which would be a throttle and diverge on chains
    * like 0 s, 0.9 s, 1.8 s). State per key is one tiny record (last
    * applied position); rows are applied in (us, event_id) order within a
    * micro-batch, and a cross-batch regression below the applied position
    * is dropped — the same partially-ordered-log contract as [[scd2]]. */
  def debounce(events: DataFrame, gapMicros: Long = 1000000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[DebounceState]) =>
          var kept = List.empty[DebounceOut]
          var cur = state.getOption
          rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, _, us, id) =>
            cur match {
              case Some(st) if us < st.lastUs ||
                  (us == st.lastUs && id <= st.lastId) =>
                () // late regression below the applied position: dropped
              case Some(st) if us - st.lastUs <= gapMicros =>
                cur = Some(DebounceState(us, id)) // burst continues: drop
              case _ =>
                kept ::= DebounceOut(key._1, key._2, id, us)
                cur = Some(DebounceState(us, id))
            }
          }
          cur.foreach(state.update)
          kept.reverse.iterator
      }
      .toDF()
  }

  /** Stream-stream interval join: attribute each purchase to any signup of
    * the same user within `windowSeconds` BEFORE it. Both sides carry
    * watermarks so the join state is bounded — Spark retains a signup only
    * until the purchase-side watermark passes `signup ts + window`, and
    * vice versa (the mandatory pattern for unbounded stream-stream joins:
    * equi-key + time-range condition + watermarks on both inputs). Emits
    * (user_id, signup_us, purchase_us, value). */
  def purchaseAttribution(events: DataFrame, windowSeconds: Long = 3600,
      watermark: String = "2 hours"): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermark)
    signups.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr(s"interval $windowSeconds seconds"))
      .select(col("user_id"), unix_micros(col("s_ts")).as("signup_us"),
        unix_micros(col("p_ts")).as("purchase_us"), col("value"))
  }

  /** Streaming incremental rollup: fold each micro-batch's (event_type,
    * day) partial counts/sums into a persistent rollup table — the
    * streaming face of q_rollup_incremental. Each batch re-aggregates
    * PRIOR STATE ∪ BATCH PARTIALS (sums and counts are associative), so
    * history is never rescanned and the state table stays
    * rollup-key-bounded regardless of stream length. The merged result is
    * eagerly localCheckpoint'ed BEFORE overwriting the state dir — the
    * read-your-own-overwrite hazard of parquet self-merge. Decimal sums
    * keep the totals order-independent; the widened decimal(38,6) is
    * pinned on both branches so the union type is round-stable.
    *
    * Crash-replay safety (round 11): a fold is NOT naturally idempotent —
    * replaying a batch whose state write landed but whose checkpoint
    * commit didn't would double-count it, and an in-place overwrite has a
    * worse window still: mode("overwrite") DELETES the old state before
    * the new write completes, so a kill inside the write loses the state
    * entirely (StreamingSpec's kill test caught exactly that). The state
    * therefore lives in VERSIONED snapshot dirs `snap-<batchId>`: each
    * fold reads the latest COMPLETE snapshot (has `_SUCCESS`), writes the
    * merged result as its own snapshot, and garbage-collects older ones
    * only after the new one is complete. Replay of an applied batchId is
    * skipped by the snapshot high-water mark; a torn snapshot (no
    * `_SUCCESS`) is invisible to readers and overwritten by the replay.
    * Read the current state with [[rollupState]]. */
  def incrementalRollup(events: DataFrame, statePath: String,
      checkpoint: String, maxPerUser: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(rollupStep(statePath, maxPerUser))
      .start()

  /** Latest complete snapshot (id, dir) under the state root. */
  private def latestSnap(root: java.io.File): Option[(Long, java.io.File)] =
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("snap-") &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix("snap-").toLong).toOption.map(_ -> f))
      .sortBy { case (id, _) => -id }.headOption

  /** The current rollup state: the latest complete snapshot, or None when
    * no batch has been applied yet. */
  def rollupState(spark: SparkSession, statePath: String): Option[DataFrame] =
    latestSnap(new java.io.File(statePath)).map { case (_, dir) =>
      spark.read.parquet(dir.toString) }

  /** The per-batch body of [[incrementalRollup]], exposed so crash-replay
    * (same batchId twice) is directly testable.
    *
    * `maxPerUser` is the round-12 ingest cap (the session-window skew
    * guard): at most k events per user per BATCH fold into the rollup,
    * keeping the EARLIEST k by (ts, event_id) via the skew-immune bounded
    * heap ([[graft.perf.Skew.capPerKey]] — a Zipf-hot user reduces to k
    * rows per input partition before any shuffle). Deliberate, documented
    * data loss: events beyond the cap never reach the state — size k off
    * [[graft.perf.Skew.keyHistogram]] so only pathological users clip. */
  private[graft] def rollupStep(statePath: String,
      maxPerUser: Option[Int] = None)
      : (DataFrame, Long) => Unit = { (batch0, batchId) =>
    val batch = maxPerUser.fold(batch0)(k => graft.perf.Skew.capPerKey(
      batch0, Seq("user_id"),
      Seq(negate(unix_micros(col("ts"))), negate(col("event_id"))), k))
    val spark = batch.sparkSession
    val root = new java.io.File(statePath)
    root.mkdirs()
    val latest = latestSnap(root)
    if (latest.exists { case (id, _) => id >= batchId }) {
      // replay of an already-applied batch: fold nothing (the double-count
      // guard); just GC any stale older snapshots a prior crash left
      latest.foreach { case (id, _) =>
        Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.getName.startsWith("snap-") && scala.util.Try(
            f.getName.stripPrefix("snap-").toLong).toOption.exists(_ < id))
          .foreach(f => graft.perf.Measure.deleteRecursively(f.toString))
      }
    } else {
      val part = batch
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("value").cast(DecimalType(18, 6)).as("v"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast(DecimalType(38, 6)).as("sv"))
      val merged = latest match {
        case Some((_, dir)) =>
          spark.read.parquet(dir.toString)
            .select(col("event_type"), col("day"), col("n"),
              col("sv").cast(DecimalType(38, 6)).as("sv"))
            .union(part).groupBy("event_type", "day")
            .agg(sum(col("n")).as("n"),
              sum(col("sv")).cast(DecimalType(38, 6)).as("sv"))
        case None => part
      }
      // eager materialization BEFORE the write: the merge reads the very
      // snapshot family the GC below deletes
      val pinned = merged.localCheckpoint(true)
      try pinned.write.mode("overwrite")
        .parquet(s"$statePath/snap-$batchId")
      finally { pinned.unpersist(); () }
      // GC strictly after the new snapshot is complete — a crash between
      // the write and here just leaves one extra snapshot for next time
      latest.foreach { case (_, dir) =>
        graft.perf.Measure.deleteRecursively(dir.toString) }
    }
  }

  /** Run a streaming query to a named in-memory sink until input is
    * exhausted (local smoke path). Returns the sink contents. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}

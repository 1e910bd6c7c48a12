package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming scale rehearsal (round-7 verdict task 8): drive the
  * Structured Streaming paths over an sf1-scale corpus in MULTIPLE
  * micro-batches (maxFilesPerTrigger-limited file source — the local stand-in
  * for a rate-limited Kafka partition) and report, per query:
  *   - batch count and per-batch duration (ms),
  *   - state-store rows + bytes at the final progress (the unbounded-growth
  *     check: watermark-bounded operators must hold state ~constant once
  *     windows expire, not proportional to stream length).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir with events.parquet/documents.parquet>
  *        sbt "runMain graft.perf.StreamSoak"
  * Output: one "[soak] name batches=… batchMs=… stateRows=… stateMB=…" line
  * per query, recorded in BASELINE.md.
  */
object StreamSoak {

  private def report(name: String, q: StreamingQuery): Unit = {
    q.processAllAvailable()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    // durs can be empty (a query that saw zero input rows) — max would throw
    val durs = progress.map(_.batchDuration)
    val maxDur = durs.maxOption.getOrElse(0L)
    val state = progress.lastOption.toSeq.flatMap(_.stateOperators.toSeq)
    q.stop()
    val rows = state.map(_.numRowsTotal).sum
    val mb = state.map(_.memoryUsedBytes).sum / 1e6
    println(f"[soak] $name%-22s batches=${durs.length}%2d " +
      f"batchMs(med/max)=${median(durs)}%5d/$maxDur%5d " +
      f"stateRows=$rows%8d stateMB=$mb%8.1f")
  }

  private def median(xs: Seq[Long]): Long =
    if (xs.isEmpty) 0L else xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf1")
    val spark: SparkSession = graft.Tables.session("graft-stream-soak", "8")
    val tmp = java.nio.file.Files.createTempDirectory("soak").toString

    def mem(name: String, df: org.apache.spark.sql.DataFrame,
        mode: OutputMode): Unit = {
      val q = df.writeStream.outputMode(mode).format("memory")
        .queryName(name).start()
      report(name, q)
    }

    import graft.streaming.{DocsStream, EventsStream}
    // ~8 part files per table at sf1 → one file per micro-batch
    def events = EventsStream.read(spark, s"$dir/events.parquet",
      maxFilesPerTrigger = Some(1))

    mem("windowed_counts", EventsStream.windowedCounts(events), OutputMode.Append())
    mem("dedup_stream",
      EventsStream.dedupStream(events, Seq("user_id", "event_type")),
      OutputMode.Append())
    mem("sessionize", EventsStream.sessionize(events), OutputMode.Update())
    mem("debounce", EventsStream.debounce(events), OutputMode.Append())
    mem("scd2", EventsStream.scd2(events), OutputMode.Append())
    mem("purchase_attribution", EventsStream.purchaseAttribution(events),
      OutputMode.Append())

    report("incremental_rollup", EventsStream.incrementalRollup(events,
      s"$tmp/rollup_state", s"$tmp/rollup_ckpt"))

    val docsIn = spark.read.parquet(s"$dir/documents.parquet")
    report("ingest_near_dup", DocsStream.ingestNearDup(
      DocsStream.read(spark, s"$dir/documents.parquet",
        maxFilesPerTrigger = Some(1)),
      s"$tmp/corpus", s"$tmp/ingest_ckpt"))
    println(s"[soak] ingest corpus rows: " +
      spark.read.parquet(s"$tmp/corpus").count() + " of " + docsIn.count())
    spark.stop()
  }
}

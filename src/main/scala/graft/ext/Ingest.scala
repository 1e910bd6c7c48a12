package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Resilient ingestion: at corpus scale malformed records are a
  * statistical certainty, and a reader that either crashes (FAILFAST) or
  * silently nulls fields (plain PERMISSIVE) loses data or hides rot. This
  * reader splits every batch into (clean, quarantine) so bad lines are
  * retained for inspection and replay instead of being dropped.
  */
object Ingest {

  /** One quarantined ingest batch: `clean` parsed rows, `quarantined` raw
    * malformed lines, and a `release()` the caller MUST invoke once both
    * outputs are consumed — the underlying parsed frame is cached (see
    * [[jsonlWithQuarantine]]) and would otherwise stay pinned for the
    * session's lifetime, leaking one cached relation per batch. */
  final case class QuarantinedBatch(clean: DataFrame, quarantined: DataFrame,
      private val raw: DataFrame) {
    def release(): Unit = { raw.unpersist(); () }
  }

  /** Read JSON-lines at `path` against `schema`, quarantining malformed
    * lines. The parsed frame is cached before the split — Spark
    * materializes `_corrupt_record` only for rows that fail parsing, and
    * filtering the raw scan twice without a materialization point can
    * re-parse and lose the corrupt column (documented Spark behavior).
    * Call `release()` on the returned batch when done. */
  def jsonlWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): QuarantinedBatch = {
    val corrupt = "_corrupt_record"
    val raw = spark.read
      .schema(schema.add(corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .cache()
    QuarantinedBatch(
      clean = raw.filter(col(corrupt).isNull).drop(corrupt),
      quarantined = raw.filter(col(corrupt).isNotNull)
        .select(col(corrupt).as("raw_line")),
      raw = raw)
  }
}

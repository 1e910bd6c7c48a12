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

  /** Read JSON-lines at `path` against `schema`, quarantining malformed
    * lines. Returns (clean rows, quarantined raw lines). The parsed frame
    * is cached before the split — Spark materializes `_corrupt_record`
    * only for rows that fail parsing, and filtering the raw scan twice
    * without a materialization point can re-parse and lose the corrupt
    * column (documented Spark behavior). */
  def jsonlWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val raw = spark.read
      .schema(schema.add(corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .cache()
    val clean = raw.filter(col(corrupt).isNull).drop(corrupt)
    val quarantined = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_line"))
    (clean, quarantined)
  }
}

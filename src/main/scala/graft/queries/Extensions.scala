package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** LLM-training-data-pipeline operators (north star, beyond the reference
  * surface): deduplication, similarity search, text analysis, multimodal
  * plumbing, event-stream analytics. All operators are DataFrame→DataFrame
  * transformers — no collects, no driver-side state — so they scale by
  * partitioning alone.
  */
object Extensions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(
    // ── exact deduplication: hash-groupBy keep-first (earliest event per
    //    (user_id, event_type)); one shuffle on the dedup key ─────────────
    Q(
      "q_dedup_exact",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(col("user_id"), col("event_type"))
          .agg(min(col("event_id")).as("first_event_id"),
            count(lit(1)).as("n_dupes"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, MIN(event_id) AS first_event_id,
        COUNT(*) AS n_dupes
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type"""),
      bench = true),

    // ── token counting: whitespace tokenizer over documents ──────────────
    Q(
      "q_token_count",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(LENGTH(text) AS BIGINT) AS n_chars
        FROM documents ORDER BY doc_id"""))
  )
}

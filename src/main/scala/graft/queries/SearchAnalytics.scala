package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Keyword-retrieval operators (round 4, beyond the reference surface):
  * the index-side and query-side of lexical search over a document corpus —
  * the retrieval half a training-data pipeline needs for decontamination
  * lookups, targeted corpus slicing, and RAG-style example mining.
  *
  * Scale shape: both operators aggregate per-(doc, term) FIRST, so the
  * widest shuffle key is the term dictionary (bounded by vocabulary, not
  * corpus size); posting lists are document-frequency-capped BEFORE any
  * list is materialized, so a stopword can never build a corpus-sized
  * array on one reducer.
  *
  * Determinism policy (shared with Extensions/CorpusAnalytics): `ln` is
  * rounded at the term level and per-doc score terms are decimal-summed, so
  * aggregate scores are independent of partitioning and engine.
  */
object SearchAnalytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Share of the corpus above which a term is treated as a stopword and
    * excluded from the index (no posting list is ever built for it). */
  private val MaxDfShare = 0.79

  /** Posting-list head kept per term in the index sample. */
  private val PostingsHead = 20

  /** BM25 parameters (standard Robertson/Lucene values). */
  private val K1 = 1.2
  private val B = 0.75

  val queries: Seq[Q] = Seq(
    // ── inverted index: term → (document frequency, sorted posting-list
    //    head). Distinct (doc, term) pairs are aggregated to df first and
    //    stopword-grade terms (df ≥ MaxDfShare·N) are dropped BEFORE the
    //    collect, so no posting list is ever corpus-sized; the head slice
    //    bounds the output row width. The corpus doc count enters as a
    //    ONE-ROW aggregate broadcast-cross ─────────────────────────────────
    Q(
      "q_inverted_index",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val pairs = d
          .select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("term"))
          .filter(length(col("term")) >= 2)
          .distinct()
        val dfreq = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val nDocs = d.agg(count(lit(1)).as("n_docs"))
        val kept = dfreq.crossJoin(broadcast(nDocs))
          .filter(col("df").cast("double") <
            lit(MaxDfShare) * col("n_docs").cast("double"))
          .select(col("term"), col("df"))
        // the posting-list head is emitted as a comma-joined STRING, not an
        // array: the driver's oracle compare canonicalizes rows in pandas,
        // which cannot sort list cells (round-5 harness crash) — scalars
        // compare everywhere, and the join preserves the sorted order
        pairs.join(broadcast(kept), Seq("term"))
          .groupBy(col("term"), col("df"))
          .agg(array_join(
            transform(
              slice(sort_array(collect_list(col("doc_id"))), 1, PostingsHead),
              _.cast("string")),
            ",").as("postings_head"))
          .orderBy(col("term"))
      },
      Some(s"""WITH pairs AS (SELECT DISTINCT doc_id, term FROM
            (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
             FROM documents) WHERE len(term) >= 2),
          dfreq AS (SELECT term, COUNT(*) AS df FROM pairs GROUP BY 1),
          nd AS (SELECT COUNT(*) AS n_docs FROM documents),
          kept AS (SELECT term, df FROM dfreq CROSS JOIN nd
            WHERE CAST(df AS DOUBLE) < $MaxDfShare * CAST(n_docs AS DOUBLE))
        SELECT term, df,
          array_to_string(list_transform(
            (list(doc_id ORDER BY doc_id))[1:$PostingsHead],
            x -> CAST(x AS VARCHAR)), ',') AS postings_head
        FROM pairs JOIN kept USING (term)
        GROUP BY term, df ORDER BY term""")),

    // ── BM25 retrieval: top-20 documents for a fixed keyword query.
    //    Per-(doc, term) tf is aggregated before scoring (vocabulary-bounded
    //    shuffle); document frequency and corpus stats are tiny broadcast
    //    sides. idf = ln((N − df + ½)/(df + ½) + 1) (Lucene's non-negative
    //    form) is rounded per term, per-term scores are rounded then
    //    decimal-summed per doc, and the final top-k sorts on the rounded
    //    score with doc_id tie-break — engine-stable end to end ─────────────
    Q(
      "q_search_bm25",
      (s, dir) => {
        val qterms = Seq("spark", "window", "merge")
        val d = t(s, dir, "documents")
        val toks = d.select(col("doc_id"),
            size(split(lower(col("text")), " ")).cast("long").as("dl"),
            explode(split(lower(col("text")), " ")).as("term"))
        val corpus = d.agg(
          count(lit(1)).cast("double").as("n_docs"),
          sum(size(split(lower(col("text")), " "))).cast("double").as("total_toks"))
        val tf = toks.filter(col("term").isin(qterms: _*))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).cast("double").as("tf"))
        val dfreq = tf.groupBy(col("term"))
          .agg(count(lit(1)).cast("double").as("df"))
        val scored = tf
          .join(broadcast(dfreq), Seq("term"))
          .crossJoin(broadcast(corpus))
          .select(col("doc_id"),
            round(
              round(log((col("n_docs") - col("df") + lit(0.5)) /
                (col("df") + lit(0.5)) + lit(1.0)), 6) *
              (col("tf") * lit(K1 + 1.0)) /
              (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) *
                col("dl").cast("double") /
                (col("total_toks") / col("n_docs")))), 6)
              .cast(DecimalType(28, 6)).as("s"))
        scored.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms"),
            sum(col("s")).as("sdec"))
          .select(col("doc_id"), col("n_terms"),
            round(col("sdec").cast("double"), 6).as("bm25"))
          .orderBy(desc("bm25"), col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH toks AS (SELECT doc_id,
            len(string_split(lower(text), ' ')) AS dl,
            UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
          corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
            CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE) AS total_toks
            FROM documents),
          tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM toks WHERE term IN ('spark', 'window', 'merge')
            GROUP BY 1, 2, 3),
          dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
          scored AS (SELECT doc_id,
              CAST(ROUND(
                ROUND(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6) *
                (tf * ${K1 + 1.0}) /
                (tf + $K1 * (${1.0 - B} + $B *
                  CAST(dl AS DOUBLE) / (total_toks / n_docs))), 6)
                AS DECIMAL(28,6)) AS s
            FROM tf JOIN dfreq USING (term) CROSS JOIN corpus)
        SELECT doc_id, COUNT(*) AS n_terms,
          ROUND(CAST(SUM(s) AS DOUBLE), 6) AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20"""))
  )
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, partition-parallel, no UDFs). */
object TextAnalysis {

  /** Tiny per-language stopword inventories (public, standard lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "de", "un", "que"))

  private def toks(text: Column): Column = split(lower(text), " ")

  /** Stopword hits for one language over a token array. */
  def stopwordHits(text: Column, lang: String): Column = {
    val list = array(stopwords(lang).map(lit): _*)
    size(filter(toks(text), t => array_contains(list, t))).cast("long")
  }

  /** n-gram-heuristic language ID: argmax of stopword hits, deterministic
    * tie-break on language code ('und' when no hits at all). */
  def langId(text: Column): Column = {
    val scored = stopwords.keys.toSeq.sorted.map(l => struct(
      stopwordHits(text, l).as("hits"), lit(l).as("lang")))
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  private def countChar(text: Column, ch: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(ch), "")))
      .cast("long")

  /** Quality signals: length, token count, mean token length, punctuation
    * count, stopword ratio — the standard cheap pre-filters for corpus
    * cleaning. Ratios follow the exact-ints → double → round policy. */
  def qualityColumns(text: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val nToks = size(toks(text)).cast("long")
    val punct = (countChar(text, ".") + countChar(text, ",") +
      countChar(text, "!") + countChar(text, "?")).cast("long")
    val hits = stopwordHits(text, "en")
    Seq(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      round(nChars.cast("double") / nToks.cast("double"), 4).as("mean_tok_len"),
      punct.as("n_punct"),
      round(hits.cast("double") / nToks.cast("double"), 4).as("stopword_ratio"))
  }

  /** Tiny character-trigram profiles per language (top discriminative
    * trigrams, public linguistic data) — the classic char-n-gram language-ID
    * complement to the stopword heuristic; robust on text without clean
    * word boundaries. */
  val charTrigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", " th", "he ", "ing", "and", " an", "ion", " of"),
    "de" -> Seq("der", "ich", "sch", "die", "und", "ein", "cht", "en "),
    "fr" -> Seq("es ", "le ", "de ", "ent", "ion", "que", " la", "ait"),
    "es" -> Seq("de ", "la ", "os ", "el ", "ent", "ión", " co", "es "))

  /** Count occurrences of a literal substring (codegen'd length arithmetic —
    * no regex engine in the hot path). */
  private def countOccurrences(text: Column, sub: String): Column =
    ((length(text) - length(regexp_replace(text,
      java.util.regex.Pattern.quote(sub), ""))) / sub.length).cast("long")

  /** Char-trigram hit score for one language. */
  def trigramHits(text: Column, lang: String): Column =
    charTrigrams(lang).map(t => countOccurrences(lower(text), t))
      .reduce(_ + _)

  /** Char-n-gram language ID: argmax of trigram hits (tie-break on language
    * code, 'und' when nothing matches). */
  def langIdCharNgram(text: Column): Column = {
    val scored = charTrigrams.keys.toSeq.sorted.map(l => struct(
      trigramHits(text, l).as("hits"), lit(l).as("lang")))
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Winnowing-style 64-bit document fingerprint (custom expression). */
  def fingerprint(text: Column, window: Int = 16): Column =
    HashFunctions.fingerprint(text, window)

  /** Convenience: full text-profile of a document table. */
  /** Split documents into token-window chunks with overlap — the standard
    * pre-training windowing (context-length-bounded chunks, stride =
    * chunk − overlap). A narrow map: tokenize once, posexplode the chunk
    * starts, slice — no shuffle, no UDF; scales with partitions alone.
    * Emits (doc_id, chunk_id, chunk_text, n_chunk_tokens). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 128, overlapTokens: Int = 32): DataFrame = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0)
    val stride = chunkTokens - overlapTokens
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        // chunk starts 0, stride, 2·stride … covering the last token; a doc
        // shorter than one chunk yields exactly one chunk
        expr(s"sequence(0, greatest(cast(ceil((size(toks) - $chunkTokens) / " +
          s"cast($stride as double)) as int), 0))").as("starts"))
      .select(col("doc_id"), col("toks"), posexplode(col("starts")).as(Seq("chunk_id", "k")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        expr(s"slice(toks, chunk_id * $stride + 1, $chunkTokens)").as("chunk_toks"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"),
        size(col("chunk_toks")).cast("long").as("n_chunk_tokens"))
  }

  /** Within-document repetition rate: 1 − distinct/total word n-grams — the
    * standard repeated-n-gram quality filter (high values mean boilerplate
    * or looping text). Pure per-row array expressions: NO explode, no
    * shuffle — a narrow map over the corpus. */
  def repetitionColumns(toksCol: String = "toks", n: Int = 3): Seq[Column] = {
    val gram = (0 until n).map(j => s"$toksCol[i + $j]")
      .mkString("concat_ws(' ', ", ", ", ")")
    val sh = expr(
      s"transform(sequence(0, size($toksCol) - $n), i -> $gram)")
    Seq(size(sh).cast("long").as("n_shingles"),
      size(array_distinct(sh)).cast("long").as("n_distinct"),
      round(lit(1.0) - size(array_distinct(sh)).cast("double") /
        size(sh).cast("double"), 6).as("repetition_rate"))
  }

  /** Corpus vocabulary induction: the top-K terms by corpus frequency with
    * document frequency and cumulative token-coverage fraction — the
    * term-statistics pass a tokenizer build (BPE seed vocab, stopword list,
    * coverage target) starts from. Two shuffles: per-(doc, term) counts with
    * map-side partial aggregation, then per-term totals. The top-K prefix
    * is taken FIRST with a distributed top-k (TakeOrderedAndProject), so
    * the rank/coverage window runs over at most topK rows by construction
    * — never the full vocabulary. Corpus token total rides in-plan as a
    * one-row broadcast aggregate. Returns (rk, term, tf, df, cum_frac). */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 100): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val terms = perDoc.groupBy("term")
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))
    val total = terms.agg(sum(col("tf")).as("total_tokens"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(desc("tf"), col("term"))
    val cum = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    // cum_frac only needs the ordered TOP-K prefix, so truncate FIRST with
    // a distributed top-k (TakeOrderedAndProject) — the global window then
    // runs over at most topK rows by construction, never the full vocabulary
    terms.orderBy(desc("tf"), col("term")).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("cum_frac", round(
        sum(col("tf")).over(cum).cast("double") /
          col("total_tokens").cast("double"), 6))
      .select(col("rk"), col("term"), col("tf"), col("df"), col("cum_frac"))
  }

  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      (col(idCol).as("doc_id") +:
        langId(col(textCol)).as("lang_pred") +:
        qualityColumns(col(textCol))) :+
        fingerprint(col(textCol)).as("fingerprint"): _*)

  // ── PII text redaction ────────────────────────────────────────────────────

  /** Email and phone-number patterns for text-level scrubbing, tuned for
    * PRECISION (never corrupt clean prose) over recall:
    *  - emails: the usual local@domain.tld shape;
    *  - phones: ≥9 digits, optional leading +, at most two of space/()/-
    *    between digit pairs, digit-boundary guards on both ends (and a
    *    leading '.' guard) so dates ("2025-01-15", 8 digits), short number
    *    lists, and decimals ("3.141592653") are spared. Dotted phone
    *    formats ("415.555.0199") are deliberately NOT matched — the dot
    *    class would swallow decimals. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "(?<![0-9.+])\\+?[0-9](?:[ ()\\[\\]\\-]{0,2}[0-9]){8,}(?![0-9])"

  /** Scrub emails and phone numbers from a text column (codegen'd
    * regexp_replace chain — the text-level complement of the plan-level
    * PiiGate: the gate stops PII COLUMNS from leaving; this removes PII
    * embedded INSIDE free text before it enters a training corpus). Emails
    * are replaced first so digit-bearing local parts cannot double-match
    * the phone pass. */
  def redact(text: Column, emailTag: String = "[EMAIL]",
      phoneTag: String = "[PHONE]"): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, emailTag),
      PhonePattern, phoneTag)

  /** Count of redacted spans in a text column (audit metric). Phones are
    * counted on the email-redacted text, mirroring [[redact]]'s pass order —
    * counting both patterns on the raw text would double-count digit-
    * bearing email local parts. */
  def redactionCount(text: Column): Column =
    (regexp_count(text, lit(EmailPattern)) +
      regexp_count(regexp_replace(text, EmailPattern, "\u0000"),
        lit(PhonePattern))).cast("long")
}

package graft.perf

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Dedup slope attribution probe (round-8 judge task 4): per corpus,
  * counts the VOLUME drivers of the prefix-filtered set-similarity join —
  * shingle rows, prefix-candidate pairs, and verified near-dup pairs — so
  * a super-2× wall-clock slope can be split into "more work per row"
  * (a plan defect) vs "more genuine near-dup pairs per row" (a corpus
  * density property). Prints one JSON line per SF dir in
  * SPARK_GRAFT_PROBE_DIRS (comma-separated).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIRS",
      "/root/testdata/sf0.1").split(',').map(_.trim).filter(_.nonEmpty)
    val spark = graft.Tables.session("graft-dedup-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val sh = Dedup.shingles(d, "doc_id", "text", 3).cache()
      val nDocs = d.count()
      val nSh = sh.count()
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // raw self-join match volume: Σ_shingle C(postings, 2) — the work the
      // candidate join pays before dedup/size filters; a superlinear slope
      // HERE with linear candidates means hot (transform-invariant)
      // shingles, not plan cost
      val (rawMatches, tRaw) = timed {
        // coalesce: SUM over zero groups (a corpus of sub-n-token docs) is
        // NULL, and getLong would NPE instead of reporting 0
        Dedup.prefixPostings(sh, 4, 5)
          .groupBy("shingle").agg(count(lit(1)).as("k"))
          // integer `div`, not `/`: SQL / is double division, which loses
          // exactness once hot-shingle posting products near 2^53
          .select(coalesce(sum(expr("k * (k - 1) div 2")), lit(0L)).cast("long"))
          .head().getLong(0)
      }
      val (nCand, tCand) = timed(Dedup.prefixCandidates(sh, 4, 5).count())
      val (nPairs, tPairs) = timed(Dedup.jaccardPairsPrefix(sh, 4, 5).count())
      sh.unpersist()
      println(s"""{"probe":"dedup","dir":"$dir","docs":$nDocs,""" +
        s""""shingle_rows":$nSh,"raw_prefix_matches":$rawMatches,""" +
        s""""prefix_candidates":$nCand,"verified_pairs":$nPairs,""" +
        s""""sec_raw":$tRaw,"sec_candidates":$tCand,"sec_pairs":$tPairs}""")
    }
    spark.stop()
  }
}

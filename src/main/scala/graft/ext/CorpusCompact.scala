package graft.ext

import org.apache.spark.sql.SparkSession

/** Crash-safe consolidation for an append-mode parquet DIRECTORY — the
  * corpus store itself. [[graft.streaming.DocsStream.ingestStep]] appends
  * ~1 file per micro-batch, so a sustained ingest fragments the corpus the
  * same way it fragments the indexes: after weeks of small batches, every
  * corpus read (the exact-dedup anti-join, the derived fallback screen,
  * any analytics face) pays file LISTING before it pays I/O.
  *
  * Unlike the index stores, the corpus is DATA: there is no "re-register
  * to heal" — a botched rewrite is data loss. The protocol is therefore a
  * RESUMABLE swap instead of a poison marker:
  *
  *  1. STAGE — write the consolidated copy into the hidden `.compact-tmp`
  *     staging dir (Spark's file listing ignores dot-paths, so readers and
  *     a crash here leave the corpus untouched; stale staging is swept by
  *     the next compaction);
  *  2. MARK — atomically write `_graft_corpus_swap` carrying the swap
  *     token: from this instant the STAGED set is the corpus truth;
  *  3. SWAP — idempotent steps, any prefix re-runnable: delete every
  *     visible part file not belonging to this swap, then move each staged
  *     file in under a `compacted-<token>-` name (a file lives in staging
  *     XOR the corpus, never both);
  *  4. CLEAR — remove the staging dir, then the marker.
  *
  * A kill anywhere in 3-4 leaves the marker, and [[resumeIfNeeded]] —
  * called by the ingest at every batch start, one `Files.exists` when
  * healthy — re-runs the idempotent steps to completion BEFORE anything
  * reads the corpus. The row multiset is preserved exactly (pinned in
  * StreamingSpec, kill windows included).
  *
  * Single-writer contract: the ingest owns the directory. A concurrent
  * EXTERNAL reader during the short swap window could observe a partial
  * corpus — the same caveat as any non-table-format parquet append — so
  * schedule external scans off the maintenance window or read a snapshot
  * copy. */
object CorpusCompact {

  private def markerPath(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, "_graft_corpus_swap")

  private def stagingPath(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, ".compact-tmp")

  private def visibleParquet(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  /** Visible corpus part files — the fragmentation telemetry. */
  def fileCount(dir: String): Int = visibleParquet(dir).size

  private def writeMarkerAtomic(dir: String, tok: String): Unit = {
    val p = markerPath(dir)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, tok)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Phases 3-4, exposed for the kill-window spec: delete old visible
    * files, move staged files in, clear staging + marker. Every step is
    * idempotent — a re-run after a kill at ANY point completes the same
    * swap. */
  private[graft] def finishSwap(dir: String, tok: String): Unit = {
    val prefix = s"compacted-$tok-"
    val staged = Option(stagingPath(dir).toFile.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    // defensive: the protocol never produces a marker without either a
    // complete staged set or already-moved token files (the marker lands
    // only after the staging write). A marker with NEITHER is corruption
    // — refuse loudly instead of deleting the corpus behind it
    require(staged.nonEmpty ||
        visibleParquet(dir).exists(_.getName.startsWith(prefix)),
      s"corpus swap marker '$tok' at $dir names no staged and no moved " +
        "files — refusing to delete the corpus; remove the marker " +
        "manually if it is spurious")
    visibleParquet(dir).filterNot(_.getName.startsWith(prefix)).foreach { f =>
      java.nio.file.Files.delete(f.toPath)
      // drop the Hadoop local-FS checksum orphan with its data file
      java.nio.file.Files.deleteIfExists(
        f.toPath.resolveSibling("." + f.getName + ".crc"))
    }
    staged.foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(dir, prefix + f.getName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    graft.perf.Measure.deleteRecursively(stagingPath(dir).toString)
    java.nio.file.Files.deleteIfExists(markerPath(dir))
    ()
  }

  /** Resume an interrupted swap if the marker is present (one
    * `Files.exists` when healthy). Returns true iff a resume ran. Callers
    * that read the corpus (the ingest, a compaction) MUST call this
    * first. */
  def resumeIfNeeded(dir: String): Boolean = {
    val m = markerPath(dir)
    if (!java.nio.file.Files.exists(m)) false
    else {
      finishSwap(dir, java.nio.file.Files.readString(m).trim)
      true
    }
  }

  /** Consolidate the directory's visible part files down to
    * `targetFiles` (default: the session's shuffle-partition count). The
    * expensive phase (one corpus read + write) runs into the hidden
    * staging dir with the live corpus untouched; only the short swap is
    * marker-guarded and resumable. No-op on an empty/absent corpus. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 0): Unit = {
    resumeIfNeeded(dir)
    // flat append-mode dirs ONLY: on a hive-partitioned dir the staging
    // read would absorb every nested row while the swap deletes only
    // top-level files — the moved-in consolidated copy would then
    // DUPLICATE the untouched subdirectories' rows. Refuse up front.
    val subdirs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    require(subdirs.isEmpty,
      s"CorpusCompact supports flat append-mode dirs only; $dir has " +
        s"subdirectories ${subdirs.map(_.getName).take(3).mkString(", ")} " +
        "(a partitioned layout compacts per-partition, not whole-dir)")
    if (visibleParquet(dir).isEmpty) return
    val target = math.max(1,
      if (targetFiles > 0) targetFiles
      else spark.sessionState.conf.numShufflePartitions)
    graft.perf.Measure.deleteRecursively(stagingPath(dir).toString)
    // tripwire for the single-writer contract: snapshot the visible file
    // set the staging read absorbs, and recheck it just before the marker
    // lands — a writer that appended between the two would otherwise have
    // its rows DELETED by the swap with no trace. Aborting here is free
    // (no marker yet → the corpus is untouched; staging is swept).
    val snapshot = visibleParquet(dir).map(_.getName).toSet
    spark.read.parquet(dir).coalesce(target)
      .write.mode("overwrite").parquet(stagingPath(dir).toString)
    val now = visibleParquet(dir).map(_.getName).toSet
    if (now != snapshot) {
      graft.perf.Measure.deleteRecursively(stagingPath(dir).toString)
      throw new IllegalStateException(
        s"corpus at $dir changed during compaction staging " +
          s"(${(now -- snapshot).size} new / ${(snapshot -- now).size} " +
          "removed files) — a concurrent writer violated the single-writer " +
          "contract; swap aborted, corpus untouched")
    }
    val tok = java.util.UUID.randomUUID().toString.take(8)
    writeMarkerAtomic(dir, tok)
    finishSwap(dir, tok)
  }

  /** Self-sizing trigger ([[ShingleIndex.maybeCompact]]'s contract on the
    * corpus store): compact iff the visible file count exceeds `factor` ×
    * the consolidation target. Returns true iff a compaction ran. */
  def maybeCompact(spark: SparkSession, dir: String, factor: Int = 8,
      targetFiles: Int = 0): Boolean = {
    resumeIfNeeded(dir)
    val target = math.max(1,
      if (targetFiles > 0) targetFiles
      else spark.sessionState.conf.numShufflePartitions)
    if (fileCount(dir) > factor * target) { compact(spark, dir, target); true }
    else false
  }
}

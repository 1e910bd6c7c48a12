package graft.perf

import org.apache.spark.sql.DataFrame

/** Shared measurement helpers for the perf mains (AnnBench,
  * AdvisorRehearsal, …) — previously copy-pasted per main, which invites
  * silent divergence the first time one copy is fixed. `graft.Bench` keeps
  * its own variants deliberately: its time() reports failures as −1 and its
  * median() filters them, a contract the rehearsal mains don't want. */
object Measure {

  /** Materialize every row without collecting to the driver. */
  def sink(df: DataFrame): Unit =
    df.foreachPartition((it: Iterator[org.apache.spark.sql.Row]) => {
      while (it.hasNext) it.next()
    })

  def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of an empty sample")
    val s = xs.sorted; s(s.length / 2)
  }

  /** Recursive count of parquet part files under a directory (0 if
    * absent) — the fragmentation telemetry for the append-mode stored
    * indexes, where file count IS the scan cost at scale. */
  def parquetFileCount(dir: String): Int = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) 0
    else {
      val s = java.nio.file.Files.walk(p)
      // regular files only: artifact DIRECTORIES are conventionally named
      // `*.parquet` too (keys.parquet/, codes.parquet/) and must not count
      try s.filter(q => java.nio.file.Files.isRegularFile(q) &&
        q.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
  }

  /** Relative paths (under `dir`) of the VISIBLE regular `*.parquet`
    * files, sorted — the run-manifest capture unit. Visibility follows
    * Spark's directory-read convention: any path COMPONENT starting with
    * `_` or `.` is metadata/sidecar, not data (artifact directories
    * conventionally named `*.parquet` are excluded too, matching
    * [[parquetFileCount]]). The `_applied_tombs` archive a corpus
    * compaction retires into its new generation is exactly why the filter
    * must apply per component: a recursive walk would otherwise sweep the
    * RETRACTED doc_ids' tombstone part files into the pin as data, and an
    * explicit-path read — unlike a dir read — would not hide them. */
  def parquetFileNames(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else {
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(q => java.nio.file.Files.isRegularFile(q) &&
            q.getFileName.toString.endsWith(".parquet"))
          .map(q => p.relativize(q))
          .filterNot(rel => (0 until rel.getNameCount).exists { i =>
            val c = rel.getName(i).toString
            c.startsWith("_") || c.startsWith(".")
          })
          .map(_.toString).toVector.sorted
      } finally s.close()
    }
  }

  /** Total bytes of regular files under `dir` (0 if absent) — the
    * generation-archive accounting unit. */
  def dirBytes(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } finally s.close()
    }
  }

  /** Warehouse root for a perf main — ISOLATED from the default
    * `./spark-warehouse` that Verify (and the driver's face runs) use, so a
    * rehearsal and a Verify run can execute concurrently without one
    * rewriting the other's stored-index marker mid-measurement (the
    * round-13 contamination: a face that registers the shingle index
    * rewrote the marker mid-A/B and the "stored" binding silently measured
    * the derivation fallback). Stable per MAIN, not per run, so the
    * fresh-JVM A/B protocol still reattaches a stored index registered by
    * an earlier binding of the same rehearsal. `SPARK_GRAFT_WAREHOUSE`
    * overrides the root. */
  def warehouseDir(mainName: String): String =
    new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "rehearsal-warehouse"),
      mainName).getAbsolutePath

  /** Recursively delete a directory tree (no-op if absent). */
  def deleteRecursively(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }
}

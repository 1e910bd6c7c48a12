package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.AnnIndex

/** Plan-health pin for the round-17 pinned-file searches: the explicit
  * file index built from a manifest's captured paths must still serve the
  * probed-cell filter as PARTITION pruning (PartitionFilters on `cell`),
  * exactly like the live directory read — a pinned replay that scanned
  * every pinned cell would silently lose the nprobe/nCells I/O bound the
  * layout exists for. */
class PinnedPlanProbe extends AnyFunSuite {
  import SharedSpark._

  test("searchIvfAtFiles keeps probed-cell partition pruning over the " +
      "explicit pinned file index") {
    val e = Tables(spark, sf, "embeddings")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pinned-plan").toString
    val (cents, indexed) = AnnIndex.buildIvf(e, nCells = 16, refineIters = 1)
    AnnIndex.writeIvf(idx, cents, indexed, nCells = 16)
    val (_, _, files, _) = AnnIndex.pinListing(spark, idx)
    val q = e.filter(col("vec_id") < 4)
    val plan = AnnIndex.searchIvfAtFiles(spark, idx, 0, files, q, 3,
      nprobe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      """PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"pinned scan lost cell partition pruning:\n${plan.take(4000)}")
    graft.perf.Measure.deleteRecursively(idx)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.CorpusStore

/** Snapshot-generation retention + pinned reads (round 14): a
  * `graceGenerations` window keeps the newest N superseded generations on
  * disk, and [[CorpusStore.readAt]] pins a read to one of them — the
  * reproduce-an-earlier-run surface — while retractions still apply (a
  * purge must not resurface through a historical read). */
class SnapshotRetentionSpec extends AnyFunSuite {
  import SharedSpark._

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private def ids(d: org.apache.spark.sql.DataFrame) =
    d.select("doc_id").collect().map(_.getLong(0)).toSet

  test("retention keeps grace+1 generations; readAt pins, applies retractions, refuses GC'd") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-snap-retention").toString
    CorpusStore.init(dir)
    intercept[IllegalArgumentException] {
      CorpusStore.compactSnapshot(spark, dir, graceGenerations = 0) }

    CorpusStore.append(spark, dir, df(Seq((1L, "a"), (2L, "b"))))
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 2) // gen 2 = {1,2}
    CorpusStore.append(spark, dir, df(Seq((3L, "c"))))
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 2) // gen 3 = {1,2,3}
    assert(CorpusStore.generations(dir) == Seq(1L, 2L, 3L))
    CorpusStore.append(spark, dir, df(Seq((4L, "d"))))
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 2) // gen 4 = {1,2,3,4}; gen 1 GC'd
    assert(CorpusStore.generations(dir) == Seq(2L, 3L, 4L),
      "steady state must hold exactly grace+1 generations")

    // pinned reads: appends land IN the current generation, so a
    // generation freezes when SUPERSEDED — gen 2 froze when compaction 2
    // flipped (after doc 3 arrived, before doc 4), gen 3 when compaction 3
    // flipped (after doc 4)
    assert(ids(CorpusStore.readAt(spark, dir, 2L)) == Set(1L, 2L, 3L))
    assert(ids(CorpusStore.readAt(spark, dir, 3L)) == Set(1L, 2L, 3L, 4L))
    assert(ids(CorpusStore.read(spark, dir)) == Set(1L, 2L, 3L, 4L))

    // a retraction reaches historical reads too — takedowns don't time-travel
    import spark.implicits._
    graft.ext.CorpusCompact.tombstone(spark, dir,
      Seq(1L).toDF("doc_id"), token = Some("rt"))
    assert(ids(CorpusStore.readAt(spark, dir, 2L)) == Set(2L, 3L),
      "a pending retraction must apply to pinned generation reads")

    // GC'd generation refuses loudly, naming what IS retained
    val e = intercept[IllegalArgumentException] {
      CorpusStore.readAt(spark, dir, 1L) }
    assert(e.getMessage.contains("GC'd") && e.getMessage.contains("2, 3, 4"))

    // round 17: a retraction APPLIED by a compaction (journal swept, rows
    // physically purged from the new generation) must still pass through
    // pinned reads of the retained older generations — the applied batch
    // is retired into the new generation's _applied_tombs archive, not
    // swept, so readAt cannot resurface the purged doc from a grace
    // generation's frozen files
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1,
      graceGenerations = 2) // gen 5 = {2,3,4}; batch "rt" applied + retired
    assert(graft.ext.CorpusCompact.pendingTombstoneBatches(dir).isEmpty,
      "the journal must be swept (the batch was applied)")
    assert(ids(CorpusStore.readAt(spark, dir, 3L)) == Set(2L, 3L, 4L),
      "an applied retraction must not resurface through a pinned read")
    assert(ids(CorpusStore.readAt(spark, dir, 4L)) == Set(2L, 3L, 4L))
    assert(ids(CorpusStore.read(spark, dir)) == Set(2L, 3L, 4L))
    graft.perf.Measure.deleteRecursively(dir)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, ShingleIndex}

/** The stored shingle index as a production storage mode (round-11 task 1):
  * stored ≡ derived (the routing can never change answers), marker
  * reattach is free, bucket-count changes force a rewrite, appends are
  * O(delta) and keep the relation exact, and the bucketed layout actually
  * removes the corpus-wide shingle shuffle (CI-pinned Exchange count). */
class ShingleIndexSpec extends AnyFunSuite {
  import SharedSpark._

  private def finalPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range|Single)".r.findAllIn(finalPlan(df)).length

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id"), col("shingle")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def wipe(): Unit = {
    for (t <- Seq(ShingleIndex.tableName, ShingleIndex.bandsTableName)) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        t).toString)
    }
    for (d <- Seq(ShingleIndex.tombstonesDirName, ShingleIndex.gensDirName,
        ShingleIndex.stopDirName))
      graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        d).toString)
  }

  private def delta(offset: Long): DataFrame =
    Tables(spark, sf, "documents").limit(5)
      .select((col("doc_id") + offset).as("doc_id"),
        concat(lit(s"appended variant $offset "), col("text")).as("text"))

  test("stored ≡ derived, reattach is free, appends stay exact, df shuffle gone") {
    wipe()
    try {
      val derived = rows(ShingleIndex.derive(spark, sf))
      assert(derived.nonEmpty)

      // unregistered → shinglesFor is the plain derivation (no stored files)
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)))

      // first registration writes; contents match the derivation exactly
      val w1 = ShingleIndex.register(spark, sf, buckets = 4)
      assert(w1 > 0.0, "first registration must write")
      assert(rows(ShingleIndex.table(spark)) == derived)

      // routing: a registered, unappended index serves dir queries
      val routed = ShingleIndex.shinglesFor(spark, sf)
      assert(routed.inputFiles.exists(_.contains(ShingleIndex.tableName)))

      // the routed faces cannot diverge: same containment pairs either way
      val viaStored = Dedup.containmentPairs(routed, 4, 5, minShingles = 10)
        .orderBy(col("id_a"), col("id_b")).collect()
      val viaDerived = Dedup.containmentPairs(
        ShingleIndex.derive(spark, sf), 4, 5, minShingles = 10)
        .orderBy(col("id_a"), col("id_b")).collect()
      assert(viaStored.sameElements(viaDerived))

      // the layout's point: the corpus-wide document-frequency aggregate
      // runs bucket-local on the stored relation (zero shuffle Exchanges;
      // the derived relation must shuffle the whole corpus by shingle)
      val dfAggStored = ShingleIndex.table(spark)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      assert(shuffles(dfAggStored) == 0,
        s"bucketed df aggregate must be shuffle-free:\n${finalPlan(dfAggStored)}")
      assert(shuffles(ShingleIndex.derive(spark, sf)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))) >= 1)

      // reattach: drop only the catalog entry; the marker + files remain
      spark.sql(s"DROP TABLE ${ShingleIndex.tableName}")
      val w2 = ShingleIndex.register(spark, sf, buckets = 4)
      assert(w2 == 0.0, s"marker reattach must not rewrite (spent $w2 s)")
      assert(rows(ShingleIndex.table(spark)) == derived)
      assert(shuffles(ShingleIndex.table(spark)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))) == 0,
        "reattached index lost its bucket spec")

      // bucket-count change must rewrite, never silently reattach
      val w3 = ShingleIndex.register(spark, sf, buckets = 2)
      assert(w3 > 0.0, "changed bucket count must force a rewrite")

      // O(delta) append: new docs' shingles land in the bucketed store and
      // the relation equals base ∪ delta derivations exactly
      val delta = Tables(spark, sf, "documents").limit(5)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("appended variant "), col("text")).as("text"))
      val deltaRows = rows(Dedup.hashedShingles(delta, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle"))
      assert(deltaRows.nonEmpty)
      ShingleIndex.append(spark, delta)
      assert(rows(ShingleIndex.table(spark)) ==
        rows(ShingleIndex.derive(spark, sf)) ++ deltaRows)
      // appended files carry bucket ids: the df aggregate stays co-located
      assert(shuffles(ShingleIndex.table(spark)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))) == 0,
        "append broke the bucket layout")

      // an appended index describes dir ∪ delta, not dir — dir-derived
      // queries must fall back to the plain derivation
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)))

      // width mismatch is refused (an n=4 append into an n=3 index would
      // silently mix incompatible shingle spaces)
      intercept[IllegalArgumentException] {
        ShingleIndex.append(spark, delta, n = 4)
      }
    } finally wipe()
  }

  test("append crash window: routing is invalidated BEFORE any data lands") {
    wipe()
    try {
      ShingleIndex.register(spark, sf, buckets = 4)
      val derived = rows(ShingleIndex.derive(spark, sf))

      // kill #1: the process dies after phase 1 (marker bump + in-flight
      // token), before any insert — dir routing must already have fallen
      // back, live routing must refuse, appends must refuse
      ShingleIndex.beginAppend(spark, ShingleIndex.readMarker(spark).get, "kill-1")
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)),
        "dir routing served an index with an in-flight append")
      assert(ShingleIndex.liveFor(spark, sf).isEmpty,
        "live routing served a poisoned marker")
      intercept[IllegalStateException] { ShingleIndex.append(spark, delta(1)) }
      // routed faces stay correct THROUGH the poisoned state (fallback path)
      assert(rows(ShingleIndex.shinglesFor(spark, sf)) == derived)

      // register must heal by REWRITING, never by reattaching the unknown
      // contents
      assert(ShingleIndex.register(spark, sf, buckets = 4) > 0.0,
        "register reattached a poisoned index")
      assert(rows(ShingleIndex.table(spark)) == derived)
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .exists(_.contains(ShingleIndex.tableName)), "healed index not routed")

      // kill #2: the process dies after the data insert but before the
      // finalize — the OLD bug's window (data in, counter stale). The
      // marker-first ordering means the table is a superset under a marker
      // that already refuses routing.
      val m = ShingleIndex.readMarker(spark).get
      ShingleIndex.beginAppend(spark, m, "kill-2")
      ShingleIndex.insertDelta(spark, m, delta(2), "doc_id", "text", 3)
      assert(rows(ShingleIndex.table(spark)) != derived,
        "kill #2 setup should leave a strict superset in the table")
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)),
        "dir routing served a half-appended superset index")
      assert(rows(ShingleIndex.shinglesFor(spark, sf)) == derived,
        "fallback derivation polluted by the half-appended table")
      assert(ShingleIndex.register(spark, sf, buckets = 4) > 0.0)
      assert(rows(ShingleIndex.table(spark)) == derived)
    } finally wipe()
  }

  test("appends are idempotent per token (streaming replay contract)") {
    wipe()
    try {
      ShingleIndex.register(spark, sf, buckets = 4)
      assert(ShingleIndex.append(spark, delta(100), token = Some("b1")))
      val after = rows(ShingleIndex.table(spark))
      // replay of the same unit of work: no-op, rows unchanged
      assert(!ShingleIndex.append(spark, delta(100), token = Some("b1")))
      assert(rows(ShingleIndex.table(spark)) == after)
      // a NEW token appends
      assert(ShingleIndex.append(spark, delta(200), token = Some("b2")))
      assert(rows(ShingleIndex.table(spark)) != after)
      // only the LATEST token is remembered (sequential-batch contract)
      assert(!ShingleIndex.append(spark, delta(200), token = Some("b2")))
    } finally wipe()
  }

  test("band-backed live index: stored bands ≡ derived banding, appends feed both") {
    wipe()
    try {
      val sh0 = ShingleIndex.derive(spark, sf)
      ShingleIndex.registerDocs(spark, "live-tag", sh0, buckets = 4,
        withBands = true)
      // dir routing never serves a foreign tag; live routing serves it
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)))
      assert(ShingleIndex.liveFor(spark, "other-tag").isEmpty)
      val idx = ShingleIndex.liveFor(spark, "live-tag").get
      assert(rows(idx.postings) == rows(sh0))
      def bandRows(df: DataFrame): Set[(Int, Int, Long)] =
        df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(bandRows(idx.bands) ==
        bandRows(ShingleIndex.bandsOf(sh0, idx.k, idx.nBands, idx.rowsPerBand)),
        "stored bands diverge from the derivation expression")

      // an append feeds BOTH relations and live routing keeps serving
      val d = delta(300)
      assert(ShingleIndex.append(spark, d, token = Some("b1")))
      val shD = graft.ext.Dedup.hashedShingles(d, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle")
      val idx2 = ShingleIndex.liveFor(spark, "live-tag").get
      assert(rows(idx2.postings) == rows(sh0) ++ rows(shD))
      assert(bandRows(idx2.bands) ==
        bandRows(ShingleIndex.bandsOf(sh0, idx.k, idx.nBands, idx.rowsPerBand)) ++
          bandRows(ShingleIndex.bandsOf(shD, idx.k, idx.nBands, idx.rowsPerBand)))

      // a band-backed reattach restores both tables
      spark.sql(s"DROP TABLE ${ShingleIndex.tableName}")
      spark.sql(s"DROP TABLE ${ShingleIndex.bandsTableName}")
      assert(ShingleIndex.liveFor(spark, "live-tag").isDefined)
      assert(rows(ShingleIndex.table(spark)) == rows(sh0) ++ rows(shD))
    } finally wipe()
  }

  test("shingle skew guard: template-spam corpus raises the bucket count, reattach and compact honor it") {
    import spark.implicits._
    wipe()
    try {
      // template spam: 95% of docs are a shared 12-token boilerplate plus a
      // 2-token unique tail — every boilerplate shingle appears in ~95% of
      // docs while the per-doc shingle count stays small, so the top key's
      // share × buckets clears the guard's 2.0 fair-load threshold
      val boiler = "terms and conditions apply all rights reserved contact us for details"
      val docs = (1 to 400).map { i =>
        if (i % 20 != 0) (i.toLong, s"$boiler item$i ref$i")
        else (i.toLong, (0 until 30).map(w => s"d${i}w$w").mkString(" "))
      }.toDF("doc_id", "text")
      val sh = graft.ext.Dedup.hashedShingles(docs, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle")
      val spamRows = rows(sh)

      // per-KEY share on the shingle axis maxes at ~1/(shingles per doc)
      // (a boilerplate shingle appears once per document), so the guard
      // binds when the bucket count is large relative to the spam docs'
      // shingle count: ~0.074 share x 64 buckets = 4.7 fair loads
      ShingleIndex.registerDocs(spark, "spam-tag", sh, buckets = 64,
        withBands = true)
      val m = ShingleIndex.readMarker(spark).get
      val eff = """"eff_buckets":(\d+)""".r.findFirstMatchIn(m)
        .map(_.group(1).toInt)
      assert(eff.exists(_ > 64),
        s"guard did not raise the bucket count on a template-spam corpus: $m")
      assert(m.contains(""""bucket_key_top_share":""") &&
        m.contains(""""hot_ratio":"""), s"skew telemetry missing: $m")
      assert(rows(ShingleIndex.table(spark)) == spamRows)

      // reattach must use the RAISED count (bucket ids live in file names;
      // attaching at the requested 8 would corrupt co-partitioning)
      spark.sql(s"DROP TABLE ${ShingleIndex.tableName}")
      spark.sql(s"DROP TABLE ${ShingleIndex.bandsTableName}")
      assert(ShingleIndex.registerDocs(spark, "spam-tag", sh, buckets = 64,
        withBands = true) == 0.0, "matching marker must reattach, not rewrite")
      assert(rows(ShingleIndex.table(spark)) == spamRows)
      assert(ShingleIndex.liveFor(spark, "spam-tag").isDefined)

      // append + compact preserve the raised geometry and the row multiset
      val d = (1001 to 1005).map(i =>
        (i.toLong, s"fresh append content row number $i alpha beta gamma"))
        .toDF("doc_id", "text")
      assert(ShingleIndex.append(spark, d, token = Some("spam-1")))
      ShingleIndex.compact(spark)
      val m2 = ShingleIndex.readMarker(spark).get
      assert("""("eff_buckets":\d+)""".r.findFirstIn(m2) ==
        """("eff_buckets":\d+)""".r.findFirstIn(m),
        "compaction changed the effective bucket count")
      val (pf, _) = ShingleIndex.fileCounts(spark)
      assert(pf <= eff.get, s"compacted to $pf files, expected <= ${eff.get}")
      val dSh = rows(graft.ext.Dedup.hashedShingles(d, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle"))
      assert(rows(ShingleIndex.table(spark)) == spamRows ++ dSh)

      // guard=false control: requested count honored verbatim
      wipe()
      ShingleIndex.registerDocs(spark, "spam-tag", sh, buckets = 8,
        guard = false)
      val m3 = ShingleIndex.readMarker(spark).get
      assert(m3.contains(""""eff_buckets":8"""),
        s"guard=false must keep the requested count: $m3")
    } finally wipe()
  }

  test("delete: logical retraction is immediate, compact purges physically, replay is a no-op, kill windows stay conservative") {
    wipe()
    try {
      def bandRows(df: DataFrame): Set[(Int, Int, Long)] =
        df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      ShingleIndex.register(spark, sf, buckets = 4, withBands = true)
      val docs = Tables(spark, sf, "documents")
      val dead = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select("doc_id")
      val surviving = docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
      val survivingSh = rows(
        Dedup.hashedShingles(surviving, "doc_id", "text", 3)
          .withColumnRenamed("sh", "shingle"))
      val full = rows(ShingleIndex.table(spark))
      assert(survivingSh != full, "test corpus must actually lose docs")

      // commit the delete: logical reads exclude IMMEDIATELY
      assert(ShingleIndex.delete(spark, dead, token = Some("d1")))
      assert(rows(ShingleIndex.postings(spark)) == survivingSh,
        "postings() must exclude tombstoned docs before any compaction")
      val idx = ShingleIndex.liveFor(spark, sf).get
      assert(rows(idx.postings) == survivingSh,
        "liveFor postings served tombstoned docs")
      // materialized NOW: idx.bands is a lazy plan over the pre-compaction
      // files, which the compact below swaps away
      val survivingBands = bandRows(idx.bands)
      assert(survivingBands == bandRows(ShingleIndex.bandsOf(
        Dedup.hashedShingles(surviving, "doc_id", "text", 3)
          .withColumnRenamed("sh", "shingle"),
        idx.k, idx.nBands, idx.rowsPerBand)),
        "liveFor bands must equal a banding of the surviving corpus")
      // physical rows still present until compaction; dir routing is OFF
      // forever (a deleted index never again equals a fresh derivation)
      assert(rows(ShingleIndex.table(spark)) == full)
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)),
        "dir routing served an index with deletions")

      // route-after-delete ≡ rebuild-from-surviving-corpus (the oracle
      // face's contract, pinned here against the derivation)
      val viaDeleted = Dedup.containmentPairs(
          ShingleIndex.postings(spark), 4, 5, minShingles = 10)
        .orderBy(col("id_a"), col("id_b")).collect()
      val viaRebuild = Dedup.containmentPairs(
          Dedup.hashedShingles(surviving, "doc_id", "text", 3)
            .withColumnRenamed("sh", "shingle"), 4, 5, minShingles = 10)
        .orderBy(col("id_a"), col("id_b")).collect()
      assert(viaDeleted.sameElements(viaRebuild),
        "routed dedup over a deleted-from index diverged from a rebuild")

      // replay: the published token directory is the commit point
      assert(!ShingleIndex.delete(spark, dead, token = Some("d1")))
      assert(rows(ShingleIndex.postings(spark)) == survivingSh)
      assert(ShingleIndex.pendingTombstoneBatches(spark) == Seq("d1"))

      // compact applies the delete PHYSICALLY: raw table shrinks, bands
      // shrink, the tombstone batch is swept, journal fields survive
      ShingleIndex.compact(spark)
      assert(rows(ShingleIndex.table(spark)) == survivingSh,
        "compaction did not purge tombstoned postings")
      assert(bandRows(spark.table(ShingleIndex.bandsTableName)) ==
        survivingBands, "compaction did not purge tombstoned bands")
      assert(ShingleIndex.pendingTombstoneBatches(spark).isEmpty,
        "applied tombstone batch not swept")
      val m = ShingleIndex.readMarker(spark).get
      assert(m.contains(""""deletes":1""") &&
        m.contains(""""last_delete":"d1""""), s"delete journal lost: $m")
      assert(rows(ShingleIndex.postings(spark)) == survivingSh)

      // a redelivery AFTER the sweep re-journals but cannot change content
      // (the rows are gone; the anti-join of absent ids is a no-op)
      ShingleIndex.delete(spark, dead, token = Some("d1"))
      assert(rows(ShingleIndex.postings(spark)) == survivingSh)
      ShingleIndex.compact(spark)

      // kill window: death between the marker bump and the tombstone
      // publish — conservative on both sides (freshness refused, no
      // deletion served), and the redelivered batch completes it
      val m2 = ShingleIndex.readMarker(spark).get
      ShingleIndex.beginDelete(spark, m2, "d2")
      assert(ShingleIndex.pendingTombstones(spark).isEmpty,
        "unpublished tombstones must not be visible")
      assert(rows(ShingleIndex.postings(spark)) == survivingSh,
        "a half-committed delete served a deletion")
      assert(ShingleIndex.delete(spark, dead.limit(1), token = Some("d2")))
      assert(ShingleIndex.pendingTombstoneBatches(spark) == Seq("d2"))

      // maybeCompact's tombstone axis: enough pending batches trigger it
      (3 to 9).foreach(i => ShingleIndex.delete(
        spark, dead.limit(1), token = Some(s"d$i")))
      assert(ShingleIndex.pendingTombstoneBatches(spark).size == 8)
      assert(ShingleIndex.maybeCompact(spark, factor = 4),
        "pending tombstone batches over the factor must trigger compaction")
      assert(ShingleIndex.pendingTombstoneBatches(spark).isEmpty)

      // a rewrite (re-registration) wipes the journal with the old identity
      ShingleIndex.delete(spark, dead.limit(1), token = Some("d99"))
      assert(ShingleIndex.register(spark, sf, buckets = 2) > 0.0)
      assert(ShingleIndex.pendingTombstoneBatches(spark).isEmpty,
        "rewrite must wipe tombstones of the replaced identity")
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .exists(_.contains(ShingleIndex.tableName)),
        "a rewritten index is fresh again and must serve dir queries")
    } finally wipe()
  }

  test("boilerplate pruning: bands drop saturated shingles, screen candidates shrink, accept pairs unchanged, compact re-freezes") {
    import spark.implicits._
    wipe()
    graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      ShingleIndex.stopDirName).toString)
    try {
      def bandRows(df: DataFrame): Set[(Int, Int, Long)] =
        df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      // template spam: boilerplate shingles saturate; each doc carries a
      // unique tail so true near-dup similarity lives in rare shingles
      val boiler = "terms and conditions apply all rights reserved contact us for details"
      val docs = (1 to 200).map { i =>
        if (i % 20 == 0) (i.toLong, (0 until 30).map(w => s"d${i}w$w").mkString(" "))
        else (i.toLong, s"$boiler item$i alpha$i beta$i gamma$i delta$i")
      }.toDF("doc_id", "text")
      val sh = Dedup.hashedShingles(docs, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle")

      ShingleIndex.registerDocs(spark, "prune-tag", sh, buckets = 8,
        withBands = true, pruneDfFrac = 0.5)
      val m = ShingleIndex.readMarker(spark).get
      assert(m.contains(""""prune_df_frac":0.5""") &&
        m.contains(""""stop_count":"""), s"prune journal missing: $m")
      val idx = ShingleIndex.liveFor(spark, "prune-tag").get
      assert(idx.stop.isDefined, "liveFor must expose the stop set")
      val stopKeys = idx.stop.get.select("shingle").as[Long].collect().toSet
      assert(stopKeys.nonEmpty, "spam corpus must produce a stop set")
      // postings stay COMPLETE (verification truth is never pruned)
      assert(rows(ShingleIndex.table(spark)) == rows(sh))
      // bands ≡ banding of postings-minus-stop
      def prunedBasis(s: DataFrame) = s.filter(!col("shingle").isin(
        stopKeys.toSeq: _*))
      assert(bandRows(idx.bands) == bandRows(ShingleIndex.bandsOf(
        prunedBasis(sh), idx.k, idx.nBands, idx.rowsPerBand)),
        "stored bands must derive from the pruned basis")

      // the SCREEN: candidates shrink (spam docs no longer collide on
      // boilerplate bands), accepted near-dup PAIRS unchanged — the true
      // near-dup (shares a tail) is found, the fresh spam doc (boiler +
      // new tail, J < threshold vs everything) matches nothing, in BOTH
      // the pruned-indexed screen and the derived unpruned screen
      // near-dup of doc 7 sharing ALL its rare shingles plus one extra
      // (J_rare = 5/6 → band-collision probability ≈ 1 − 3·10⁻⁵; a
      // looser tail drew a deterministic 0/16-band miss — minhash is
      // probabilistic per pair even when exact in expectation)
      val batch = Seq(
        (9001L, s"$boiler item7 alpha7 beta7 gamma7 delta7 extra9001"),
        (9002L, s"$boiler item9002 alpha9002 beta9002 gamma9002 delta9002"))
        .toDF("doc_id", "text")
      val (prunedPairs, rel1) = Dedup.incrementalMinhashPairsIndexed(
        batch, docs.select("doc_id"), idx, "doc_id", "text", 0.6)
      val got = prunedPairs.select("delta_id", "corpus_id")
        .as[(Long, Long)].collect().toSet
      rel1()
      val (derivedPairs, rel2) = Dedup.incrementalMinhashPairsManaged(
        batch, docs, "doc_id", "text", 0.6)
      val want = derivedPairs.select("delta_id", "corpus_id")
        .as[(Long, Long)].collect().toSet
      rel2()
      assert(want.contains((9001L, 7L)), s"planted near-dup missing: $want")
      assert(got == want,
        s"pruned screen pairs $got != derived $want — similarity here " +
          "lives in rare shingles, so pruning must not change the answer")

      // append: the delta bands over the FROZEN stop set — invariant holds
      val d = Seq((501L, s"$boiler item501 alpha501 beta501 gamma501 delta501"))
        .toDF("doc_id", "text")
      assert(ShingleIndex.append(spark, d, token = Some("p1")))
      val shD = Dedup.hashedShingles(d, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle")
      val idx2 = ShingleIndex.liveFor(spark, "prune-tag").get
      assert(bandRows(idx2.bands) == bandRows(ShingleIndex.bandsOf(
        prunedBasis(sh.unionByName(shD)), idx.k, idx.nBands, idx.rowsPerBand)),
        "append must band its delta over the frozen stop set")

      // compact: re-freezes saturation from the compacted postings and
      // re-derives bands — invariant holds with the NEW stop set
      ShingleIndex.compact(spark)
      val m2 = ShingleIndex.readMarker(spark).get
      assert(m2.contains(""""prune_df_frac":0.5"""), "prune spec lost")
      val idx3 = ShingleIndex.liveFor(spark, "prune-tag").get
      val stopKeys3 = idx3.stop.get.select("shingle").as[Long].collect().toSet
      val allSh = sh.unionByName(shD)
      assert(bandRows(idx3.bands) == bandRows(ShingleIndex.bandsOf(
        allSh.filter(!col("shingle").isin(stopKeys3.toSeq: _*)),
        idx.k, idx.nBands, idx.rowsPerBand)),
        "compaction must re-derive bands over the re-frozen stop set")
      assert(rows(ShingleIndex.table(spark)) == rows(allSh))

      // identity: a prune-spec change forces a rewrite, never a reattach
      assert(ShingleIndex.registerDocs(spark, "prune-tag", sh, buckets = 8,
        withBands = true, pruneDfFrac = 0.5) == 0.0, "same spec must reattach")
      assert(ShingleIndex.registerDocs(spark, "prune-tag", sh, buckets = 8,
        withBands = true) > 0.0, "dropping the prune spec must rewrite")
    } finally {
      wipe()
      graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        ShingleIndex.stopDirName).toString)
    }
  }

  test("compaction: row-identical, marker survives, file count bounded, kill windows refuse") {
    wipe()
    try {
      def bandRows(df: DataFrame): Set[(Int, Int, Long)] =
        df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

      // zero-append compaction keeps dir routing: the index still equals a
      // fresh derivation, so shinglesFor must keep serving it
      ShingleIndex.register(spark, sf, buckets = 4, withBands = true)
      val derived = rows(ShingleIndex.derive(spark, sf))
      ShingleIndex.compact(spark)
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .exists(_.contains(ShingleIndex.tableName)),
        "a compacted zero-append index must still serve dir-derived queries")
      assert(rows(ShingleIndex.table(spark)) == derived)

      // append (fragments the store), then compact: row multiset, bands,
      // and every marker identity field must survive; the postings land at
      // exactly one file per bucket
      assert(ShingleIndex.append(spark, delta(500), token = Some("soak-1")))
      val before = rows(ShingleIndex.table(spark))
      val bandsBefore = bandRows(spark.table(ShingleIndex.bandsTableName))
      val (pf0, bf0) = ShingleIndex.fileCounts(spark)
      assert(pf0 > 4, s"append should fragment past one file per bucket, got $pf0")
      ShingleIndex.compact(spark)
      assert(rows(ShingleIndex.table(spark)) == before,
        "compaction changed the postings multiset")
      assert(bandRows(spark.table(ShingleIndex.bandsTableName)) == bandsBefore,
        "compaction changed the band multiset")
      val (pf1, bf1) = ShingleIndex.fileCounts(spark)
      assert(pf1 == 4, s"postings must compact to one file per bucket, got $pf1")
      assert(bf1 <= bf0)
      val m1 = ShingleIndex.readMarker(spark).get
      assert(m1.contains(""""appends":1"""), "append counter lost")
      assert(m1.contains(""""last_append":"soak-1""""), "replay token lost")
      assert(m1.contains(""""compactions":2"""), "compaction counter wrong")
      // the replay no-op contract survives compaction
      assert(!ShingleIndex.append(spark, delta(500), token = Some("soak-1")))
      assert(ShingleIndex.liveFor(spark, sf).isDefined,
        "live routing must keep serving a compacted index")

      // kill window A: death during the rewrite phase costs NOTHING — the
      // live index stays attached, routable, and identical; the next
      // compact sweeps the stale temp dirs and completes
      ShingleIndex.prepareCompact(spark, ShingleIndex.readMarker(spark).get)
      assert(ShingleIndex.liveFor(spark, sf).isDefined)
      assert(rows(ShingleIndex.table(spark)) == before)
      ShingleIndex.compact(spark)
      assert(rows(ShingleIndex.table(spark)) == before)

      // kill window B: death after beginSwap, before the swap — poisoned:
      // nothing serves, append and compact refuse, register heals by rewrite
      ShingleIndex.beginSwap(spark, ShingleIndex.readMarker(spark).get,
        "kill-swap")
      assert(ShingleIndex.liveFor(spark, sf).isEmpty,
        "live routing served a mid-compaction marker")
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)))
      intercept[IllegalStateException] { ShingleIndex.append(spark, delta(501)) }
      intercept[IllegalStateException] { ShingleIndex.compact(spark) }
      assert(ShingleIndex.register(spark, sf, buckets = 4, withBands = true) > 0.0,
        "register reattached a mid-compaction index")

      // kill window C: death after the directory swap, before the finalize
      // — the marker vanished with the old dir; nothing serves, register
      // heals by rewrite
      val mC = ShingleIndex.readMarker(spark).get
      val (tp, tb, ts, _, _) = ShingleIndex.prepareCompact(spark, mC)
      ShingleIndex.beginSwap(spark, mC, "kill-swap-2")
      ShingleIndex.swapCompacted(spark, mC, tp, tb, ts)
      assert(ShingleIndex.readMarker(spark).isEmpty,
        "the old marker must disappear with the old postings dir")
      assert(ShingleIndex.liveFor(spark, sf).isEmpty)
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)))
      assert(ShingleIndex.register(spark, sf, buckets = 4, withBands = true) > 0.0)
      assert(rows(ShingleIndex.table(spark)) == derived)
    } finally wipe()
  }

  test("generation pinning: postingsAt freezes the pre-compaction state, retractions pass through, GC refuses loudly") {
    wipe()
    try {
      ShingleIndex.register(spark, sf, buckets = 4, withBands = true)
      assert(ShingleIndex.currentGeneration(spark) == 0)
      assert(ShingleIndex.retainedGenerations(spark).isEmpty)

      // generation 0 accumulates an append and a retraction, then freezes
      assert(ShingleIndex.append(spark, delta(600), token = Some("g0-a")))
      val gen0Final = rows(ShingleIndex.table(spark))
      val deadId = Tables(spark, sf, "documents")
        .orderBy("doc_id").limit(1).head().getLong(0)
      val deadDf = Tables(spark, sf, "documents")
        .filter(col("doc_id") === deadId).select("doc_id")
      assert(ShingleIndex.delete(spark, deadDf, token = Some("g0-kill")))
      ShingleIndex.compact(spark) // freezes gen 0, retires the tombstone
      assert(ShingleIndex.currentGeneration(spark) == 1)
      assert(ShingleIndex.retainedGenerations(spark) == Seq(0))

      // the live index moves on; the pinned state does not
      assert(ShingleIndex.append(spark, delta(700), token = Some("g1-a")))
      val pinned = rows(ShingleIndex.postingsAt(spark, 0))
      assert(pinned == gen0Final.filterNot(_._1 == deadId),
        "postingsAt(0) must be generation 0's final rows minus the retraction")
      assert(pinned != rows(ShingleIndex.postings(spark)),
        "the live index has diverged — the pin is real")

      // a LATER retraction also passes through the historical read (a
      // takedown must never resurface via a pinned view)
      val dead2 = Tables(spark, sf, "documents")
        .orderBy(col("doc_id").desc).limit(1).head().getLong(0)
      assert(ShingleIndex.delete(spark,
        Tables(spark, sf, "documents").filter(col("doc_id") === dead2)
          .select("doc_id"), token = Some("g1-kill")))
      assert(rows(ShingleIndex.postingsAt(spark, 0)) ==
        gen0Final.filterNot(r => r._1 == deadId || r._1 == dead2),
        "a pending retraction journaled after the freeze must pass through")

      // the pinned band store reproduces the archived identity
      val idx0 = ShingleIndex.liveAt(spark, 0)
      assert(idx0.isDefined, "generation 0 carried bands")
      assert(idx0.get.postings.select("doc_id", "shingle").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
        rows(ShingleIndex.postingsAt(spark, 0)))

      // pinned reads on the CURRENT generation are just the live truth
      assert(rows(ShingleIndex.postingsAt(spark, 1)) ==
        rows(ShingleIndex.postings(spark)))

      // retention GC: the default window keeps ONE frozen generation —
      // gen 0 is swept by the compaction that freezes gen 1, and pinning
      // it refuses loudly instead of serving a half-gone state
      ShingleIndex.compact(spark)
      assert(ShingleIndex.currentGeneration(spark) == 2)
      assert(ShingleIndex.retainedGenerations(spark) == Seq(1))
      val e = intercept[IllegalArgumentException] {
        ShingleIndex.postingsAt(spark, 0)
      }
      assert(e.getMessage.contains("retainGenerations"),
        s"the refusal must name the retention knob: ${e.getMessage}")
      assert(ShingleIndex.retainedGenerations(spark).nonEmpty)

      // retention is a PERSISTED store setting: an explicit window
      // survives later default-knob maintenance (the review-pass footgun)
      ShingleIndex.compact(spark, retainGenerations = Some(3)) // persists 3
      ShingleIndex.compact(spark) // default knobs — inherits, never shrinks
      assert(ShingleIndex.retainedGenerations(spark) == Seq(1, 2, 3),
        "a default-knob compact must honor the persisted retention window")

      // retainGenerations = 0 restores delete-on-swap (no archive growth)
      ShingleIndex.compact(spark, retainGenerations = Some(0))
      assert(ShingleIndex.retainedGenerations(spark).isEmpty,
        "retention 0 must sweep the archive")
    } finally wipe()
  }
}

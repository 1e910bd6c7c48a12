package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.WriterLease
import graft.streaming.DocsStream

/** Cross-process single-writer lease (round 14): mutual exclusion while
  * live, TTL steal of a dead holder, epoch fencing of zombies, and the
  * ingest integration — a fenced batch aborts BEFORE touching any store. */
class WriterLeaseSpec extends AnyFunSuite {
  import SharedSpark._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("mutual exclusion while live; release frees; epochs are monotonic") {
    val dir = tmp("graft-lease-mutex")
    val a = WriterLease.acquire(dir, "ingest-a", ttlMs = 60000L)
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(dir, "ingest-b") }
    assert(e.getMessage.contains("ingest-a"),
      "the refusal must name the live holder")
    WriterLease.check(a)
    WriterLease.renew(a)
    assert(WriterLease.holder(dir).exists(h => h._1 == "ingest-a" && h._3))
    // a default renew must PRESERVE the acquired TTL, not shrink it: a
    // 200 ms lease renewed bare stays 200 ms — expired (and its handle
    // dead: liveness is part of the check contract) shortly after
    val short = WriterLease.acquire(tmp("graft-lease-ttl"), "a", ttlMs = 200L)
    WriterLease.renew(short)
    Thread.sleep(250)
    assert(WriterLease.holder(short.dir).exists(h => !h._3),
      "bare renew must keep the 200 ms TTL (not reset it to a default)")
    // an expired-but-unstolen lease may NOT quietly resurrect via renew —
    // a late renew racing a concurrent stealer's acquire would leave two
    // writers; the frozen holder must re-acquire (epoch bump)
    val e2 = intercept[IllegalStateException] { WriterLease.renew(short) }
    assert(e2.getMessage.contains("EXPIRED"))
    WriterLease.release(a)
    assert(WriterLease.holder(dir).exists(h => !h._3),
      "release leaves a not-live tombstone that preserves the epoch")
    intercept[IllegalStateException] { WriterLease.check(a) } // handle dead
    val b = WriterLease.acquire(dir, "ingest-b")
    assert(b.epoch > a.epoch, "epochs must grow across holds — fencing axis")
    WriterLease.release(b)
  }

  test("TTL steal fences the frozen holder; same-owner restart fences the zombie") {
    val dir = tmp("graft-lease-steal")
    val a = WriterLease.acquire(dir, "ingest-a", ttlMs = 1L)
    Thread.sleep(20)
    // holder presumed dead after a full TTL without a renew — steal
    val b = WriterLease.acquire(dir, "ingest-b", ttlMs = 60000L)
    assert(b.epoch > a.epoch)
    intercept[IllegalStateException] { WriterLease.check(a) }
    intercept[IllegalStateException] { WriterLease.renew(a) }
    WriterLease.release(a) // not ours anymore: must NOT free the thief's
    assert(WriterLease.holder(dir).exists(_._1 == "ingest-b"))
    // same-owner restart: epoch bumps, the OLD handle of the same owner is
    // fenced exactly like a foreign thief's victim
    val b2 = WriterLease.acquire(dir, "ingest-b")
    assert(b2.epoch > b.epoch)
    intercept[IllegalStateException] { WriterLease.check(b) }
    WriterLease.release(b2)
  }

  test("same-(owner,epoch) acquire race: the nonce fences the loser") {
    // two PROCESSES racing acquire can both pass the liveness check and
    // write the same (owner, epoch) — JVM synchronized doesn't reach across
    // them. Simulate the winner's overwrite landing after ours: same owner,
    // same epoch, different nonce. Epoch fencing alone is blind to this
    // (epochs match); the per-acquire nonce is what fails our handle.
    val dir = tmp("graft-lease-nonce")
    val a = WriterLease.acquire(dir, "retry-job", ttlMs = 60000L)
    val winner = java.util.UUID.randomUUID().toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_lease"),
      s"""{"owner":"retry-job","epoch":${a.epoch},""" +
        s""""ts":${System.currentTimeMillis()},"ttl_ms":60000,""" +
        s""""nonce":"$winner"}""")
    val e = intercept[IllegalStateException] { WriterLease.check(a) }
    assert(e.getMessage.contains("taken over"),
      "a same-epoch overwrite must fence the loser via the nonce")
    intercept[IllegalStateException] { WriterLease.renew(a) }
    // release of the fenced handle must NOT free the winner's lease
    WriterLease.release(a)
    assert(WriterLease.holder(dir).exists(_._3),
      "the winner's lease survives the loser's release attempt")
  }

  test("corrupt lease refuses loudly; withLease releases on failure") {
    val dir = tmp("graft-lease-corrupt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_lease"), "not a lease")
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(dir, "ingest-a") }
    assert(e.getMessage.contains("corrupt"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_graft_lease"))
    intercept[RuntimeException] {
      WriterLease.withLease(dir, "ingest-a") { _ =>
        throw new RuntimeException("boom") }
    }
    assert(WriterLease.holder(dir).exists(h => !h._3),
      "withLease must release on an exceptional exit")
  }

  test("maintenance writers are lease-gated: a manual run racing a leased ingest is refused, a stale lease aborts before staging") {
    import spark.implicits._
    val corpus = tmp("graft-lease-maint")
    val batch = (1 to 8).map(i =>
      (i.toLong, s"document number $i with plenty of distinct words here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    // generous TTL: this lease must stay LIVE across ~10 Spark jobs (two
    // corpus compacts, an index register + two index compacts) — under a
    // pressured shared-suite JVM a 60 s budget flaked once (the refusal
    // assertions test GATING, not expiry; expiry has its own sub-test on
    // a millisecond lease below)
    val a = WriterLease.acquire(corpus, "ingest-a", ttlMs = 600000L)
    DocsStream.ingestStep(corpus, 0.8, None, Some(a))(batch, 0L)
    // the race WriterLease's own doc names: a MANUAL (unleased) compact
    // while the scheduled ingest holds the lease — refused up front, with
    // the corpus untouched
    val filesBefore = graft.ext.CorpusCompact.fileCount(corpus)
    val e = intercept[IllegalStateException] {
      graft.ext.CorpusCompact.compact(spark, corpus) }
    assert(e.getMessage.contains("ingest-a") &&
      e.getMessage.contains("refused"), e.getMessage)
    assert(graft.ext.CorpusCompact.fileCount(corpus) == filesBefore,
      "a refused compact must leave the corpus untouched")
    // the holder's OWN maintenance proceeds (and renews through the gate)
    graft.ext.CorpusCompact.compact(spark, corpus, lease = Some(a))
    assert(spark.read.parquet(corpus).count() == 8L)

    // the shingle index SERVING this corpus gates on the same lease — its
    // marker records the corpus tag, which is exactly the leased directory
    import graft.ext.ShingleIndex
    spark.sql(s"DROP TABLE IF EXISTS ${ShingleIndex.tableName}")
    graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      ShingleIndex.tableName).toString)
    ShingleIndex.registerDocs(spark, corpus,
      graft.ext.Dedup.hashedShingles(batch, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle"), buckets = 4)
    val e2 = intercept[IllegalStateException] {
      ShingleIndex.compact(spark) }
    assert(e2.getMessage.contains("ingest-a"), e2.getMessage)
    ShingleIndex.compact(spark, lease = Some(a))
    spark.sql(s"DROP TABLE IF EXISTS ${ShingleIndex.tableName}")
    graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      ShingleIndex.tableName).toString)

    // a STALE lease (holder frozen past TTL, another writer took over)
    // aborts at the gate BEFORE staging — never swaps over the thief's work
    WriterLease.release(a)
    val frozen = WriterLease.acquire(corpus, "ingest-a", ttlMs = 1L)
    Thread.sleep(20)
    val thief = WriterLease.acquire(corpus, "ingest-b", ttlMs = 60000L)
    intercept[IllegalStateException] {
      graft.ext.CorpusCompact.compact(spark, corpus, lease = Some(frozen)) }
    assert(spark.read.parquet(corpus).count() == 8L,
      "a fenced compact must leave the corpus untouched")
    WriterLease.release(thief)
  }

  test("ANN maintenance honors the lease on the index dir") {
    import org.apache.spark.sql.functions.pmod
    val emb = Tables(spark, sf, "embeddings")
    val idx = tmp("graft-lease-ann")
    val base = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val (cents, indexed) = graft.ext.AnnIndex.buildIvf(base, nCells = 8)
    graft.ext.AnnIndex.writeIvf(idx, cents, indexed, nCells = 8)
    // generous TTL for the same reason as the corpus gate test above: the
    // leased retrain below is several Spark jobs on a shared-suite JVM
    val holder = WriterLease.acquire(idx, "vec-ingest", ttlMs = 600000L)
    val e = intercept[IllegalStateException] {
      graft.ext.AnnIndex.compact(spark, idx) }
    assert(e.getMessage.contains("vec-ingest"), e.getMessage)
    intercept[IllegalStateException] {
      graft.ext.AnnIndex.retrain(spark, idx) }
    // the holder's own maintenance runs; search still answers afterwards
    graft.ext.AnnIndex.compact(spark, idx, lease = Some(holder))
    graft.ext.AnnIndex.retrain(spark, idx, lease = Some(holder))
    assert(graft.ext.AnnIndex.searchIvf(spark, idx,
      emb.filter(col("vec_id") < 5), 3).count() > 0)
    WriterLease.release(holder)
    graft.perf.Measure.deleteRecursively(idx)
  }

  test("a fenced ingest batch aborts before touching any store; the new holder proceeds") {
    import spark.implicits._
    val corpus = tmp("graft-lease-ingest")
    val batch = Seq((1L, "some words about spark joins and shuffles today"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val a = WriterLease.acquire(corpus, "ingest-a", ttlMs = 1L)
    Thread.sleep(20)
    val b = WriterLease.acquire(corpus, "ingest-b", ttlMs = 60000L)
    // the frozen writer's batch-start renew aborts it — corpus untouched
    intercept[IllegalStateException] {
      DocsStream.ingestStep(corpus, 0.8, None, Some(a))(batch, 0L) }
    assert(!Option(new java.io.File(corpus).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .exists(_.getName.endsWith(".parquet")),
      "a fenced batch must write nothing")
    // the live holder's identical batch lands
    DocsStream.ingestStep(corpus, 0.8, None, Some(b))(batch, 0L)
    assert(spark.read.parquet(corpus).count() == 1L)
    // retract honors the same fence
    intercept[IllegalStateException] {
      DocsStream.retract(spark, corpus, Seq(1L).toDF("doc_id"), "r1", Some(a)) }
    WriterLease.release(b)
  }
}

package graft.ext

/** Cross-process single-writer lease for a store directory (round 14: the
  * last single-writer CONVENTION turned into a mechanism).
  *
  * Every mutating store protocol here — [[ShingleIndex]] appends/compaction,
  * [[AnnIndex]] appends/compaction/retrain, [[CorpusCompact]]/[[CorpusStore]]
  * swaps — documents a single-writer contract, enforced per-JVM by
  * `synchronized` and backstopped by the staging tripwire. Across PROCESSES
  * (two orchestrator retries of the same ingest job, a manual maintenance
  * run racing a scheduled one) nothing stood between two writers but the
  * convention. This lease closes that: an operator brackets its write
  * session in [[acquire]]/[[renew]]/[[release]] against a `_graft_lease`
  * marker in the store dir, and a second writer's acquire REFUSES while the
  * first is live.
  *
  * Epoch fencing: every acquire bumps a monotonic epoch, and [[check]]/
  * [[renew]] verify that the file still names THIS holder's (owner, epoch).
  * A writer that lost its lease — its process paused past the TTL and
  * another writer stole it — fails its next check/renew loudly instead of
  * publishing over the thief's work. Same-owner re-acquire (a crashed job
  * restarting under its name) also bumps the epoch, so a zombie of the old
  * process is fenced by the same rule.
  *
  * Honest limits, stated rather than papered over: a filesystem directory
  * cannot validate epochs server-side, so [[acquire]]'s read-check-write
  * is atomic only within one JVM — two PROCESSES racing acquire can both
  * write. The per-acquire nonce (round 15) makes the file the arbiter:
  * exactly one acquire's nonce survives, the loser fails its read-back (or
  * at latest its first [[check]]), so a doomed handle can never publish a
  * full session — at most it acts inside one check-to-publish interval.
  * That interval is the irreducible residue: between a successful [[check]]
  * and the write it guards there remains one unguarded publish window —
  * the classic lease residue every ZooKeeper/Chubby-style client has
  * without storage-side fencing tokens. The TTL contract is what makes it
  * small: a live writer must renew (or abort) well inside `ttlMs` — a
  * steal therefore implies the old writer has been dead or frozen for a
  * full TTL, and its first post-freeze act (the batch-start renew) aborts
  * it. The per-store atomic-token and tripwire layers below remain the
  * data-integrity backstop.
  *
  * All writes are temp + ATOMIC_MOVE (the marker-write discipline); a
  * corrupt lease file refuses loudly — never treated as free. */
object WriterLease {

  /** A held lease: the fencing identity [[check]]/[[renew]] verify. The
    * `nonce` is minted per-acquire, so two acquires that raced to the same
    * (owner, epoch) — same job name retried by two schedulers — are still
    * distinguishable: exactly one nonce survives on disk, and the loser's
    * first check/renew fails. */
  final case class Lease(dir: String, owner: String, epoch: Long,
      nonce: String)

  private final case class State(owner: String, epoch: Long, ts: Long,
      ttlMs: Long, nonce: String)

  private def leasePath(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, "_graft_lease")

  private def render(st: State): String =
    s"""{"owner":"${st.owner}","epoch":${st.epoch},""" +
      s""""ts":${st.ts},"ttl_ms":${st.ttlMs},"nonce":"${st.nonce}"}"""

  private val StatePattern =
    ("""\{"owner":"([A-Za-z0-9._-]+)","epoch":(\d+),""" +
      """"ts":(\d+),"ttl_ms":(\d+),"nonce":"([A-Za-z0-9-]+)"\}""").r

  // pre-nonce lease files (written before round 15) still parse — a store
  // whose last writer released under the old format must not refuse every
  // later acquire/gate as "corrupt". The synthetic "legacy" nonce can
  // never equal a real handle's UUID, so nothing held under the old
  // format can pass a new check() — exactly the fencing a format change
  // should impose
  private val LegacyStatePattern =
    ("""\{"owner":"([A-Za-z0-9._-]+)","epoch":(\d+),""" +
      """"ts":(\d+),"ttl_ms":(\d+)\}""").r

  private def readState(dir: String): Option[State] = {
    val p = leasePath(dir)
    if (!java.nio.file.Files.exists(p)) None
    else java.nio.file.Files.readString(p).trim match {
      case StatePattern(o, e, t, l, x) =>
        Some(State(o, e.toLong, t.toLong, l.toLong, x))
      case LegacyStatePattern(o, e, t, l) =>
        Some(State(o, e.toLong, t.toLong, l.toLong, "legacy"))
      case other => throw new IllegalStateException(
        s"corrupt writer lease at $p: '$other' — inspect and remove by hand")
    }
  }

  private def writeState(dir: String, st: State): Unit = {
    val p = leasePath(dir)
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, render(st))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  // ttlMs == 0 encodes a RELEASED lease: never live (instantly acquirable)
  // but still present, so the epoch counter survives release/re-acquire
  // cycles — without it, a zombie of a pre-release hold could match a
  // fresh post-release lease that restarted at epoch 1
  private def live(st: State, now: Long): Boolean =
    st.ttlMs > 0 && now - st.ts <= st.ttlMs

  /** (owner, epoch, still-live) of the current lease, for telemetry. */
  def holder(dir: String): Option[(String, Long, Boolean)] =
    readState(dir).map(st =>
      (st.owner, st.epoch, live(st, System.currentTimeMillis())))

  /** Acquire the write lease on `dir`. Succeeds when the lease is absent,
    * expired (a TTL past its holder's last renew — the holder is presumed
    * dead), or held by THIS owner (a restart; the old handle is fenced by
    * the epoch bump). Refuses loudly while another owner is live.
    *
    * The read-check-write here is atomic only within this JVM
    * (`synchronized`); across PROCESSES two racing acquires can both pass
    * the liveness check and write. The per-acquire nonce closes that
    * acquire/acquire window: after publishing, the winner is whoever's
    * nonce the file holds — the read-back below fails the loser
    * IMMEDIATELY (and even a loser that slipped past the read-back — wrote
    * after the winner's verification — dies at its first [[check]]/
    * [[renew]], which every write path runs before publishing). The
    * remaining residue is the one unguarded check-to-publish window the
    * object doc already names. */
  def acquire(dir: String, owner: String, ttlMs: Long = 60000L): Lease =
    synchronized {
      require(owner.matches("[A-Za-z0-9._-]+"),
        s"lease owner '$owner' must be [A-Za-z0-9._-]+")
      require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs") // 0 = released
      val now = System.currentTimeMillis()
      val cur = readState(dir)
      cur.filter(st => st.owner != owner && live(st, now)).foreach(st =>
        throw new IllegalStateException(
          s"writer lease on $dir is held by '${st.owner}' (epoch " +
            s"${st.epoch}, ${st.ttlMs - (now - st.ts)} ms to expiry) — " +
            "refuse to double-write; wait for expiry or its release"))
      val epoch = cur.map(_.epoch).getOrElse(0L) + 1L
      val nonce = java.util.UUID.randomUUID().toString
      writeState(dir, State(owner, epoch, now, ttlMs, nonce))
      val lease = Lease(dir, owner, epoch, nonce)
      check(lease) // read-back: a racing acquire that overwrote us wins; WE fail
      lease
    }

  /** Verify the lease file still names this holder — the fencing check a
    * writer runs before every publish (and at every batch start). Throws
    * when the lease was stolen or removed: the holder must ABORT, not
    * publish. */
  def check(lease: Lease): Unit = {
    val st = readState(lease.dir).getOrElse(throw new IllegalStateException(
      s"writer lease on ${lease.dir} is gone — '${lease.owner}' must abort " +
        "(removed by hand?)"))
    // nonce inequality with matching (owner, epoch) = a concurrent acquire
    // under the same name raced this one and overwrote it — same verdict
    // as any other takeover: this handle must abort
    if (st.owner != lease.owner || st.epoch != lease.epoch ||
        st.nonce != lease.nonce)
      throw new IllegalStateException(
        s"writer lease on ${lease.dir} was taken over by '${st.owner}' " +
          s"(epoch ${st.epoch}, held ${lease.epoch}) — '${lease.owner}' " +
          "must abort, not publish")
    if (st.ttlMs == 0L)
      throw new IllegalStateException(
        s"writer lease on ${lease.dir} was released — this handle is dead")
    // LIVENESS is part of the contract, not a courtesy: a holder frozen
    // past its TTL must re-acquire (epoch bump), never quietly resurrect —
    // a late renew that succeeded would race a concurrent stealer's
    // acquire and leave TWO writers each believing they hold the lease
    // for a full batch. Size the TTL above the worst batch time.
    if (!live(st, System.currentTimeMillis()))
      throw new IllegalStateException(
        s"writer lease on ${lease.dir} EXPIRED ${-(st.ttlMs -
          (System.currentTimeMillis() - st.ts))} ms ago — '${lease.owner}' " +
          "was frozen past its TTL and must re-acquire, not publish")
  }

  /** Refresh the TTL clock — [[check]] + a timestamp rewrite, the
    * batch-start heartbeat. Epoch is PRESERVED (same continuous hold), and
    * so is the TTL unless `ttlMs` overrides it explicitly — a default that
    * silently shrank a long-TTL lease at every heartbeat would change the
    * holder's stealability out from under it. */
  def renew(lease: Lease, ttlMs: Long = 0L): Lease = synchronized {
    check(lease)
    val cur = readState(lease.dir).get // check() proved it exists + matches
    writeState(lease.dir, State(lease.owner, lease.epoch,
      System.currentTimeMillis(), if (ttlMs > 0) ttlMs else cur.ttlMs,
      lease.nonce))
    lease
  }

  /** Release iff still held by this lease; a stolen lease is left alone
    * (it is the thief's to release). Idempotent. The file is kept as a
    * RELEASED tombstone (ttl 0 — instantly acquirable) so the epoch
    * counter survives the release. */
  def release(lease: Lease): Unit = synchronized {
    readState(lease.dir) match {
      case Some(st) if st.owner == lease.owner && st.epoch == lease.epoch &&
          st.nonce == lease.nonce =>
        writeState(lease.dir,
          State(lease.owner, lease.epoch, System.currentTimeMillis(), 0L,
            lease.nonce))
      case _ => ()
    }
  }

  /** Bracket a write session: acquire, run, release (release only if still
    * held — a mid-body steal leaves the thief's lease untouched). */
  def withLease[T](dir: String, owner: String, ttlMs: Long = 60000L)(
      body: Lease => T): T = {
    val lease = acquire(dir, owner, ttlMs)
    try body(lease) finally release(lease)
  }

  /** Maintenance-writer gate (round 15 — "a manual maintenance run racing
    * a scheduled one", the race this class names as its target, refused
    * rather than merely tripwired). Heavy maintenance entry points
    * (compact / retrain / maybeCompact on every store) call this at phase
    * boundaries:
    *
    *   - holding a lease: verify it still covers `dir` and RENEW — a
    *     stolen or expired holder aborts here, before staging or swapping
    *     anything over the new writer's work;
    *   - holding none: refuse iff someone ELSE holds a live lease on the
    *     store — an unleased manual run must not race a leased scheduled
    *     one. An unleased store (no lease file, or released/expired) keeps
    *     the old behavior: maintenance proceeds under the single-writer
    *     convention, backstopped by the staging tripwires. */
  def gate(dir: String, lease: Option[Lease], what: String): Unit =
    lease match {
      case Some(l) =>
        require(l.dir == dir,
          s"$what on $dir was passed a lease for ${l.dir} — a lease fences " +
            "exactly the directory it was acquired on")
        renew(l); ()
      case None => holder(dir) match {
        case Some((owner, epoch, true)) => throw new IllegalStateException(
          s"$what on $dir refused: '$owner' (epoch $epoch) holds a live " +
            "writer lease — pass that lease, or wait for release/expiry " +
            "(an unleased maintenance run racing a leased writer is the " +
            "double-write this lease exists to prevent)")
        case _ => ()
      }
    }
}

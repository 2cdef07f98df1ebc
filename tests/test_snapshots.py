"""Snapshot log / time travel (plans.snapshots): append shares old
files, every version stays readable, rollback is a pointer move, and
deletes are new versions (E2: 'anti-join producing a new table
version'); a crashed commit (orphan data dir, unswapped log) must not
change what readers see."""

import os

import pytest
from pyspark.sql import functions as F

from optimizing_spark.plans import snapshots as S


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("obj_id"),
        F.pmod(F.col("id") * 7919, F.lit(1 << 16)).alias("ix"),
    )


def test_append_time_travel_and_shared_files(spark, root):
    s1 = S.commit_snapshot(spark, _df(spark, 0, 100), root, "objs")
    s2 = S.commit_snapshot(spark, _df(spark, 100, 150), root, "objs")
    s3 = S.commit_snapshot(spark, _df(spark, 150, 160), root, "objs")
    assert (s1.version, s2.version, s3.version) == (1, 2, 3)
    assert S.read_snapshot(spark, root, "objs").count() == 160  # current
    # time travel: every historical version still reads exactly
    assert S.read_snapshot(spark, root, "objs", version=1).count() == 100
    assert S.read_snapshot(spark, root, "objs", version=2).count() == 150
    # append shares parent dirs instead of rewriting (persistent tree)
    assert s2.data_dirs[:1] == s1.data_dirs
    assert len(s3.data_dirs) == 3
    # v1's files untouched by later commits
    ids = sorted(r.obj_id for r in
                 S.read_snapshot(spark, root, "objs", version=1).collect())
    assert ids == list(range(100))


def test_overwrite_and_rollback(spark, root):
    S.commit_snapshot(spark, _df(spark, 0, 50), root, "t")
    S.commit_snapshot(spark, _df(spark, 500, 520), root, "t",
                      operation="overwrite")
    assert S.read_snapshot(spark, root, "t").count() == 20
    assert S.read_snapshot(spark, root, "t", version=1).count() == 50
    rb = S.rollback(root, "t", to_version=1)
    assert rb.version == 3 and rb.rows == 50
    got = sorted(r.obj_id for r in S.read_snapshot(spark, root, "t").collect())
    assert got == list(range(50))
    # the rolled-back-over state remains time-travelable
    assert S.read_snapshot(spark, root, "t", version=2).count() == 20


def test_delete_commit_is_new_version(spark, root):
    S.commit_snapshot(spark, _df(spark, 0, 100), root, "d")
    dead = spark.range(0, 100, 2).select(F.col("id").alias("obj_id"))
    s = S.delete_commit(spark, root, "d", dead)
    assert s.operation == "overwrite" and s.rows == 50
    got = sorted(r.obj_id for r in S.read_snapshot(spark, root, "d").collect())
    assert got == list(range(1, 100, 2))
    # pinned readers still see the pre-delete state
    assert S.read_snapshot(spark, root, "d", version=1).count() == 100


def test_crashed_commit_is_invisible(spark, root):
    S.commit_snapshot(spark, _df(spark, 0, 30), root, "c")
    # simulate a crash AFTER data landed but BEFORE the log swap:
    # orphan snap dir present, log unchanged
    orphan = os.path.join(root, "c", "snap-2", "data")
    _df(spark, 999, 1999).write.parquet(orphan)
    assert S.current_version(root, "c") == 1
    assert S.read_snapshot(spark, root, "c").count() == 30
    # the next real commit claims version 2 in its OWN unique dir;
    # the orphan stays disjoint on disk and is never referenced
    s = S.commit_snapshot(spark, _df(spark, 30, 40), root, "c")
    assert s.version == 2
    assert os.path.exists(orphan)  # untouched, swept by expire later
    assert S.read_snapshot(spark, root, "c").count() == 40
    # no tmp log file left behind by successful swaps
    assert not os.path.exists(os.path.join(root, "c", S.LOG + ".tmp"))


def test_append_schema_drift_rejected(spark, root):
    S.commit_snapshot(spark, _df(spark, 0, 10), root, "sd")
    # renames / retypes / reorders would silently mis-read old data —
    # rejected at commit time (only add-column evolution is legal)
    renamed = _df(spark, 10, 20).withColumnRenamed("ix", "iy")
    with pytest.raises(ValueError, match="schema drift"):
        S.commit_snapshot(spark, renamed, root, "sd")
    retyped = _df(spark, 10, 20).withColumn("ix", F.col("ix").cast("int"))
    with pytest.raises(ValueError, match="schema drift"):
        S.commit_snapshot(spark, retyped, root, "sd")
    # overwrite MAY change the schema (full new state)
    s = S.commit_snapshot(spark, renamed, root, "sd", operation="overwrite")
    assert s.version == 2
    assert "iy" in S.read_snapshot(spark, root, "sd").columns
    # and the pre-drift version still reads with ITS committed schema
    assert "iy" not in S.read_snapshot(spark, root, "sd", version=1).columns


def test_append_add_column_evolution(spark, root):
    """Iceberg-style add-column: an append delta carrying the parent's
    columns plus new trailing ones commits; the new snapshot's pinned
    schema is the wider one, so rows from OLD dirs surface the added
    column as NULL (read-time default), while time travel to the old
    version keeps the narrow schema."""
    S.commit_snapshot(spark, _df(spark, 0, 5), root, "evol")
    wider = _df(spark, 5, 8).withColumn("tag", F.lit("x"))
    s2 = S.commit_snapshot(spark, wider, root, "evol", operation="append")
    assert s2.version == 2 and s2.rows == 8
    cur = S.read_snapshot(spark, root, "evol")
    assert cur.columns == ["obj_id", "ix", "tag"]
    tags = {r["obj_id"]: r["tag"] for r in cur.collect()}
    assert all(tags[i] is None for i in range(5))
    assert all(tags[i] == "x" for i in range(5, 8))
    # old version: narrow schema, untouched
    v1 = S.read_snapshot(spark, root, "evol", version=1)
    assert v1.columns == ["obj_id", "ix"] and v1.count() == 5
    # incremental read of the widening commit carries the new column
    delta = S.read_changes(spark, root, "evol", from_version=1)
    assert delta.columns == ["obj_id", "ix", "tag"] and delta.count() == 3


def test_concurrent_commit_loses_cas(spark, root):
    S.commit_snapshot(spark, _df(spark, 0, 10), root, "cc")
    log = S.snapshot_log(root, "cc")
    entry = dict(log[-1], version=2, parent=1)
    # a committer that read the log at version None (stale) must NOT
    # erase the committed v1 — the compare-and-swap rejects it
    with pytest.raises(S.SnapshotConflictError, match="concurrent"):
        S._swap_log(root, "cc", entry, expect_parent=None)
    assert S.current_version(root, "cc") == 1  # winner's commit intact
    # matching parent succeeds (the retry path)
    S._swap_log(root, "cc", entry, expect_parent=1)
    assert S.current_version(root, "cc") == 2


def test_stale_lock_times_out(spark, root):
    S.commit_snapshot(spark, _df(spark, 0, 5), root, "lk")
    lock = S._log_path(root, "lk") + ".lock"
    open(lock, "w").close()  # crashed committer left its lock behind
    log = S.snapshot_log(root, "lk")
    entry = dict(log[-1], version=2, parent=1)
    with pytest.raises(S.SnapshotConflictError, match="lock"):
        S._swap_log(root, "lk", entry, expect_parent=1, lock_timeout_s=0.3)
    os.unlink(lock)  # operator removes the stale lock; commit proceeds
    S._swap_log(root, "lk", entry, expect_parent=1)
    assert S.current_version(root, "lk") == 2


def test_compact_bounds_append_chain(spark, root):
    for lo in range(0, 40, 10):
        S.commit_snapshot(spark, _df(spark, lo, lo + 10), root, "cp")
    assert len(S.snapshot_log(root, "cp")[-1]["data_dirs"]) == 4
    s = S.compact(spark, root, "cp")
    assert s.version == 5 and len(s.data_dirs) == 1 and s.rows == 40
    got = sorted(r.obj_id for r in S.read_snapshot(spark, root, "cp").collect())
    assert got == list(range(40))
    # history intact: pre-compaction versions still read
    assert S.read_snapshot(spark, root, "cp", version=2).count() == 20
    # further appends chain off the compacted dir only
    s6 = S.commit_snapshot(spark, _df(spark, 40, 45), root, "cp")
    assert len(s6.data_dirs) == 2


def test_expire_snapshots_removes_dead_and_orphan_dirs(spark, root):
    for lo in range(0, 30, 10):
        S.commit_snapshot(spark, _df(spark, lo, lo + 10), root, "ex")
    S.compact(spark, root, "ex")  # v4: one dir; v1-v3 dirs now dead
    # plus an orphan from a crashed commit
    _df(spark, 900, 910).write.parquet(
        os.path.join(root, "ex", "snap-99", "data"))
    dead = {d for d in os.listdir(os.path.join(root, "ex"))
            if d.startswith("snap-")}
    live = {d.split(os.sep)[0]
            for d in S.snapshot_log(root, "ex")[-1]["data_dirs"]}
    out = S.expire_snapshots(root, "ex", keep_last=1)
    assert out["kept_versions"] == [4]
    # everything except the compacted v4 dir goes: the three old
    # version dirs AND the crashed-commit orphan
    assert set(out["removed_dirs"]) == dead - live
    assert "snap-99" in out["removed_dirs"]
    assert len(out["removed_dirs"]) == 4
    assert S.read_snapshot(spark, root, "ex").count() == 30  # current intact
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, root, "ex", version=1)  # history gone
    # keep_last covering an append chain keeps every referenced dir
    S.commit_snapshot(spark, _df(spark, 30, 35), root, "ex")  # v5 = v4+delta
    out2 = S.expire_snapshots(root, "ex", keep_last=1)
    assert out2["removed_dirs"] == []  # v5 references v4's dir too


def test_unknown_version_and_empty_table_raise(spark, root):
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, root, "nope")
    S.commit_snapshot(spark, _df(spark, 0, 5), root, "e")
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, root, "e", version=9)
    with pytest.raises(FileNotFoundError):
        S.rollback(root, "e", to_version=9)


def test_read_changes_returns_only_deltas(spark, root):
    for lo in range(0, 40, 10):
        S.commit_snapshot(spark, _df(spark, lo, lo + 10), root, "ch")
    got = sorted(r.obj_id for r in
                 S.read_changes(spark, root, "ch", from_version=1).collect())
    assert got == list(range(10, 40))  # v2..v4 deltas, v1 excluded
    mid = sorted(r.obj_id for r in
                 S.read_changes(spark, root, "ch", 1, 3).collect())
    assert mid == list(range(10, 30))
    assert S.read_changes(spark, root, "ch", 2, 2).count() == 0  # empty range
    with pytest.raises(FileNotFoundError):
        S.read_changes(spark, root, "ch", 0)
    with pytest.raises(ValueError):
        S.read_changes(spark, root, "ch", 3, 1)


def test_read_changes_refuses_overwrite_boundary(spark, root):
    S.commit_snapshot(spark, _df(spark, 0, 10), root, "cw")
    S.commit_snapshot(spark, _df(spark, 10, 20), root, "cw")
    S.compact(spark, root, "cw")  # v3: overwrite
    S.commit_snapshot(spark, _df(spark, 20, 25), root, "cw")  # v4
    with pytest.raises(ValueError):
        S.read_changes(spark, root, "cw", 1)  # range crosses the overwrite
    # but a pure-append span after the overwrite still works
    got = sorted(r.obj_id for r in
                 S.read_changes(spark, root, "cw", 3, 4).collect())
    assert got == list(range(20, 25))


def test_refresh_cell_histogram_incremental_equals_full(spark, root):
    """IVM: three append commits, refresh after the first (full) and
    after the rest (incremental); the maintained histogram must equal
    re-tiling the current snapshot from scratch."""
    from optimizing_spark.plans import pipeline as P
    from optimizing_spark.sources import datagen

    docs = datagen.documents_spark_fast(spark, 900, partitions=2) \
        .select("doc_id", "spans").localCheckpoint()
    parts = [docs.limit(300),
             docs.subtract(docs.limit(600)).localCheckpoint(),
             docs.limit(600).subtract(docs.limit(300)).localCheckpoint()]
    S.commit_snapshot(spark, parts[0], root, "docs")
    h1 = P.refresh_cell_histogram(spark, root, "docs", "hist")
    assert h1.meta["mode"] == "full" and h1.meta["src_version"] == 1

    S.commit_snapshot(spark, parts[1], root, "docs")
    S.commit_snapshot(spark, parts[2], root, "docs")
    h2 = P.refresh_cell_histogram(spark, root, "docs", "hist")
    assert h2.meta["mode"] == "incremental"
    assert h2.meta["src_version"] == 3 and h2.meta["from_version"] == 1

    got = {(r.qt_depth, r.qt_code): r.n_docs for r in
           S.read_snapshot(spark, root, "hist").collect()}
    want_df = P.docs_cell_histogram(
        P.tile_documents(S.read_snapshot(spark, root, "docs")
                         .select("doc_id", "spans")))
    want = {(r.qt_depth, r.qt_code): r.n_docs for r in want_df.collect()}
    assert got == want
    assert sum(got.values()) == 900


def test_refresh_cell_histogram_noop_and_delete_fallback(spark, root):
    from optimizing_spark.plans import pipeline as P
    from optimizing_spark.sources import datagen

    docs = datagen.documents_spark_fast(spark, 400, partitions=2) \
        .select("doc_id", "spans").localCheckpoint()
    S.commit_snapshot(spark, docs, root, "docs")
    h1 = P.refresh_cell_histogram(spark, root, "docs", "hist")
    # watermark at tip -> no new histogram version
    h1b = P.refresh_cell_histogram(spark, root, "docs", "hist")
    assert h1b.version == h1.version

    # delete (non-append) breaks the delta chain -> full recompute
    dead = docs.limit(100).select("doc_id")
    S.delete_commit(spark, root, "docs", dead, key="doc_id")
    h2 = P.refresh_cell_histogram(spark, root, "docs", "hist")
    assert h2.meta["mode"] == "full" and h2.meta["src_version"] == 2
    got_total = S.read_snapshot(spark, root, "hist") \
        .agg(F.sum("n_docs").alias("s")).collect()[0].s
    assert got_total == 300


def test_evolved_column_recorded_nullable(spark, root):
    """The appended column is NULL for every pre-evolution row, so the
    pinned log schema must record it nullable even when the delta's own
    schema said otherwise (F.lit -> nullable=false)."""
    S.commit_snapshot(spark, _df(spark, 0, 3), root, "nul")
    wider = _df(spark, 3, 5).withColumn("tag", F.lit("x"))  # non-nullable lit
    S.commit_snapshot(spark, wider, root, "nul", operation="append")
    entry = S.snapshot_log(root, "nul")[-1]
    tag = [f for f in entry["schema"]["fields"] if f["name"] == "tag"][0]
    assert tag["nullable"] is True
    # and the evolved read still surfaces NULLs for old rows
    cur = S.read_snapshot(spark, root, "nul")
    assert cur.filter(F.col("tag").isNull()).count() == 3


def test_racing_committers_never_share_a_data_dir(spark, root):
    """Two committers racing from the same parent both target version 2,
    but each writes its OWN snap-2-<token>/data — the CAS loser raises
    SnapshotConflictError and its orphan dir can never clobber the
    winner's committed files (round-3 advice: the old snap-<version>
    naming let the loser's mode=overwrite parquet write delete the
    winner's already-committed data)."""
    import threading

    S.commit_snapshot(spark, _df(spark, 0, 30), root, "race")

    barrier = threading.Barrier(2, timeout=60)
    real_swap = S._swap_log

    def gated_swap(*a, **kw):
        # both threads have fully WRITTEN their data dirs when they
        # reach here; then they race the log CAS deterministically
        barrier.wait()
        return real_swap(*a, **kw)

    results: dict[str, object] = {}

    def committer(name, lo, hi):
        try:
            results[name] = S.commit_snapshot(
                spark, _df(spark, lo, hi), root, "race")
        except S.SnapshotConflictError as e:
            results[name] = e

    orig = S._swap_log
    S._swap_log = gated_swap
    try:
        t1 = threading.Thread(target=committer, args=("a", 30, 40))
        t2 = threading.Thread(target=committer, args=("b", 30, 45))
        t1.start(); t2.start(); t1.join(60); t2.join(60)
    finally:
        S._swap_log = orig

    kinds = {k: isinstance(v, S.SnapshotInfo) for k, v in results.items()}
    assert sorted(kinds.values()) == [False, True]  # exactly one winner
    winner = next(v for v in results.values()
                  if isinstance(v, S.SnapshotInfo))
    assert winner.version == 2
    # the winner's committed rows are intact (loser didn't clobber them)
    n = 40 if winner.rows == 40 else 45
    assert S.read_snapshot(spark, root, "race").count() == n
    # both attempts' dirs exist on disk and are disjoint
    snap2 = [d for d in os.listdir(os.path.join(root, "race"))
             if d.startswith("snap-2-")]
    assert len(snap2) == 2


def test_expire_surfaces_lock_contention_as_conflict(spark, root):
    """A held/stale lock makes expire fail with SnapshotConflictError
    (the shared _swap_log contract), not a raw FileExistsError."""
    for lo in (0, 10):
        S.commit_snapshot(spark, _df(spark, lo, lo + 10), root, "lk")
    lock = S._log_path(root, "lk") + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with pytest.raises(S.SnapshotConflictError, match="lock"):
            S.expire_snapshots(root, "lk", keep_last=1, lock_timeout_s=0.3)
    finally:
        os.close(fd)
        os.unlink(lock)
    # with the lock gone the same call succeeds
    out = S.expire_snapshots(root, "lk", keep_last=1)
    assert out["kept_versions"] == [2]


def test_refresh_falls_back_full_when_watermark_expired(spark, root):
    """If the histogram's source-version watermark was expired from the
    docs log, read_changes raises FileNotFoundError — the refresh must
    fall back to a full recompute instead of crashing."""
    from optimizing_spark.plans import pipeline as P
    from optimizing_spark.sources import datagen

    docs = datagen.documents_spark_fast(spark, 400, partitions=2) \
        .select("doc_id", "spans").localCheckpoint()
    parts = [docs.limit(200),
             docs.subtract(docs.limit(200)).localCheckpoint()]
    S.commit_snapshot(spark, parts[0], root, "docs")
    h1 = P.refresh_cell_histogram(spark, root, "docs", "hist")
    assert h1.meta["src_version"] == 1

    S.commit_snapshot(spark, parts[1], root, "docs")        # v2 (append)
    S.expire_snapshots(root, "docs", keep_last=1)           # v1 gone
    S.commit_snapshot(spark, docs.limit(0), root, "docs")   # v3 (append)

    h2 = P.refresh_cell_histogram(spark, root, "docs", "hist")
    assert h2.meta["mode"] == "full" and h2.meta["src_version"] == 3
    got_total = S.read_snapshot(spark, root, "hist") \
        .agg(F.sum("n_docs").alias("s")).collect()[0].s
    assert got_total == 400

"""Snapshot log + time travel over the parquet/manifest layer — the
Iceberg-snapshot analog of SURVEY §7's fallback storage (no Iceberg
runtime jar in this sandbox; the swap to `writeTo(...).createOrReplace`
remains a config change, not a redesign).

Semantics mirror the reference's persistent-structure discussion
(REPORT.md:17-21: pointer-free persistent trees; .Test/QuadTree.cpp
E2: "deletes = anti-join producing a new table version"):

- A TABLE is a directory holding immutable snapshot data dirs
  (``snap-<version>/data``) plus one atomically-swapped log file
  (``snapshots.json``) whose last entry is the current version.
- ``append`` commits write ONLY the delta dir; the new snapshot's
  file-set = parent's dir list + the delta dir. Old data is never
  rewritten — earlier versions stay readable forever (time travel),
  exactly the shared-substructure property of a persistent tree.
- ``overwrite`` commits write a full new state dir and reference only
  it (the full re-tile / resize path, O15).
- ``rollback`` moves the current pointer by appending a log entry that
  references an old snapshot's dirs — data untouched, O(1).
- Crash safety: data dirs land first, the log swaps last via
  tmp+rename. A crash mid-commit leaves an orphan ``snap-*`` dir and
  an unchanged log — the table still reads consistently at the old
  version. Every commit attempt writes a UNIQUE dir
  (``snap-<version>-<token>``), so a crashed or CAS-losing committer
  can never clobber the winner's files; orphans are swept by
  ``expire_snapshots``.

At 100 TB this is the layout that makes remove/relocate (O12-O14)
cheap: a delete is an anti-join materialized as an overwrite commit
(or, for append-mostly flows, a new delta of survivors), and readers
pin a snapshot version for a consistent scan while writers commit.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .checkpoint import atomic_write_json

LOG = "snapshots.json"


class SnapshotConflictError(RuntimeError):
    """The log advanced between reading the parent and swapping the new
    entry in — the commit lost a compare-and-swap race and must be
    retried against the new current version."""


@dataclass
class SnapshotInfo:
    table: str
    version: int
    operation: str
    rows: int
    data_dirs: list[str]
    parent: int | None
    meta: dict | None = None


def _log_path(root: str, table: str) -> str:
    return os.path.join(root, table, LOG)


def snapshot_log(root: str, table: str) -> list[dict]:
    """The committed snapshot log, oldest first ([] for a new table)."""
    p = _log_path(root, table)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def current_version(root: str, table: str) -> int | None:
    log = snapshot_log(root, table)
    return log[-1]["version"] if log else None


def _acquire_log_lock(
    root: str, table: str, lock_timeout_s: float = 10.0
) -> tuple[int, str]:
    """Acquire the table's O_EXCL log lock with a bounded retry loop;
    a lock held past the deadline surfaces as SnapshotConflictError
    (the contract every log-mutating op shares), never as a raw
    FileExistsError. Returns (fd, lock_path); caller must
    ``os.close(fd); os.unlink(lock_path)`` in a finally block."""
    lock = _log_path(root, table) + ".lock"
    deadline = time.time() + lock_timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            return fd, lock
        except FileExistsError:
            if time.time() > deadline:
                raise SnapshotConflictError(
                    f"lock {lock} held past {lock_timeout_s}s "
                    "(stale lock from a crashed committer? remove it)")
            time.sleep(0.05)


def _swap_log(
    root: str, table: str, entry: dict, expect_parent: int | None,
    lock_timeout_s: float = 10.0,
) -> list[dict]:
    """Append ``entry`` to the log iff the current tip is still
    ``expect_parent`` — a compare-and-swap under an O_EXCL lock file,
    so two concurrent committers cannot both rewrite the log from the
    same parent (the loser gets SnapshotConflictError instead of
    silently erasing the winner's commit). The data dirs written by a
    losing committer become orphans, exactly like a crash mid-commit —
    guaranteed disjoint from the winner's because every commit attempt
    writes a unique ``snap-<version>-<token>`` dir. Returns the
    committed log."""
    p = _log_path(root, table)
    fd, lock = _acquire_log_lock(root, table, lock_timeout_s)
    try:
        log = snapshot_log(root, table)  # re-read under the lock
        tip = log[-1]["version"] if log else None
        if tip != expect_parent:
            raise SnapshotConflictError(
                f"table {table!r}: expected parent {expect_parent}, "
                f"log tip is {tip} — concurrent commit won; retry")
        entries = log + [entry]
        atomic_write_json(p, entries)  # readers see old or new, never torn
        return entries
    finally:
        os.close(fd)
        os.unlink(lock)


def commit_snapshot(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    table: str,
    operation: str = "append",
    partition_by: list[str] | None = None,
    meta: dict | None = None,
) -> SnapshotInfo:
    """Commit df as the next snapshot of the table.

    meta: optional small JSON-able dict stored verbatim in the log
    entry (e.g. a derived table's source-version watermark) — the
    Iceberg snapshot-summary analog.

    operation='append': df becomes a new delta dir; the snapshot reads
    parent dirs + delta (old files shared, never rewritten).
    operation='overwrite': df becomes the entire new table state.
    The snapshot data is fully written BEFORE the log swap commits it.
    """
    if operation not in ("append", "overwrite"):
        raise ValueError(f"unknown operation {operation!r}")
    log = snapshot_log(root, table)
    parent = log[-1] if log else None
    version = (parent["version"] + 1) if parent else 1
    schema_json = df.schema.jsonValue()
    if operation == "append" and parent is not None:
        # a delta whose schema drifted from the parent would make the
        # multi-dir read silently drop/null the divergent column
        # (parquet schema is sampled per file) — reject at commit time.
        # Compare (name, type) only: nullability flips on any parquet
        # round-trip and does not affect what a multi-dir read returns.
        # EVOLUTION: a delta that keeps every parent column (same name,
        # same type, same order) and APPENDS new columns is legal —
        # Iceberg's add-column. The snapshot records the WIDER schema;
        # read_snapshot pins it, so old dirs (which lack the new
        # columns in their footers) surface them as NULLs — exactly
        # Iceberg's read-time default. Drops/renames/retypes stay
        # rejected: they would silently null or corrupt old data.
        def shape(s):
            return [(f["name"], f["type"]) for f in s["fields"]]
        new_s, old_s = shape(schema_json), shape(parent["schema"])
        if new_s[:len(old_s)] != old_s:
            raise ValueError(
                f"append schema drift on table {table!r} v{version}: "
                f"delta must keep the parent snapshot's columns as a "
                f"prefix (add-column evolution only)")
        # the added columns are NULL in every pre-evolution row, so the
        # pinned schema must record them nullable whatever the delta's
        # own nullability was — else a consumer trusting the log sees a
        # non-nullable column full of NULLs
        for f in schema_json["fields"][len(old_s):]:
            f["nullable"] = True
    # Unique dir per commit ATTEMPT (not per version): two committers
    # racing from the same parent both target version N, but each
    # writes its own snap-N-<token>/data — the CAS loser's dir is a
    # disjoint orphan and can never clobber the winner's committed
    # files. The log entry records the winning dir.
    snap_rel = f"snap-{version}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(root, table, snap_rel, "data")

    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_dir)
    delta_rows = spark.read.parquet(data_dir).count()

    if operation == "append" and parent is not None:
        dirs = list(parent["data_dirs"]) + [os.path.join(snap_rel, "data")]
        rows = parent["rows"] + delta_rows
    else:
        dirs = [os.path.join(snap_rel, "data")]
        rows = delta_rows
    entry = {
        "version": version,
        "operation": operation,
        "rows": rows,
        "delta_rows": delta_rows,
        "data_dirs": dirs,
        "parent": parent["version"] if parent else None,
        "schema": schema_json,
        "meta": meta or {},
    }
    _swap_log(root, table, entry, parent["version"] if parent else None)
    return SnapshotInfo(table=table, version=version, operation=operation,
                        rows=rows, data_dirs=dirs,
                        parent=parent["version"] if parent else None,
                        meta=entry["meta"])


def read_snapshot(
    spark: SparkSession, root: str, table: str, version: int | None = None
) -> DataFrame:
    """Read the table at the given version (default: current) — time
    travel is just resolving a different log entry's dir list."""
    log = snapshot_log(root, table)
    if not log:
        raise FileNotFoundError(f"no snapshots for table {table!r} under {root}")
    if version is None:
        entry = log[-1]
    else:
        matches = [e for e in log if e["version"] == version]
        if not matches:
            raise FileNotFoundError(
                f"table {table!r} has no snapshot version {version}")
        entry = matches[0]
    paths = [os.path.join(root, table, d) for d in entry["data_dirs"]]
    # pin the snapshot's committed schema: multi-dir append chains read
    # the columns the log recorded, not whatever footer Spark samples
    schema = StructType.fromJson(entry["schema"])
    return spark.read.schema(schema).parquet(*paths)


def read_changes(
    spark: SparkSession, root: str, table: str,
    from_version: int, to_version: int | None = None,
) -> DataFrame:
    """Incremental read: rows ADDED after ``from_version`` (exclusive)
    up to ``to_version`` (inclusive, default current) — the union of
    the append deltas in that range, scanning ONLY those dirs. This is
    what makes downstream consumers cheap at 100 TB: a pipeline that
    re-tiles or re-indexes per commit reads the new delta, not the
    table (Iceberg's incremental append scan, re-expressed).

    Raises ValueError if the range crosses an overwrite/rollback
    commit: the state was replaced, so "what changed" is not a union of
    deltas — the caller must fall back to a full read + diff.
    """
    log = snapshot_log(root, table)
    if not log:
        raise FileNotFoundError(f"no snapshots for table {table!r} under {root}")
    if to_version is None:
        to_version = log[-1]["version"]
    known = {e["version"] for e in log}
    for v in (from_version, to_version):
        if v not in known:
            raise FileNotFoundError(
                f"table {table!r} has no snapshot version {v}")
    if to_version < from_version:
        raise ValueError(
            f"to_version {to_version} < from_version {from_version}")
    span = [e for e in log if from_version < e["version"] <= to_version]
    bad = [e["version"] for e in span if e["operation"] != "append"]
    if bad:
        raise ValueError(
            f"table {table!r}: versions {bad} in ({from_version}, "
            f"{to_version}] are not appends — incremental read is not a "
            "delta union across them; do a full read of the target version")
    to_entry = next(e for e in log if e["version"] == to_version)
    schema = StructType.fromJson(to_entry["schema"])
    # each append's delta dir is the one dir it added over its parent
    deltas = [e["data_dirs"][-1] for e in span]
    if not deltas:
        return spark.read.schema(schema).parquet(
            os.path.join(root, table, to_entry["data_dirs"][-1])).limit(0)
    return spark.read.schema(schema).parquet(
        *[os.path.join(root, table, d) for d in deltas])


def rollback(root: str, table: str, to_version: int) -> SnapshotInfo:
    """Append a new snapshot whose state IS an earlier version's (data
    untouched, O(1) pointer move — the persistent-tree property)."""
    log = snapshot_log(root, table)
    matches = [e for e in log if e["version"] == to_version]
    if not matches:
        raise FileNotFoundError(
            f"table {table!r} has no snapshot version {to_version}")
    src = matches[0]
    version = log[-1]["version"] + 1
    entry = {
        "version": version,
        "operation": f"rollback:{to_version}",
        "rows": src["rows"],
        "delta_rows": 0,
        "data_dirs": list(src["data_dirs"]),
        "parent": log[-1]["version"],
        "schema": src["schema"],
    }
    _swap_log(root, table, entry, log[-1]["version"])
    return SnapshotInfo(table=table, version=version,
                        operation=entry["operation"], rows=src["rows"],
                        data_dirs=entry["data_dirs"], parent=entry["parent"])


def compact(spark: SparkSession, root: str, table: str) -> SnapshotInfo:
    """Rewrite the current state as a single overwrite commit — the
    maintenance op that bounds append-chain length. A long append chain
    is correct but makes every read open N delta dirs; compaction
    resets N to 1 while history stays time-travelable (old versions
    keep referencing the old dirs). At 100 TB this runs as a normal
    distributed job: one scan of the current dirs, one write."""
    cur = read_snapshot(spark, root, table)
    return commit_snapshot(spark, cur, root, table, operation="overwrite")


def expire_snapshots(
    root: str, table: str, keep_last: int = 1,
    lock_timeout_s: float = 10.0,
) -> dict:
    """Drop history: keep only the newest ``keep_last`` log entries,
    then delete every snap-* data dir no surviving entry references
    (including orphans from crashed/lost-CAS commits). The analog of
    Iceberg's expire_snapshots + orphan-file cleanup; the ONLY
    operation that ever deletes data files. Returns
    {"kept_versions": [...], "removed_dirs": [...]}."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    log = snapshot_log(root, table)
    if not log:
        raise FileNotFoundError(f"no snapshots for table {table!r} under {root}")
    kept = log[-keep_last:]
    live = {d.split(os.sep)[0] for e in kept for d in e["data_dirs"]}
    tdir = os.path.join(root, table)
    removed = sorted(
        d for d in os.listdir(tdir)
        if d.startswith("snap-") and d not in live
    )
    # truncate history FIRST (atomic): a crash after the swap leaves
    # unreferenced dirs (harmless orphans), never a log entry whose
    # data is gone
    if len(kept) < len(log):
        # rewrite under the same CAS lock (retry loop + conflict
        # contract shared with _swap_log via _acquire_log_lock)
        p = _log_path(root, table)
        fd, lock = _acquire_log_lock(root, table, lock_timeout_s)
        try:
            cur = snapshot_log(root, table)
            if cur[-1]["version"] != log[-1]["version"]:
                raise SnapshotConflictError(
                    f"table {table!r} advanced during expire; retry")
            atomic_write_json(p, kept)
        finally:
            os.close(fd)
            os.unlink(lock)
    for d in removed:
        shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
    return {"kept_versions": [e["version"] for e in kept],
            "removed_dirs": removed}


def delete_commit(
    spark: SparkSession,
    root: str,
    table: str,
    dead_keys: DataFrame,
    key: str = "obj_id",
) -> SnapshotInfo:
    """O12/O13 at table scope: remove-by-key as a NEW VERSION — an
    anti-join of the current snapshot against the dead keys,
    materialized as an overwrite commit (E2's 'deletes = anti-join
    producing a new table version'). Readers pinned to older versions
    still see the deleted rows; nothing is mutated in place."""
    cur = read_snapshot(spark, root, table)
    survivors = cur.join(dead_keys.select(key), key, "left_anti")
    return commit_snapshot(spark, survivors, root, table, operation="overwrite")

"""Checkpoint / lineage / resume (north rule: "every stage checkpoints
... with per-partition lineage and row/byte metrics so a killed job
resumes mid-tiling").

Design: each stage writes parquet under <root>/<stage>/data partitioned
by a cell-prefix column, plus a JSON manifest <root>/<stage>/manifest
.json written ATOMICALLY (tmp + rename) only after the data commit.
The manifest records stage name, input manifest fingerprints, schema,
row/byte/file counts per partition directory, and a content fingerprint
(job-deterministic, not wall-clock). Resume = if a valid manifest
exists whose inputs match, read the parquet instead of recomputing.

Iceberg note: this sandbox has no Iceberg runtime jar; the layout is
the plain-parquet + manifest fallback called out in SURVEY.md §7. The
manifest carries the same facts an Iceberg snapshot would (schema,
partition stats, lineage), so swapping `_write_parquet` for an Iceberg
`writeTo(...).createOrReplace()` is a config change, not a redesign.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


@dataclass
class StageResult:
    stage: str
    path: str
    rows: int
    bytes: int
    partitions: list[dict]
    fingerprint: str
    resumed: bool = False
    inputs: list[str] = field(default_factory=list)


def atomic_write_json(path: str, obj) -> None:
    """Write obj as JSON via tmp+rename: readers see the old file or
    the new one, never a torn write (the manifest/log commit idiom
    shared with plans/snapshots)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _dir_stats(data_dir: str) -> tuple[int, list[dict]]:
    total = 0
    parts = []
    for root, _dirs, files in os.walk(data_dir):
        pfiles = [f for f in files if f.endswith(".parquet")]
        if not pfiles:
            continue
        b = sum(os.path.getsize(os.path.join(root, f)) for f in pfiles)
        total += b
        parts.append({
            "partition": os.path.relpath(root, data_dir),
            "files": len(pfiles),
            "bytes": b,
        })
    return total, sorted(parts, key=lambda p: p["partition"])


def checkpoint_stage(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    stage: str,
    partition_by: list[str] | None = None,
    inputs: list[str] | None = None,
    fingerprint: str = "",
) -> StageResult:
    """Write df as the named stage unless a valid manifest with the same
    inputs+fingerprint already exists (resume path). Returns stats."""
    sdir = os.path.join(root, stage)
    data_dir = os.path.join(sdir, "data")
    mpath = os.path.join(sdir, MANIFEST)
    inputs = inputs or []

    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                m = json.load(f)
            if m.get("inputs") == inputs and m.get("fingerprint") == fingerprint:
                return StageResult(
                    stage=stage, path=data_dir, rows=m["rows"], bytes=m["bytes"],
                    partitions=m["partitions"], fingerprint=fingerprint,
                    resumed=True, inputs=inputs,
                )
        except (json.JSONDecodeError, KeyError):
            pass  # corrupt manifest -> recompute

    # invalidate any stale manifest BEFORE touching the data dir: a crash
    # mid-overwrite must not leave a valid old manifest pointing at
    # partially-rewritten parquet (silent corrupt resume)
    if os.path.exists(mpath):
        os.remove(mpath)

    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_dir)
    rows = spark.read.parquet(data_dir).count()
    total_bytes, parts = _dir_stats(data_dir)
    manifest = {
        "stage": stage,
        "inputs": inputs,
        "fingerprint": fingerprint,
        "schema": df.schema.jsonValue(),
        "rows": rows,
        "bytes": total_bytes,
        "partitions": parts,
    }
    atomic_write_json(mpath, manifest)  # atomic commit: manifest appears last
    return StageResult(
        stage=stage, path=data_dir, rows=rows, bytes=total_bytes,
        partitions=parts, fingerprint=fingerprint, inputs=inputs,
    )


def read_stage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    m = load_manifest(root, stage)
    if m is None:
        raise FileNotFoundError(f"no committed manifest for stage {stage!r} under {root}")
    return spark.read.parquet(os.path.join(root, stage, "data"))


def load_manifest(root: str, stage: str) -> dict | None:
    mpath = os.path.join(root, stage, MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)


def stage_fingerprint(root: str, stage: str) -> str:
    """Identity of a committed stage for downstream lineage: stage name
    + row count + bytes (deterministic content proxy)."""
    m = load_manifest(root, stage)
    if m is None:
        return ""
    return f"{stage}:{m['rows']}:{m['bytes']}"

"""Snapshot log over the parquet fallback (operator S2's semantics).

Production reads pin Iceberg snapshots; the sandbox has no Iceberg
runtime jar (no network — SURVEY.md §0).  This module implements the
slice of the snapshot contract the engine actually depends on, as a
JSON manifest log beside the data:

- **atomic fileset visibility** — a snapshot names the EXACT parquet
  files that made up the table at commit time, so readers never see a
  torn write or a stray uncommitted file (plain directory scans do);
- **snapshot-pinned reads / time travel** — ``read_snapshot(…, id)``
  re-reads an older table state for as long as its files survive;
- **expiry detection** — the parquet fallback's partition overwrite
  REPLACES files (unlike Iceberg's copy-on-write), so a pinned
  snapshot whose files are gone raises :class:`SnapshotExpiredError`
  instead of silently returning wrong rows — the same observable
  failure as reading an expired Iceberg snapshot after
  ``expire_snapshots``.

Manifests are tiny (file names + sizes), written with tmp+rename (the
same atomic-commit point as lineage rows), and are append-only: one
``snap-<id>.json`` per commit, monotonically increasing ids, each
carrying its parent id — a linear snapshot history like Iceberg's
metadata log.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

SNAP_TABLE = "_snapshots"


class SnapshotExpiredError(RuntimeError):
    """The pinned snapshot's files were overwritten/removed."""


def _snap_dir(root: str, stage: str) -> str:
    return os.path.join(root, SNAP_TABLE, stage)


def _data_files(data_dir: str) -> dict[str, int]:
    """relative path → size for every parquet part file currently in
    the stage directory (hive ``part=k`` layout)."""
    out: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(data_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                full = os.path.join(dirpath, fn)
                out[os.path.relpath(full, data_dir)] = os.path.getsize(full)
    return out


def snapshots(root: str, stage: str) -> list[dict]:
    """All snapshot manifests for a stage, oldest first."""
    d = _snap_dir(root, stage)
    if not os.path.isdir(d):
        return []
    recs = []
    for fn in sorted(os.listdir(d)):
        if fn.startswith("snap-") and fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                recs.append(json.load(f))
    return sorted(recs, key=lambda r: r["snapshot_id"])


def record_snapshot(root: str, stage: str, n_buckets: int) -> int:
    """Append a manifest naming the stage's current fileset; returns
    the new snapshot id.  Called at the end of commit_stage — after
    the lineage rows, so a snapshot only ever describes a fully
    committed table state."""
    data_dir = os.path.join(root, stage)
    prior = snapshots(root, stage)
    snap_id = prior[-1]["snapshot_id"] + 1 if prior else 1
    rec = {
        "snapshot_id": snap_id,
        "parent_id": prior[-1]["snapshot_id"] if prior else None,
        "stage": stage,
        "n_buckets": n_buckets,
        "files": _data_files(data_dir),
        "committed_at": time.time(),
    }
    d = _snap_dir(root, stage)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"snap-{snap_id:08d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)
    return snap_id


def read_snapshot(
    spark: SparkSession,
    root: str,
    stage: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a stage AS OF a snapshot (latest when ``snapshot_id`` is
    None): exactly the manifest's files — concurrent writers' new or
    torn files are invisible.  Raises SnapshotExpiredError when any
    pinned file no longer exists (overwritten bucket), ValueError for
    an unknown id or an empty log."""
    recs = snapshots(root, stage)
    if not recs:
        raise ValueError(f"no snapshots recorded for stage {stage!r}")
    if snapshot_id is None:
        rec = recs[-1]
    else:
        byid = {r["snapshot_id"]: r for r in recs}
        if snapshot_id not in byid:
            raise ValueError(
                f"unknown snapshot {snapshot_id} for stage {stage!r} "
                f"(have {sorted(byid)})"
            )
        rec = byid[snapshot_id]
    data_dir = os.path.join(root, stage)
    paths = [os.path.join(data_dir, rel) for rel in sorted(rec["files"])]
    missing = [p for p in paths if not os.path.isfile(p)]
    if missing:
        raise SnapshotExpiredError(
            f"snapshot {rec['snapshot_id']} of stage {stage!r} expired: "
            f"{len(missing)} of {len(paths)} files were overwritten "
            f"(parquet fallback overwrites in place; Iceberg would "
            f"retain them until expire_snapshots)"
        )
    if not paths:
        # an empty commit: no files, nothing to pin
        from ner_spark.io.read import TRANSCRIPT_SCHEMA

        return spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    # basePath keeps the hive `part=` column, exactly like the plain
    # directory read the un-pinned fallback does — so resume-side
    # partition pruning on `part` still applies to pinned reads.
    return spark.read.option("basePath", data_dir).parquet(*paths)

"""Iceberg-semantics shim over partitioned Parquet.

No Iceberg jars ship in this sandbox's $SPARK_HOME, so the three Iceberg
behaviors the north rule actually exercises are provided by a thin,
swappable layer (SURVEY.md §7.0):

  1. **snapshot-id lineage** — every commit writes an immutable manifest
     ``_snapshots/snap-<id>.json`` listing its data directory, row count,
     and parent snapshot;
  2. **atomic pointer swap** — ``_snapshots/CURRENT`` is replaced with
     ``os.replace`` (atomic on POSIX), so readers see either the old or the
     new snapshot, never a torn state;
  3. **incremental diff** — ``added_since(a, b)`` lists data paths present
     in ``b`` but not ``a`` for incremental processing
     (Trigger.AvailableNow-style batch increments, SURVEY.md §2.10).

The interface is deliberately narrow (`write_snapshot`, `read_current`,
`read_snapshot`, `added_since`) so a real Iceberg catalog drops in by
swapping this module (``spark.read.format("iceberg")...``).

On a real cluster this module's filesystem calls would target the shared
object store (s3a/abfss path via the Hadoop FS API); locally plain ``os``
suffices and keeps the shim dependency-free.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "_snapshots"
_CURRENT = "CURRENT"


def _snap_path(table_root: str, snapshot_id: str) -> str:
    return os.path.join(table_root, _SNAP_DIR, f"snap-{snapshot_id}.json")


def current_snapshot_id(table_root: str) -> str | None:
    ptr = os.path.join(table_root, _SNAP_DIR, _CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        return fh.read().strip() or None


def read_manifest(table_root: str, snapshot_id: str) -> dict:
    with open(_snap_path(table_root, snapshot_id), encoding="utf-8") as fh:
        return json.load(fh)


def prepare_snapshot(df: DataFrame, table_root: str,
                     partition_by: list[str] | None = None,
                     snapshot_id: str | None = None,
                     parent_id: str | None = "auto",
                     extra: dict | None = None) -> str:
    """Stage a new immutable snapshot WITHOUT publishing it: data lands
    under ``data/snap-<id>/`` and the manifest is written, but CURRENT is
    not touched — the snapshot is invisible to ``history``/``read_current``
    until ``publish_snapshot``. This is the Iceberg commit shape: the
    metadata pointer swap is the commit point, everything before it is
    crash-discardable staging.

    ``parent_id='auto'`` (default) chains onto the current snapshot;
    ``parent_id=None`` starts a fresh chain (used by compaction, whose
    data REPLACES the whole history rather than appending to it).
    ``extra`` is merged into the manifest (e.g. ``compacted_from``)."""
    snapshot_id = snapshot_id or uuid.uuid4().hex[:16]
    data_dir = os.path.join(table_root, "data", f"snap-{snapshot_id}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    row_count = None  # avoid re-scan; callers that need it count the read-back
    parent = current_snapshot_id(table_root) if parent_id == "auto" \
        else parent_id
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_id": parent,
        "created_at": time.time(),
        "data_dir": data_dir,
        "partition_by": partition_by or [],
        "row_count": row_count,
        **(extra or {}),
    }
    os.makedirs(os.path.join(table_root, _SNAP_DIR), exist_ok=True)
    with open(_snap_path(table_root, snapshot_id), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2)
    return snapshot_id


def is_published(table_root: str, snapshot_id: str) -> bool:
    """A snapshot counts as published if it is in the visible history OR
    was absorbed into a published compacted snapshot (its rows are
    visible through the compaction even though its own manifest left the
    chain) — so crash roll-forward never re-publishes a compacted-away
    snapshot and rewinds CURRENT."""
    try:
        chain = history(table_root)
    except FileNotFoundError:
        return False
    if snapshot_id in chain:
        return True
    for sid in chain:
        if snapshot_id in (read_manifest(table_root, sid)
                           .get("compacted_from") or []):
            return True
    return False


def publish_snapshot(table_root: str, snapshot_id: str) -> None:
    """Atomic commit point: swap CURRENT to ``snapshot_id``. Idempotent —
    republishing an already-visible snapshot is a no-op (used by crash
    roll-forward in the job layer)."""
    if is_published(table_root, snapshot_id):
        return
    if not os.path.exists(_snap_path(table_root, snapshot_id)):
        raise FileNotFoundError(
            f"cannot publish unknown snapshot {snapshot_id} at {table_root}")
    tmp = os.path.join(table_root, _SNAP_DIR,
                       f".{_CURRENT}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(snapshot_id)
    os.replace(tmp, os.path.join(table_root, _SNAP_DIR, _CURRENT))  # atomic


def write_snapshot(df: DataFrame, table_root: str,
                   partition_by: list[str] | None = None,
                   snapshot_id: str | None = None) -> str:
    """Write ``df`` as a new immutable snapshot and atomically commit it
    (prepare + publish in one call)."""
    sid = prepare_snapshot(df, table_root, partition_by, snapshot_id)
    publish_snapshot(table_root, sid)
    return sid


def read_snapshot(spark: SparkSession, table_root: str,
                  snapshot_id: str, schema=None) -> DataFrame:
    manifest = read_manifest(table_root, snapshot_id)
    reader = spark.read
    if schema is not None:
        # explicit schema also makes empty snapshots readable
        reader = reader.schema(schema)
    return reader.parquet(manifest["data_dir"])


def chain_data_dirs(table_root: str, snapshot_id: str) -> list[str]:
    """All data dirs making up the LOGICAL table content at a snapshot
    (append-chain model: each snapshot's dir holds only its added rows,
    so the table at snapshot S = union of S's chain's dirs)."""
    return added_since(table_root, None, snapshot_id)


def read_table_at(spark: SparkSession, table_root: str, snapshot_id: str,
                  schema=None) -> DataFrame:
    """Full logical table content at ``snapshot_id``: ONE multi-path
    parquet read over the snapshot chain's data dirs (a single scan node
    — the plan stays O(1) no matter how many incremental commits exist,
    unlike a per-snapshot union).

    This is the READ-side API (analytics over an append-chain table).
    The extraction JOB deliberately does not use it: processing walks
    the chain per-snapshot so resume checkpoints stay (snapshot, bucket)
    granular (see job._run_chain)."""
    dirs = chain_data_dirs(table_root, snapshot_id)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*dirs)


def read_current(spark: SparkSession, table_root: str) -> DataFrame:
    sid = current_snapshot_id(table_root)
    if sid is None:
        raise FileNotFoundError(f"no CURRENT snapshot under {table_root}")
    return read_snapshot(spark, table_root, sid)


def history(table_root: str) -> list[str]:
    """Snapshot ids, oldest → newest, by following parent links."""
    sid = current_snapshot_id(table_root)
    chain = []
    while sid is not None:
        chain.append(sid)
        sid = read_manifest(table_root, sid).get("parent_id")
    return list(reversed(chain))


def added_since(table_root: str, old_snapshot_id: str | None,
                new_snapshot_id: str) -> list[str]:
    """Data dirs added strictly after ``old`` up to and including ``new``."""
    added = []
    sid = new_snapshot_id
    while sid is not None and sid != old_snapshot_id:
        m = read_manifest(table_root, sid)
        added.append(m["data_dir"])
        sid = m.get("parent_id")
    return list(reversed(added))


def vacuum_absorbed(table_root: str, dry_run: bool = False) -> dict:
    """Reclaim storage after compaction — the expire-snapshots /
    delete-orphan-files maintenance pair, restricted to what is
    PROVABLY reclaimable: snapshots listed in a published chain
    manifest's ``compacted_from`` (their rows are fully contained in
    the compacted snapshot) whose own manifests have left the chain.

    Deliberately NEVER touches prepared-but-unpublished snapshots —
    those are in-flight two-phase commits awaiting crash roll-forward,
    and deleting them would turn a crash-recoverable run into data
    loss. ``is_published`` keeps answering True for vacuumed ids (the
    compaction manifest retains the ``compacted_from`` list), so a
    later roll-forward attempt stays a no-op instead of resurrecting a
    deleted snapshot.

    Returns {"vacuumed": [ids], "dirs_deleted": n, "bytes_freed": n}
    (``dry_run`` computes without deleting)."""
    import shutil

    chain = set(history(table_root)) \
        if current_snapshot_id(table_root) else set()
    absorbed: list[str] = []
    for sid in chain:
        absorbed.extend(read_manifest(table_root, sid)
                        .get("compacted_from") or [])
    victims = [s for s in absorbed if s not in chain
               and os.path.exists(_snap_path(table_root, s))]
    bytes_freed = 0
    dirs_deleted = 0
    for sid in victims:
        m = read_manifest(table_root, sid)
        data_dir = m.get("data_dir")
        if data_dir and os.path.isdir(data_dir):
            bytes_freed += sum(
                os.path.getsize(os.path.join(dp, fn))
                for dp, _dn, fns in os.walk(data_dir) for fn in fns)
            if not dry_run:
                shutil.rmtree(data_dir)
            dirs_deleted += 1
        if not dry_run:
            os.remove(_snap_path(table_root, sid))
    return {"vacuumed": sorted(victims), "dirs_deleted": dirs_deleted,
            "bytes_freed": bytes_freed}

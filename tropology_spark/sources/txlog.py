"""Transactional Parquet sink — a minimal Delta-style commit protocol
(SURVEY.md §2 A6 upgraded; no Delta dependency).

The reference persists crawl batches in one JDBC transaction per page
(``db.clj`` — reconstructed, SURVEY.md §3.1); the Spark-side analog of
that atomicity at table granularity is a manifest log:

    <table>/
      _txlog/00000000.json   {"version":0,"mode":"overwrite","files":[...]}
      _txlog/00000001.json   {"version":1,"mode":"append","files":[...]}
      data/v0-<task>.parquet ...

* **Atomic commit** — data files are fully written BEFORE the manifest;
  the manifest is staged as ``_txlog/.tmp-N`` and published with
  ``os.rename`` (atomic within a POSIX directory).  A crash at any
  point leaves either the old table or the new one, never a torn mix:
  data files without a manifest are invisible to readers.
* **Snapshot isolation** — readers resolve ONE manifest and read the
  exact file list it names; concurrent writers never disturb a running
  read (files are immutable, never rewritten in place).
* **Optimistic concurrency** — the rename fails (``FileExistsError``
  via ``os.link``-style exclusive create) when another writer took
  version N first; the loser re-reads the log and retries on N+1.
* **Time travel** — ``tx_read(..., version=k)`` reads any retained
  snapshot; ``tx_versions`` lists the log.

At 100 TB this is the same design that scales in production systems
(the log is O(commits), data is immutable parquet); the single-node
``os.rename`` would become a conditional-put on the object store.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"
_DATA_DIR = "data"
_WIDTH = 8


def _log_path(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_path(path), f"{version:0{_WIDTH}d}.json")


def tx_versions(path: str) -> list[int]:
    """Committed versions, ascending (empty when no table exists)."""
    log = _log_path(path)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def tx_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_retries: int = 10,
) -> int:
    """Commit ``df`` to the transactional table at ``path``; returns the
    committed version.  ``mode``: ``append`` (new files add to the
    snapshot) or ``overwrite`` (new files replace it)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_log_path(path), exist_ok=True)
    data_dir = os.path.join(path, _DATA_DIR)

    # 1. Write the immutable data files (invisible until a manifest
    #    names them).  One sub-directory per attempt keeps file names
    #    collision-free without coordinating with other writers.
    batch_id = uuid.uuid4().hex[:12]
    batch_dir = os.path.join(data_dir, f"b-{batch_id}")
    df.write.mode("error").parquet(batch_dir)
    new_files = sorted(
        os.path.join(_DATA_DIR, f"b-{batch_id}", f)
        for f in os.listdir(batch_dir)
        if f.endswith(".parquet")
    )

    # 2. Publish: exclusive-create the next manifest; on collision
    #    (another writer won version N) re-read the log and retry.
    for _ in range(max_retries):
        versions = tx_versions(path)
        version = (versions[-1] + 1) if versions else 0
        if mode == "append" and versions:
            files = _read_manifest(path, versions[-1])["files"] + new_files
        else:
            files = new_files
        manifest = {
            "version": version,
            "mode": mode,
            "files": files,
            "committed_at": time.time(),
        }
        tmp = os.path.join(_log_path(path), f".tmp-{batch_id}-{version}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            # os.link + unlink = exclusive publish (rename would
            # silently clobber a concurrent winner's manifest).
            os.link(tmp, _manifest_path(path, version))
            os.unlink(tmp)
            return version
        except FileExistsError:
            os.unlink(tmp)  # lost the race — recompute against the new tip
    raise RuntimeError(f"tx_write: lost the commit race {max_retries} times")


#: Compaction output-file size goal (bytes).  Guide §6: aim for output
#: files in the 128 MB - 1 GB range; overridable for deployments with
#: different storage economics.
TX_COMPACT_TARGET_BYTES = int(
    os.environ.get("TROPOLOGY_TX_COMPACT_TARGET_BYTES", str(128 * 1024 * 1024))
)


def tx_compact(spark: SparkSession, path: str) -> int:
    """Rewrite the current snapshot as one fresh batch and commit it as
    an overwrite: append-heavy tables accumulate one file set per
    commit, and both the manifest file-list and small-file count grow
    with commit frequency (the documented cost of any log-structured
    table).  Readers of old versions are unaffected — data files are
    immutable and compaction only publishes a NEW manifest.  Vacuuming
    unreferenced files is intentionally separate (and not implemented):
    deleting data is a retention policy, not a compaction side
    effect.

    The rewrite SIZES ITS OUTPUT explicitly (guide §6: files in the
    128 MB - 1 GB band): a compaction that inherits the reader's input
    splits re-emits one file per split — at high core counts the tiny
    per-commit files map 1:1 onto splits and the "compaction" changes
    nothing.  ``coalesce`` (not ``repartition``) keeps the rewrite
    shuffle-free: snapshot bytes stream straight into ceil(bytes /
    target) writers."""
    versions = tx_versions(path)
    manifest = _read_manifest(path, versions[-1]) if versions else {"files": []}
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in manifest.get("files", [])
        if os.path.exists(os.path.join(path, f))
    )
    n_out = max(1, -(-total_bytes // TX_COMPACT_TARGET_BYTES))
    snapshot = tx_read(spark, path).coalesce(n_out)
    return tx_write(spark, snapshot, path, mode="overwrite")


def tx_read(
    spark: SparkSession, path: str, version: Optional[int] = None
) -> DataFrame:
    """Snapshot read: the file list of ONE manifest (latest, or the
    requested time-travel ``version``)."""
    versions = tx_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed table at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(f"version {version} not in {versions}")
    manifest = _read_manifest(path, version)
    files = [os.path.join(path, f) for f in manifest["files"]]
    if not files:
        raise FileNotFoundError(f"version {version} names no files")
    return spark.read.parquet(*files)

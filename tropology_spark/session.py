"""SparkSession factory and per-session runtime configuration.

Two jobs:

* :func:`configure` — runtime confs that EVERY query needs for
  cross-engine (DuckDB-oracle) determinism, safe to apply to a session
  we did not create (the verify driver hands us its own session).
* :func:`get_spark` — the session our own tests/bench build, tuned for
  local mode per SURVEY.md §4.3; the same settings are the documented
  cluster posture at scale (§7.7): AQE for skew/coalescing, Arrow for
  the pandas-UDF slow path, shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs applied before every registered query runs.  These are
#: all runtime-settable (verified on pyspark 4.1):
#:
#: * UTC session time zone — DuckDB computes on naive wall-clock
#:   timestamps; pinning UTC makes Spark's TIMESTAMP ops agree
#:   (SURVEY.md §7.6).
#: * ``nanosAsLong`` — Spark 4 refuses parquet TIMESTAMP(NANOS) (the
#:   ``events.ts`` physical type); with this flag it reads the raw
#:   int64 and the loader converts ns → µs exactly like DuckDB does.
#: * AQE — runtime coalescing + skew-join handling (SURVEY.md §4.2).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply cross-engine determinism confs to an existing session."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf may be static in some deployment; queries that
            # depend on it will fail loudly rather than silently drift.
            pass
    return spark


def get_spark(app_name: str = "tropology-spark") -> SparkSession:
    """Build the local session used by tests and bench.

    Honors ``SPARK_GRAFT_CPUS`` (default 32 — the container's core
    count) and ``SPARK_GRAFT_DRIVER_MEM``.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # One shuffle partition per core: at sf<=0.1 every partition is
        # small; at cluster scale this is raised to ~2-3x total cores.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)


def iter_materialize(df):
    """Eager lineage truncation for the ITERATIVE loops (pagerank,
    connected components, k-core): per round, the new vector must be
    materialized so round N+1 does not re-execute rounds 1..N.

    Local default is ``localCheckpoint`` — executor block storage, the
    fastest option and fine on local[n].  At cluster scale local
    blocks are NOT durable across executor loss, so setting
    ``TROPOLOGY_CHECKPOINT_DIR`` (an HDFS/S3/shared path) swaps every
    in-loop materialization to a RELIABLE ``checkpoint()`` into that
    directory (SCALE.md watch-item 4).  The checkpoint dir is applied
    to the owning SparkContext on first use; results are identical
    either way — only failure-recovery durability changes."""
    ckdir = os.environ.get("TROPOLOGY_CHECKPOINT_DIR")
    if not ckdir:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    # Re-apply whenever the env dir is not the one currently active
    # (getCheckpointDir returns <dir>/<uuid>, possibly URI-qualified):
    # a long-lived session must follow an operator-changed env path,
    # not stay pinned to the first dir it ever saw.  The comparison is
    # on NORMALIZED parent paths, never substring containment (ADVICE
    # r14: /tmp/ckpt is a substring of /tmp/ckpt-a/<uuid>, so
    # switching to the shorter path false-matched and left checkpoints
    # pinned to the stale directory).
    cur = sc.getCheckpointDir()
    if cur is None or not _ckpt_same_dir(cur, ckdir):
        sc.setCheckpointDir(ckdir)
    return df.checkpoint(eager=True)


def _ckpt_same_dir(active: str, env: str) -> bool:
    """True iff the ACTIVE checkpoint dir (``<dir>/<uuid>``, possibly
    URI-qualified by the context's default filesystem) lives inside
    the ENV-configured directory.  Exact normalized-parent equality
    first; when the env value is a plain scheme-less PATH (the common
    cluster posture — ``TROPOLOGY_CHECKPOINT_DIR=/shared/ckpt`` with
    ``defaultFS hdfs://nn:8020``), the active dir comes back
    authority-qualified, so the fallback compares PATH components
    only — otherwise every in-loop materialization would re-apply
    setCheckpointDir and spray each checkpoint into a fresh uuid
    root.  The same path-only fallback applies to a scheme-qualified
    but AUTHORITY-LESS env value (``hdfs:/shared/ckpt`` — Hadoop
    resolves it against the default authority, so the active dir
    comes back authority-qualified while the env side normalizes to
    the bare path; ADVICE r15).  Only an env value carrying its own
    ``scheme://authority`` keeps the strict authority-inclusive
    comparison (switching clusters must re-apply)."""
    import re

    a_parent = os.path.dirname(_ckpt_norm(active))
    e = _ckpt_norm(env)
    if a_parent == e:
        return True
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?", env)
    if m is None or m.group(1) is None:
        return _authority_free(a_parent) == e
    return False


def _authority_free(p: str) -> str:
    """Drop a leading ``host[:port]`` authority segment left by
    :func:`_ckpt_norm` on ``scheme://authority/path`` inputs."""
    if p.startswith("/") or "/" not in p:
        return p
    return "/" + p.split("/", 1)[1]


def _ckpt_norm(path: str) -> str:
    """Normalize a checkpoint path for equality: strip any URI scheme
    (``file:/x``, ``file:///x``, ``hdfs://nn/x`` all keep their
    authority+path part) and trailing slashes; absolutize scheme-less
    local paths.  Both sides of the comparison in
    :func:`iter_materialize` go through this, so a URI-qualified
    active dir compares equal to the plain env path that produced
    it."""
    import re

    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?", path)
    if m:
        # file:/x and file:///x both leave the local path /x; an
        # hdfs-style authority (nn:8020/x) stays verbatim until the
        # caller's authority-free fallback.
        return path[m.end() :].rstrip("/")
    return os.path.abspath(path).rstrip("/") or "/"

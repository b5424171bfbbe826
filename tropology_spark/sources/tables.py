"""Fixture-table loader and canonical schemas (SURVEY.md §1.4-§1.5).

One canonical load path so every query (and the DuckDB oracle, which
reads the same parquet files) sees identical values:

* ``events.ts`` is physically parquet TIMESTAMP(NANOS); Spark 4 cannot
  read that type directly, so the loader reads it as a raw int64
  (``nanosAsLong``, set in :mod:`tropology_spark.session`) and converts
  ns → µs with exact integer division — bit-identical to DuckDB 1.0's
  ns → TIMESTAMP truncation (verified empirically).
* everything else round-trips as-is (timestamp[ms] → timestamp_ntz,
  list<float> → array<float>).

The tropology graph analog (FIXTURES.md §6): ``edges`` is the derived
bipartite customer→part "LINKSTO" table, the Spark shape of tropology's
``links`` table (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from tropology_spark.session import configure

#: Fixture node ids used by the neighbor/intersect query family
#: (FIXTURES.md §6): two "work pages" that share 4 parts at sf0.01.
#: Defined here (not in operators/relational.py) so operator modules can
#: share them without import-order side effects on the registry.
CUST_A = 0
CUST_B = 5

#: The ten driver fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Every session-keyed cache in the package registers itself here so
#: tests (and long-lived hosts) can drop all materialized handles at
#: once — e.g. the partitioning-invariance probe must re-derive the
#: materialized views under each shuffle-partition setting.
SESSION_CACHES: list[dict] = []


def clear_session_caches() -> None:
    for c in SESSION_CACHES:
        c.clear()


_LOCKS_GUARD = __import__("threading").Lock()
_BUILD_LOCKS: dict = {}


def cache_get_or_build(cache: dict, key: tuple, builder):
    """Concurrency-correct session-cache access: under the bench's
    thread pool, N queries racing on a cold cache used to ALL derive
    the same materialized view (N eager checkpoints of identical
    data).  A per-(cache, key) build lock makes the first thread build
    and the rest wait-and-reuse — double-checked so the hot path stays
    lock-free."""
    val = cache.get(key)
    if val is not None:
        return val
    with _LOCKS_GUARD:
        lock = _BUILD_LOCKS.setdefault((id(cache), key), __import__("threading").Lock())
    with lock:
        val = cache.get(key)
        if val is None:
            val = builder()
            cache_put(cache, key, val)
    return val


def cache_put(cache: dict, key: tuple, value) -> None:
    """Insert into a session-keyed cache (``key[0]`` is the Spark
    applicationId), first evicting entries from OTHER sessions: one
    live session at a time is the actual usage pattern, and handles
    held for stopped contexts only pin driver memory for the process
    lifetime (bench.py now opens a second session for isolated
    re-times, so this is exercised, not theoretical)."""
    app = key[0]
    for stale in [k for k in cache if k[0] != app]:
        # pop, not del: two threads building DIFFERENT keys of the same
        # cache can each select the same stale entry; the second delete
        # must be a no-op rather than a KeyError.
        cache.pop(stale, None)
    cache[key] = value


#: DataFrame handles are immutable logical plans — reusing one across
#: queries saves the per-query footer read + analysis without sharing
#: any mutable state.  Keyed by the Spark applicationId (unique per
#: context, new after a restart — unlike ``id(spark)``, which the
#: allocator can reuse) so a fresh session never sees stale handles.
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}
SESSION_CACHES.append(_LOAD_CACHE)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with canonical types."""
    configure(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    return cache_get_or_build(_LOAD_CACHE, key, lambda: _load_uncached(spark, sf_dir, name))


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The physical type of ``ts`` depends on the generator vintage:
        # TIMESTAMP(NANOS) (read as raw int64 via ``nanosAsLong``) or
        # TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).  Normalize both to
        # the same UTC TimestampType every query/oracle was built on.
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # ns → µs: integer `div` keeps full int64 precision (a
            # double division would lose bits above 2^53) and truncates
            # exactly like DuckDB's TIMESTAMP(NANOS) → TIMESTAMP read.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # NTZ → LTZ under the pinned UTC session zone is the same
            # wall-clock instant; DuckDB reads the file as naive
            # TIMESTAMP with identical values.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: Row counts cached with the table handles: several queries size a
#: parameter from the corpus cardinality (√n cells in sim_knn_join,
#: broadcast gates); the count is parquet-metadata-cheap but it is
#: still a driver action, and a query build should not re-run it.
_COUNT_CACHE: dict[tuple[str, str, str], int] = {}
SESSION_CACHES.append(_COUNT_CACHE)


def table_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Cached ``load(...).count()`` per (session, sf_dir, table)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    return cache_get_or_build(
        _COUNT_CACHE, key, lambda: load(spark, sf_dir, name).count()
    )


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived graph edge table: ``(src=o_custkey, dst=l_partkey)``.

    The bipartite "work LINKSTO trope" analog of tropology's ``links``
    table (SURVEY.md §1.4): customers play work pages, parts play trope
    pages.  Deduplicated, as the reference keeps link pairs unique.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
    )


#: Materialized edge tables shared ACROSS queries in one session (keyed
#: like ``_LOAD_CACHE``, plus the src-filter signature).  A dozen graph
#: queries each need the materialized edge list; re-deriving the
#: orders⋈lineitem join + distinct + checkpoint per query costs ~1-2 s
#: each at sf0.1 and N copies of the same blocks.  One shared copy is
#: the "materialized view" a warehouse would maintain for the hot edge
#: table — identical results, strictly less work and block pressure.
_EDGE_CACHE: dict[tuple[str, str, tuple | None], DataFrame] = {}
SESSION_CACHES.append(_EDGE_CACHE)


def edges_materialized(spark: SparkSession, sf_dir: str, srcs=None) -> DataFrame:
    """Edge table materialized once (eager localCheckpoint) for queries
    that reference it from multiple plan branches (self-joins,
    intersections).  Without this, each branch re-derives the
    orders⋈lineitem join — Spark's exchange reuse does not canonicalize
    across the aliased branches.  ``srcs`` optionally pre-filters to a
    few source nodes (the filter is pushed to the orders scan *before*
    materialization).  Cached per (session, sf_dir, srcs)."""
    # None (no filter) and an explicit empty filter are DIFFERENT
    # plans: keep None as its own sentinel so ``srcs=[]`` (zero edges)
    # can never be served — or poison — the unfiltered entry.
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        tuple(sorted(srcs)) if srcs is not None else None,
    )
    def build() -> DataFrame:
        e = edges(spark, sf_dir)
        if srcs is not None:
            e = e.filter(F.col("src").isin(list(srcs)))
        return e.localCheckpoint(eager=True)

    return cache_get_or_build(_EDGE_CACHE, key, build)


#: The same edge derivation as a DuckDB CTE body, shared by all graph
#: oracles so both engines agree on the graph by construction.
EDGES_SQL = (
    "SELECT DISTINCT o_custkey AS src, l_partkey AS dst "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for ``spark.sql`` queries."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def publish_parquet(df: DataFrame, final_path: str) -> None:
    """Write ``df`` as parquet and ATOMICALLY publish it at
    ``final_path`` (ADVICE r13 item 2: the write-if-missing env
    artifact paths had no cross-process guard — two concurrent cold
    sessions both built, and ``mode('overwrite')``'s delete-then-write
    window could expose a ``_SUCCESS``-less dir to a concurrent
    reader mid-run).

    Protocol: write to a unique sibling temp dir, then ``os.rename``
    into place — readers gate on ``<final_path>/_SUCCESS``, which only
    becomes visible with the rename, so no reader ever sees a partial
    directory at the published path.  If a concurrent writer already
    published (``_SUCCESS`` present), or wins the rename race, the
    temp copy is discarded — env-artifact builds are deterministic,
    so either winner's content is identical.  A partial leftover at
    ``final_path`` (crashed writer, no ``_SUCCESS``) is replaced,
    preserving the pinned partial-artifact-retrain behavior.

    The rename is attempted FIRST (it only succeeds on an empty slot),
    and the ``_SUCCESS`` gate is re-checked immediately before the
    leftover rmtree (ADVICE r14: a concurrent writer completing
    between the first check and the replace must keep its artifact).
    Residual honesty note: between that re-check and the rmtree a
    nanosecond window remains in which a just-completed concurrent
    publish is replaced with byte-identical content — the END STATE
    is always a complete gated artifact, but a reader that passed its
    gate mid-window can observe files vanish and should retry; only a
    filesystem with atomic exchange (renameat2 RENAME_EXCHANGE) could
    close it entirely."""
    import os
    import shutil
    import uuid

    tmp = f"{final_path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(os.path.join(final_path, "_SUCCESS")):
        shutil.rmtree(tmp, ignore_errors=True)  # a concurrent writer won
        return
    try:
        os.rename(tmp, final_path)  # empty slot: the common path, no rmtree
        return
    except OSError:
        pass
    # Something occupies final_path.  Re-check the gate IMMEDIATELY
    # before replacing: a writer that completed since the first check
    # keeps its (identical) artifact.
    if os.path.exists(os.path.join(final_path, "_SUCCESS")):
        shutil.rmtree(tmp, ignore_errors=True)
        return
    shutil.rmtree(final_path, ignore_errors=True)  # gate-less partial only
    try:
        os.rename(tmp, final_path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the rename race

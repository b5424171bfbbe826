"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with total + per-query wall times.

Queries execute CONCURRENTLY (a small thread pool submitting jobs to
Spark's scheduler): per-query fixed overhead (job scheduling, AQE
planning) overlaps, and the heavy graph self-joins run alongside
sub-second scans that would otherwise leave 31 cores idle.  Per-query
times are therefore wall-under-concurrency; the headline metric is the
suite total.  Set SPARK_GRAFT_BENCH_PARALLEL=1 for sequential timing.

Each query is materialized with a ``noop`` write so the measured time
covers the complete scan→shuffle→agg pipeline without driver-side row
transfer.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    parallel = int(os.environ.get("SPARK_GRAFT_BENCH_PARALLEL", "6"))
    from tropology_spark import QUERIES
    from tropology_spark.session import get_spark

    try:
        load_start = list(os.getloadavg())
    except OSError:  # pragma: no cover — platform without getloadavg
        load_start = None

    per_query: dict[str, float] = {}
    errors: dict[str, str] = {}

    # Fresh-session isolated re-times for the heaviest queries, run
    # FIRST (BASELINE.md: measuring them after the concurrent suite
    # contaminated one CC entry with the suite's GC tail — 42.7 s vs
    # ~12 s fresh).  Each heavy gets its OWN SparkContext (own block
    # manager + applicationId → session caches derive from cold) plus a
    # throwaway warm-up query so JIT/footer costs don't land on the
    # measured number — sharing one session re-created the very
    # contamination this phase exists to remove (CC's pinned checkpoint
    # blocks inflated link_prediction 11 s → 26 s, measured).
    isolated: dict[str, float] = {}
    # VERDICT r17 item 3: the driver's isolated re-times have twice
    # read above-band under host contention (dedup_embedding_clusters
    # 18.07 → 25.56 s vs its 9.5-13.6 s quiet band) and adjudication
    # depended on builder re-runs — capture the 1-minute loadavg at
    # the START of each re-time so every artifact self-adjudicates.
    isolated_load1: dict[str, float] = {}
    isolated_loadavg: dict[str, list] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_ISOLATED", "1") != "0":
        from tropology_spark.sources.tables import clear_session_caches

        for name in [
            "graph_connected_components", "graph_pagerank3",
            "graph_link_prediction", "sim_knn_join", "dedup_ngram_jaccard",
            # round-6: the heaviest new query (Hash-to-Min over the M2
            # cosine pair graph) gets a clean fresh-session number too
            "dedup_embedding_clusters",
            # round-20 (VERDICT r19 item 2): extend the list to the
            # real top of the suite so driver artifacts carry clean
            # comparable fresh-session numbers for >=10 cost centers —
            # the in-suite walls for these are wall-under-concurrency
            # and oscillate 2-7x with host phase.
            "mm_cdc_dedup_stats", "graph_label_prop3",
            "graph_core_profile", "graph_closeness3",
        ]:
            if name not in QUERIES:
                continue
            spark = get_spark(f"tropology-bench-isolated-{name}")
            try:
                QUERIES["flagship_revenue_by_region"](spark, sf_dir).collect()
                try:
                    la = os.getloadavg()
                    isolated_load1[name] = round(la[0], 2)
                    isolated_loadavg[name] = [round(x, 2) for x in la]
                except OSError:  # pragma: no cover
                    pass
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                isolated[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errors[f"isolated:{name}"] = f"{type(exc).__name__}: {exc}"[:200]
            spark.stop()
            clear_session_caches()
            gc.collect()

    spark = get_spark("tropology-bench")

    # Warm the JVM + parquet footers with the flagship query once.
    QUERIES["flagship_revenue_by_region"](spark, sf_dir).collect()

    def release_cached_blocks() -> None:
        """Queries that materialize intermediates (localCheckpoint)
        leave blocks pinned until their JVM references are collected;
        across ~90 queries that pressure degrades the block manager
        2-3x (measured).  Dropping Python refs + forcing both GCs lets
        the ContextCleaner reclaim them between waves."""
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    import itertools

    completions = itertools.count(1)

    def run_one(name: str) -> None:
        t0 = time.perf_counter()
        try:
            spark.sparkContext.setJobDescription(f"bench:{name}")
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — one bad query must not
            # zero out the whole bench (BENCH_r02 lost every number to a
            # single loader exception); correctness is gated elsewhere.
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        per_query[name] = round(time.perf_counter() - t0, 3)
        # GC cadence by COMPLETION COUNT, not wave barrier (round-19
        # optimization, guide §2.6): the old wave structure
        # (list(pool.map(...)) per 24 queries) idled up to parallel-1
        # workers during every wave's straggler tail — pure lost
        # overlap, 18 barriers per suite.  The ContextCleaner still
        # gets its periodic full GC (same cadence: every ~4 waves'
        # worth of completions), it just runs inside a worker instead
        # of a scheduling barrier.  Results and methodology unchanged:
        # same queries, same noop sink, same thread-pool concurrency.
        if next(completions) % (4 * max(parallel, 1)) == 0:
            release_cached_blocks()

    names = sorted(QUERIES)
    # Heavy queries run in their own capped lane (below) so they never
    # stampede each other; the list doubles as the lane membership.
    heavy = [
        "graph_link_prediction", "fn_fuzzy_levenshtein",
        "graph_connected_components", "graph_pagerank3",
        "graph_twohop_count", "join_self_twohop", "sim_knn_join",
        "dedup_ngram_jaccard", "graph_bfs3", "pipeline_curation_e2e",
        "graph_triangles", "graph_clustering_pairs",
        "graph_kcore", "graph_random_walk3", "graph_sssp3",
        "graph_triangles_capped", "graph_twohop_capped",
        "graph_link_prediction_capped", "dedup_embedding_cosine",
        "mm_dedup_exact", "mm_phash_hamming",
        "graph_related_tropes", "graph_trope_lift",
        "graph_modularity_terms", "graph_label_prop3", "dedup_lsh_recall",
    ]
    ordered = [n for n in heavy if n in names] + [n for n in names if n not in heavy]

    # Round-19 optimization (guide §2.6 idle capacity): a measured
    # pool-size sweep showed the suite is CONTENTION-bound, not
    # worker-bound — pool=12 ran 2.2x SLOWER than pool=6 (447.9 s vs
    # 200.3 s quiet) because the heavy-first order put 12 iterative
    # graph heavies in flight at once, each stretching the others'
    # long critical path of small stages (CC 211 s in-suite vs 11.6 s
    # isolated).  Fix: two lanes.  At most SPARK_GRAFT_BENCH_HEAVY_CAP
    # heavies run concurrently (default 2); the remaining workers
    # drain the light queue.  A worker whose lane empties steals from
    # the other, so no worker ever idles while work remains.
    # Methodology unchanged: same queries, same noop sink, same
    # per-query wall timing in run_one.
    heavy_cap = int(os.environ.get(
        "SPARK_GRAFT_BENCH_HEAVY_CAP", str(min(2, max(parallel - 1, 1)))
    ))

    t_all = time.perf_counter()
    if parallel <= 1:
        for name in ordered:
            run_one(name)
    else:
        import threading
        from collections import deque

        heavy_q = deque(n for n in ordered if n in heavy)
        light_q = deque(n for n in ordered if n not in heavy)
        qlock = threading.Lock()

        def drain(primary: "deque[str]", secondary: "deque[str]") -> None:
            while True:
                with qlock:
                    if primary:
                        name = primary.popleft()
                    elif secondary:
                        name = secondary.popleft()
                    else:
                        return
                run_one(name)

        with ThreadPoolExecutor(max_workers=parallel) as pool:
            futs = [
                pool.submit(
                    drain,
                    heavy_q if i < heavy_cap else light_q,
                    light_q if i < heavy_cap else heavy_q,
                )
                for i in range(parallel)
            ]
            for f in futs:
                f.result()
    total = round(time.perf_counter() - t_all, 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    try:
        load_end = list(os.getloadavg())
    except OSError:  # pragma: no cover
        load_end = None

    detail = {
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "total_sec": total,
        "sf": sf,
        "queries": per_query,
        "isolated": isolated,
        "isolated_loadavg": isolated_loadavg,
        "errors": errors,
    }
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json"), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        pass
    spark.stop()

    # stdout gets ONE COMPACT line, printed LAST so the driver's ~2 KB
    # tail capture always ends with it (r1/r3 lost the head of a long
    # line: "parsed": null), with the headline numbers at the END of
    # the key order so even a mid-line clip keeps them in the tail.
    # The full per-query map lives in bench_detail.json only — r3's
    # stderr copy was exactly what the tail capture swallowed.
    slowest = dict(sorted(per_query.items(), key=lambda kv: -kv[1])[:10])
    # n_errors counts only DECLARED-SUITE failures; isolated re-time
    # failures are diagnostic-only and reported under their own key.
    n_suite_errors = sum(1 for k in errors if not k.startswith("isolated:"))
    print(
        json.dumps(
            {
                "queries": slowest,
                "isolated": isolated,
                # 1-min loadavg at each isolated re-time's start —
                # compact on purpose (the tail budget); full 3-tuples
                # live in bench_detail.json's isolated_loadavg.
                "isolated_load1": isolated_load1,
                "metric": "declared_suite_wall_time",
                "unit": "sec",
                "sf": sf,
                "loadavg_start": load_start,
                "loadavg_end": load_end,
                "n_queries": len(per_query),
                "n_errors": n_suite_errors,
                "n_isolated_errors": len(errors) - n_suite_errors,
                "value": total,
                "total_sec": total,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Registry-wide PROBE-KWARG GUARD sweep (the round-17 rule).

Every registered op that advertises a frame-substitution kwarg
(``orders=``, ``docs=``, ``events=``, ``e=``, ``li=`` …) exposes a
probe surface the driver never touches — and an injected EMPTY frame
is the canonical adversarial input for it: any division whose
denominator the empty corpus zeroes raises under ANSI instead of
NULL-propagating.  This class produced three ADVICE items in round 16
and three self-review findings in round 17 (all guarded); this sweep
closes the CLASS: it auto-discovers every probe kwarg by signature,
substitutes an empty frame with the exact post-``load`` schema of the
fixture table the kwarg replaces, and asserts the op EXECUTES (NULL
columns and zero-row results are both fine — errors are not).

Auto-discovery is the enforcement: a future op's new probe kwarg is
swept with no test change; a kwarg replacing a DERIVED frame (not a
fixture table) must be consciously added to ``DERIVED_FRAME_PARAMS``
with its own targeted injection pin elsewhere.
"""

from __future__ import annotations

import inspect
from concurrent.futures import ThreadPoolExecutor

from tests.conftest import SF_UNIT

#: probe-kwarg name -> the fixture table whose post-load schema it
#: substitutes (empty .limit(0) frames carry exactly that schema).
PARAM_TABLE = {
    "orders": "orders",
    "o": "orders",
    "docs": "documents",
    "events": "events",
    "e": "embeddings",
    "li": "lineitem",
    "parts": "part",
    # pipeline_kanon_curve (staged r18) registers with customers= —
    # swept empty-frame-green during the round-17 bank sweep; the
    # mapping is pre-added so its activation needs no test change.
    "customers": "customer",
}

#: Probe kwargs that substitute DERIVED frames (not fixture tables):
#: the empty-frame sweep cannot build them generically, so each needs
#: a targeted injection pin in its own twin file instead.
DERIVED_FRAME_PARAMS = {
    ("agg_bloom_fpr_curve", "mem"),
    ("agg_bloom_fpr_curve", "probes"),
    ("graph_wedge_sample_closure", "proj"),  # empty-moduli pin in r16 twins
}


def _probe_params(fn):
    try:
        sig = inspect.signature(fn)
    except (ValueError, TypeError):
        return []
    return [
        p.name
        for p in sig.parameters.values()
        if p.name not in ("spark", "sf_dir") and p.default is None
    ]


def test_probe_kwarg_ops_survive_empty_frames(spark):
    from tropology_spark.registry import QUERIES
    from tropology_spark.sources.tables import load

    empty = {t: load(spark, SF_UNIT, t).limit(0) for t in set(PARAM_TABLE.values())}
    todo = []
    unmapped = []
    for name, fn in QUERIES.items():
        params = _probe_params(fn)
        if not params:
            continue
        if any((name, p) in DERIVED_FRAME_PARAMS for p in params):
            continue
        missing = [p for p in params if p not in PARAM_TABLE]
        if missing:
            unmapped.append((name, missing))
            continue
        todo.append((name, fn, params))
    assert not unmapped, (
        "new probe kwargs need a PARAM_TABLE mapping (fixture-table "
        f"frames) or a DERIVED_FRAME_PARAMS entry + targeted pin: {unmapped}"
    )

    failures: dict[str, str] = {}

    def run(item) -> None:
        name, fn, params = item
        try:
            fn(spark, SF_UNIT, **{p: empty[PARAM_TABLE[p]] for p in params}).collect()
        except Exception as exc:  # noqa: BLE001 — every failure reported
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(run, todo))
    # Coverage identity derived from the registry (ADVICE r17): every
    # op with probe params is either swept here or consciously parked
    # in DERIVED_FRAME_PARAMS with its own targeted pin — no magic
    # count to re-baseline when the probe surface legitimately moves.
    with_params = {n for n, fn in QUERIES.items() if _probe_params(fn)}
    derived_ops = {n for n, _p in DERIVED_FRAME_PARAMS}
    assert {n for n, _f, _p in todo} == with_params - derived_ops
    assert derived_ops <= with_params, "stale DERIVED_FRAME_PARAMS entry"
    assert len(with_params) >= 58  # the probe surface only grows
    assert not failures, (
        f"{len(failures)} probe-kwarg ops crash on an empty injected "
        f"frame (guard the zeroed denominators NULL in BOTH engines):\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(failures.items()))
    )

"""Registry-wide plan-shape gate (r13): every driver query's EXECUTED
plan must stay on the JVM fast path. Individual rows have had targeted
plan tests for rounds (the single-exchange merge, the broadcast-stay of
q32); this sweep makes the two non-negotiables hold for ALL 50 rows at
once, so a future edit cannot quietly introduce the classic scale
killers:

* ``BatchEvalPython`` — a row-at-a-time Python UDF in the hot path
  (Arrow-batched ``mapInPandas``/``ArrowEvalPython`` stages are the
  sanctioned Python seam and are NOT flagged);
* ``CartesianProduct`` — an unbroadcast all-pairs join.

``BroadcastNestedLoopJoin`` is allowed ONLY on the enumerated rows
whose small side is a broadcast scalar/queries literal (the brute-force
similarity baseline's declared shape, BM25's broadcast df/avgdl
aggregates, the rollup's trailing-window bound) — a BNLJ appearing on
any OTHER row fails loudly and must be justified here, because with two
big sides it degenerates to the cartesian case.

Planning only: ``executedPlan`` builds the physical plan without
running the query, so the sweep costs seconds per row, not scans.
"""

from __future__ import annotations

import os

from stripe_sync_engine_spark.plans import REGISTRY

# same override every other test honors (conftest.SF_DIR / the sf_dir
# fixture) — module-level because BNLJ_BY_DESIGN tests also need it
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: rows whose BroadcastNestedLoopJoin is a tiny-broadcast-side design
#: choice, re-adjudicated whenever this set changes
BNLJ_BY_DESIGN = {
    "q08_daily_rollup",       # trailing-window bound: 1-row broadcast
    "sim_topk_brute",         # declared broadcast baseline (query set)
    "sim_ivf_topk",           # broadcast probe-cell/query literals
    "txt_bm25_topk",          # broadcast df/avgdl scalar aggregates
}


def test_registry_plans_stay_on_the_jvm_fast_path(spark):
    offenders: dict[str, list[str]] = {}
    for name, q in sorted(REGISTRY.items()):
        plan = (
            q.spark(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        flags = []
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time Python UDF")
        if "CartesianProduct" in plan:
            flags.append("cartesian product")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_BY_DESIGN:
            flags.append("unadjudicated BroadcastNestedLoopJoin")
        if flags:
            offenders[name] = flags
    assert not offenders, (
        f"slow-path plan nodes crept into driver rows: {offenders} — "
        "rewrite with built-in expressions / Arrow-batched UDFs / a "
        "broadcast equi-join, or (BNLJ with a provably tiny broadcast "
        "side only) add the row to BNLJ_BY_DESIGN with a justification"
    )


def test_bnlj_by_design_rows_still_use_it(spark):
    """The allowlist cannot rot into dead entries: every enumerated row
    still plans its BNLJ (when one disappears — e.g. rewritten as an
    equi-join — remove it from the list so the gate re-tightens)."""
    for name in sorted(BNLJ_BY_DESIGN):
        plan = (
            REGISTRY[name]
            .spark(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan, (
            f"{name} no longer plans a BroadcastNestedLoopJoin — remove "
            "it from BNLJ_BY_DESIGN so the gate re-tightens"
        )

"""Registry-wide plan-scan regression gate.

Every registered query's formatted physical plan is audited for repeated
scans of one corpus table. A shared subtree that re-expands per reference
is invisible locally (page-cached small parquet) but at 100 TB each
visible scan is a full corpus pass — the defect class round 7 caught at
34 lineitem scans in graph_clustering_coeff and round 8 collapsed across
24 more queries (dedup ladder 8x, scd2 6x, ...). This gate makes the
audit permanent: a NEW query cannot ship a re-expanded subtree silently.

Budget: plans only (plus whatever eager localCheckpoints materialize at
sf0.001 build time) in ONE shared session — a single test so the whole
registry audits in one pass and the failure message lists every offender.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_audit import scan_counts  # noqa: E402

from sdg_data_catalog_spark.plans.inspect import formatted_plan  # noqa: E402
from sdg_data_catalog_spark.queries.registry import all_queries  # noqa: E402

MAX_SCANS = 2

# Queries allowed >2 visible scans of one table, each with the reason the
# extra scans are REAL work, not a re-expanded subtree. Adding a name here
# requires the same justification discipline (PERF.md).
ALLOWED = {
    # 2 corpus passes (contamination-id derivation + full-row output
    # anti-join) + 1 eval-split pass — three distinct logical datasets,
    # all over the same physical documents table at test scale
    "dedup_decontaminate": 3,
    # six independent constraints over three tables: per-table agg folds
    # share one scan each; the two FK anti-joins are genuinely separate
    # column-pruned probes (orders appears in its own agg + both FK sides)
    "dq_constraints": 3,
    # three genuinely distinct column-pruned probes of embeddings:
    # candidate vectors (embedding col), neighbor labels (vec_id+label),
    # and the |labels|-row histogram behind the recall denominator; the
    # 10-row query panel is checkpointed and reused
    "eval_pr_at_k": 3,
}


def test_no_reexpanded_corpus_scans(spark, sf_dir):
    qs = all_queries()
    seen_fn: set[int] = set()
    offenders: list[str] = []
    errors: list[str] = []
    for name, fn in qs.items():
        if id(fn) in seen_fn:  # alias of an already-audited callable
            continue
        seen_fn.add(id(fn))
        try:
            counts = scan_counts(formatted_plan(fn(spark, sf_dir)))
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: plan build failed: {e}")
            continue
        mx = max(counts.values(), default=0)
        if mx > ALLOWED.get(name, MAX_SCANS):
            offenders.append(f"{name}: {counts}")
    assert not errors, "plan build errors:\n" + "\n".join(errors)
    assert not offenders, (
        f"queries scanning one corpus table more than {MAX_SCANS}x "
        f"(re-expanded shared subtree — checkpoint it once or justify in "
        f"ALLOWED):\n" + "\n".join(sorted(offenders))
    )

"""Catalog-wide physical-plan audit: flag BroadcastNestedLoopJoin /
CartesianProduct in any entry's executed plan.

Every BNLJ/Cartesian is a potential all-pairs scale-killer, so each one
in the catalog must be DELIBERATE and bounded.  The allowlist below
names every accepted occurrence with its justification; anything else
(a new entry growing a stray theta-join, or a refactor turning an
equi-join into a nested loop) fails the audit.

Run per-round alongside rehearse_driver_gate.py::

    python plan_audit.py            # sf0.001, exits non-zero on new flags

Individual high-value plans are additionally pinned in
tests/test_plans.py (pagerank single-shuffle links, simhash/temporal
no-BNLJ, CSR no-reshuffle); this sweep is the catalog-wide net.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# entry -> max accepted count, with the reason each occurrence exists.
ALLOWED: dict[str, tuple[int, str]] = {
    # deliberate brute/exact tier: |queries| capped at 20 in the catalog,
    # never the ANN generator path (operators/similarity.py docstrings)
    "embedding_cosine_topk": (1, "capped 20-query exact rerank tier"),
    # broadcast of a one-row aggregate (scalar join has no equi key) —
    # constant-size build side, not a data-dependent product
    "lp_conductance": (1, "two_m one-row scalar broadcast"),
    "global_transitivity": (1, "triangle/wedge totals one-row broadcast"),
    "tfidf_top_terms": (1, "corpus doc-count one-row broadcast"),
    "event_hour_anomalies": (1, "mean/var stats one-row broadcast"),
    "mixture_allocation": (1, "token-budget leftover one-row broadcast"),
    "attack_robustness_curve": (3, "per-step giant-component scalar joins"),
    "dsir_selection": (1, "T/R occurrence totals one-row broadcast"),
    "funnel_conversion": (1, "step-1 user-count one-row broadcast"),
    # one-row broadcast + a bounded seed/probe-set theta join
    "dedup_embedding_cosine": (2, "norm scalar + bucket-capped verify"),
    "ann_lsh_topk": (2, "sign-matrix row + capped query set"),
    "ann_ivf_topk": (2, "centroid stats + nprobe cell probe set"),
    "landmark_distance_bounds": (2, "20x20 query-pair generator (u<v)"),
}


def main() -> int:
    from l_space_spark.session import get_spark
    from l_space_spark import queries as q

    sf = os.environ.get("LSPACE_AUDIT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="plan_audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    bad: list[str] = []
    for name, fn in q.QUERIES.items():
        try:
            plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: ERR {type(e).__name__}: "
                       f"{(str(e).splitlines() or [repr(e)])[0][:100]}")
            continue
        n = plan.count("BroadcastNestedLoopJoin") + plan.count(
            "CartesianProduct"
        )
        cap, why = ALLOWED.get(name, (0, ""))
        if n > cap:
            bad.append(f"{name}: {n} nested-loop/cartesian joins "
                       f"(allowed {cap}{' — ' + why if why else ''})")
        elif n:
            print(f"{name:32s} {n} allowed ({why})")
    print(f"--- {len(bad)} violations of {len(q.QUERIES)} entries")
    for b in bad:
        print("FAIL", b)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

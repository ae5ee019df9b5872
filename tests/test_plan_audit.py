"""Gate on the systematic plan audit (scripts/plan_audit.py).

Two layers:
- the committed PLAN_AUDIT.json must cover every registered query and
  carry zero flagged entries (no CartesianProduct, no row-at-a-time
  BatchEvalPython anywhere in the 115-query surface);
- a live re-audit of a fixed, diverse subset (cheap-to-build plans)
  catches regressions between full audit runs.

BroadcastNestedLoopJoin appearances are recorded, not flagged: each one
is a bounded build side — a 1-row corpus-stats aggregate broadcast back
(bm25/dsir/pagerank/hits normalization, weighted_sample total-weight
threshold) or the capped exact-baseline subset (jaccard_near_dup's
60-doc all-pairs; the scale path is minhash_near_dup). The live check
asserts boundedness can't silently widen: no BNL in the subset below.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

LIVE_SUBSET = [
    "q1_pricing_summary",
    "frontier_dedup",
    "exact_dedup",
    "minhash_near_dup",
    "image_decontaminate",
    "lsh_embedding_topk",
    "sequence_pack",
    "decontaminate",
    "per_host_topk",
]


def test_committed_audit_is_complete_and_clean():
    import __spark_entry__ as entry

    path = os.path.join(REPO, "PLAN_AUDIT.json")
    assert os.path.exists(path), "run scripts/plan_audit.py"
    audit = json.load(open(path))
    assert audit["flagged"] == []
    missing = sorted(set(entry.queries()) - set(audit["queries"]))
    assert missing == [], f"stale PLAN_AUDIT.json, missing {missing}"
    for name, rec in audit["queries"].items():
        assert "error" not in rec, (name, rec)
        assert not rec["cartesian"], name
        assert not rec["row_python"], name


@needs_testdata
def test_live_subset_plans_stay_clean(spark):
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from plan_audit import audit_plan

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in LIVE_SUBSET:
        df = qs[name](spark, SF_DIR)
        rec = audit_plan(df._jdf.queryExecution().executedPlan().toString())
        assert not rec["cartesian"], name
        assert not rec["row_python"], name
        assert not rec["bnl_join"], name

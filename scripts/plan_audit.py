"""Systematic physical-plan audit over EVERY queries() entry.

Per-query plan pins live in tests/test_plans.py; this script is the
complementary sweep: it builds the physical plan of all registered
queries at sf0.001 and records, for each one,

- cartesian      : a CartesianProduct node (always a bug at scale)
- bnl_join       : BroadcastNestedLoopJoin (acceptable only when the
                   build side is a bounded dimension table; recorded so
                   regressions are visible)
- row_python     : BatchEvalPython — a row-at-a-time Python UDF in the
                   plan (the slow path; this repo's rule is Arrow only)
- arrow_nodes    : ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
                   / FlatMapGroupsInPandasWithState node count
- exchanges      : shuffle Exchange count (hashpartitioning etc.)
- broadcasts     : BroadcastExchange count
- smj / bhj      : SortMergeJoin / BroadcastHashJoin counts

and writes PLAN_AUDIT.json at the repo root. Exit code is non-zero if
any query has a CartesianProduct or a BatchEvalPython node (minus the
documented allowlist below, currently empty).

Notes on fidelity: the plan string is the pre-AQE executedPlan of the
DataFrame the query returns. Queries that materialize intermediates
internally (driver-superstep loops: crawl rounds, Lloyd iterations,
BPE merges, streaming foreachBatch) audit the FINAL returned frame;
their internal plans are pinned individually in tests/test_plans.py
and tests/test_crawl_exact.py.

Usage: python scripts/plan_audit.py [--sf-dir DIR] [--out PLAN_AUDIT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries allowed to carry a flagged node, with the reason audited by a
# human. Keep this empty unless a node is provably bounded.
ALLOWLIST: dict[str, str] = {}

ARROW_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "MapInArrow",
)


def audit_plan(plan: str) -> dict:
    return {
        "cartesian": "CartesianProduct" in plan,
        "bnl_join": "BroadcastNestedLoopJoin" in plan,
        "row_python": "BatchEvalPython" in plan,
        "arrow_nodes": sum(plan.count(n) for n in ARROW_NODES),
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single|Round)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json"))
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from smart_crawler_spark.session import spark_session

    spark = spark_session(app_name="plan-audit")
    qs = entry.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec = audit_plan(plan)
            rec["build_sec"] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001 - record, don't abort the sweep
            rec = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            flagged.append(name)
        results[name] = rec
        bad = rec.get("cartesian") or rec.get("row_python") or "error" in rec
        if bad and name not in ALLOWLIST:
            flagged.append(name)
        print(f"{'FLAG' if bad else 'ok  '} {name}: {rec}", flush=True)

    flagged = sorted(set(flagged))
    out = {
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "flagged": flagged,
        "allowlist": ALLOWLIST,
        "queries": results,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\n{len(results)} plans audited, {len(flagged)} flagged -> {args.out}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())

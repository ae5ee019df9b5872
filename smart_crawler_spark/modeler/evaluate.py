"""Model-quality evaluation vs a golden model (SURVEY C12;
``modeler/evaluator/ModelerEvaluator.java:107-277``).

Golden classes are regex URL patterns; the count matrix is a regex join
(crossJoin + rlike) executed as DataFrame ops; the scalar scores
(weighted F-measure, cohesion = -Σ p·log p, purity = max-class fraction)
follow the reference formulas on the collected (small) matrix.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class EvalReport:
    fmeasure: float
    cohesion: float
    purity: float
    per_class: list[dict]
    matrix: dict  # (true_class, cluster_id) -> count


def count_matrix(assigned: DataFrame, golden: DataFrame) -> DataFrame:
    """(true_class, cluster_id, n) for pages matching each golden regex.

    ``assigned``: pages with cluster_id; ``golden``: (class, url_pattern).
    """
    return (
        assigned.select("url", "cluster_id")
        .crossJoin(F.broadcast(golden.select("class", "url_pattern")))
        .filter(F.expr("url rlike url_pattern"))
        .groupBy(F.col("class").alias("true_class"), "cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def evaluate_model(assigned: DataFrame, golden: DataFrame) -> EvalReport:
    rows = count_matrix(assigned, golden).collect()
    matrix = {(r["true_class"], r["cluster_id"]): r["n"] for r in rows}
    cluster_sizes = {
        r["cluster_id"]: r["n"]
        for r in assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    true_sizes: dict[str, int] = {}
    for (tc, _c), n in matrix.items():
        true_sizes[tc] = true_sizes.get(tc, 0) + n
    for r in golden.collect():
        true_sizes.setdefault(r["class"], 0)
    total_true = sum(true_sizes.values()) or 1

    # weighted best-F1 per true class (calculateFmeasure)
    fmeasure = 0.0
    per_class = []
    for tc, tc_size in true_sizes.items():
        best = {"fm": -1.0, "p": -1.0, "r": -1.0, "cluster": None}
        for cid, csize in cluster_sizes.items():
            n = matrix.get((tc, cid), 0)
            p = n / csize if csize else 0.0
            r = n / tc_size if tc_size else 0.0
            fm = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
            if fm > best["fm"]:
                best = {"fm": fm, "p": p, "r": r, "cluster": cid}
        per_class.append({"true_class": tc, **best})
        if tc_size:
            fmeasure += max(best["fm"], 0.0) * (tc_size / total_true)

    # cohesion (-Σ p·log p) and purity, size-weighted (reference formulas)
    cohesions, purities = {}, {}
    for cid, csize in cluster_sizes.items():
        coh, mx, found = 0.0, 0, False
        for tc in true_sizes:
            n = matrix.get((tc, cid), 0)
            p = n / csize if csize else 0.0
            if p > 0:
                found = True
                coh += p * math.log(p)
            mx = max(mx, n)
        if found:
            cohesions[cid] = -coh if coh != 0 else 0.0
        if csize and mx / csize > 0:
            purities[cid] = mx / csize
    coh_total = sum(cluster_sizes[c] for c in cohesions) or 1
    pur_total = sum(cluster_sizes[c] for c in purities) or 1
    cohesion = sum(v * cluster_sizes[c] / coh_total for c, v in cohesions.items())
    purity = sum(v * cluster_sizes[c] / pur_total for c, v in purities.items())

    return EvalReport(
        fmeasure=fmeasure,
        cohesion=cohesion,
        purity=purity,
        per_class=per_class,
        matrix=matrix,
    )

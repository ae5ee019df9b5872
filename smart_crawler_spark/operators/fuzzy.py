"""Edit-distance (fuzzy) joins via deletion neighborhoods (FastSS).

Spark has no edit-distance join; the naive theta-join
``levenshtein(a, b) <= d`` is a cartesian product. This module uses the
FastSS / SymSpell blocking identity instead: if ``ed(s, t) <= d`` then
the deletion neighborhoods ``Del_<=d(s)`` and ``Del_<=d(t)`` (all
strings reachable by deleting up to ``d`` characters, including the
string itself) intersect — align the <=d edit operations and delete the
touched positions from both sides. The converse does not hold, so every
candidate pair is verified with the exact JVM ``levenshtein`` before it
is emitted; blocking therefore has exact recall and the verify restores
exact precision.

Scale shape: the only explode is the deletion neighborhood itself —
``O(L^d / d!)`` variants per key (L+1 for d=1), practical for the short
keys fuzzy joins are used on (titles, names, slugs, handles; document
bodies near-dup via MinHash in operators/minhash.py, not here). Each
exploded row ships ``(id, xxhash64(variant))`` — an 16-byte shuffle
row, never the variant string. Candidates come from one equi-join on
the variant hash + distinct; key strings re-join once per side on the
slim ``(id, key)`` dims; a hash collision can only create a false
CANDIDATE, which the levenshtein verify then drops. No cartesian
product anywhere (pinned in tests/test_plans.py).

Reference parity note: the reference has no fuzzy join; this extends
the LLM-pipeline dedup family (exact/minhash/simhash) down to short-key
typo matching, same candidates->verify architecture as
operators/minhash.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(key: Column, max_dist: int) -> Column:
    """Array of all strings obtained from ``key`` by deleting up to
    ``max_dist`` characters (the string itself included), distinct.
    Pure Catalyst: transform over a position sequence + substring
    splice, iterated ``max_dist`` times with array_distinct between
    rounds — no Python in the hot path."""
    if max_dist < 1:
        return F.array(key)

    def del_one(s: Column) -> Column:
        # delete the 0-based position i: first i chars + chars from i+2
        return F.transform(
            F.sequence(F.lit(0), F.length(s) - 1),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i),
                F.substring(s, i + 2, F.length(s)),
            ),
        )

    out = F.array(key)
    for _ in range(max_dist):
        out = F.array_distinct(
            F.flatten(
                F.array(
                    out,
                    F.flatten(F.transform(out, del_one)),
                )
            )
        )
    return out


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a, id_b, dist) with id_a < id_b and
    ``levenshtein(key_a, key_b) <= max_dist``, without a cartesian
    product. Exact: deletion-neighborhood blocking has provable full
    recall for Levenshtein distance <= max_dist; the JVM levenshtein
    verify restores precision. Intended for SHORT keys (explode factor
    is O(len^max_dist))."""
    base = df.select(
        F.col(id_col).alias("_fid"), F.col(key_col).alias("_fkey")
    )
    var = base.select(
        "_fid",
        F.explode(
            deletion_variants(F.col("_fkey"), max_dist)
        ).alias("_v"),
    ).select("_fid", F.xxhash64("_v").alias("_vh"))
    a, b = var.alias("a"), var.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._vh") == F.col("b._vh"))
            & (F.col("a._fid") < F.col("b._fid")),
        )
        .select(
            F.col("a._fid").alias("id_a"), F.col("b._fid").alias("id_b")
        )
        .distinct()
    )
    ka = base.select(
        F.col("_fid").alias("id_a"), F.col("_fkey").alias("_ka")
    )
    kb = base.select(
        F.col("_fid").alias("id_b"), F.col("_fkey").alias("_kb")
    )
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .withColumn("dist", F.levenshtein("_ka", "_kb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )

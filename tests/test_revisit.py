"""Hand-computed cases for the Poisson revisit scheduler."""

from __future__ import annotations

import math

import pytest

from smart_crawler_spark.frontier.revisit import revisit_priority

US_H = 3_600_000_000


def test_revisit_priority_hand_case(spark):
    # a: 3 visits over 2h, 1 change, last seen 1h before now
    # b: 2 visits over 1h, 0 changes (fp stable)
    # c: single visit (span 0 -> lambda 0, priority 0 regardless of age)
    rows = [
        ("a", 0 * US_H, 1, 1),
        ("a", 1 * US_H, 2, 2),  # change
        ("a", 2 * US_H, 2, 3),
        ("b", 0 * US_H, 5, 4),
        ("b", 1 * US_H, 5, 5),
        ("c", 0 * US_H, 9, 6),
    ]
    df = spark.createDataFrame(
        rows, "url string, ts_us long, fp long, ev long"
    )
    got = {
        r["url"]: r
        for r in revisit_priority(
            df, tiebreak="ev", now_us=3 * US_H
        ).collect()
    }
    a = got["a"]
    assert (a["visits"], a["changes"]) == (3, 1)
    assert a["lambda_h"] == pytest.approx(0.5)
    assert a["priority"] == pytest.approx(round(1 - math.exp(-0.5), 6))
    b = got["b"]
    assert (b["visits"], b["changes"], b["lambda_h"]) == (2, 0, 0.0)
    assert b["priority"] == 0.0
    c = got["c"]
    assert (c["visits"], c["changes"], c["lambda_h"], c["priority"]) == (
        1,
        0,
        0.0,
        0.0,
    )


def test_revisit_first_visit_never_change(spark):
    # fingerprint differs across URLS but each URL's history is constant
    rows = [(f"u{i}", j * US_H, i, i * 10 + j) for i in range(4) for j in range(3)]
    df = spark.createDataFrame(rows, "url string, ts_us long, fp long, ev long")
    out = revisit_priority(df, tiebreak="ev").collect()
    assert all(r["changes"] == 0 for r in out)
    assert all(r["priority"] == 0.0 for r in out)


def test_revisit_default_now_is_corpus_max(spark):
    # the most recently visited URL has age 0 -> priority exactly 0
    rows = [
        ("x", 0, 1, 1),
        ("x", 2 * US_H, 2, 2),
        ("y", 0, 1, 3),
        ("y", 5 * US_H, 2, 4),  # corpus max
    ]
    df = spark.createDataFrame(rows, "url string, ts_us long, fp long, ev long")
    got = {r["url"]: r for r in revisit_priority(df, tiebreak="ev").collect()}
    assert got["y"]["priority"] == 0.0
    assert got["x"]["priority"] > 0.0

"""End-to-end audit of jobs/vision_pipeline_job.py: run the deployable
job as a subprocess (the spark-submit code path minus the launcher,
covered separately in test_spark_submit.py), then recompute every
stage's expected outcome from the datagen plant rules in pure Python
and compare against the written parquet via DuckDB — no second Spark
session, and the checker shares no code with the pipeline."""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 420, not 400: the jpeg watermark group needs 5 members to cross the
# miner threshold, and the i=349 plant is lost to the dup redirect
# (349 % 25 == 24 -> content 348), so the fifth jpeg plant is c=419
N = 420
# the job's hardcoded plant cadences
JPEG, FLAT, DUP, SHORTCAP, BOMB, LOGO = 10, 50, 25, 40, 90, 7


def _content(i: int) -> int:
    return i - 1 if i % DUP == DUP - 1 else i


def _expected_gate() -> dict[str, dict[str, bool]]:
    out = {}
    for i in range(N):
        c = _content(i)
        bomb = c % BOMB == BOMB - 1
        if bomb:
            w, h = 1024, 768
        else:
            w, h = 32 + (c % 4) * 16, 24 + (c % 3) * 16
        flat = (not bomb) and c % FLAT == FLAT - 1
        # the bomb branch returns early in image_row, so bombs keep
        # their full caption
        short = (not bomb) and c % SHORTCAP == SHORTCAP - 1
        # caption_gate: header dims >= (48, 40) AND >= 4 caption words
        caption_ok = w >= 48 and h >= 40 and not short
        bomb_ok = not bomb
        # flats have zero contrast/entropy; bombs never reach the
        # quality decode (left join -> False)
        quality_ok = bomb_ok and not flat
        out[f"img{i}"] = {
            "bomb_ok": bomb_ok,
            "caption_ok": caption_ok,
            "quality_ok": quality_ok,
            "keep": bomb_ok and caption_ok and quality_ok,
        }
    return out


def _expected_watermark() -> dict[str, int]:
    """image_id -> n_images for every stamped tile that reaches the
    min_images=5 threshold, grouped by format (png plants keep exact
    logo bytes; jpeg plants share one decoded pattern)."""
    groups: dict[str, set[str]] = {"png": set(), "jpeg": set()}
    for i in range(N):
        c = _content(i)
        if c % BOMB == BOMB - 1:  # bombs return before the logo stamp
            continue
        if c % LOGO == LOGO - 1:
            fmt = "jpeg" if c % JPEG == JPEG - 1 else "png"
            groups[fmt].add(f"img{i}")
    out = {}
    for members in groups.values():
        if len(members) >= 5:
            for m in members:
                out[m] = len(members)
    return out


def test_vision_pipeline_job(tmp_path):
    out_dir = str(tmp_path / "vpipe")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "vision_pipeline_job.py"),
            "--generate", str(N),
            "--output", out_dir,
            "--stages", "verify,gate,dedup,watermark,shard,export,boilerplate,decon",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=900,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert res.returncode == 0, res.stderr[-4000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    st = report["stages"]
    assert st["verify"]["rows"] == N
    assert st["gate"]["rows"] == N

    con = duckdb.connect()

    # verify: every generated row decodes and matches its metadata
    bad = con.execute(
        f"SELECT count(*) FROM '{out_dir}/verify/*.parquet'"
        " WHERE NOT ok OR NOT invariant_ok"
    ).fetchone()[0]
    assert bad == 0

    # gate: per-leg verdicts match the plant rules exactly
    got = {
        r[0]: {"bomb_ok": r[1], "caption_ok": r[2], "quality_ok": r[3],
               "keep": r[4]}
        for r in con.execute(
            f"SELECT image_id, bomb_ok, caption_ok, quality_ok, keep "
            f"FROM '{out_dir}/gate/*.parquet'"
        ).fetchall()
    }
    want = _expected_gate()
    assert got == want
    n_bombs = sum(1 for v in want.values() if not v["bomb_ok"])
    assert n_bombs >= 4  # the cadence fix keeps bombs in the corpus

    # dedup: every planted dup pair collapses to the predecessor rep
    reps = dict(con.execute(
        f"SELECT image_id, group_rep FROM '{out_dir}/exact_groups/*.parquet'"
    ).fetchall())
    for i in range(N):
        if i % DUP == DUP - 1:
            assert reps[f"img{i}"] == f"img{i - 1}"
            assert reps[f"img{i - 1}"] == f"img{i - 1}"

    # watermark: exactly the planted tiles, with per-format group sizes
    wm = {
        r[0]: (r[1], r[2], r[3]) for r in con.execute(
            f"SELECT image_id, py, px, n_images "
            f"FROM '{out_dir}/watermark/*.parquet'"
        ).fetchall()
    }
    want_wm = _expected_watermark()
    assert {k: v[2] for k, v in wm.items()} == want_wm
    assert all(v[:2] == (1, 1) for v in wm.values())
    assert 5 in set(want_wm.values())  # the jpeg group is present at N=420

    # shard: exactly the keep ∧ canonical-rep survivors, each placed once
    survivors = {
        i for i, v in want.items() if v["keep"] and reps[i] == i
    }
    placed = dict(con.execute(
        f"SELECT image_id, shard_id FROM '{out_dir}/shards/*.parquet'"
    ).fetchall())
    assert set(placed) == survivors
    assert st["shards"]["rows"] == len(survivors)

    # export: the tar shards hold exactly one sample per survivor
    n_exported = con.execute(
        f"SELECT sum(n_samples) FROM '{out_dir}/export/*.parquet'"
    ).fetchone()[0]
    assert n_exported == len(survivors)

    # boilerplate: exactly the rows carrying the planted 'thumb'
    # caption (content rule; dup rows copy content i-1)
    bp = dict(con.execute(
        f"SELECT image_id, boilerplate FROM '{out_dir}/boilerplate/*.parquet'"
    ).fetchall())
    for i in range(N):
        c = i - 1 if i % DUP == DUP - 1 else i
        # bombs return early in image_row and keep a normal caption
        is_thumb = c % SHORTCAP == SHORTCAP - 1 and c % BOMB != BOMB - 1
        assert bp[f"img{i}"] is is_thumb, i

    # decon: exactly the benchmark slice, all via the byte-exact path
    dec = con.execute(
        f"SELECT image_id, method FROM '{out_dir}/decon/*.parquet'"
    ).fetchall()
    assert {r[0] for r in dec} == {
        f"img{i}" for i in range(N) if i % 25 == 3
    }
    assert all(r[1] == "exact" for r in dec)

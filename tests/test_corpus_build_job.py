"""End-to-end audit of jobs/corpus_build_job.py — the crawl engine's
output feeding the curation surface. The job runs as a subprocess; the
checker replays the site arithmetic, the plant rules, the curation
decisions, and the shard-packing prefix sum in pure Python + DuckDB
over the written parquet, sharing no code with the pipeline."""

import hashlib
import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HOSTS, DIRS, CHAIN, DETAILS = 3, 2, 2, 40
SHARD_BYTES = 1500
JUNK, CONTAM, DUP = 40, 30, 25
BENCH = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "watch quietly tonight"
)
DUP_TEXT = (
    "The shared body of the duplicated detail entry appears on every "
    "mirror page"
)
JUNK_TEXT = "zz zz zz zz zz zz zz zz"


def details_per_host() -> int:
    # dir_pages = DIRS * CHAIN chain pages, each listing DETAILS links
    return DIRS * CHAIN * DETAILS


def detail_urls() -> list[str]:
    return [
        f"http://site{k}.test/detail/{n}"
        for k in range(HOSTS)
        for n in range(details_per_host())
    ]


def n_of(url: str) -> int:
    return int(url.rsplit("/", 1)[1])


def plant(url: str) -> str:
    n = n_of(url)
    if n % JUNK == JUNK - 1:
        return "junk"
    if n % CONTAM == CONTAM - 1:
        return "contam"
    if n % DUP == DUP - 1:
        return "dup"
    return "normal"


@pytest.fixture(scope="module")
def job_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus_job"))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "corpus_build_job.py"),
            "--hosts", str(HOSTS), "--dirs", str(DIRS),
            "--chain", str(CHAIN), "--details", str(DETAILS),
            "--shard-bytes", str(SHARD_BYTES),
            "--output", out, "--master", "local[8]",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    manifest = json.loads(r.stdout.strip().splitlines()[-1])
    return out, manifest


def test_crawl_covers_the_whole_site(job_out):
    out, manifest = job_out
    per_host = 1 + DIRS * CHAIN + details_per_host() + 1
    assert manifest["crawl_pages"] == HOSTS * per_host
    # every planned detail page is a document row, exactly once
    rows = duckdb.sql(
        f"SELECT url FROM read_parquet('{out}/documents/*.parquet')"
    ).fetchall()
    assert sorted(u for (u,) in rows) == sorted(detail_urls())


def test_planted_texts_are_extracted_exactly(job_out):
    out, _ = job_out
    got = dict(
        duckdb.sql(
            f"SELECT url, text FROM read_parquet('{out}/documents/*.parquet')"
        ).fetchall()
    )
    for url in detail_urls():
        kind = plant(url)
        n = n_of(url)
        if kind == "junk":
            assert got[url] == JUNK_TEXT, url
        elif kind == "contam":
            assert got[url] == f"The study notes that {BENCH}", url
        elif kind == "dup":
            assert got[url] == DUP_TEXT, url
        else:
            # html strip: h1 title + archive prose, head/script gone
            assert got[url].startswith(f"Detail page {n} The picture shows "), (
                url,
                got[url][:60],
            )
            assert got[url].endswith(" and the page is part of the archive")
            assert "ignored" not in got[url] and "var x" not in got[url]


def test_curation_decisions_follow_the_plants(job_out):
    out, _ = job_out
    gate = dict(
        duckdb.sql(
            f"SELECT url, keep FROM read_parquet('{out}/gate/*.parquet')"
        ).fetchall()
    )
    assert set(gate) == set(detail_urls())
    for url in detail_urls():
        assert gate[url] == (plant(url) != "junk"), url

    decon = dict(
        duckdb.sql(
            f"SELECT url, contaminated FROM read_parquet('{out}/decon/*.parquet')"
        ).fetchall()
    )
    assert set(decon) == {u for u in detail_urls() if plant(u) != "junk"}
    for url, c in decon.items():
        assert c == (plant(url) == "contam"), url

    dedup = dict(
        duckdb.sql(
            f"SELECT url, survivor FROM read_parquet('{out}/dedup/*.parquet')"
        ).fetchall()
    )
    dup_urls = [u for u in detail_urls() if plant(u) == "dup"]
    dup_survivor = min(dup_urls)  # exact_dedup keeps the min id
    for url, s in dedup.items():
        if plant(url) == "dup":
            assert s == (url == dup_survivor), url
        else:
            assert s, url  # unique texts survive trivially

    kept = {
        u
        for (u,) in duckdb.sql(
            f"SELECT url FROM read_parquet('{out}/kept/*.parquet')"
        ).fetchall()
    }
    want_kept = {
        u
        for u in detail_urls()
        if plant(u) == "normal" or u == dup_survivor
    }
    assert kept == want_kept


def test_shard_layout_replays_the_prefix_sum(job_out):
    out, _ = job_out
    rows = duckdb.sql(
        f"""SELECT s.url, s.n_bytes, s.shard_id, s.shard_offset,
                   s.overflows, strlen(k.text) AS true_bytes
            FROM read_parquet('{out}/shards/*.parquet') s
            JOIN read_parquet('{out}/kept/*.parquet') k USING (url)"""
    ).fetchall()
    assert rows
    # sizes are the real byte lengths
    for url, nb, _sid, _off, _ovf, tb in rows:
        assert nb == tb, url
    # independent replay: (md5-bucket, url) order, flat prefix sum
    def bucket(u: str) -> int:
        return int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 64

    ordered = sorted(rows, key=lambda r: (bucket(r[0]), r[0]))
    start = 0
    for url, nb, sid, off, ovf, _tb in ordered:
        assert sid == start // SHARD_BYTES, url
        assert off == start % SHARD_BYTES, url
        end = start + max(nb, 1) - 1
        assert ovf == (end // SHARD_BYTES > start // SHARD_BYTES), url
        start += nb
    # kept set and shard table agree exactly
    kept = {
        u
        for (u,) in duckdb.sql(
            f"SELECT url FROM read_parquet('{out}/kept/*.parquet')"
        ).fetchall()
    }
    assert {r[0] for r in rows} == kept

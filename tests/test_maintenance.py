"""Sink compaction (sources/maintenance.py): row-identical rewrite,
size targeting, no-op detection, and crash-window healing."""

import os
import shutil

from pyspark.sql import functions as F

from smart_crawler_spark.sources.maintenance import (
    compact_parquet_dir,
    heal_interrupted_compaction,
)


def _write_rounds(spark, d, rounds=10, rows=200):
    for rnd in range(rounds):
        spark.range(rows).select(
            F.lit(rnd).alias("round"),
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
            (F.col("id") + rnd).alias("seq"),
        ).repartition(4).write.mode("append").parquet(d)


def _rows(spark, d):
    return sorted(
        (r["round"], r["url"], r["seq"])
        for r in spark.read.parquet(d).collect()
    )


def test_compaction_row_identical_and_sized(spark, tmp_path):
    d = str(tmp_path / "order")
    _write_rounds(spark, d)
    want = _rows(spark, d)
    n_before = len(
        [f for f in os.listdir(d) if f.endswith(".parquet")]
    )
    assert n_before >= 40  # the small-file problem is real here
    stats = compact_parquet_dir(spark, d, target_bytes_per_file=1 << 30)
    assert stats["compacted"] and stats["files_before"] == n_before
    assert stats["files_after"] == 1  # everything fits one target file
    assert _rows(spark, d) == want
    # second run is a no-op (already at target)
    again = compact_parquet_dir(spark, d, target_bytes_per_file=1 << 30)
    assert not again["compacted"] and again["files_after"] == 1


def test_compaction_respects_byte_target(spark, tmp_path):
    d = str(tmp_path / "order")
    _write_rounds(spark, d, rounds=8, rows=500)
    files = [
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    target = total // 3  # ask for ~3-4 output files
    want = _rows(spark, d)
    stats = compact_parquet_dir(spark, d, target_bytes_per_file=target)
    assert stats["compacted"]
    assert 3 <= stats["files_after"] <= 5
    assert _rows(spark, d) == want


def test_compaction_heals_crash_window(spark, tmp_path):
    d = str(tmp_path / "order")
    _write_rounds(spark, d, rounds=4, rows=100)
    want = _rows(spark, d)
    # simulate dying between the renames: tmp holds the complete
    # compacted copy, live was renamed away
    spark.read.parquet(d).coalesce(1).write.parquet(d + "._compact_tmp")
    shutil.move(d, d + "._compact_old")
    assert not os.path.isdir(d)
    assert heal_interrupted_compaction(d)
    assert _rows(spark, d) == want
    assert not os.path.isdir(d + "._compact_old")
    # compact_parquet_dir heals transparently too
    spark.read.parquet(d).coalesce(1).write.parquet(d + "._compact_tmp")
    shutil.move(d, d + "._compact_old")
    stats = compact_parquet_dir(spark, d, target_bytes_per_file=1 << 30)
    assert stats["healed"] and _rows(spark, d) == want


def test_compaction_missing_dir_is_noop(spark, tmp_path):
    stats = compact_parquet_dir(spark, str(tmp_path / "nope"))
    assert stats == {
        "files_before": 0, "files_after": 0, "bytes": 0,
        "compacted": False, "healed": False,
    }

"""Parquet sink maintenance (Iceberg ``rewrite_data_files`` parity).

The crawl sinks append one parquet batch per round
(``crawler/engine.py _append_order``), so a long crawl accumulates
rounds × shuffle-partitions small files — the classic small-file
problem: at a 10^10-URL crawl's cadence the order sink would hold
millions of KB-sized files whose open/footer overhead dominates every
downstream scan. ``compact_parquet_dir`` rewrites the directory into
size-targeted files with row-identical content, using the same
crash-safe swap discipline as the engine's resume truncation
(write tmp → rename live to old → rename tmp to live → drop old): one
complete copy of the sink exists on disk at every instant, and
``heal_interrupted_compaction`` (called automatically) promotes a
finished tmp copy if a previous compaction died between the renames.

On a cluster with a real catalog this maps to Iceberg's
``rewrite_data_files`` action; the here-built swap is the sandbox
stand-in, exactly like the checkpoint manifest stands in for a
snapshot commit (frontier/checkpoint.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

_TMP = "._compact_tmp"
_OLD = "._compact_old"


def _data_files(d: str) -> list[str]:
    return [
        os.path.join(d, n)
        for n in os.listdir(d)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    ]


def heal_interrupted_compaction(path: str) -> bool:
    """Promote a finished tmp copy left by a compaction that died
    between the two renames (live dir missing, tmp complete). Returns
    True if a heal happened."""
    tmp, old = path + _TMP, path + _OLD
    healed = False
    if not os.path.isdir(path) and os.path.isdir(tmp):
        os.replace(tmp, path)
        healed = True
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return healed


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes_per_file: int = 128 << 20,
    min_files: int = 2,
) -> dict:
    """Rewrite ``path`` into ``ceil(total_bytes / target)`` files with
    row-identical content. No-op (and no rewrite) when the directory
    already has fewer than ``min_files`` data files or already meets
    the target count. Returns
    {files_before, files_after, bytes, compacted, healed}."""
    healed = heal_interrupted_compaction(path)
    if not os.path.isdir(path):
        return {
            "files_before": 0, "files_after": 0, "bytes": 0,
            "compacted": False, "healed": healed,
        }
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    want = max(1, -(-total // target_bytes_per_file))
    if len(files) < min_files or len(files) <= want:
        return {
            "files_before": len(files), "files_after": len(files),
            "bytes": total, "compacted": False, "healed": healed,
        }
    tmp, old = path + _TMP, path + _OLD
    df = spark.read.parquet(path)
    # coalesce, not repartition: a narrow merge of input splits — no
    # shuffle, and the row-identical guarantee is trivially preserved
    df.coalesce(want).write.mode("overwrite").parquet(tmp)
    os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": len(files),
        "files_after": len(_data_files(path)),
        "bytes": total,
        "compacted": True,
        "healed": healed,
    }

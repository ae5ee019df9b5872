"""Crawl-state checkpointing + lossless resume (SURVEY §2.2 S8/F6).

Reference: akka-persistence event-journals every StoreURL/NEXT/Completed
message and replays them on restart, re-enqueueing in-flight URLs
(``CrawlFrontier.java:80-106,118-146``). We re-express this as a
*snapshot per crawl round*: after each round the engine writes

    <root>/round=<n>/v=<k>/frontier/   (parquet)
    <root>/round=<n>/v=<k>/seen/
    <root>/round=<n>/v=<k>/in_flight/
    <root>/round=<n>/v=<k>/metrics/    (per-partition lineage:
                                        partition_id, rows)
    <root>/round=<n>/_MANIFEST.json    (written LAST -> commit point;
                                        names the live version k)

The manifest is the atomic commit marker (the stand-in for an Iceberg
snapshot commit in this jar-less sandbox; on a cluster the same class
writes Iceberg tables via ``format("iceberg")`` with snapshot-per-round).
Resume = read the newest round with a manifest; in-flight URLs are
unioned back into the frontier exactly like the reference's recovery
re-enqueue (``CrawlQueue.recover``, bypassing the seen-filter).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PARTS = ("frontier", "seen", "in_flight", "metrics", "host_stats")

# per-host crawl counters live in a TABLE, not driver memory: at 10^10
# URLs / millions of hosts a python dict (and its JSON trip through the
# manifest) is a driver-memory + serialization bottleneck
HOST_STATS_SCHEMA = "host string, seq long, fetched long"


@dataclass
class Snapshot:
    round: int
    frontier: DataFrame
    seen: DataFrame
    in_flight: DataFrame
    metrics: DataFrame
    host_stats: DataFrame
    extras: dict
    # dispatched rows awaiting recrawl expiry (None: snapshot written
    # by a run without recrawl, or before the part existed)
    recrawl_pool: DataFrame | None = None
    # per-URL visit history for priority mode (None: snapshot written
    # by a parity run, or before the part existed)
    visit_stats: DataFrame | None = None


class CrawlCheckpoint:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"round={rnd}")

    def clear(self) -> None:
        """Drop every committed snapshot (fresh runs in a reused
        workdir call this so resume can never restore a prior run)."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)

    def write(
        self,
        rnd: int,
        frontier: DataFrame,
        seen: DataFrame,
        in_flight: DataFrame,
        metrics: DataFrame,
        host_stats: DataFrame,
        extras: dict | None = None,
        recrawl_pool: DataFrame | None = None,
        visit_stats: DataFrame | None = None,
    ) -> None:
        # each snapshot of a round goes to a fresh versioned subdir and
        # the manifest (the commit point) flips to it LAST: the mid-round
        # and post-round snapshots of one round never rewrite parquet the
        # current manifest still points at — an in-place overwrite would
        # leave a valid manifest over torn parts if the writer dies
        # mid-overwrite (exactly an Iceberg snapshot commit: new data
        # files, then one atomic metadata pointer swap)
        d = self._dir(rnd)
        os.makedirs(d, exist_ok=True)
        existing = [
            int(n.split("=", 1)[1])
            for n in os.listdir(d)
            if n.startswith("v=")
        ]
        v = max(existing, default=0) + 1
        vd = os.path.join(d, f"v={v}")
        parts = (frontier, seen, in_flight, metrics, host_stats)
        names = list(_PARTS)
        for name, df in zip(_PARTS, parts):
            df.write.mode("overwrite").parquet(os.path.join(vd, name))
        if recrawl_pool is not None:
            # optional part: only recrawl-enabled runs carry it, and
            # snapshots without it resume with an empty pool (counters
            # restart after the next dispatches — same as pre-part runs)
            recrawl_pool.write.mode("overwrite").parquet(
                os.path.join(vd, "recrawl_pool")
            )
            names.append("recrawl_pool")
        if visit_stats is not None:
            # optional part, same contract as recrawl_pool: only
            # priority-mode runs carry it; snapshots without it resume
            # with an empty history (staleness restarts at 0)
            visit_stats.write.mode("overwrite").parquet(
                os.path.join(vd, "visit_stats")
            )
            names.append("visit_stats")
        manifest = {
            "round": rnd,
            "parts": names,
            "version": v,
            "extras": extras or {},
        }
        tmp = os.path.join(d, "_MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "_MANIFEST.json"))
        # GC superseded versions only after the manifest commit
        import shutil

        for k in existing:
            shutil.rmtree(os.path.join(d, f"v={k}"), ignore_errors=True)

    def committed_rounds(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("round=") and os.path.exists(
                os.path.join(self.root, name, "_MANIFEST.json")
            ):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg ``expireSnapshots`` parity for the snapshot store:
        drop committed rounds older than the newest ``keep_last``
        (resume only ever reads the newest, so older rounds are pure
        storage debt — unbounded at a 10^10-URL crawl's round cadence),
        and remove ORPHANS in the retained rounds: version dirs the
        manifest does not name (a crash between the parquet writes and
        the manifest commit leaves one — write() only GCs superseded
        versions after a successful commit) plus stale ``.tmp``
        manifests. The newest committed round is never touched, and an
        uncommitted round dir NEWER than it is also kept (it may be a
        concurrent writer mid-commit). Returns counts:
        {rounds_expired, orphans_removed}."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        committed = self.committed_rounds()
        expired = orphans = 0
        if committed:
            newest = committed[-1]
            cutoff = (
                committed[-keep_last]
                if len(committed) >= keep_last
                else committed[0]
            )
            for name in os.listdir(self.root):
                if not name.startswith("round="):
                    continue
                rnd = int(name.split("=", 1)[1])
                d = os.path.join(self.root, name)
                is_committed = os.path.exists(
                    os.path.join(d, "_MANIFEST.json")
                )
                if rnd < cutoff or (not is_committed and rnd < newest):
                    shutil.rmtree(d, ignore_errors=True)
                    expired += 1
                    continue
                if not is_committed:
                    continue
                with open(os.path.join(d, "_MANIFEST.json")) as f:
                    live = f"v={json.load(f).get('version')}"
                for entry in os.listdir(d):
                    if (
                        entry.startswith("v=") and entry != live
                    ) or entry.endswith(".tmp"):
                        p = os.path.join(d, entry)
                        (
                            shutil.rmtree(p, ignore_errors=True)
                            if os.path.isdir(p)
                            else os.remove(p)
                        )
                        orphans += 1
        return {"rounds_expired": expired, "orphans_removed": orphans}

    def latest(self) -> Snapshot | None:
        rounds = self.committed_rounds()
        if not rounds:
            return None
        rnd = rounds[-1]
        d = self._dir(rnd)
        with open(os.path.join(d, "_MANIFEST.json")) as f:
            manifest = json.load(f)
        dfs = {p: self._read_part(d, p, manifest) for p in _PARTS}
        v = manifest.get("version")
        pool_dir = os.path.join(d, f"v={v}" if v else "", "recrawl_pool")
        vstats_dir = os.path.join(d, f"v={v}" if v else "", "visit_stats")
        return Snapshot(
            round=rnd,
            frontier=dfs["frontier"],
            seen=dfs["seen"],
            in_flight=dfs["in_flight"],
            metrics=dfs["metrics"],
            host_stats=dfs["host_stats"],
            extras=manifest.get("extras", {}),
            recrawl_pool=(
                self.spark.read.parquet(pool_dir)
                if os.path.isdir(pool_dir)
                else None
            ),
            visit_stats=(
                self.spark.read.parquet(vstats_dir)
                if os.path.isdir(vstats_dir)
                else None
            ),
        )

    def _read_part(self, d: str, part: str, manifest: dict) -> DataFrame:
        v = manifest.get("version")
        base = os.path.join(d, f"v={v}") if v else d  # pre-version layout
        path = os.path.join(base, part)
        if part == "host_stats" and not os.path.isdir(path):
            # snapshot written before host_stats became a part: migrate
            # the old driver-dict extras if present, else resume with an
            # empty stats table (counters restart — same behavior those
            # snapshots had)
            extras = manifest.get("extras", {})
            seq = extras.get("host_seq") or {}
            fetched = extras.get("host_fetched") or {}
            rows = [
                (h, int(seq.get(h, 0)), int(fetched.get(h, 0)))
                for h in sorted(set(seq) | set(fetched))
            ]
            return self.spark.createDataFrame(rows, HOST_STATS_SCHEMA)
        return self.spark.read.parquet(path)

    def resume_frontier(self, snap: Snapshot) -> DataFrame:
        """frontier ∪ in_flight — the reference's recovery re-enqueue."""
        return snap.frontier.unionByName(
            snap.in_flight.select(*snap.frontier.columns)
        ).dropDuplicates(["url", "form_params"])


def partition_metrics(df: DataFrame, counter: str) -> DataFrame:
    """Per-partition lineage rows: (partition_id, <counter> count)."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias(counter)
    )

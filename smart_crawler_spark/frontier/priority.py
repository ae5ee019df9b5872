"""Importance-prioritized frontier scheduling (the round-5 engine mode).

The reference's frontier order is purely structural: (class depth,
class name, url, form params) — ``model/CrawlURL.java:101-110`` /
``model/PageClass.java:462-468`` — i.e. "shallow model classes first".
That is the right order for a one-shot site crawl, but a CONTINUOUS
crawler has two extra signals the structural order ignores:

1. **Staleness** (Cho & Garcia-Molina, TODS 2003): a page whose content
   keeps changing should be re-fetched before a page that never does.
   ``frontier/revisit.py`` already computes the Poisson staleness
   ``1 - exp(-lambda * age)`` as a side query; here it becomes a LIVE
   frontier column: every re-enqueued recrawl entry carries the
   staleness derived from its own visit history, and the prioritized
   batch pick ranks it first.
2. **Host trust** (Gyongyi et al. 2004, TrustRank): link-spam
   neighborhoods should not crowd the politeness budget. The
   ``personalized_pagerank`` / ``host_graph`` operators produce a
   (host, trust) table; here it scales each host's per-round budget
   down — a trust-0.3 host gets 30% of the fetch slots, floor, min 1 —
   via ONE broadcast join at pick time (the table is host-cardinality,
   metadata scale).

Semantics contract (mirrored bit-for-bit by
``crawler/oracle.py:crawl_site_prioritized``):

- Prioritization changes WHICH rows are picked each round (the batch
  membership) — the pick ranks per host by ``PRIORITY_ORDER`` =
  (staleness DESC, then the reference comparator) and caps host h at
  ``max(1, floor(budget * trust_h))`` rows.
- WITHIN a round, dispatch bookkeeping (crawl-order sequence numbers,
  intra-batch link-dedup winners, redirect seen timing) keeps the
  reference comparator, exactly as in the parity engine's budget>1
  mode. Within-round order is a politeness artifact, not a semantic:
  the reference paces fetches per host, so only the round MEMBERSHIP
  is observable at round granularity. This keeps every downstream
  stage (``_dedup_links``, ``_append_order``, E8 redirect timing)
  byte-identical to the parity path.
- Fresh URLs (seeds, newly discovered links) enter with staleness 0.0;
  ties under equal staleness fall back to the reference order, so a
  corpus with no recrawl churn behaves exactly like the parity engine
  modulo trust budget caps.

Scale shape: staleness is a frontier COLUMN (rides the existing
frontier shuffles — adds zero exchanges); the trust table joins
broadcast after the per-host group-limit (<= budget rows per host reach
it); the visit-stats table is one full-outer merge per round on the
dispatch identity (same shape as the engine's host_stats roll-up,
bounded by dispatched-URL cardinality, checkpointed to the snapshot
like the recrawl pool).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smart_crawler_spark.frontier.queue import FRONTIER_ORDER


def PRIORITY_ORDER() -> list:
    """The prioritized frontier comparator: Poisson staleness first
    (most-stale wins), reference order as the tiebreak. A function for
    the same reason as FRONTIER_ORDER (Columns need a live session)."""
    return [F.col("staleness").desc(), *FRONTIER_ORDER()]


def staleness_expr(
    changes: Column, first_round: Column, last_round: Column, now_round: Column
) -> Column:
    """Poisson staleness ``1 - exp(-lambda * age)`` over ROUND time.

    The round-clock analog of ``revisit_priority``'s hour-clock formula
    (frontier/revisit.py:72-80): lambda = changes / (last - first)
    observed changes per round (0 when a single visit — span 0), age =
    now - last rounds since the last successful fetch. Rounded to 6dp
    like revisit_priority so engine and oracles compare exactly."""
    span = (last_round - first_round).cast("double")
    lam = F.when(span > 0, changes.cast("double") / span).otherwise(
        F.lit(0.0)
    )
    age = (now_round - last_round).cast("double")
    return F.round(F.lit(1.0) - F.exp(-lam * age), 6)


def trust_budgets(
    host_trust: DataFrame,
    budget: int,
    host_col: str = "host",
    trust_col: str = "trust",
) -> DataFrame:
    """(host, _tb): the trust-scaled per-host budget
    ``max(1, floor(budget * trust))``. Floor-then-clamp keeps every
    host crawlable (min 1 fetch/round — starvation-free, the same
    guarantee robots Crawl-delay budgets give) while a trust-0.1 host
    consumes a tenth of the slots. Hosts absent from the table are
    fully trusted (budget unchanged) via the caller's coalesce."""
    return host_trust.select(
        F.col(host_col).alias("host"),
        F.greatest(
            F.lit(1),
            F.floor(F.lit(budget) * F.col(trust_col)).cast("int"),
        ).alias("_tb"),
    )


def host_trust_from_links(
    links: DataFrame,
    seed_hosts: list[str],
    iters: int = 8,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(host, trust) from the crawl's OWN link graph — the loop closed:
    crawl round N's URL-level link table rolls up to the host graph
    (``operators/graphops.py:host_graph``, internal template edges
    dropped — a site's nav links are not endorsements), TrustRank-style
    personalized PageRank from the operator's trusted seed hosts
    assigns rank mass by proximity to trust (Gyongyi et al. 2004), and
    the mass normalizes to (0, 1] by the maximum so the top trusted
    host keeps the full politeness budget while spam neighborhoods
    demote proportionally. Feed the result straight into
    ``CrawlEngine(host_trust=...)`` for crawl round N+1.

    Scale shape: the host rollup is one partial-aggregated groupBy
    (shuffle = distinct host pairs, not links); PPR is the checkpointed
    co-partitioned iteration of personalized_pagerank; the normalizer
    is a 1-row broadcast. Output is host-cardinality — the broadcast
    table the pick join expects. Trust rounded 6dp for engine/oracle
    determinism."""
    from smart_crawler_spark.operators.graphops import (
        host_graph,
        personalized_pagerank,
    )

    hg = host_graph(links, src=src, dst=dst).filter(~F.col("internal"))
    seeds = (
        links.sparkSession.createDataFrame(
            [(h,) for h in seed_hosts], "node string"
        )
    )
    pr = personalized_pagerank(
        hg.select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        ),
        seeds,
        iters=iters,
        damping=damping,
    )
    mx = pr.agg(F.max("pr").alias("_mx"))
    return (
        pr.crossJoin(F.broadcast(mx))
        .select(
            F.col("node").alias("host"),
            F.round(F.col("pr") / F.col("_mx"), 6).alias("trust"),
        )
    )


def prioritized_pick(
    frontier: DataFrame,
    budget: int,
    host_trust: DataFrame | None = None,
) -> DataFrame:
    """One round's prioritized batch over a ``staleness``-bearing
    frontier: per-host top-K under PRIORITY_ORDER, K = the trust-scaled
    budget. The standalone form of the engine's priority-mode pick
    (crawler/engine.py:_pick_batch) — the ``crawl_site_prioritized``
    gate query runs THIS function so the driver's oracle check
    exercises the production pick path.

    Plan shape: one window (rank <= budget filters map-side as a
    Partial WindowGroupLimit, the F2 skew defense) + one broadcast join
    against the host-cardinality trust table. Returns the batch with
    its ``rank``."""
    from smart_crawler_spark.frontier.queue import priority_rank

    ranked = priority_rank(frontier, "host", order=PRIORITY_ORDER()).filter(
        F.col("rank") <= budget
    )
    if host_trust is None:
        return ranked
    tb = trust_budgets(host_trust, budget)
    return (
        ranked.join(F.broadcast(tb), "host", "left")
        .filter(F.col("rank") <= F.coalesce("_tb", F.lit(budget)))
        .drop("_tb")
    )

"""Link-graph importance operators: PageRank and HITS.

A crawl frontier at 10^10-URL scale needs a link-importance signal to
prioritize fetches beyond the reference's page-class utility (the
reference orders purely by inferred model utility,
``crawler/CrawlFrontier.java`` comparator); PageRank/OPIC-style scores
are the standard complement for web-scale frontiers. Both operators are
expressed as the Spark iterative-fixpoint pattern (SURVEY §2.6): a
driver loop of co-partitioned joins with eager ``localCheckpoint`` every
``checkpoint_interval`` rounds to truncate lineage (lazy checkpoints
re-plan per round — measured 2x slower on this box).

Scale design (100 TB / 10^10 edges):
- The edge table is joined once with out-degrees, repartitioned by
  ``src``, and checkpointed; every iteration's contribution join then
  hashes only the rank table (id + one double) into that layout. On a
  real cluster the edge table would be bucketed by ``src`` so the
  per-round join is exchange-free on the big side.
- Dangling mass and normalization constants are computed as 1-row
  DataFrames and broadcast-crossed into the update — no per-iteration
  driver ``collect()``, so each round is one job regardless of K.
- Ranks stay (node, double) — the shuffle per round is O(|V|) + the
  co-partitioned edge probe, never O(|E|) re-materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).distinct()


def pagerank(
    edges: DataFrame,
    iters: int = 8,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Semantics (the textbook formulation, Page et al. 1999, with uniform
    dangling-mass redistribution):

        pr_0(v)   = 1/N
        pr_k+1(v) = (1-d)/N + d * ( sum_{u->v} pr_k(u)/outdeg(u)
                                    + dangling_k / N )

    where ``dangling_k`` is the total rank held by nodes with no
    out-edges. Node set = every id appearing as src or dst. Returns
    ``(node, pr)`` with sum(pr) == 1 at every iteration.
    """
    spark = edges.sparkSession
    e = _edges(edges, src, dst)
    nparts = partitions or e.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    nparts = int(nparts)

    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    # node table annotated ONCE with a has-out-edges flag: the dangling
    # term is then an agg over the checkpointed rank table (no
    # per-iteration anti-join), and skipped entirely when the one-time
    # census proves the graph has no dangling nodes at all
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
        .join(
            deg.select(
                F.col("_src").alias("node"), F.lit(True).alias("_hasout")
            ),
            "node",
            "left",
        )
        .select(
            "node", F.coalesce("_hasout", F.lit(False)).alias("_hasout")
        )
        .repartition(nparts, "node")
        .localCheckpoint()
    )
    census = nodes.agg(
        F.count("*").alias("n"),
        F.sum(F.when(~F.col("_hasout"), 1).otherwise(0)).alias("ndang"),
    ).collect()[0]
    n, has_dangling = census["n"], census["ndang"] > 0
    # edge table annotated with out-degree, laid out by src once; every
    # iteration probes this layout with the (small) rank table
    ed = (
        e.join(deg, "_src")
        .repartition(nparts, "_src")
        .localCheckpoint()
    )

    ranks = nodes.select("node", "_hasout", (F.lit(1.0) / n).alias("pr"))
    for k in range(iters):
        contribs = (
            ed.join(ranks, ed._src == ranks.node)
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("_deg")).alias("_c"))
        )
        upd = nodes.join(contribs, "node", "left")
        if has_dangling:
            # rank mass sitting on dangling nodes (no out-edges), as a
            # 1-row frame broadcast into the update: no driver collect
            dangling = ranks.filter(~F.col("_hasout")).agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm")
            )
            upd = upd.crossJoin(F.broadcast(dangling))
        else:
            upd = upd.withColumn("_dm", F.lit(0.0))
        ranks = upd.select(
            "node",
            "_hasout",
            (
                F.lit((1.0 - damping) / n)
                + damping
                * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / n)
            ).alias("pr"),
        )
        if checkpoint_interval > 0 and (
            (k + 1) % checkpoint_interval == 0 or k == iters - 1
        ):
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "pr")


def hits(
    edges: DataFrame,
    iters: int = 6,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) with L1 normalization.

        auth_k+1(v) = sum_{u->v} hub_k(u)      then auth /= sum(auth)
        hub_k+1(u)  = sum_{u->v} auth_k+1(v)   then hub  /= sum(hub)

    L1 (sum) normalization instead of the classical L2 keeps the oracle
    SQL-exact (no sqrt of a float sum); the fixpoint direction is
    identical. Returns ``(node, hub, auth)``; either score is 0 for
    nodes with no edges in that direction. Same scale layout as
    ``pagerank``: the edge table is checkpointed by key once per
    direction, scores are (node, double) frames.
    """
    e = _edges(edges, src, dst)
    nparts = int(
        partitions
        or e.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
        .repartition(nparts, "node")
        .localCheckpoint()
    )
    e_by_src = e.repartition(nparts, "_src").localCheckpoint()
    e_by_dst = e.repartition(nparts, "_dst").localCheckpoint()
    n = nodes.count()

    hub = nodes.select("node", (F.lit(1.0) / n).alias("hub"))
    auth = None
    for k in range(iters):
        raw_auth = (
            e_by_src.join(hub, e_by_src._src == hub.node)
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        asum = raw_auth.agg(F.sum("_a").alias("_s"))
        auth = (
            nodes.join(raw_auth, "node", "left")
            .crossJoin(F.broadcast(asum))
            .select(
                "node",
                (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_s")).alias(
                    "auth"
                ),
            )
        )
        raw_hub = (
            e_by_dst.join(auth, e_by_dst._dst == auth.node)
            .groupBy(F.col("_src").alias("node"))
            .agg(F.sum("auth").alias("_h"))
        )
        hsum = raw_hub.agg(F.sum("_h").alias("_s"))
        hub = (
            nodes.join(raw_hub, "node", "left")
            .crossJoin(F.broadcast(hsum))
            .select(
                "node",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_s")).alias(
                    "hub"
                ),
            )
        )
        if checkpoint_interval > 0 and (
            (k + 1) % checkpoint_interval == 0 or k == iters - 1
        ):
            hub = hub.localCheckpoint()
            auth = auth.localCheckpoint()
    return hub.join(auth, "node")


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected graph given as an edge list (direction and duplicates
    ignored; self-loops dropped).

    Algorithm (the MapReduce-era standard, Suri & Vassilvitskii 2011
    "Counting Triangles and the Curse of the Last Reducer"):

    1. Canonicalize to undirected ``u < v`` distinct edges.
    2. ORIENT each edge from its lower-(degree, id) endpoint to the
       higher one. This is the load-balancing step: every node's
       oriented out-degree is O(sqrt(m)), so the wedge join below never
       builds the quadratic neighbor-pair list of a hot node (a
       celebrity node with 10^7 followers contributes 0 wedges as a
       source unless its neighbors are equally hot).
    3. Wedge join: oriented (a→b) ⨝ oriented (a→c) with b before c in
       the same (degree, id) total order — an equi-join on the source.
    4. Close: semi-join wedges (b, c) against the oriented edge set —
       another equi-join. Each triangle is found exactly once, at its
       lowest-(degree, id) corner.
    5. Explode the 3 corners of each triangle and count per node.

    Every stage is an equi-join or aggregation (no cartesian, no
    windows); at 10^10 edges the oriented edge table is the only big
    shuffle and it is reused (checkpointed) across the two probes.

    Returns ``(node, deg, tri, lcc)`` for every node with deg >= 1,
    where ``lcc = 2*tri / (deg*(deg-1))`` (0.0 when deg < 2), rounded
    to 6dp so float formatting is oracle-stable.
    """
    e = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("u"), F.greatest("_a", "_b").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("_dv"))
    # orient low-(deg, id) -> high-(deg, id); struct comparison gives the
    # lexicographic (deg, node) total order natively in codegen
    keyed = e.join(du, "u").join(dv, "v")
    uk = F.struct(F.col("_du").alias("deg"), F.col("u").alias("node"))
    vk = F.struct(F.col("_dv").alias("deg"), F.col("v").alias("node"))
    lo_first = uk < vk
    oriented = keyed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lo_first, vk).otherwise(uk).alias("tkey"),
    ).localCheckpoint()
    o1 = oriented.select(F.col("s"), F.col("tkey").alias("k1"))
    o2 = oriented.select(F.col("s"), F.col("tkey").alias("k2"))
    wedges = o1.join(o2, "s").filter(F.col("k1") < F.col("k2"))
    closing = oriented.select(
        F.col("s").alias("_cs"), F.col("tkey").alias("_ck")
    )
    tri_rows = wedges.join(
        closing,
        (F.col("k1.node") == F.col("_cs")) & (F.col("k2") == F.col("_ck")),
        "left_semi",
    ).select(
        F.col("s").alias("x"),
        F.col("k1.node").alias("y"),
        F.col("k2.node").alias("z"),
    )
    per_node = (
        tri_rows.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("tri"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).alias("tri"),
            F.when(
                F.col("deg") > 1,
                F.round(
                    2.0
                    * F.coalesce(F.col("tri"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1.0)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def anchor_text_agg(
    links: DataFrame,
    src: str = "src",
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """Inbound anchor-text aggregation per target URL — the classic
    web-corpus signal (anchor text describes the TARGET better than the
    target's own text; used by every search stack since Brin & Page
    1998 §2.2) and a quality feature for crawl prioritization.

    Per target: total inlinks, distinct anchor strings, distinct
    source hosts (link-farm discount: 10^6 inlinks from one host is
    one vote), and the dominant anchor with its count (ties broken by
    lexicographically smallest anchor, so the result is deterministic
    and oracle-hashable).

    Scale shape: one partial-aggregated groupBy on (dst, anchor) — the
    map-side combine collapses repeated anchors before the shuffle —
    then a groupBy on dst; the dominant-anchor pick is a window
    PARTITIONED BY dst over the already-aggregated (dst, anchor, cnt)
    rows, never over raw links. A hot page with 10^7 inlinks but ~10^2
    distinct anchors costs 10^2 window rows. No global window, no
    driver collect.
    """
    host = F.regexp_extract(F.col(src), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    base = links.select(
        F.col(dst).alias("dst"),
        F.col(anchor).alias("anchor"),
        host.alias("_shost"),
    )
    per_anchor = base.groupBy("dst", "anchor").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    top = (
        per_anchor.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "dst",
            F.col("anchor").alias("top_anchor"),
            F.col("cnt").alias("top_anchor_cnt"),
        )
    )
    totals = base.groupBy("dst").agg(
        F.count("*").alias("inlinks"),
        F.countDistinct("anchor").alias("distinct_anchors"),
        F.countDistinct("_shost").alias("src_hosts"),
    )
    return totals.join(top, "dst")


def toppages_by_rank(ranks: DataFrame, k: int, col: str = "pr") -> DataFrame:
    """Top-k nodes by rank with deterministic (rank desc, node asc)
    ordering — a map-side WindowGroupLimit plan, same pattern as the
    frontier's per-host top-k (F2)."""
    w = Window.orderBy(F.col(col).desc(), F.col("node").asc())
    return (
        ranks.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    partitions: int | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over the undirected view of an edge list, made fully
    DETERMINISTIC: every node starts labeled with its own id, and each
    round adopts the most frequent label among its distinct neighbors
    with ties broken toward the SMALLEST label (classic LPA breaks ties
    randomly; a crawl pipeline needs replayable communities). Host-link
    communities are the coarse "site family" signal the scheduler uses
    above page classes.

    Scale shape: the deduped undirected edge table is laid out by the
    neighbor key ONCE (repartition + localCheckpoint, same pattern as
    pagerank); every iteration joins only the (node, label) frame into
    that layout, aggregates label counts per node, and takes the
    argmax as one `max_by(label, struct(count, -label))` hash agg — no
    window, no per-round driver collect. Label frames stay O(nodes).

    Returns ``(node, label)`` after ``iters`` synchronous rounds."""
    e = _edges(edges, src, dst)
    nparts = int(
        partitions
        or e.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    und = (
        e.select(F.col("_src").alias("a"), F.col("_dst").alias("b"))
        .unionAll(
            e.select(F.col("_dst").alias("a"), F.col("_src").alias("b"))
        )
        .distinct()
        .repartition(nparts, "b")
        .localCheckpoint()
    )
    nodes = und.select(F.col("a").alias("node")).distinct().localCheckpoint()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        cnt = (
            und.join(labels, und.b == labels.node)
            .groupBy(F.col("a").alias("n2"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        new = cnt.groupBy("n2").agg(
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("t"))
            ).alias("newl")
        )
        labels = (
            nodes.join(new, nodes.node == new.n2, "left")
            .select(
                "node",
                F.coalesce(F.col("newl"), F.col("node")).alias("label"),
            )
            .localCheckpoint()
        )
    return labels


def host_graph(
    links: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Host-level web-graph rollup: collapse the URL-level link table
    to one row per (src_host, dst_host) with link multiplicity and
    distinct-source-page support — the graph every crawl scheduler,
    spam heuristic, and site-family analysis actually operates on
    (the URL graph at 10^10 edges is too fine; the host graph is ~10^4x
    smaller and answers "who links to whom").

    Per edge: n_links (all URL links), n_src_pages (distinct linking
    pages — a 10^6-link template footer is one page's vote),
    internal (src_host == dst_host — template/nav edges vs genuine
    endorsements).

    Scale shape: host parsing is a map-side regexp; the rollup is ONE
    partial-aggregated groupBy on (src_host, dst_host) — the map-side
    combine collapses template links before the shuffle, so shuffle
    volume is the distinct host-pair count, not the link count. The
    distinct-page count uses the same two-level (pair, page) pre-agg
    pattern as anchor_text_agg."""
    hostre = r"^[a-z][a-z0-9+.-]*://([^/]+)"
    base = links.select(
        F.regexp_extract(F.col(src), hostre, 1).alias("src_host"),
        F.regexp_extract(F.col(dst), hostre, 1).alias("dst_host"),
        F.col(src).alias("_page"),
    )
    # two-level agg keeps count_distinct partial-aggregatable: first
    # collapse to (pair, page) rows map-side, then count
    per_page = base.groupBy("src_host", "dst_host", "_page").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_page.groupBy("src_host", "dst_host").agg(
        F.sum("_n").cast("long").alias("n_links"),
        F.count(F.lit(1)).cast("long").alias("n_src_pages"),
    ).withColumn("internal", F.col("src_host") == F.col("dst_host"))


def resolve_redirect_chains(
    redirects: DataFrame,
    max_chain: int = 64,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-hop redirect resolution by path doubling: collapse a
    redirect map (u -> v, at most ONE outgoing edge per u — HTTP
    redirects are functional) to each URL's FINAL destination, hop
    count, and a cycle flag. The crawl-side use: a 10^10-URL frontier
    must canonicalize u to final(u) before the seen-filter probe, or
    every hop of a chain is fetched and deduped separately; WARC
    revisit resolution and E8 redirect adoption handle single hops,
    this collapses arbitrary chains.

    Pointer jumping (path doubling): the pointer table P maps u to the
    node 2^k hops away (saturating at terminals, accumulating the true
    hop distance), so R = ceil(log2(max_chain)) self-joins resolve
    every chain up to max_chain hops — O(log L) co-partitioned shuffles
    of (url, ptr, dist) rows, never a per-hop walk (10^10 URLs with
    30-hop chains = 5 rounds, not 30). A walk still pointing at a
    non-terminal node after R rounds cannot terminate within max_chain
    hops: with max_chain >= |redirects|+1 that proves a cycle (a
    terminating walk visits distinct srcs), reported as
    (final_url=NULL, hops=-1, is_cycle=true) — detection-order-free, so
    the SQL oracle's bounded recursive walk states the identical result.

    Output: (url, final_url, hops, is_cycle) — one row per redirecting
    URL (terminals have no row; they redirect nothing).
    """
    import math

    e = redirects.select(
        F.col(src).alias("u"), F.col(dst).alias("p")
    ).distinct()
    terminals = e.select(F.col("p").alias("u")).subtract(
        e.select("u")
    )  # targets that never redirect
    p = e.select("u", "p", F.lit(1).cast("long").alias("d"))
    rounds = max(1, math.ceil(math.log2(max_chain)))
    for r in range(rounds):
        q = p.select(
            F.col("u").alias("qu"),
            F.col("p").alias("qp"),
            F.col("d").alias("qd"),
        )
        p = (
            p.join(q, p["p"] == q["qu"], "left")
            .select(
                "u",
                F.coalesce("qp", "p").alias("p"),
                (F.col("d") + F.coalesce("qd", F.lit(0))).alias("d"),
            )
        )
        if (r + 1) % 3 == 0:
            p = p.localCheckpoint(eager=True)
    term = terminals.select(F.col("u").alias("tu"), F.lit(True).alias("_t"))
    return p.join(term, p["p"] == term["tu"], "left").select(
        F.col("u").alias("url"),
        F.when(F.col("_t"), F.col("p")).alias("final_url"),
        F.when(F.col("_t"), F.col("d")).otherwise(F.lit(-1)).cast("long").alias("hops"),
        F.coalesce(~F.col("_t"), F.lit(True)).alias("is_cycle"),
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 3,
) -> DataFrame:
    """k-core decomposition (fixed k): iteratively peel nodes of degree
    < k from the undirected graph until (at most ``rounds`` rounds) a
    fixpoint — the standard density filter for link-spam farms and
    seed-set selection (a crawl scheduler trusts hosts in a dense core
    over leaf hosts whose every link is reciprocated nowhere).

    Runs a FIXED number of peel rounds rather than until-convergence:
    at a fixpoint further rounds are no-ops, so with ``rounds`` >= the
    graph's peel depth the result IS the k-core, and the fixed count
    makes the computation bit-identical to the statically unrolled SQL
    oracle (no convergence-detection divergence). Each round is one
    degree aggregation + two semi-joins against the shrinking edge set
    — co-partitioned on the node key, lineage truncated every
    ``checkpoint_interval`` rounds. Peel depth at web scale is small
    (degeneracy ordering peels in O(core number) rounds for the k-core
    question asked here); callers needing proof of convergence compare
    rounds and rounds+1.

    Output: (node, degree) for k-core members with their within-core
    degree."""
    e = _edges(edges, src, dst)
    und = (
        e.unionAll(
            e.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for r in range(rounds):
        alive = (
            und.groupBy("_src")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select("_src")
        )
        und = und.join(alive, "_src").join(
            alive.select(F.col("_src").alias("_dst")), "_dst"
        ).select("_src", "_dst")
        if (r + 1) % checkpoint_interval == 0:
            und = und.localCheckpoint(eager=True)
    return (
        und.groupBy("_src")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("_src").alias("node"), "degree")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 8,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    checkpoint_interval: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """TrustRank-style personalized PageRank (Gyongyi, Garcia-Molina &
    Pedersen 2004; Haveliwala 2002): the random surfer teleports to a
    TRUSTED SEED SET instead of uniformly, so rank mass measures
    proximity to trust — the crawl-frontier prioritization that demotes
    link-spam neighborhoods uniform PageRank happily inflates.

        t(v)      = 1/|S| if v in S else 0
        pr_0(v)   = t(v)
        pr_k+1(v) = (1-d) t(v) + d ( sum_{u->v} pr_k(u)/outdeg(u)
                                     + dangling_k * t(v) )

    (dangling mass teleports to the seed distribution, the PPR analog
    of uniform redistribution). Same scale shape as ``pagerank``: the
    src-partitioned degree-annotated edge layout is built once and
    checkpointed, each round is one co-partitioned contribution join +
    a 1-row broadcast dangling frame — no per-iteration driver collect;
    the seed indicator rides the checkpointed node table.

    Returns (node, pr) over the full node set; sum(pr) == 1."""
    e = _edges(edges, src, dst)
    nparts = partitions or int(
        e.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    # same one-time dangling census as pagerank: the per-iteration
    # dangling job (agg + broadcast) only exists when dangling nodes do
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
        .join(s.select("node", F.lit(True).alias("_s")), "node", "left")
        .join(
            deg.select(
                F.col("_src").alias("node"), F.lit(True).alias("_hasout")
            ),
            "node",
            "left",
        )
        .select(
            "node",
            F.when(F.col("_s"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("_t"),
            F.coalesce("_hasout", F.lit(False)).alias("_hasout"),
        )
        .repartition(nparts, "node")
        .localCheckpoint()
    )
    has_dangling = (
        nodes.filter(~F.col("_hasout")).limit(1).count() > 0
    )
    ed = e.join(deg, "_src").repartition(nparts, "_src").localCheckpoint()

    ranks = nodes.select("node", "_t", "_hasout", F.col("_t").alias("pr"))
    for k in range(iters):
        contribs = (
            ed.join(ranks, ed._src == ranks.node)
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("_deg")).alias("_c"))
        )
        upd = nodes.join(contribs, "node", "left")
        if has_dangling:
            dangling = ranks.filter(~F.col("_hasout")).agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm")
            )
            upd = upd.crossJoin(F.broadcast(dangling))
        else:
            upd = upd.withColumn("_dm", F.lit(0.0))
        ranks = upd.select(
            "node",
            "_t",
            "_hasout",
            (
                F.lit(1.0 - damping) * F.col("_t")
                + damping
                * (
                    F.coalesce(F.col("_c"), F.lit(0.0))
                    + F.col("_dm") * F.col("_t")
                )
            ).alias("pr"),
        )
        if checkpoint_interval > 0 and (
            (k + 1) % checkpoint_interval == 0 or k == iters - 1
        ):
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "pr")


def neighborhood_function(
    edges: DataFrame,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """EXACT neighborhood function of a directed graph: N(h) = number
    of ordered pairs (u, v) with d(u, v) <= h, self-pairs included
    (d(u, u) = 0, the standard convention), for h = 0..max_hops. N(h)
    is the curve behind effective-diameter and connectivity reports on
    a crawl's link graph ("90% of reachable pairs connect within 4
    hops").

    Computed by iterative reachable-set expansion: reach_h =
    reach_{h-1} UNION (reach_{h-1} JOIN edges), distinct, eagerly
    checkpointed; the loop stops early when the count saturates
    (transitive closure reached) and holds the curve flat. EXACT but
    pair-materializing — O(sum of ball sizes) rows — so this is the
    truth path for bounded graphs (site graphs, host graphs) and the
    differential baseline for ``hyperball_neighborhood``, the
    register-sketch scale path whose state is O(|V| * 2^log2m) no
    matter how dense the balls get.

    Output: (hop, n_pairs), max_hops + 1 rows."""
    e = _edges(edges, src, dst)
    nodes = (
        e.select(F.col("_src").alias("_u"))
        .unionAll(e.select(F.col("_dst").alias("_u")))
        .distinct()
    )
    reach = nodes.select(
        F.col("_u"), F.col("_u").alias("_v")
    ).localCheckpoint(eager=True)
    counts = [reach.count()]
    for _h in range(max_hops):
        nxt = reach.join(
            e, reach["_v"] == e["_src"]
        ).select("_u", F.col("_dst").alias("_v"))
        new_reach = (
            reach.unionAll(nxt).distinct().localCheckpoint(eager=True)
        )
        c = new_reach.count()
        counts.append(c)
        if c == counts[-2]:
            break
        reach = new_reach
    while len(counts) < max_hops + 1:
        counts.append(counts[-1])  # closure reached: the curve is flat
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(h, int(c)) for h, c in enumerate(counts)],
        "hop int, n_pairs long",
    )


def hyperball_neighborhood(
    edges: DataFrame,
    max_hops: int = 8,
    log2m: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "HyperANF/HyperBall", WWW 2011 /
    arXiv 1308.2144): approximate the neighborhood function with one
    HyperLogLog sketch per node instead of materialized balls. Each
    node starts with the HLL of {itself}; iteration h takes the
    register-wise max of its own sketch and its OUT-neighbors' sketches
    (HLL union is elementwise max), so after h rounds node u's sketch
    estimates |ball_out(u, h)|; summing the per-node estimates gives
    N(h). State is O(|V| * m) bytes (m = 2^log2m registers) — the
    10^10-node scale path where exact balls are quadratically
    impossible. Standard error ~1.04/sqrt(m) per node (~6.5% at the
    default m=256), partially averaging out in the sum; the
    differential sweep in tests/test_graphops.py pins the observed
    envelope vs the exact operator.

    Plan shape per iteration: one equi-join (edge table probes the
    sketch table on dst), one groupBy(node) whose per-group work is a
    JVM ``aggregate``/``zip_with`` register-max fold — no Python
    anywhere; per-group memory is in-degree x m ints (at true web
    scale the same fold runs per (node, register-block) after an
    explode — noted, not needed at sketch sizes this small). Estimates
    are pure column expressions (the m-register harmonic sum + the
    small-range linear-counting correction); the driver collects ONE
    scalar per hop, like the other iterative operators.

    Deterministic: registers derive from xxhash64(node) only.

    Output: (hop, nf_est double), max_hops + 1 rows."""
    if not 4 <= log2m <= 12:
        raise ValueError("log2m must be in [4, 12]")
    m = 1 << log2m
    W = 64 - log2m
    e = _edges(edges, src, dst)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    h64 = F.xxhash64(F.col("node"))
    bucket = F.pmod(h64, F.lit(m)).cast("int")
    w = F.shiftrightunsigned(h64, log2m)
    rho = (
        F.when(w == 0, F.lit(W + 1))
        .otherwise(F.lit(W) - F.floor(F.log2(w.cast("double"))))
        .cast("int")
    )
    init = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.when(i == bucket, rho).otherwise(F.lit(0)),
    )
    nparts = int(
        e.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    sk = (
        nodes.select("node", init.alias("sk"))
        .repartition(nparts, "node")
        .localCheckpoint(eager=True)
    )
    e_by_dst = e.withColumnRenamed("_dst", "node").localCheckpoint()

    alpha = 0.7213 / (1.0 + 1.079 / m)
    harm = F.aggregate(
        F.transform(F.col("sk"), lambda r: F.pow(F.lit(2.0), -r)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    raw = F.lit(alpha * m * m) / harm
    zeros = F.size(F.filter(F.col("sk"), lambda r: r == 0))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)

    def nf(frame: DataFrame) -> float:
        return float(
            frame.agg(F.sum(est).alias("s")).collect()[0]["s"] or 0.0
        )

    out = [(0, nf(sk))]
    zero_arr = F.array_repeat(F.lit(0), m)
    for h in range(1, max_hops + 1):
        nb = e_by_dst.join(sk, "node").select(
            F.col("_src").alias("node"), "sk"
        )
        sk = (
            sk.select("node", "sk")
            .unionAll(nb)
            .groupBy("node")
            .agg(
                F.aggregate(
                    F.collect_list("sk"),
                    zero_arr,
                    lambda acc, x: F.zip_with(
                        acc, x, lambda a, b: F.greatest(a, b)
                    ),
                ).alias("sk")
            )
            .localCheckpoint(eager=True)
        )
        out.append((h, nf(sk)))
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(h, round(v, 3)) for h, v in out], "hop int, nf_est double"
    )


def effective_diameter(
    nf: DataFrame, q: float = 0.9
) -> DataFrame:
    """Interpolated effective diameter from a neighborhood-function
    curve (Palmer/Gibbons/Faloutsos ANF, KDD 2002; the
    "90% of connected pairs within d hops" headline statistic): the
    smallest h with N(h) >= q * N(max), linearly interpolated inside
    the crossing step:

        d_eff = (h - 1) + (q*N_max - N(h-1)) / (N(h) - N(h-1))

    (h = 0 crossing reports 0.0 — the quantile is already met by the
    self-pairs.) Input is any (hop, n_pairs) frame —
    ``neighborhood_function``'s exact curve or the rounded HyperBall
    estimate; the arithmetic is a couple of window expressions over a
    max_hops-row frame (metadata scale). Output: one row
    (q, eff_diameter) rounded 4dp."""
    w = Window.orderBy("hop")
    tot = nf.agg(F.max("n_pairs").alias("_nmax"))
    steps = (
        nf.crossJoin(F.broadcast(tot))
        .withColumn("_prev", F.lag("n_pairs").over(w))
        .withColumn("_target", F.lit(q) * F.col("_nmax"))
        .filter(F.col("n_pairs") >= F.col("_target"))
        .orderBy("hop")
        .limit(1)
    )
    d = F.when(F.col("hop") == 0, F.lit(0.0)).otherwise(
        (F.col("hop") - 1)
        + (F.col("_target") - F.col("_prev"))
        / (F.col("n_pairs") - F.col("_prev"))
    )
    return steps.select(
        F.lit(q).alias("q"), F.round(d, 4).alias("eff_diameter")
    )

"""Distributed connected components over a pair/edge table.

The near-dup operators (minhash/simhash/phash/embedding) emit PAIRS;
a training-data dedup pipeline needs GROUPS — one canonical survivor
per duplicate cluster. That is connected components over the pair
graph: component id = min doc id reachable.

Algorithm: iterative min-label propagation with one pointer-jumping
step per round (comp <- label(comp)), all as DataFrame joins/aggs:

  round:  comp(v) <- min(comp(v), min_{u in N(v)} comp(u))   # 1 shuffle agg + join
          comp(v) <- comp(comp(v))                           # pointer jump, 1 join

Plain propagation needs O(diameter) rounds; the jump step halves the
remaining label-tree depth each round, giving O(log diameter) — for
near-dup clusters (near-cliques, diameter <= 3) this converges in 1-2
rounds. For adversarial long-path graphs at 10^10-edge scale the
published alternative is the large-star/small-star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
same join/agg primitives, O(log^2 n) rounds; the propagation loop here
keeps the per-round plan smaller, which wins at bounded diameter.

Loop state is eagerly localCheckpoint-ed every round (lazy checkpoints
re-plan the whole lineage per action — measured 2x slower in the crawl
engine; see BASELINE.md). Convergence = zero labels changed.

Reference parity note: the reference collapses near-dup page classes
agglomeratively on the driver (modeler/DynamicModeler.java:217-241);
this operator is the distributed analogue used by the training-data
dedup queries, where clusters live in a billion-row pair table instead
of a dozen-class list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "id",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Return (id, component) with component = min reachable node id.

    `edges` is an undirected pair list (each pair listed once in either
    orientation). `nodes` optionally supplies the node universe (column
    `node_col`) so isolated nodes appear as singleton components — a
    dedup pipeline needs the non-duplicated docs in the output too.
    """
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).unionAll(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    if nodes is None:
        universe = e.select(F.col("s").alias("id")).distinct()
    else:
        universe = nodes.select(F.col(node_col).alias("id")).distinct()
    lab = universe.select("id", F.col("id").alias("comp")).localCheckpoint(
        eager=True
    )
    e = e.localCheckpoint(eager=True)

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # min label over neighbours (map-side partial agg, then join)
        nbr = (
            e.join(lab.withColumnRenamed("id", "d_id"), e.d == F.col("d_id"))
            .groupBy("s")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            lab.join(nbr, lab.id == nbr.s, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
            )
        )
        # pointer jump: comp <- label(comp). Labels only ever shrink, so
        # following one hop through the label table is always sound and
        # halves the remaining depth of the min-label tree.
        jump = stepped.select(
            F.col("id").alias("j_id"), F.col("comp").alias("j_comp")
        )
        new_lab = (
            stepped.join(jump, stepped.comp == jump.j_id)
            .select("id", F.col("j_comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_lab.alias("n")
            .join(lab.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        lab = new_lab
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return lab


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "id",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the adversarial-diameter alternative to the min-label
    propagation in :func:`connected_components`.

    Each round rewires the edge set toward star graphs rooted at
    component minima:

      large-star(u): m = min(Γ(u) ∪ {u}); for v ∈ Γ(u), v > u emit (v, m)
      small-star(u): on edges oriented (larger, smaller), m = min(Γ(u));
                     emit (u, m) and (v, m) for v ∈ Γ(u), v ≠ m

    Both steps are one groupBy-min + one join + one distinct — the same
    shuffle primitives as propagation, but convergence is O(log^2 n)
    rounds INDEPENDENT of graph diameter, so a 10^10-edge path graph
    (where any frontier-style propagation does diameter rounds) still
    terminates. Per round the edge set only moves toward the minima;
    termination = small-star output equals its input edge set, at which
    point every edge is (node, component-min). Loop state is eagerly
    localCheckpoint-ed per round (lazy checkpoints re-plan the whole
    lineage; measured 2x slower — BASELINE.md).

    Returns (id, comp) with the same contract as
    :func:`connected_components`; the two implementations are
    differential-tested against each other and a driver union-find on
    random graphs incl. diameter >> 30 paths (test_components.py,
    test_random_graphs.py).
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if nodes is None:
        # capture the universe BEFORE dropping self-loops, so a node
        # appearing only as (x, x) still gets its singleton label
        universe = (
            raw.select("u")
            .unionAll(raw.select(F.col("v").alias("u")))
            .distinct()
            .select(F.col("u").alias("id"))
        )
    else:
        universe = nodes.select(F.col(node_col).alias("id")).distinct()
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.unionAll(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        d = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        j = d.join(m, "u")
        out = j.select(F.col("v").alias("u"), F.col("m").alias("v")).unionAll(
            j.select("u", F.col("m").alias("v"))
        )
        return (
            out.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
        )

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        stepped = small_star(large_star(e)).localCheckpoint(eager=True)
        # set-equality convergence: symmetric difference empty. Both
        # sides are distinct canonical pairs, so two anti-join counts
        # suffice (cheaper than exceptAll at equal correctness).
        grew = stepped.join(e, ["u", "v"], "left_anti").count()
        shrank = e.join(stepped, ["u", "v"], "left_anti").count()
        e = stepped
        if grew == 0 and shrank == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds

    # converged edges are (child, root): comp = min(self, min neighbor)
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    lab = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("comp"))
    return universe.join(
        lab.withColumnRenamed("u", "id"), "id", "left"
    ).select("id", F.coalesce("comp", F.col("id")).alias("comp"))


def dedup_groups(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> (doc_id, component): every doc labelled with
    its cluster's canonical (minimum) id; non-duplicated docs are
    singleton components of themselves. Keeping `component == doc_id`
    rows is the survivor set of an exact-once dedup."""
    comp = connected_components(
        pairs.select(pair_a, pair_b),
        nodes=docs.select(id_col),
        src=pair_a,
        dst=pair_b,
        node_col=id_col,
    )
    return comp.select(F.col("id").alias(id_col), "comp").withColumnRenamed(
        "comp", "component"
    )


def keep_best(
    groups: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware survivor selection: given the component labelling
    from ``dedup_groups`` and a per-doc score, each component keeps its
    HIGHEST-scoring member (ties -> lowest id) instead of the arbitrary
    min-id canonical — what a production dedup actually ships, since
    near-dup clusters mix good and boilerplate-damaged copies.

    One agg shuffle on component: ``max_by(id, struct(score, -id))``
    aggregates with map-side partials (structs are orderable), so the
    kept-id table is component-cardinality small and broadcasts back.
    No window over the corpus, no driver loop."""
    scored = groups.join(scores.select(id_col, score_col), id_col)
    kept = scored.groupBy("component").agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col(score_col), (-F.col(id_col)).alias("_nid")),
        ).alias("kept_id"),
        F.count(F.lit(1)).cast("long").alias("group_size"),
    )
    return (
        scored.join(F.broadcast(kept), "component")
        .select(
            id_col,
            "component",
            score_col,
            "kept_id",
            (F.col(id_col) == F.col("kept_id")).alias("keep"),
            "group_size",
        )
    )

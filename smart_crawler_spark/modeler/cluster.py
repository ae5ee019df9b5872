"""Structural clustering — the modeler core (SURVEY §2.5 C1–C4, C8).

Reference semantics re-expressed for bulk execution:

- **C1** group pages by exact link-schema equality
  (``DynamicModeler.java:214-219``) → a hash groupBy on the sorted
  schema array.
- **C2** split off pages whose non-empty label schema doesn't contain
  the class label schema (xpaths whose text repeats on >=2 pages —
  ``ModelPageClass.java:89-98``, ``DynamicModeler.java:246-265``).
- **C3** agglomerative collapse of candidate pairs with schema distance
  < 0.2, where distance = |symmetric difference| / |union| over the full
  (link ∪ label) schema (``ModelCostCalculator.distance:170-175``,
  pair loop ``DynamicModeler.java:224-241``). The pair loop is
  driver-side over cluster *summaries* (clusters are few); at scale the
  pair set is pre-pruned by MinHash-LSH banding over schema sets so the
  driver never sees O(n²) pairs.
- **C4** sequential MDL merge of each candidate into the model
  (``DynamicModeler.updateModel:408-422``). The cost function
  (``ModelCostCalculator.java:26-127``) decomposes into per-cluster
  sufficient statistics that MERGE ADDITIVELY (page counts, per-xpath
  document frequencies, per-(xpath,text) label counts, total url count),
  so the sequential decision loop runs exactly on the driver while all
  page-level aggregation stays distributed.

Input pages DataFrame: (url, link_schema array<string>,
label_values map<string,string>, out_links map<string,array<string>>).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_DISTANCE = 0.2  # DynamicModeler.java:48
C_U, C_I, C_XP = 1.0, 0.8, 1.0  # ModelCostCalculator.java:28-38


# --------------------------------------------------------------------------
# distributed stage: pages -> candidate cluster summaries


def candidate_clusters(pages: DataFrame) -> DataFrame:
    """C1+C2: assign each page a candidate id (schema hash + label-split
    flag). Returns pages extended with ``candidate_id``."""
    p = pages.withColumn(
        "_sig", F.xxhash64(F.to_json(F.array_sort("link_schema")))
    )
    # class label schema per C1 group: xpaths whose text repeats >= 2x
    labels = p.select(
        "_sig", F.explode_outer("label_values").alias("xpath", "text")
    )
    class_labels = (
        labels.groupBy("_sig", "xpath", "text")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & F.col("xpath").isNotNull())
        .groupBy("_sig")
        .agg(F.collect_set("xpath").alias("class_labels"))
    )
    p = p.join(class_labels, "_sig", "left").withColumn(
        "class_labels", F.coalesce("class_labels", F.array())
    )
    page_labels = F.map_keys(F.coalesce("label_values", F.create_map()))
    split = (F.size(page_labels) > 0) & (
        F.size(F.array_except("class_labels", page_labels)) > 0
    )
    return p.withColumn(
        "candidate_id",
        F.concat_ws("_", F.col("_sig"), split.cast("int")),
    ).drop("_sig", "class_labels")


def cluster_summaries(
    pages_with_cand: DataFrame, collect_urls: bool = False
) -> DataFrame:
    """Aggregate per-candidate sufficient statistics (all distributed).

    ``collect_urls`` additionally ships every member URL per candidate
    to the driver — diagnostics/tests only: the MDL collapse needs just
    the sufficient statistics (size / urls_total / link_df /
    label_counts), and the page→cluster assignment comes from the
    candidate-id join in cluster_pages, so at corpus scale the driver
    must NOT materialize O(pages) URL strings."""
    base = pages_with_cand.select(
        "candidate_id",
        "url",
        "link_schema",
        F.coalesce("label_values", F.create_map()).alias("label_values"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.map_values(F.coalesce("out_links", F.create_map()))
                )
            )
        ).alias("urls_size"),
    )
    aggs = [
        F.count(F.lit(1)).alias("size"),
        F.sum("urls_size").alias("urls_total"),
    ]
    if collect_urls:
        aggs.append(F.collect_list("url").alias("urls"))
    sizes = base.groupBy("candidate_id").agg(*aggs)
    link_df = (
        base.select("candidate_id", F.explode_outer("link_schema").alias("xpath"))
        .filter(F.col("xpath").isNotNull())
        .groupBy("candidate_id", "xpath")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("candidate_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("xpath", "n"))
            ).alias("link_df")
        )
    )
    label_df = (
        base.select(
            "candidate_id", F.explode_outer("label_values").alias("xpath", "text")
        )
        .filter(F.col("xpath").isNotNull())
        .groupBy("candidate_id", "xpath", "text")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("candidate_id")
        .agg(
            F.collect_list(F.struct("xpath", "text", "n")).alias("label_counts")
        )
    )
    return (
        sizes.join(link_df, "candidate_id", "left")
        .join(label_df, "candidate_id", "left")
    )


def global_idf(pages: DataFrame) -> dict[str, float]:
    """idf(xp) = ln(N / df(xp)) over all pages' full schemas
    (``ModelCostCalculator.java:57-59``)."""
    n = pages.count()
    schema = F.array_union(
        F.array_sort("link_schema"),
        F.array_sort(F.map_keys(F.coalesce("label_values", F.create_map()))),
    )
    df_rows = (
        pages.select(F.explode(schema).alias("xpath"))
        .groupBy("xpath")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    return {r["xpath"]: math.log(n / r["df"]) for r in df_rows}


# --------------------------------------------------------------------------
# driver stage: mergeable cluster statistics + exact reference decisions


@dataclass
class ClusterStats:
    cid: str
    size: int
    urls_total: int
    urls: list
    link_df: dict            # xpath -> #pages containing it
    label_counts: dict       # (xpath, text) -> count
    members: list = field(default_factory=list)  # collapsed candidate ids

    def __post_init__(self):
        if not self.members:
            self.members = [self.cid]

    @classmethod
    def from_row(cls, r) -> "ClusterStats":
        lc = {}
        for e in r["label_counts"] or []:
            lc[(e["xpath"], e["text"])] = e["n"]
        return cls(
            cid=r["candidate_id"],
            size=r["size"],
            urls_total=r["urls_total"] or 0,
            urls=list(r["urls"]) if "urls" in r.__fields__ else [],
            link_df=dict(r["link_df"] or {}),
            label_counts=lc,
            members=[r["candidate_id"]],
        )

    # -- derived schemas ------------------------------------------------
    @property
    def label_df(self) -> dict:
        out: dict[str, int] = {}
        for (xp, _t), n in self.label_counts.items():
            out[xp] = out.get(xp, 0) + n
        return out

    @property
    def label_schema(self) -> set:
        """xpaths whose text repeats on >=2 pages (ModelPageClass:89-98)."""
        return {xp for (xp, _t), n in self.label_counts.items() if n >= 2}

    @property
    def schema(self) -> set:
        return set(self.link_df) | set(self.label_df)

    def merge(self, other: "ClusterStats") -> "ClusterStats":
        lc = dict(self.label_counts)
        for k, n in other.label_counts.items():
            lc[k] = lc.get(k, 0) + n
        ld = dict(self.link_df)
        for k, n in other.link_df.items():
            ld[k] = ld.get(k, 0) + n
        return ClusterStats(
            cid=self.cid,
            size=self.size + other.size,
            urls_total=self.urls_total + other.urls_total,
            urls=self.urls + other.urls,
            link_df=ld,
            label_counts=lc,
            members=self.members + other.members,
        )


def distance(c1: ClusterStats, c2: ClusterStats) -> float:
    """Unweighted symmetric-difference distance (ModelCostCalculator:170)."""
    s1, s2 = c1.schema, c2.schema
    union = len(s1 | s2)
    if union == 0:
        return 0.0
    return len(s1 ^ s2) / union


def collapsed(
    clusters: list[ClusterStats], pred, allowed_pairs: set | None = None
) -> list[ClusterStats]:
    """The reference's in-place pairwise collapse loop
    (``DynamicModeler.collapsed:224-241``): i ascending, j descending,
    merge j into i when pred holds. ``allowed_pairs`` (from the LSH
    pruning) skips the predicate for pairs no member of which co-banded —
    the loop order and merge semantics are unchanged."""
    items: list[ClusterStats | None] = list(clusters)

    def may_match(a: ClusterStats, b: ClusterStats) -> bool:
        if allowed_pairs is None:
            return True
        return any(
            (m1, m2) in allowed_pairs or (m2, m1) in allowed_pairs
            for m1 in a.members
            for m2 in b.members
        )

    for i in range(len(items)):
        for j in range(len(items) - 1, i, -1):
            ci, cj = items[i], items[j]
            if (
                ci is not None
                and cj is not None
                and may_match(ci, cj)
                and pred(ci, cj)
            ):
                items[i] = ci.merge(cj)
                items[j] = None
    return [c for c in items if c is not None]


class CostModel:
    """Exact reference MDL cost from mergeable stats
    (``ModelCostCalculator.java:70-127``)."""

    def __init__(self, idf: dict[str, float]):
        self.idf = idf

    def tf_idf(self, xp: str, c: ClusterStats, df: int) -> float:
        return (df / c.size) * self.idf.get(xp, 0.0)

    def cost(self, c: ClusterStats) -> float:
        links, labels = c.link_df, c.label_df
        lbl_schema = c.label_schema
        total = 0.0
        # class schema encoding: link xpaths + label-schema xpaths
        for xp, df in links.items():
            total += C_XP / (self.tf_idf(xp, c, df) + 1)
        for xp in lbl_schema:
            total += C_XP / (self.tf_idf(xp, c, labels[xp]) + 1)
        # page costs, aggregated per xpath:
        #   indexesLinks: every page containing xp pays C_I/(tfidf+1)
        #   missingLinks: pages NOT containing xp pay C_XP/(tfidf+1)
        for xp, df in links.items():
            w = self.tf_idf(xp, c, df) + 1
            total += df * C_I / w + (c.size - df) * C_XP / w
        # labels: indexes only for xpaths in the class label schema;
        # missing for class-label xpaths absent from a page
        for xp in lbl_schema:
            df = labels[xp]
            w = self.tf_idf(xp, c, df) + 1
            total += df * C_I / w + (c.size - df) * C_XP / w
        total += C_U * c.urls_total
        return total

    def model_cost(self, clusters: list[ClusterStats]) -> float:
        return sum(self.cost(c) for c in clusters)


def mdl_update(
    model: list[ClusterStats], candidates: list[ClusterStats], cost: CostModel
) -> list[ClusterStats]:
    """Sequential MDL merge (``DynamicModeler.updateModel:408-422``):
    for each candidate, pick min-cost between adding it as a new class or
    merging it into one existing class."""
    for cand in candidates:
        best = model + [cand]
        best_cost = cost.model_cost(best)
        for i, c in enumerate(model):
            merged = model[:i] + model[i + 1 :] + [c.merge(cand)]
            mc = cost.model_cost(merged)
            if best_cost > mc:
                best, best_cost = merged, mc
        model = best
    return model


# --------------------------------------------------------------------------
# LSH pair pruning (scale path for C3 over many candidates)


def schema_minhash_sig(schema_col, num_perm: int = 32):
    """Fixed-length MinHash signature of a set-valued (array) column,
    entirely JVM-side: per-element xxhash64, then ``num_perm`` splitmix
    remixes, min per permutation. Empty sets hash to a sentinel."""
    elem_hashes = F.transform(schema_col, lambda x: F.xxhash64(x))
    perms = []
    for i in range(num_perm):
        perms.append(
            F.coalesce(
                F.array_min(
                    F.transform(
                        elem_hashes, lambda h: F.xxhash64(h, F.lit(i))
                    )
                ),
                F.lit(-(1 << 62)),
            )
        )
    return F.array(*perms)


def lsh_schema_pairs(
    summaries: DataFrame,
    num_perm: int = 32,
    bands: int = 16,
) -> DataFrame:
    """Candidate pairs with estimated schema distance < MIN_DISTANCE via
    MinHash banding over schema sets — replaces the O(n²) loop input when
    candidates are many (the C3 scale path). Distance < 0.2 means
    Jaccard similarity > 0.8, so 16 bands × 2 rows catches such pairs
    with P ≈ 1-(1-0.8²)¹⁶ ≈ 0.9997 — a caller collapsing at a different
    threshold must re-derive (bands, rows) for that similarity, which is
    why there is deliberately no threshold parameter here. Verification
    stays exact on the driver over the pruned pair list."""
    from smart_crawler_spark.operators.minhash import lsh_candidate_pairs

    schema_col = F.array_union(
        F.map_keys(F.coalesce("link_df", F.create_map())),
        F.array_distinct(
            F.transform(
                F.coalesce("label_counts", F.array()), lambda s: s["xpath"]
            )
        ),
    )
    sigs = summaries.select(
        F.col("candidate_id"),
        schema_minhash_sig(schema_col, num_perm).alias("sig"),
    )
    return lsh_candidate_pairs(sigs, bands=bands, id_col="candidate_id")


# --------------------------------------------------------------------------
# end-to-end batch modeler


def cluster_pages(
    pages: DataFrame,
    use_lsh_pairs: bool = False,
    collect_urls: bool = False,
) -> tuple[list[ClusterStats], DataFrame]:
    """Full C1→C2→C3→C4→C8(schema part) pipeline.

    ``use_lsh_pairs``: prune the C3/C8 pair loops with MinHash-LSH
    banding (the scale path when candidate clusters are many).
    Returns (final clusters, page→cluster assignment DataFrame).
    """
    with_cand = candidate_clusters(pages).localCheckpoint()
    summaries = cluster_summaries(with_cand, collect_urls=collect_urls)
    allowed = None
    if use_lsh_pairs:
        allowed = {
            (r["id_a"], r["id_b"])
            for r in lsh_schema_pairs(summaries).collect()
        }
    stats = [ClusterStats.from_row(r) for r in summaries.collect()]
    # candidates sorted size-desc (DynamicModeler.toCandidates:263)
    stats.sort(key=lambda c: (-c.size, c.cid))
    # C3 collapse below MIN_DISTANCE
    stats = collapsed(
        stats, lambda a, b: distance(a, b) < MIN_DISTANCE, allowed
    )
    # C4 MDL merge, sequential (model starts empty -> candidates in order)
    cost = CostModel(global_idf(pages))
    model = mdl_update([], stats, cost)
    # C8 final schema collapse (same pruned pair set applies: merging
    # only grows schemas, and near-duplicates were co-banded already)
    model = collapsed(
        model, lambda a, b: distance(a, b) < MIN_DISTANCE, allowed
    )
    # page -> final cluster assignment
    mapping = [
        (member, i) for i, c in enumerate(model) for member in c.members
    ]
    spark = pages.sparkSession
    map_df = spark.createDataFrame(mapping, "candidate_id string, cluster_id int")
    assign = with_cand.join(F.broadcast(map_df), "candidate_id").drop(
        "candidate_id"
    )
    return model, assign

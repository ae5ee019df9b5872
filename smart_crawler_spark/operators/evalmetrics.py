"""Distributed model-evaluation metrics: exact ROC-AUC and calibration
bins over (score, label) columns — the audit every classifier-driven
curation gate (quality filter, language router, toxicity screen) needs
before its threshold is trusted at corpus scale.

Scale shapes:

- ``roc_auc`` is the Mann-Whitney rank-sum identity, computed WITHOUT a
  global sort of the corpus: scores are first aggregated per distinct
  (rounded) value — one corpus-keyed partial-agg shuffle — and the
  prefix count of lower-scoring negatives comes from the same two-phase
  prefix sum as textops.sequence_pack: a per-coarse-bucket window over
  the distinct-score table plus a broadcast of per-bucket offsets (the
  only unpartitioned window is the bucket-count-row offset table).
  The numerator is accumulated in integers (counts and count products),
  so the result is exact and insensitive to float summation order.

- ``calibration_bins`` is one map-side bin assignment + one bounded
  groupBy (n_bins rows out). Per-bin mean score is reconstructed from
  an integer micro-unit sum (scores are rounded to 6 dp first), so the
  reliability table is bit-stable across partitionings and engines.

Both assume probability-like scores in [0, 1] (as produced by
textops.quality_score / hashed_ngram_classifier); roc_auc's coarse
bucketization uses that range. Ties are handled exactly: tied
positives/negatives contribute 1/2 per the Mann-Whitney convention.

Reference parity note: the reference has no model-eval operators; this
extends the LLM-pipeline quality-gate family (quality_score,
hashed_ngram_classifier, quality_gate) with the evaluation side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 64  # coarse prefix-sum buckets over the [0,1] score range


def roc_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` ranking ``label_col`` (boolean),
    tie-aware (Mann-Whitney): AUC = P(score_pos > score_neg)
    + P(score_pos = score_neg)/2. Scores are rounded to 6 dp to make
    tie groups well-defined and SQL-replayable.

    Returns one row: (n_pos, n_neg, auc)."""
    s = F.round(F.col(score_col), 6)
    lab = F.col(label_col).cast("boolean")
    g = (
        df.select(s.alias("s"), lab.alias("_y"))
        .groupBy("s")
        .agg(
            F.sum(F.col("_y").cast("long")).alias("pos"),
            F.sum((~F.col("_y")).cast("long")).alias("neg"),
        )
        .withColumn(
            "bkt",
            F.least(
                F.floor(F.col("s") * _BUCKETS), F.lit(_BUCKETS - 1)
            ).cast("int"),
        )
    )
    in_bucket = (
        Window.partitionBy("bkt")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn(
        "_neg_lt_in", F.coalesce(F.sum("neg").over(in_bucket), F.lit(0))
    )
    # per-bucket totals: <= _BUCKETS rows, the only unpartitioned window
    off_w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        g.groupBy("bkt")
        .agg(F.sum("neg").alias("_bneg"))
        .withColumn(
            "_neg_off", F.coalesce(F.sum("_bneg").over(off_w), F.lit(0))
        )
        .select("bkt", "_neg_off")
    )
    g = g.join(F.broadcast(offsets), "bkt")
    neg_lt = F.col("_neg_lt_in") + F.col("_neg_off")
    # 2*sum(neg_lt*pos) + sum(pos*neg) == 2 * (wins + ties/2), exact ints
    tot = g.agg(
        F.sum(
            (F.lit(2) * neg_lt * F.col("pos") + F.col("pos") * F.col("neg"))
            .cast("decimal(38,0)")
        ).alias("_num2"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    return tot.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            F.col("_num2").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            ),
            6,
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for a probability-like score: equal-width bins
    over [0, 1], per-bin count, mean score (confidence), positive rate
    (empirical accuracy), and |confidence - accuracy| gap — the rows a
    calibration plot / ECE computation reads. Mean score comes from an
    integer micro-unit (1e-6) sum so the table is float-order-stable.

    Returns (bin, n, mean_score, pos_rate, abs_gap) sorted by bin."""
    s = F.round(F.col(score_col), 6)
    lab = F.col(label_col).cast("boolean")
    binned = df.select(
        F.least(F.floor(s * n_bins), F.lit(n_bins - 1))
        .cast("int")
        .alias("bin"),
        F.round(s * 1000000).cast("long").alias("_micro"),
        lab.cast("long").alias("_y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_micro").alias("_sm"),
        F.sum("_y").alias("_np"),
    )
    mean_score = F.round(
        F.col("_sm").cast("double")
        / (F.lit(1000000.0) * F.col("n").cast("double")),
        6,
    )
    pos_rate = F.round(
        F.col("_np").cast("double") / F.col("n").cast("double"), 6
    )
    return (
        agg.select(
            "bin",
            F.col("n").cast("long").alias("n"),
            mean_score.alias("mean_score"),
            pos_rate.alias("pos_rate"),
        )
        .withColumn(
            "abs_gap",
            F.round(F.abs(F.col("mean_score") - F.col("pos_rate")), 6),
        )
        .orderBy("bin")
    )


def ndcg_at_k(
    ranked: DataFrame,
    rels: DataFrame,
    k: int = 10,
    id_col: str = "id",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k (Jarvelin & Kekalainen 2002) of a ranked retrieval list
    against graded relevance labels: DCG = sum over the top-k of
    (2^rel - 1)/log2(rank+1), normalized by the ideal DCG of the k most
    relevant items in the WHOLE label table. The ranking-quality
    counterpart to roc_auc's classification audit.

    Inputs: ``ranked`` carries (id, rank) — a retriever's k-bounded
    output (bm25_topk / cosine_topk / rrf_fuse); ``rels`` carries
    (id, rel) graded relevance. Items missing a label count rel=0.

    Scale shape: the DCG side joins labels onto a <=k-row list; the
    IDCG side is one TakeOrderedAndProject over the label table (top-k
    by relevance — no global sort materialized) plus a k-row window.
    Ties in relevance don't affect IDCG (equal rel => equal gain at
    either position), so the value is deterministic.

    Returns one row: (k, dcg, idcg, ndcg), rounded to 6 dp."""
    gain = (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - 1.0) / F.log2(
        F.col("rank").cast("double") + 1.0
    )
    dcg = (
        ranked.filter(F.col("rank") <= k)
        .join(
            rels.select(F.col(id_col), F.col(rel_col)), id_col, "left"
        )
        .na.fill({rel_col: 0})
        .agg(F.round(F.sum(gain), 6).alias("dcg"))
    )
    ideal = (
        rels.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(rel_col),
            F.row_number()
            .over(
                Window.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
            )
            .alias("rank"),
        )
        .agg(F.round(F.sum(gain), 6).alias("idcg"))
    )
    return dcg.crossJoin(ideal).select(
        F.lit(k).cast("int").alias("k"),
        "dcg",
        "idcg",
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


def cohens_kappa(
    df: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    two binary raters/gates: kappa = (p_o - p_e) / (1 - p_e) with
    observed agreement p_o and chance agreement p_e from the raters'
    marginals. The curation-pipeline use: quantify how much one gate
    (a quality threshold, a classifier) is secretly re-deciding another
    (a language label, a second classifier) beyond chance.

    Scale shape: one map-side boolean projection + one 1-row aggregate
    of four contingency counts; every derived quantity is integer
    arithmetic until the two final divisions, so the statistic is exact
    and partitioning-independent.

    Returns one row: (n, p_o, p_e, kappa), rounded to 6 dp.
    kappa is NULL when p_e = 1 (both raters constant — undefined)."""
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    c = df.agg(
        F.sum((a & b).cast("long")).alias("tt"),
        F.sum((a & ~b).cast("long")).alias("tf"),
        F.sum((~a & b).cast("long")).alias("ft"),
        F.sum((~a & ~b).cast("long")).alias("ff"),
    )
    n = F.col("tt") + F.col("tf") + F.col("ft") + F.col("ff")
    # integer numerators: po_num/n and pe_num/n^2
    po_num = F.col("tt") + F.col("ff")
    pe_num = (F.col("tt") + F.col("tf")) * (F.col("tt") + F.col("ft")) + (
        F.col("ft") + F.col("ff")
    ) * (F.col("tf") + F.col("ff"))
    nd = n.cast("double")
    po = po_num.cast("double") / nd
    pe = pe_num.cast("double") / (nd * nd)
    return c.select(
        n.cast("long").alias("n"),
        F.round(po, 6).alias("p_o"),
        F.round(pe, 6).alias("p_e"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)), 6
        ).alias("kappa"),
    )

"""Change-rate revisit scheduling for recrawl.

The reference crawls each site once (``crawler/CrawlController.java``
runs a frontier to exhaustion); a production crawler must also decide
*when to come back*. The standard model (Cho & Garcia-Molina, "Effective
page refresh policies for web crawlers", TODS 2003) treats page change
as a Poisson process: estimate a per-URL change rate λ from the visit
history, then rank URLs by expected staleness 1 - e^(-λ·age). The
resulting priority feeds the recrawl pool the engine already keeps
(``frontier/checkpoint.py`` ``recrawl_pool``): expired URLs re-enter the
frontier ordered by staleness instead of FIFO.

Scale shape: one window (lag over the visit key) + one aggregate —
both shuffle on the URL key only, map-side partial aggregation applies,
and the "now" constant enters via a broadcast 1-row cross join (no
driver collect). At 10^10 visits the log would be bucketed by
``url_hash`` like the seen table (``sources/bucketed.py``) making the
window exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_HOUR = 3600000000.0


def revisit_priority(
    visits: DataFrame,
    key: str = "url",
    ts_us: str = "ts_us",
    fp: str = "fp",
    tiebreak: str | None = None,
    now_us: int | None = None,
) -> DataFrame:
    """Poisson-staleness revisit priorities from a visit log.

    ``visits`` rows are (key, ts_us, fp): one fetch of ``key`` at
    microsecond timestamp ``ts_us`` observing content fingerprint
    ``fp``. A *change* is a visit whose fingerprint differs from the
    previous visit's (first visit is never a change). Per key:

        lambda_h = changes / span_hours      (0 if a single visit)
        priority = 1 - exp(-lambda_h * age_hours)

    with age measured from the key's last visit to ``now_us`` (default:
    the corpus-wide latest visit). Returns
    ``(key, visits, changes, lambda_h, priority)`` rounded to 6dp.
    """
    order = [F.col(ts_us).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    ch = visits.withColumn("_prev", F.lag(fp).over(w)).withColumn(
        "_chg",
        (F.col("_prev").isNotNull() & (F.col(fp) != F.col("_prev"))).cast(
            "int"
        ),
    )
    agg = ch.groupBy(key).agg(
        F.count("*").alias("visits"),
        F.sum("_chg").alias("changes"),
        F.min(ts_us).alias("_first"),
        F.max(ts_us).alias("_last"),
    )
    if now_us is None:
        now_f = agg.agg(F.max("_last").alias("_now"))
        agg = agg.crossJoin(F.broadcast(now_f))
    else:
        agg = agg.withColumn("_now", F.lit(int(now_us)))
    span_h = (F.col("_last") - F.col("_first")) / F.lit(_US_PER_HOUR)
    lam = F.when(span_h > 0, F.col("changes") / span_h).otherwise(F.lit(0.0))
    age_h = (F.col("_now") - F.col("_last")) / F.lit(_US_PER_HOUR)
    return agg.select(
        key,
        "visits",
        "changes",
        F.round(lam, 6).alias("lambda_h"),
        F.round(F.lit(1.0) - F.exp(-lam * age_h), 6).alias("priority"),
    )

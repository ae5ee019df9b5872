"""smart_crawler_spark — a PySpark-native rebuild of the capabilities of
fcibecchini/smart-crawler (reference at /root/reference, read-only).

Brand-new engine, not a port: the reference is a single-host Akka actor
pipeline (Java 8); this package expresses the same semantics as a
bulk-synchronous DataFrame program — the frontier, seen-set, navigation
model, fetched pages and extracted records are all DataFrames/parquet
snapshot tables, and every per-row computation is a vectorized
pandas/Arrow UDF or a native Catalyst expression.

Layout:
  session      — SparkSession factory (Arrow, AQE, UTC, shuffle tuning)
  frontier/    — URL canonicalization, seen-filter dedup, priority queue,
                 politeness budgets, checkpoint/resume  (SURVEY §2.2)
  crawler/     — fetch (corpus join), link/record extraction, crawl engine
                 round loop  (SURVEY §2.3, §3.2)
  modeler/     — structural clustering: schema groupby, distance merge,
                 MDL, model graph, golden eval  (SURVEY §2.4–2.5)
  operators/   — training-data pipeline ops: dedup (exact/MinHash/SimHash/
                 jaccard/embedding), ANN search, text analysis
  functions/   — shared column expressions + pure-Python kernels (png codec,
                 phash, xpath lattice)
  datagen/     — deterministic synthetic site graph + image/caption corpus
  sources/     — target-CSV model loader, golden-model loader
"""

__version__ = "0.1.0"

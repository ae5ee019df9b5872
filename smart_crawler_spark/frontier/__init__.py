from smart_crawler_spark.frontier.canonical import (
    canonical_relative_url,
    url_host,
    url_seen_key,
)
from smart_crawler_spark.frontier.dedup import SeenFilter, dedup_new_urls
from smart_crawler_spark.frontier.queue import (
    FRONTIER_ORDER,
    pick_batch,
    priority_rank,
)
from smart_crawler_spark.frontier.checkpoint import CrawlCheckpoint
from smart_crawler_spark.frontier.cuckoo import CuckooFilter
from smart_crawler_spark.frontier.dedup import BloomConfig
from smart_crawler_spark.frontier.robots import RobotsPolicy
from smart_crawler_spark.frontier.spill import BoundedFrontierQueue

__all__ = [
    "canonical_relative_url",
    "url_host",
    "url_seen_key",
    "SeenFilter",
    "dedup_new_urls",
    "FRONTIER_ORDER",
    "pick_batch",
    "priority_rank",
    "CrawlCheckpoint",
    "CuckooFilter",
    "BloomConfig",
    "RobotsPolicy",
    "BoundedFrontierQueue",
]

"""F3 bounded frontier + FIFO spill: port of the reference's
CrawlQueueTest.java:119-215 against frontier/spill.py, plus the oracle
integration (frontier_heap flag). No Spark needed."""

from smart_crawler_spark.crawler.oracle import _Entry, crawl_site
from smart_crawler_spark.frontier.spill import BoundedFrontierQueue


def _e(depth: int, name: str, url: str) -> _Entry:
    return _Entry(depth, name, url, "")


# reference fixtures: class1 depth 0, class2 depth 1, class3 depth 2
def c1(url: str) -> _Entry:
    return _e(0, "class1", url)


def c2(url: str) -> _Entry:
    return _e(1, "class2", url)


def c3(url: str) -> _Entry:
    return _e(2, "class3", url)


def test_add_stores_overflow_in_file_order():
    """CrawlQueueTest.testAdd_storeOnFile:119-135 — the first overflow
    row on the spill side is the displaced/overflowing URL."""
    q = BoundedFrontierQueue(2)
    q.add(c1("http://localhost"))
    q.add(c1("http://localhost/test"))
    q.add(c1("http://localhost/directory"))
    # /directory < /test, so the in-memory worst (/test) is displaced
    # to the file — the reference asserts curl2's relative URL as the
    # first storage row
    assert q.spilled == [c1("http://localhost/test")]


def test_next_all_in_memory():
    """CrawlQueueTest.testNext_allInMemory:137-154 — pure best-first
    while memory suffices."""
    q = BoundedFrontierQueue(2)
    u1, u2 = c1("http://localhost"), c2("http://localhost/test")
    u3 = c2("http://localhost/directory")
    q.add(u2)
    q.add(u1)
    assert q.next() == u1
    assert q.next() == u2
    q.add(u3)
    assert q.next() == u3


def test_next_retrieve_from_file_is_fifo_when_max_1():
    """CrawlQueueTest.testNext_retrieveFromFile:157-175 — with max=1
    the observable policy degrades to FIFO."""
    q = BoundedFrontierQueue(1)
    u1 = c1("http://localhost")
    u2 = c2("http://localhost/test")
    u4 = c3("http://localhost/index")
    u3 = c1("http://localhost/directory")
    q.add(u1)
    q.add(u2)
    q.add(u4)
    q.add(u3)
    assert [q.next() for _ in range(4)] == [u1, u2, u4, u3]


def test_next_retrieve_from_file2_mixed():
    """CrawlQueueTest.testNext_retrieveFromFile2:177-215 — better URLs
    displace the in-memory worst; spill batches reload in file order."""
    q = BoundedFrontierQueue(4)
    u = {
        1: c1("http://localhost"), 2: c2("http://localhost/2"),
        3: c1("http://localhost/3"), 4: c3("http://localhost/4"),
        5: c3("http://localhost/5"), 6: c3("http://localhost/6"),
        7: c3("http://localhost/7"), 8: c3("http://localhost/8"),
        9: c2("http://localhost/9"), 10: c2("http://localhost/10"),
        11: c2("http://localhost/11"), 12: c1("http://localhost/122"),
    }
    for k in (1, 2, 4, 3, 5, 6, 7, 8, 9, 10, 11, 12):
        q.add(u[k])
    assert [q.next() for _ in range(4)] == [u[1], u[12], u[3], u[10]]


def test_oracle_heap_flag_degrades_order_not_set(site_rows_model=None):
    """With frontier_heap < frontier the oracle's crawl ORDER changes
    (FIFO degradation) but the fetched URL SET does not; with heap >=
    frontier the order equals the unbounded best-first order."""
    from smart_crawler_spark.datagen.site import (
        SiteConfig,
        all_rows,
        target_tsv,
    )
    from smart_crawler_spark.sources.targets import load_target_tsv

    cfg = SiteConfig(n_hosts=1, dirs=3, chain=2, details_per_page=3,
                     n_images=10)
    rows = all_rows(cfg)
    pages = {r["url"]: r for r in rows}
    model = load_target_tsv(target_tsv(cfg))
    seed = f"http://{cfg.host(0)}/"

    unbounded = crawl_site(pages, model, seed)
    big_heap = crawl_site(pages, model, seed, frontier_heap=10_000)
    tiny_heap = crawl_site(pages, model, seed, frontier_heap=2)

    assert [o["url"] for o in big_heap.order] == [
        o["url"] for o in unbounded.order
    ]
    assert tiny_heap.seen == unbounded.seen  # same coverage
    assert {o["url"] for o in tiny_heap.order} == {
        o["url"] for o in unbounded.order
    }
    # …but the dequeue ORDER visibly degrades
    assert [o["url"] for o in tiny_heap.order] != [
        o["url"] for o in unbounded.order
    ]

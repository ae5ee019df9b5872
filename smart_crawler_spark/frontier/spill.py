"""F3: bounded in-memory frontier with FIFO spill — reference-exact
emulation of ``actors/frontier/CrawlQueue.java:130-204``.

The reference keeps at most ``max`` CrawlURLs in a TreeSet; when full,
an arriving URL either displaces the in-memory worst (if strictly
higher priority — ``addToQueue:138-150``) or goes straight to a CSV
appended FIFO (``enqueue:158-170``). When the memory side drains,
the next ``max`` rows are reloaded in FILE ORDER (``dequeue:172-204``)
— so global priority is NOT preserved across spill batches and the
observable dequeue order degrades toward FIFO as ``max`` shrinks
(pinned by ``CrawlQueueTest.java:157-215``).

The Spark engine never needs this mechanism — its frontier IS a table
and Spark spills natively — but the *observable semantics* matter for
exact-order matching against reference deployments running with
``frontierheap`` smaller than the frontier. The pure-Python crawl
oracle (``crawler/oracle.py``) takes a ``frontier_heap`` flag that
routes its queue through this class; with the default (heap ≥
frontier) it never spills and the order is the pure best-first one.
"""

from __future__ import annotations

import bisect
from collections import deque

UNBOUNDED = 1 << 60


class BoundedFrontierQueue:
    """Priority queue with the reference's bounded-memory + FIFO-spill
    observable semantics. Entries must be mutually comparable (the
    frontier total order); ties on arrival go to the spill side, like
    ``curl.compareTo(last) <= -1`` admitting only strictly-better URLs.
    """

    def __init__(self, max_mem: int = UNBOUNDED):
        if max_mem < 1:
            raise ValueError("max_mem must be >= 1")
        self.max = max_mem
        self._mem: list = []       # sorted ascending (TreeSet)
        self._spill: deque = deque()  # FIFO file side

    def __len__(self) -> int:
        return len(self._mem) + len(self._spill)

    @property
    def spilled(self) -> list:
        """Spill-side contents in file order (CrawlQueueTest:119-135)."""
        return list(self._spill)

    def add(self, entry) -> None:
        """CrawlQueue.addToQueue: insert in memory if space; else the
        strictly-better entry displaces the in-memory worst, which is
        appended to the spill FIFO; otherwise the entry itself spills."""
        if len(self._mem) < self.max:
            bisect.insort(self._mem, entry)
            return
        worst = self._mem[-1]
        if entry < worst:
            self._mem.pop()
            bisect.insort(self._mem, entry)
            self._spill.append(worst)
        else:
            self._spill.append(entry)

    def next(self):
        """CrawlQueue.next: refill memory with the next ``max`` spill
        rows in FILE order when empty, then pop the in-memory best
        (which may be worse than URLs still in later spill batches —
        the documented degradation). None when exhausted."""
        if not self._mem and self._spill:
            for _ in range(min(self.max, len(self._spill))):
                bisect.insort(self._mem, self._spill.popleft())
        if not self._mem:
            return None
        return self._mem.pop(0)

"""Query result cache — the SolrIndexSearcher queryResultCache analogue.

References:
  - solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java
    (getDocListC: the (query, filters, sort) key; queryResultWindowSize
    rounds the requested page up so nearby pages hit the same entry;
    queryResultMaxDocsCached caps what gets inserted);
  - solr/core/src/java/org/apache/solr/search/LRUCache.java.

Spark shape: the cached value is the COLLECTED superset window (a
top-k page is small by construction — this is driver-edge state, like
Solr's DocList), so a hit serves any page inside the window with zero
Spark jobs. Keys normalize fq order, as Solr's QueryResultKey does.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable


class QueryResultCache:
    """LRU of collected top-k windows keyed by (q, sorted fq, sort)."""

    def __init__(
        self,
        max_size: int = 32,
        window_size: int = 20,
        max_docs_cached: int = 200,
    ):
        self.max_size = int(max_size)
        self.window_size = max(1, int(window_size))
        self.max_docs_cached = int(max_docs_cached)
        self._items: OrderedDict[tuple, list] = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.inserts = 0
        self.evictions = 0

    @staticmethod
    def key(q: str, fq: list[str] | None, sort: str | None) -> tuple:
        # QueryResultKey: filter order must not matter
        return (q, tuple(sorted(fq or [])), sort or "score desc")

    def get_page(
        self,
        q: str,
        fq: list[str] | None,
        sort: str | None,
        start: int,
        rows: int,
        fetch_window: Callable[[int], list[Any]],
    ) -> list[Any]:
        """Serve rows [start, start+rows) — from the cached window when
        it covers the slice, else by fetching a window rounded up to
        ``window_size`` (getDocListC's supersetMaxDoc) and inserting it
        (unless it exceeds ``max_docs_cached``)."""
        k = self.key(q, fq, sort)
        need = start + rows
        win = self._items.get(k)
        # a cached window covers the request if it reaches `need` OR it
        # is the COMPLETE result (shorter than the window it asked for)
        if win is not None and (
            len(win["rows"]) >= need or len(win["rows"]) < win["asked"]
        ):
            self._items.move_to_end(k)
            self.hits += 1
            return win["rows"][start:need]
        self.misses += 1
        asked = (
            (need + self.window_size - 1) // self.window_size
        ) * self.window_size
        rows_out = fetch_window(asked)
        if asked <= self.max_docs_cached:
            self._items[k] = {"rows": rows_out, "asked": asked}
            self._items.move_to_end(k)
            self.inserts += 1
            while len(self._items) > self.max_size:
                self._items.popitem(last=False)
                self.evictions += 1
        return rows_out[start:need]


def cached_select(
    cache: QueryResultCache,
    searcher,
    q: str,
    fq: list[str] | None = None,
    sort: str | None = None,
    start: int = 0,
    rows: int = 10,
    **select_kwargs,
) -> list:
    """handler.select through the queryResultCache: a hit answers the
    page without touching Spark."""
    from .handler import select

    def fetch(asked: int) -> list:
        out = select(
            searcher, q=q, fq=fq, sort=sort, start=0, rows=asked,
            **select_kwargs,
        )
        return out["response"].collect()

    return cache.get_page(q, fq, sort, start, rows, fetch)

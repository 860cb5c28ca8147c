"""Filter cache — the SolrIndexSearcher filterCache analogue.

References:
  - solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java
    (getDocSet routes every fq through the filterCache; cache hits skip
    re-collecting the DocSet);
  - solr/core/src/java/org/apache/solr/search/LRUCache.java (size-
    bounded LRU with hit/miss/eviction stats);
  - lucene/core/src/java/org/apache/lucene/search/
    CachingWrapperFilter.java (the per-filter caching wrapper).

Spark shape: a cached filter is the doc_id DataFrame ``persist()``-ed
(memory-and-disk, exactly the role of Solr's DocSet bitsets); eviction
``unpersist()``-s. The cache key is the caller's filter expression
string — the same normalized-fq keying SolrIndexSearcher uses. At
10^12 docs a cached doc set is a distributed persisted dataset, not a
driver object, so capacity scales with the cluster, and every repeated
fq skips its postings/scan work just like the reference skips its
DocSet collection.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame


class FilterCache:
    """Size-bounded cache of persisted doc-set DataFrames.

    ``policy="lru"`` evicts least-recently-used (LRUCache.java);
    ``policy="lfu"`` least-frequently-used with recency tie-break
    (solr/core/.../search/LFUCache.java / ConcurrentLFUCache — the
    cache Solr recommends for filterCache, where a hot fq should
    survive bursts of one-off filters)."""

    def __init__(self, max_size: int = 64, policy: str = "lru"):
        if policy not in ("lru", "lfu"):
            raise ValueError(f"unknown eviction policy {policy!r}")
        self.max_size = int(max_size)
        self.policy = policy
        self._items: OrderedDict[str, DataFrame] = OrderedDict()
        self._freq: dict[str, int] = {}
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def get_or_compute(self, key: str, compute) -> DataFrame:
        """Return the cached persisted doc set for ``key``; on a miss,
        call ``compute()`` (-> DataFrame of doc_id), persist it, insert
        LRU-wise, and evict+unpersist the oldest entry past capacity
        (LRUCache.put / removeEldestEntry)."""
        hit = self._items.get(key)
        if hit is not None:
            self.hits += 1
            self._items.move_to_end(key)
            self._freq[key] = self._freq.get(key, 0) + 1
            return hit
        self.misses += 1
        df = compute().persist()
        self._items[key] = df
        self._freq[key] = 1
        if len(self._items) > self.max_size:
            if self.policy == "lfu":
                # ConcurrentLFUCache.markAndSweep: evict the lowest
                # hit count; OrderedDict order (insertion/recency)
                # breaks ties toward the stalest entry
                victim = min(
                    self._items, key=lambda k: self._freq.get(k, 0)
                )
            else:
                victim = next(iter(self._items))
            old = self._items.pop(victim)
            self._freq.pop(victim, None)
            old.unpersist()
            self.evictions += 1
        return df

    def clear(self) -> None:
        for df in self._items.values():
            df.unpersist()
        self._items.clear()
        self._freq.clear()

    def stats(self) -> dict:
        """LRUCache.getStatistics analogue."""
        return {
            "size": len(self._items),
            "hits": self.hits,
            "misses": self.misses,
            "evictions": self.evictions,
        }

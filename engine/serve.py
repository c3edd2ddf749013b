"""Distributed query serving: a pool of query actors holding warm readers.

The reference serves queries from one Streamlit process with
`@st.cache_resource` singletons (/root/reference/streamlit_app.py:52-59) and
lets Postgres parallelize internally.  Our engine's equivalent at cluster
scale is a pool of Ray actors, each holding an `IndexReader` (segment-bucket
caches, doc metadata, df table) for its whole lifetime — the SURVEY.md §7.3
"query-side segment cache" actor.  Queries fan out round-robin; each actor
answers independently, so QPS scales with the pool while every answer stays
rank-identical to a local reader.

This is the one place the engine uses raw @ray.remote actors instead of a
Dataset: a serving pool is persistent mutable state + request/response, which
the Dataset API intentionally does not model.
"""

from __future__ import annotations

import ray

from .query import IndexReader


@ray.remote
class QueryActor:
    def __init__(self, index_dir: str):
        self.reader = IndexReader(index_dir)
        # warm the hot caches so first queries don't pay cold reads
        self.reader._load_docmeta()

    def search(self, query_text: str, **kw) -> list[tuple[int, float]]:
        return self.reader.search(query_text, **kw)

    def search_batch(self, queries: list[dict]) -> list[list[tuple[int, float]]]:
        return [self.reader.search(q.pop("query_text"), **q) for q in queries]


class QueryPool:
    """Round-robin pool of QueryActors over one index."""

    def __init__(self, index_dir: str, num_actors: int = 4, num_cpus: float = 1):
        self.actors = [
            QueryActor.options(num_cpus=num_cpus).remote(index_dir)
            for _ in range(num_actors)
        ]
        self._i = 0

    def _next(self):
        a = self.actors[self._i % len(self.actors)]
        self._i += 1
        return a

    def search(self, query_text: str, **kw):
        return ray.get(self._next().search.remote(query_text, **kw))

    def search_many(self, queries: list[dict]) -> list[list[tuple[int, float]]]:
        """Fan a query list across the pool; results in input order."""
        shards: list[list[tuple[int, dict]]] = [[] for _ in self.actors]
        for j, q in enumerate(queries):
            shards[j % len(self.actors)].append((j, dict(q)))
        futs = [
            self.actors[i].search_batch.remote([q for _, q in shard])
            for i, shard in enumerate(shards)
            if shard
        ]
        out: list = [None] * len(queries)
        live = [shard for shard in shards if shard]
        for shard, res in zip(live, ray.get(futs)):
            for (j, _), r in zip(shard, res):
                out[j] = r
        return out

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

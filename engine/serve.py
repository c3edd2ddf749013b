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

    def search_boolean(self, query_text: str, **kw) -> list[tuple[int, float]]:
        return self.reader.search_boolean(query_text, **kw)

    def search_batch(self, queries: list[dict]) -> list[list[tuple[int, float]]]:
        return [self.reader.search(q.pop("query_text"), **q) for q in queries]

    def suggest(self, term: str):
        return self.reader.suggest(term)


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

    def search_boolean(self, query_text: str, **kw):
        return ray.get(self._next().search_boolean.remote(query_text, **kw))

    def suggest(self, term: str):
        return ray.get(self._next().suggest.remote(term))

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


# ---------------------------------------------------------------------------
# Doc-sharded serving: corpus size scales with the shard count
# ---------------------------------------------------------------------------


@ray.remote
class ShardQueryActor:
    """Owns ONE doc-shard index; scores with corpus-GLOBAL statistics.

    Per-actor state is O(corpus/S): its shard's docmeta, doclens and segment
    caches.  Only the df map is vocab-sized (at 10^12 docs that table is
    itself hash-sharded; here it rides the object store as one broadcast).
    """

    def __init__(self, index_dir: str, global_df, global_n_docs: int):
        # global_df is an ObjectRef to the term-SORTED Arrow (term, df)
        # table; Ray dereferences it on delivery, so each actor reads the
        # one object-store copy and wraps it in a searchsorted-backed map —
        # no vocab-sized Python dict is built anywhere
        from .query import SortedTermMap

        self.reader = IndexReader(index_dir)
        self.reader._df = SortedTermMap.from_arrow(global_df)
        self.reader.n_docs = global_n_docs
        self.reader._load_docmeta()

    def search(self, query_text: str, **kw) -> list[tuple[int, float]]:
        return self.reader.search(query_text, **kw)

    def search_boolean(self, query_text: str, **kw) -> list[tuple[int, float]]:
        # boolean eligibility is doc-local (must/not masks, phrase
        # adjacency all resolve within the doc's own shard) and scores use
        # the injected GLOBAL df, so shard-local boolean top-k merges
        # exactly like plain search.  A required term missing from THIS
        # shard empties the local presence mask, not the global result.
        return self.reader.search_boolean(query_text, **kw)

    def suggest(self, term: str):
        # the injected GLOBAL df map means the delete index spans the whole
        # corpus vocabulary: any single shard actor answers exactly
        return self.reader.suggest(term)


def build_sharded(
    input_path: str | list[str], root: str, num_shards: int, **build_kw
) -> list[str]:
    """Build `num_shards` doc-sharded indexes whose merged top-k is
    rank-identical to one big index over the same corpus.

    Input FILES round-robin across shards (a doc lives in one file, so file
    granularity shards docs); the keep-latest loser set is computed over the
    WHOLE corpus so cross-shard re-crawls dedup correctly; pass A stops
    after ingest, the corpus-global avgdl is derived from the shard
    manifests, and pass B (which skips the checkpointed ingest) compresses
    segments with the global avgdl baked into every impact.  This is the
    10^12-doc layout: each shard is an independent, resumable build over its
    slice of the corpus.
    """
    import os

    from .build import build_index

    if isinstance(input_path, str):
        files = sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    else:
        files = sorted(input_path)
    shard_files = [files[s::num_shards] for s in range(num_shards)]
    shard_dirs = [os.path.join(root, f"shard-{s:03d}") for s in range(num_shards)]
    n_docs = 0
    total_tokens = 0
    for sf, sd in zip(shard_files, shard_dirs):
        m = build_index(
            sf, sd, loser_files=files, stop_after_postings=True, **build_kw
        )
        n_docs += m["n_docs"]
        total_tokens += m["total_tokens"]
    avgdl = float(total_tokens) / n_docs if n_docs else 0.0
    for sf, sd in zip(shard_files, shard_dirs):
        build_index(sf, sd, loser_files=files, avgdl_override=avgdl, **build_kw)
    return shard_dirs


class ShardedQueryPool:
    """Scatter-gather over doc-shard actors; exact, rank-identical top-k.

    Every shard scores its own docs COMPLETELY (per-doc BM25 needs all of a
    doc's term postings, which doc-sharding keeps co-located — the reason
    web-search engines shard by document, not term), so merging the shards'
    local top-k by (score DESC, doc_id ASC) is exact."""

    def __init__(self, shard_dirs: list[str], num_cpus: float = 1):
        import json as _json

        import pyarrow.dataset as pads

        # global df = sum of the shards' exact per-term dfs, reduced with one
        # Arrow group_by over all shards' dfs/ tables and SORTED BY TERM —
        # everything stays Arrow end-to-end (round 2 accumulated a Python
        # dict term-by-term; round 3 still converted the grouped table to a
        # vocab-sized Python dict on the driver — tens of GB single-threaded
        # at web vocabulary).  The sorted table rides the object store once;
        # each actor answers lookups via searchsorted (SortedTermMap).  At
        # 10^12 docs the same table is hash-sharded by term instead.
        import pyarrow as pa

        t = pads.dataset(
            [pads.dataset(f"{d}/dfs") for d in shard_dirs]
        ).to_table()
        g = t.group_by("term").aggregate([("df", "sum")]).sort_by("term")
        df_tbl = pa.table(
            {"term": g["term"], "df": g["df_sum"].cast(pa.int64())}
        )
        n_docs = 0
        for d in shard_dirs:
            with open(f"{d}/stats.json") as f:
                n_docs += _json.load(f)["n_docs"]
        df_ref = ray.put(df_tbl)
        self.n_docs = n_docs
        # a pool that overcommits the cluster leaves pending actors forever
        # and every scatter-gather ray.get blocks on them — shrink per-actor
        # cpus so all shards schedule (serving actors are latency-bound)
        avail = ray.cluster_resources().get("CPU", 0)
        if avail and len(shard_dirs) * num_cpus > avail:
            num_cpus = max(avail / (2 * len(shard_dirs)), 0.05)
        self.actors = [
            ShardQueryActor.options(num_cpus=num_cpus).remote(d, df_ref, n_docs)
            for d in shard_dirs
        ]

    def search(self, query_text: str, k: int = 10, **kw):
        futs = [a.search.remote(query_text, k=k, **kw) for a in self.actors]
        merged = [hit for res in ray.get(futs) for hit in res]
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]

    def search_boolean(self, query_text: str, k: int = 10, **kw):
        futs = [
            a.search_boolean.remote(query_text, k=k, **kw) for a in self.actors
        ]
        merged = [hit for res in ray.get(futs) for hit in res]
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]

    def suggest(self, term: str):
        a = self.actors[0]
        return ray.get(a.suggest.remote(term))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

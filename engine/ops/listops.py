"""List-typed columns: unnest + array-overlap (SURVEY.md §2.5 A2, §2.8).

The reference models authors/categories as Postgres TEXT[] with unnest and
`&&` overlap filters (/root/reference/rds_schema.sql:3-10,
/root/reference/streamlit_app.py:74-79,189-191).  The engine analog is an
Arrow `list_(string())` column processed with the vectorized list kernels
(`list_flatten` + `list_parent_indices`) — token strings never surface as
Python objects.

The testdata carries no list column, so `authors` is DERIVED deterministically
from doc_id (1-3 authors, ids coprime-spread mod 50) — the same formula is a
CASE expression in the DuckDB oracle, so both ops are hash-checked end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

NUM_AUTHORS = 50
OVERLAP_PROBE = ["author_3", "author_19", "author_42"]


def authors_of(doc_ids: np.ndarray) -> pa.ListArray:
    """doc_id -> list<string> of 1 + doc_id%3 authors, vectorized.

    author_i = 'author_' || (doc_id*7 + i*13) % 50; 13 is coprime to 50 so a
    doc's authors are distinct."""
    n_auth = (1 + doc_ids % 3).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(n_auth)))
    parent = np.repeat(np.arange(len(doc_ids)), n_auth)
    i_within = np.arange(len(parent)) - offsets[parent]
    author_num = (doc_ids[parent] * 7 + i_within * 13) % NUM_AUTHORS
    # dictionary-style construction: 50 distinct strings built once
    vocab = pa.array([f"author_{k}" for k in range(NUM_AUTHORS)], pa.string())
    flat = vocab.take(pa.array(author_num, pa.int64()))
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)


def _with_authors(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column("authors", authors_of(ids))


def authors_unnest_distinct(sf_dir: str) -> rd.Dataset:
    """A2: unnest the list column -> (author, n_docs), author-sorted.

    Map-side: flatten each batch's lists and pre-count (author occurs at
    most once per doc, so n_docs = row count) -> tiny (author, cnt) rows;
    reduce: groupby(author).sum — a 50-row shuffle regardless of corpus
    size."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        authors = authors_of(ids)
        flat = authors.flatten()
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(de.dictionary))
        return pa.table(
            {
                "author": de.dictionary,
                "cnt": pa.array(cnt[: len(de.dictionary)], pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    parts = ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
    out = parts.groupby("author").sum("cnt")
    out = out.map_batches(
        lambda t: t.rename_columns(["author", "n_docs"]),
        batch_format="pyarrow", batch_size=None,
    )
    return out.sort("author")


def docs_author_overlap(sf_dir: str) -> rd.Dataset:
    """§2.8 `authors && probe` filter -> (doc_id, authors_str), id-sorted.

    Vectorized overlap: flatten lists, is_in against the (broadcast-small)
    probe set, OR-reduce per parent row via bincount — no Python loop, no
    shuffle (pure map + filter)."""
    probe = pa.array(OVERLAP_PROBE, pa.string())

    def overlap(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        authors = authors_of(ids)
        hit = pc.is_in(authors.flatten(), value_set=probe).to_numpy(
            zero_copy_only=False
        )
        parent = pc.list_parent_indices(authors).to_numpy(zero_copy_only=False)
        n_hits = np.bincount(parent[hit], minlength=len(ids))
        keep = n_hits > 0
        sub = batch.filter(pa.array(keep))
        sub_authors = authors.filter(pa.array(keep))
        joined = pa.array(
            [",".join(a) for a in sub_authors.to_pylist()], pa.string()
        )  # k<=3 strings per kept row; output is filter-small
        return pa.table(
            {
                "doc_id": sub.column("doc_id"),
                "authors_str": joined,
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(overlap, batch_format="pyarrow", batch_size=None).sort(
        "doc_id"
    )


def _author_expr(i: str) -> str:
    return f"'author_' || CAST((doc_id*7 + {i}*13) % {NUM_AUTHORS} AS VARCHAR)"


_AUTHORS_SQL = f"""
  CASE CAST(doc_id % 3 AS INT)
    WHEN 0 THEN [{_author_expr('0')}]
    WHEN 1 THEN [{_author_expr('0')}, {_author_expr('1')}]
    ELSE [{_author_expr('0')}, {_author_expr('1')}, {_author_expr('2')}]
  END
"""

AUTHORS_UNNEST_SQL = f"""
WITH authored AS (SELECT doc_id, {_AUTHORS_SQL} AS authors FROM documents),
exploded AS (SELECT doc_id, unnest(authors) AS author FROM authored)
SELECT author, count(*) AS n_docs FROM exploded GROUP BY author ORDER BY author
"""

probe_sql = "[" + ", ".join(f"'{a}'" for a in OVERLAP_PROBE) + "]"
AUTHOR_OVERLAP_SQL = f"""
WITH authored AS (SELECT doc_id, {_AUTHORS_SQL} AS authors FROM documents)
SELECT doc_id, array_to_string(authors, ',') AS authors_str
FROM authored
WHERE list_has_any(authors, {probe_sql})
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PageRank over the author collaboration graph — the graph-analytics member
# next to dup_clusters' connected components: distributed edge extraction,
# then power iteration on the author-grain matrix (authors are vocab-like —
# sublinear in corpus size — so the iteration is the documented-small
# driver step, the same size class as the BPE merge table).
_PR_DAMPING = 0.85
_PR_ITERS = 30


def authors_pagerank(sf_dir: str) -> pd.DataFrame:
    """(author, rank_r9): weighted PageRank over the co-authorship graph
    (authors linked once per co-authored doc, edge weight = number of
    shared docs).  Scale shape: per-batch author-pair partials (each doc
    emits <= 3 pairs, vectorized by list length) reduce through ONE
    coarse pair-keyed shuffle to <= C(n_authors, 2) weighted edges; the
    damping-0.85 power iteration then runs 30 rounds on the author-grain
    matrix.  Deterministic; pytest re-derives the whole chain (edges +
    iteration) independently from the author formula and checks bitwise
    equality plus the rank-sum invariant."""
    from ray.data.aggregate import Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_auth = (1 + ids % 3).astype(np.int64)
        a = [(ids * 7 + i * 13) % NUM_AUTHORS for i in range(3)]
        pairs = []
        for i, j in ((0, 1), (0, 2), (1, 2)):
            need = n_auth > max(i, j)
            x, y = a[i][need], a[j][need]
            lo, hi = np.minimum(x, y), np.maximum(x, y)
            pairs.append(np.stack([lo, hi], axis=1))
        p = np.concatenate(pairs)
        key = p[:, 0] * NUM_AUTHORS + p[:, 1]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "a1": pa.array(uniq // NUM_AUTHORS, pa.int64()),
                "a2": pa.array(uniq % NUM_AUTHORS, pa.int64()),
                "w": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    edges = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a1", "a2"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()  # <= C(n_authors, 2) rows
    )
    n = NUM_AUTHORS
    W = np.zeros((n, n))
    if len(edges):
        W[edges["a1"], edges["a2"]] = edges["w"]
        W = W + W.T  # undirected
    deg = W.sum(axis=1)
    # column-stochastic transition; dangling authors redistribute uniformly
    with np.errstate(divide="ignore", invalid="ignore"):
        T = np.where(deg[None, :] > 0, W.T / deg[None, :], 1.0 / n)
    r = np.full(n, 1.0 / n)
    for _ in range(_PR_ITERS):
        r = (1 - _PR_DAMPING) / n + _PR_DAMPING * (T @ r)
    return pd.DataFrame(
        {
            "author": [f"author_{k}" for k in range(n)],
            "rank_r9": np.round(r, 9),
        }
    )

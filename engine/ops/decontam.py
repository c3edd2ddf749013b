"""Benchmark decontamination: flag corpus documents that share token
n-grams with a held-out evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM / Llama all
ship a variant): any training document containing an n-gram that also occurs
in an evaluation benchmark is contamination and must be flagged (and usually
dropped or split).  Scale shape: the benchmark side is SMALL by definition
(eval sets are MBs), so its distinct n-gram set is collected once and
broadcast via ray.put (`ray.put` once, zero-copy read in every task); the
corpus side STREAMS — one vectorized pass per batch, no shuffle at all.

The synthetic stand-in for "the benchmark" is the deterministic corpus slice
``doc_id % 20 == 7`` (the documents table carries near-duplicate recrawls,
so real overlap exists at 4-gram granularity).  N-grams are exact strings
(shared ngram_stream_arrow kernel), so the whole lifecycle is gated against
a pure-SQL oracle that forms the same n-grams with array_to_string slices.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..analyze import ngram_stream_arrow

_DECON_N = 4  # n-gram order (tokens)
_BENCH_MOD = 20
_BENCH_REM = 7


def _read_docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _bench_mask(ids: pa.Array) -> pa.Array:
    return pc.equal(
        pc.subtract(ids, pc.multiply(pc.divide(ids, _BENCH_MOD), _BENCH_MOD)),
        _BENCH_REM,
    )


def benchmark_ngrams(sf_dir: str, n: int = _DECON_N) -> pa.Array:
    """Distinct n-gram strings of the benchmark slice (small side).

    Per-batch distinct via the dictionary encode, then a driver-side unique
    of the per-batch vocabularies — benchmark-scale rows by definition, the
    documented small side of the broadcast."""

    def grams_of_batch(t: pa.Table) -> pa.Table:
        texts = pc.filter(t["text"], _bench_mask(t["doc_id"]))
        codes, _, vocab = ngram_stream_arrow(texts, n)
        present = np.unique(codes)
        return pa.table({"ng": vocab.take(pa.array(present, pa.int64()))})

    parts = _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        grams_of_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # Ray emits zero-column placeholder blocks for empty inputs
    tbl = pa.concat_tables(
        [t for t in (ray.get(r) for r in parts.to_arrow_refs()) if t.num_columns]
    )
    if tbl.num_columns == 0:
        return pa.array([], pa.string())
    col = tbl["ng"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.unique(col)


def decontaminate_docs(sf_dir: str, n: int = _DECON_N):
    """Per non-benchmark doc: how many DISTINCT benchmark n-grams it contains
    -> (doc_id, n_hits, contaminated) for every non-benchmark doc (zeros
    included, so the gate checks the clean docs too).

    The probe is code-level: index_in maps the batch's n-gram VOCABULARY
    (not occurrences) into the broadcast benchmark array once, then the
    occurrence stream is pure numpy — distinct (doc, benchmark-id) pairs via
    one np.unique.  Exact strings end to end: no hash-collision caveat."""
    bench = benchmark_ngrams(sf_dir, n)
    n_bench = len(bench)
    bcast = ray.put(bench)

    def probe_batch(t: pa.Table) -> pa.Table:
        bset = ray.get(bcast)
        keep = pc.invert(_bench_mask(t["doc_id"]))
        t = t.filter(keep)
        n_rows = len(t)
        hits = np.zeros(n_rows, np.int64)
        if n_rows and n_bench:
            codes, parents, vocab = ngram_stream_arrow(t["text"], n)
            if codes.size:
                pos_np = (
                    pc.fill_null(pc.index_in(vocab, value_set=bset), -1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                bench_idx = pos_np[codes]
                valid = bench_idx >= 0
                if valid.any():
                    key = parents[valid] * np.int64(n_bench) + bench_idx[valid]
                    upairs = np.unique(key)
                    np.add.at(hits, (upairs // n_bench).astype(np.int64), 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array((hits > 0).astype(np.int64), pa.int64()),
            }
        )

    return _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        probe_batch, batch_format="pyarrow", zero_copy_batch=True
    )


DECONTAMINATE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(toks) - {_DECON_N - 1}, 0))) AS i,
         toks
  FROM tok
),
ng AS (
  SELECT doc_id, array_to_string(toks[i:i+{_DECON_N - 1}], ' ') AS ng FROM pos
),
bench AS (
  SELECT DISTINCT ng FROM ng WHERE doc_id % {_BENCH_MOD} = {_BENCH_REM}
),
hits AS (
  SELECT n.doc_id, count(DISTINCT n.ng) AS n_hits
  FROM ng n JOIN bench b USING (ng)
  WHERE n.doc_id % {_BENCH_MOD} <> {_BENCH_REM}
  GROUP BY n.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM documents d
LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_BENCH_MOD} <> {_BENCH_REM}
"""

"""Full-engine BM25 search over the relational `documents` table.

This is the flagship pipeline run through the driver's correctness gate: the
whole index build (extract-adapter -> tokenize actor pool -> salted
groupby(term) merge -> compressed segments) plus Block-Max-WAND top-k, with a
pure-SQL BM25 oracle on the same table (tokenizer spec and BM25 formula
mirrored term-for-term; scores compared at 6 decimals because summation
order differs between a distributed engine and a sequential SQL engine).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd

from ..analyze import tokenize
from ..build import build_index
from ..query import IndexReader
from ..schema import B, K1

DOC_QUERIES = [
    "window agg partition",
    "hash join table",
    "slow query scan",
    "customer order line",
    "spark data column batch",
]
K = 10

_reader_cache: dict[str, IndexReader] = {}


def _index_for(sf_dir: str) -> IndexReader:
    """Build (once per sf_dir per process) the documents index under /tmp."""
    key = os.path.abspath(sf_dir)
    if key in _reader_cache:
        return _reader_cache[key]
    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.blake2b(
        f"{key}:{os.path.getsize(src)}".encode(), digest_size=8
    ).hexdigest()
    index_dir = os.path.join(tempfile.gettempdir(), f"rayft_docidx_{tag}")
    build_index(
        src, index_dir, num_partitions=2, input_kind="documents",
        tokenize_batch_size=256,
    )
    reader = IndexReader(index_dir)
    _reader_cache[key] = reader
    return reader


def bm25_docs_topk(sf_dir: str, k: int = K) -> pd.DataFrame:
    """Top-k BM25 per fixed query -> (query_id, rank, doc_id, score_r6).

    Retrieves 2k by exact score, then re-ranks by (round(score,6) DESC,
    doc_id ASC) so the boundary matches the SQL oracle's rounded ordering.
    """
    reader = _index_for(sf_dir)
    rows = []
    for qid, qtext in enumerate(DOC_QUERIES):
        res = reader.search(qtext, k=2 * k)
        res = [(int(np.int64(np.uint64(d))), round(s, 6)) for d, s in res]
        res.sort(key=lambda t: (-t[1], t[0]))
        for rank, (did, s) in enumerate(res[:k], 1):
            rows.append((qid, rank, did, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score_r6"])


def _bm25_docs_sql() -> str:
    values = []
    for qid, qtext in enumerate(DOC_QUERIES):
        for term in sorted(set(tokenize(qtext))):
            values.append(f"({qid}, '{term}')")
    vals = ", ".join(values)
    return f"""
WITH queries(query_id, term) AS (VALUES {vals}),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS tk
  FROM documents
),
tf AS (SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY doc_id, tk),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT tk, count(*) AS df FROM tf GROUP BY tk),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * ((1.0 - {B}) + ({B} * dl.dl) / s.avgdl)) AS c
  FROM queries q
  JOIN tf ON tf.tk = q.term
  JOIN df ON df.tk = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scores AS (SELECT query_id, doc_id, sum(c) AS score FROM contrib GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score_r6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, score_r6 FROM ranked WHERE rank <= {K}
"""


BM25_DOCS_SQL = _bm25_docs_sql()

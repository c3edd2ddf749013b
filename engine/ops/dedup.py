"""Deduplication operators over the `documents` table.

The reference only has exact natural-key dedup (UNIQUE(paper_id, name) upsert,
/root/reference/rds_schema.sql:29 + ec2/rds/upsert.py:29-52 — SURVEY.md §2.7
D1); near-dup operators are the large-scale-training-data extensions:

- exact_dedup        content-hash groupby (D1 generalized to content identity)
- ngram_jaccard_pairs exact token-set Jaccard via a shared-token inverted
                      index (oracle-verifiable in SQL; quadratic in group
                      size — the correctness baseline, not the scale path)
- minhash_lsh_pairs  MinHash signatures + banded LSH (the scale path: the
                      shuffle carries one (band, hash, doc) row per band, and
                      only same-bucket docs pair up)
- simhash_pairs      64-bit SimHash + 4-band blocking for hamming <= k
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..analyze import tokenize

_MERSENNE = (1 << 61) - 1


def _read_docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
def exact_dedup(sf_dir: str):
    """Exact content dedup: md5(text) -> (hash, keep_id=min doc_id, n_dups)."""

    def hash_batch(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        t2 = pa.table({"h": pa.array(hs, pa.string()), "doc_id": t["doc_id"]})
        g = t2.group_by("h").aggregate([("doc_id", "min"), ("doc_id", "count")])
        return pa.table(
            {"h": g["h"], "keep_part": g["doc_id_min"], "n_part": g["doc_id_count"]}
        )

    return (
        _read_docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min("keep_part", alias_name="keep_id"), Sum("n_part", alias_name="n_dups"))
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
def _shingle_rows(t: pa.Table) -> pa.Table:
    """Distinct (doc_id, 3-gram shingle) rows per batch (shingles as the
    joined token-triple string, mirroring the SQL oracle exactly)."""
    doc_ids, shingles = [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = tokenize(text)
        for s in {
            f"{toks[i]} {toks[i + 1]} {toks[i + 2]}" for i in range(len(toks) - 2)
        }:
            doc_ids.append(did)
            shingles.append(s)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "tk": pa.array(shingles, pa.string())}
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8):
    """Exact 3-gram-shingle Jaccard similar pairs (a < b, jaccard >= threshold).

    Plan: distinct (doc, shingle) rows -> groupby(shingle) emits candidate
    pairs (pre-counted per group) -> groupby(pair) sums intersections ->
    sizes are broadcast -> jaccard filter.  Quadratic in shingle-group size,
    which is why the scale path is minhash_lsh_pairs; kept exact here as the
    DuckDB-verifiable baseline.  Docs with < 3 tokens have no shingles and
    never pair (same in the oracle).
    """
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    tok = docs.map_batches(_shingle_rows, batch_format="pyarrow", zero_copy_batch=True)

    # doc -> |token set|  (small: one row per doc)
    def size_batch(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("tk", "count")])
        return pa.table({"doc_id": g["doc_id"], "n": g["tk_count"].cast(pa.int64())})

    sizes = (
        tok.map_batches(size_batch, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    size_of = dict(zip(sizes["doc_id"], sizes["n"]))
    size_ref = ray.put(size_of)

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"a": [], "b": [], "i_part": []}).astype(
                {"a": "int64", "b": "int64", "i_part": "int64"}
            )
        ai, bi = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"a": ids[ai], "b": ids[bi], "i_part": 1})

    inter = (
        tok.groupby("tk")
        .map_groups(pairs_of_group, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("i_part", alias_name="i"))
    )

    class _Jaccard:
        def __init__(self):
            self.size_of = ray.get(size_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            i = t["i"].to_numpy(zero_copy_only=False).astype(np.float64)
            na = np.array([self.size_of[x] for x in a], dtype=np.float64)
            nb = np.array([self.size_of[x] for x in b], dtype=np.float64)
            j = i / (na + nb - i)
            keep = j >= threshold
            return pa.table(
                {
                    "a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                    "jaccard": pa.array(np.round(j[keep], 6), pa.float64()),
                }
            )

    return inter.map_batches(_Jaccard, batch_format="pyarrow", concurrency=(1, 4))


NGRAM_JACCARD_SQL = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tk
  FROM base
),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT t1.doc_id AS a, t2.doc_id AS b, count(*) AS i
  FROM tok t1 JOIN tok t2 ON t1.tk = t2.tk AND t1.doc_id < t2.doc_id
  GROUP BY t1.doc_id, t2.doc_id
)
SELECT a, b, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = a
JOIN sz sb ON sb.doc_id = b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
"""


# ---------------------------------------------------------------------------
_N_PERM = 64
_N_BANDS = 16  # 16 bands x 4 rows


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = tokenize(text)
    if len(toks) < k:
        toks = toks + ["_pad"] * (k - len(toks))
    out = set()
    for i in range(len(toks) - k + 1):
        h = hashlib.blake2b(" ".join(toks[i : i + k]).encode(), digest_size=8).digest()
        out.add(int.from_bytes(h, "big") % _MERSENNE)
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class _MinHasher:
    """Actor-pool stage: documents -> (band_id, band_hash, doc_id) rows.

    Permutation parameters are derived from a fixed seed in __init__
    (once per actor), signatures are vectorized: sig_i = min((a_i*x+b_i) mod p).
    """

    def __init__(self, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=_N_PERM, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=_N_PERM, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text)
        if x.size == 0:
            return np.zeros(_N_PERM, dtype=np.uint64)
        # (n_perm, n_shingles) via object->uint64 modmul in python ints is slow;
        # use float-safe 128-bit arithmetic through np.uint64 with mersenne trick
        prod = (
            self.a[:, None].astype(object) * x[None, :].astype(object)
            + self.b[:, None].astype(object)
        ) % _MERSENNE
        return prod.min(axis=1).astype(np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows_per = _N_PERM // _N_BANDS
        band_ids, band_hashes, doc_ids = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = self.signature(text)
            for b in range(_N_BANDS):
                chunk = sig[b * rows_per : (b + 1) * rows_per]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                band_ids.append(b)
                band_hashes.append(int.from_bytes(h, "big") >> 1)
                doc_ids.append(did)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "bh": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.6):
    """MinHash+LSH candidate pairs, verified with exact shingle Jaccard.

    Scale path for near-dedup: the shuffle moves N_BANDS small rows per doc;
    only same-(band, band_hash) docs generate candidates.  Verification uses
    a broadcast shingle-set lookup at sandbox scale (at 10^12 docs this is a
    doc_id-keyed join of candidates against a shingle store).
    """
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    bands = docs.map_batches(
        _MinHasher, batch_format="pyarrow", concurrency=(1, 8), zero_copy_batch=True
    )

    def cand_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
        ai, bi = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"a": ids[ai], "b": ids[bi]})

    cands = (
        bands.groupby(["band", "bh"])
        .map_groups(cand_of_group, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")  # distinct pairs
    )

    shingles = {
        r["doc_id"]: set(_shingle_hashes(r["text"]).tolist())
        for r in _read_docs(sf_dir, columns=["doc_id", "text"]).take_all()
    }
    sh_ref = ray.put(shingles)

    class _Verify:
        def __init__(self):
            self.sh = ray.get(sh_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["a"].to_pylist()
            b = t["b"].to_pylist()
            keep_a, keep_b, jac = [], [], []
            for x, y in zip(a, b):
                sa, sb = self.sh[x], self.sh[y]
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter) if (sa or sb) else 1.0
                if j >= threshold:
                    keep_a.append(x)
                    keep_b.append(y)
                    jac.append(round(j, 6))
            return pa.table(
                {
                    "a": pa.array(keep_a, pa.int64()),
                    "b": pa.array(keep_b, pa.int64()),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )

    return cands.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------------
class _SimHasher:
    """64-bit SimHash over tf-weighted token hashes (actor-pool stage)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            toks = tokenize(text)
            acc = np.zeros(64, dtype=np.int64)
            for tk in toks:
                h = int.from_bytes(
                    hashlib.blake2b(tk.encode(), digest_size=8).digest(), "big"
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            sh = int((acc > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)).astype(object))
            out.append(sh >> 1)  # keep int64-safe
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.int64())})


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Blocking: split the 63 stored bits into 4 bands; a pair within hamming 3
    must agree exactly on >= 1 band (pigeonhole), so candidates are found by
    4 band-keyed groupbys, then verified exactly.
    """
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    sh = docs.map_batches(_SimHasher, batch_format="pyarrow", concurrency=(1, 8))

    def explode(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        s = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands, keys, dids, hashes = [], [], [], []
        for b in range(4):
            key = (s >> np.uint64(b * 16)) & np.uint64(0xFFFF)
            bands.extend([b] * len(d))
            keys.extend(key.tolist())
            dids.extend(d.tolist())
            hashes.extend(s.tolist())
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(dids, pa.int64()),
                "simhash": pa.array(np.array(hashes, dtype=np.uint64).astype(np.int64)),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
                {"a": "int64", "b": "int64", "hamming": "int64"}
            )
        ai, bi = np.triu_indices(ids.size, k=1)
        x = hs[ai] ^ hs[bi]
        ham = np.zeros(x.size, dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep], "hamming": ham[keep]})

    return (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )

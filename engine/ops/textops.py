"""Text-analysis operators over `documents` (training-data pipeline staples).

All vectorized pyarrow inside map_batches; the tokenizer is the engine's
single tokenization spec (engine/analyze.py) so the DuckDB oracle can express
the same token rule with regexp_split_to_array.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..analyze import SPLIT_PATTERN, tokenize, tokenize_counts_arrow


def _read_docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
def token_counts(sf_dir: str):
    """Per-doc token + char counts (M25/A10 analog: tokenizable-text stats)."""

    def fn(t: pa.Table) -> pa.Table:
        _, _, _, doclens = tokenize_counts_arrow(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(doclens.astype(np.int64), pa.int64()),
                "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
            }
        )

    return _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS n_tokens,
       length(text) AS n_chars
FROM documents
"""


# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "and", "of", "to")


def quality_scores(sf_dir: str):
    """Quality heuristics: punct ratio, stopword ratio, avg token length."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"]
        lower = pc.utf8_lower(texts)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
        non_word = pc.utf8_length(
            pc.replace_substring_regex(lower, pattern="[a-z0-9 ]", replacement="")
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        token_chars = pc.utf8_length(
            pc.replace_substring_regex(lower, pattern="[^a-z0-9]", replacement="")
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        doc_idx, terms, tfs, doclens = tokenize_counts_arrow(texts)
        n_tokens = doclens.astype(np.float64)
        stop_tf = np.zeros(len(texts), dtype=np.float64)
        is_stop = pc.is_in(terms, value_set=pa.array(_STOPWORDS)).to_numpy(
            zero_copy_only=False
        )
        np.add.at(stop_tf, doc_idx[is_stop], tfs[is_stop].astype(np.float64))
        safe_chars = np.maximum(n_chars, 1.0)
        safe_tokens = np.maximum(n_tokens, 1.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "punct_ratio": pa.array(np.round(non_word / safe_chars, 6), pa.float64()),
                "stop_ratio": pa.array(np.round(stop_tf / safe_tokens, 6), pa.float64()),
                "avg_token_len": pa.array(
                    np.round(token_chars / safe_tokens, 6), pa.float64()
                ),
            }
        )

    return _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


QUALITY_SCORES_SQL = """
WITH base AS (
  SELECT doc_id, text, lower(text) AS lt,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
  round(length(regexp_replace(lt, '[a-z0-9 ]', '', 'g')) * 1.0
        / greatest(length(text), 1), 6) AS punct_ratio,
  round(len(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) * 1.0
        / greatest(len(toks), 1), 6) AS stop_ratio,
  round(length(regexp_replace(lt, '[^a-z0-9]', '', 'g')) * 1.0
        / greatest(len(toks), 1), 6) AS avg_token_len
FROM base
"""


# ---------------------------------------------------------------------------
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "por", "para", "con"},
    "zh": set(),  # no ascii markers; falls back to "unknown"
}


class LangId:
    """Heuristic language ID (actor-pool stage; marker tables built once).

    n-gram/stopword-profile classifier: argmax over per-language marker-token
    hit rates; 'unknown' when nothing matches.  Rows-only correctness check
    (not SQL-expressible); tests assert determinism and schema.
    """

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items() if v}

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = []
        for text in t["text"].to_pylist():
            toks = tokenize(text)
            if not toks:
                preds.append("unknown")
                continue
            best, best_hits = "unknown", 0
            for lang in sorted(self.markers):
                hits = sum(1 for tk in toks if tk in self.markers[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "pred_lang": pa.array(preds, pa.string()),
            }
        )


def lang_id(sf_dir: str):
    return _read_docs(sf_dir, columns=["doc_id", "text", "lang"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
_FP_WINDOW = 4
_FP_K = 5  # k-gram chars


def _winnow_fingerprints(text: str) -> list[int]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling hashes of k-grams, min per sliding window, deduped."""
    s = "".join(tokenize(text))
    if len(s) < _FP_K:
        return []
    hs = [
        int.from_bytes(
            hashlib.blake2b(s[i : i + _FP_K].encode(), digest_size=8).digest(), "big"
        )
        >> 1
        for i in range(len(s) - _FP_K + 1)
    ]
    out, last = [], None
    for i in range(max(1, len(hs) - _FP_WINDOW + 1)):
        w = hs[i : i + _FP_WINDOW]
        m = min(w)
        if m != last:
            out.append(m)
            last = m
    return sorted(set(out))


def fingerprints(sf_dir: str):
    """Per-doc winnowing fingerprint summary (rows-only check)."""

    def fn(t: pa.Table) -> pa.Table:
        n, lo, hi = [], [], []
        for text in t["text"].to_pylist():
            fps = _winnow_fingerprints(text)
            n.append(len(fps))
            lo.append(fps[0] if fps else 0)
            hi.append(fps[-1] if fps else 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pa.array(n, pa.int64()),
                "min_fp": pa.array(lo, pa.int64()),
                "max_fp": pa.array(hi, pa.int64()),
            }
        )

    return _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )

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

    Stopword-profile classifier: argmax over per-language marker-token hit
    counts (tf-weighted), ties broken by ascending language code, 'unknown'
    when nothing matches.  Vectorized: one tokenize_counts_arrow pass, one
    is_in per language over the batch's (doc, term) pairs (round-1 kernel
    looped per token).  SQL-expressible, so it is oracle-checked (the same
    argmax as a window function in LANG_ID_SQL).
    """

    def __init__(self):
        self.langs = sorted(k for k, v in _LANG_MARKERS.items() if v)
        self.marker_arrays = {
            k: pa.array(sorted(_LANG_MARKERS[k])) for k in self.langs
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        n_docs = len(t)
        doc_idx, terms, tfs, _ = tokenize_counts_arrow(t["text"])
        # hits[lang][doc] = total tf of that lang's marker tokens in doc
        hits = np.zeros((len(self.langs), n_docs), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            is_m = pc.is_in(terms, value_set=self.marker_arrays[lang]).to_numpy(
                zero_copy_only=False
            )
            np.add.at(hits[li], doc_idx[is_m], tfs[is_m].astype(np.int64))
        best_li = np.argmax(hits, axis=0)  # first max wins == asc lang order
        best_hits = hits[best_li, np.arange(n_docs)]
        preds = np.where(
            best_hits > 0, np.array(self.langs, dtype=object)[best_li], "unknown"
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "pred_lang": pa.array(preds.tolist(), pa.string()),
            }
        )


def lang_id(sf_dir: str):
    return _read_docs(sf_dir, columns=["doc_id", "text", "lang"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True
    )


def _lang_id_sql() -> str:
    member_rows = ", ".join(
        f"('{lang}', '{tok}')"
        for lang in sorted(k for k, v in _LANG_MARKERS.items() if v)
        for tok in sorted(_LANG_MARKERS[lang])
    )
    return f"""
WITH markers(mlang, tok) AS (VALUES {member_rows}),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS tk
  FROM documents
),
hits AS (
  SELECT t.doc_id, m.mlang, count(*) AS h
  FROM tok t JOIN markers m ON t.tk = m.tok
  GROUP BY t.doc_id, m.mlang
),
best AS (
  SELECT doc_id, mlang, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, mlang ASC) AS rn
  FROM hits
)
SELECT d.doc_id, d.lang,
       coalesce(b.mlang, 'unknown') AS pred_lang
FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
"""


LANG_ID_SQL = _lang_id_sql()


# ---------------------------------------------------------------------------
_FP_WINDOW = 4
_FP_K = 5  # k-gram chars
_FP_BASE = np.uint64(1099511628211)  # FNV-ish odd multiplier


def _winnow_batch(texts) -> list[np.ndarray]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003) for a
    whole batch: rolling polynomial hashes of char k-grams, min per sliding
    window, per-doc sorted unique.  Fully vectorized — the token-character
    stream comes from one Arrow regex pass, k-gram hashes are 5 shifted
    numpy slices over the flat byte array, window minima one
    sliding_window_view per doc (round-1 kernel ran blake2b per character
    position in Python)."""
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(texts), pattern="[^a-z0-9]", replacement=""
    )  # == "".join(tokenize(text)) under the engine analyzer spec
    if isinstance(cleaned, pa.ChunkedArray):
        cleaned = cleaned.combine_chunks()
    n_docs = len(cleaned)
    lens = pc.binary_length(cleaned).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    off_buf = np.frombuffer(cleaned.buffers()[1], dtype=np.int32)
    start = int(off_buf[cleaned.offset])
    end = int(off_buf[cleaned.offset + n_docs])
    data = (
        np.frombuffer(cleaned.buffers()[2], dtype=np.uint8, count=end)[start:]
        if end > start
        else np.empty(0, np.uint8)
    )
    n = data.size
    h = np.empty(0, np.uint64)
    if n >= _FP_K:
        d = data.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = d[: n - _FP_K + 1].copy()
            for j in range(1, _FP_K):
                h = h * _FP_BASE + d[j : n - _FP_K + 1 + j]
        h >>= np.uint64(1)  # int64-safe
    out = []
    sw = np.lib.stride_tricks.sliding_window_view
    for i in range(n_docs):
        lo, hi = int(offs[i]), int(offs[i + 1])
        if hi - lo < _FP_K:
            out.append(np.empty(0, np.int64))
            continue
        hd = h[lo : hi - _FP_K + 1]
        w = min(_FP_WINDOW, hd.size)
        mins = sw(hd, w).min(axis=1)
        out.append(np.unique(mins).astype(np.int64))
    return out


def fingerprints(sf_dir: str):
    """Per-doc winnowing fingerprint summary (rows-only check)."""

    def fn(t: pa.Table) -> pa.Table:
        fps_per_doc = _winnow_batch(t["text"])
        n = np.array([f.size for f in fps_per_doc], dtype=np.int64)
        lo = np.array([f[0] if f.size else 0 for f in fps_per_doc], dtype=np.int64)
        hi = np.array([f[-1] if f.size else 0 for f in fps_per_doc], dtype=np.int64)
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


# ---------------------------------------------------------------------------
# PII redaction: the scrub stage every training-data pipeline runs before
# tokenization.  Both Arrow (`replace_substring_regex`) and DuckDB
# (`regexp_replace(..., 'g')`) execute RE2, so one pattern string is the
# single source of truth for both sides.  The synthetic corpus contains no
# PII, so the operator deterministically injects a contact line per doc
# (same `||` expression in the SQL oracle) and the thing under test is the
# redactor itself: patterns, ordering (emails before bare digit runs — an
# address's local part may contain digits), and the redaction counts.
_PII_RULES = (
    # (pattern, replacement) applied in order
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{7,}\b", "<NUM>"),
)


def redact_pii(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        ids_s = ids.cast(pa.string())
        octet = pc.cast(pc.subtract(ids, pc.multiply(pc.divide(ids, 256), 256)), pa.string())
        text = pc.binary_join_element_wise(
            t["text"], " contact user", ids_s, "@mail.example.com ip 10.0.",
            octet, ".7 ref 90210", ids_s, "55", "",
        )
        n = pa.array(np.zeros(len(t), dtype=np.int64), pa.int64())
        for pat, repl in _PII_RULES:
            n = pc.add(n, pc.count_substring_regex(text, pat).cast(pa.int64()))
            text = pc.replace_substring_regex(text, pat, repl)
        return pa.table(
            {"doc_id": ids, "text_clean": text, "n_redacted": n}
        )

    return _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


REDACT_PII_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com ip 10.0.'
              || (doc_id % 256) || '.7 ref 90210' || doc_id || '55' AS text
  FROM documents
),
counted AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS c1,
         regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM aug
),
counted2 AS (
  SELECT doc_id, c1,
         len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
         regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
  FROM counted
)
SELECT doc_id,
       regexp_replace(t2, '\b\d{7,}\b', '<NUM>', 'g') AS text_clean,
       CAST(c1 + c2 + len(regexp_extract_all(t2, '\b\d{7,}\b')) AS BIGINT) AS n_redacted
FROM counted2
"""

"""Text-analysis operators over `documents` (training-data pipeline staples).

All vectorized pyarrow inside map_batches; the tokenizer is the engine's
single tokenization spec (engine/analyze.py) so the DuckDB oracle can express
the same token rule with regexp_split_to_array.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..analyze import (
    SPLIT_PATTERN,
    ngram_from_stream,
    token_array_stream,
    tokenize,
    tokenize_counts_arrow,
)


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


# ---------------------------------------------------------------------------
# Global heavy hitters: the "what does this corpus talk about" staple of a
# training-data pipeline (vocabulary audits, stopword discovery, boilerplate
# spotting).  Exact path + a mergeable Misra-Gries sketch as the
# bounded-memory scale path.
_TOP_TERMS_N = 50
_N_TERM_PARTS = 32


def _term_parts(terms: pa.Array) -> pa.Array:
    """Coarse partition key per term row.  Only the batch's UNIQUE terms are
    hashed in Python (dictionary-encoded; vocab-bounded, same budget class
    as exact_dedup's per-hash loop) — the row stream is a numpy gather."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    de = terms.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=4).digest(), "big")
            % _N_TERM_PARTS
            for t in de.dictionary.to_pylist()
        ),
        dtype=np.int64,
        count=len(de.dictionary),
    )
    return pa.array(uniq[codes], pa.int64())


def top_terms(sf_dir: str, n_out: int = _TOP_TERMS_N):
    """Exact global top-N terms by document frequency (tie: term ASC).

    Scale shape: the reduce key (term) is vocab-cardinality, so the combine
    is map-side partial df/tf per batch -> ONE coarse shuffle on a term-hash
    partition key -> one vectorized pandas groupby + LOCAL top-N per
    partition -> driver merge of only P*N rows (independent of corpus and
    vocab size; a term's rows all land in one partition, so per-partition
    top-N is globally safe)."""

    def partials(t: pa.Table) -> pa.Table:
        _, terms, tfs, _ = tokenize_counts_arrow(t["text"])
        tt = pa.table({"term": terms, "tf": pa.array(tfs.astype(np.int64))})
        g = tt.group_by("term").aggregate([("tf", "sum"), ("tf", "count")])
        return pa.table(
            {
                "term": g["term"],
                "df_part": g["tf_count"].cast(pa.int64()),
                "tf_part": g["tf_sum"],
                "part": _term_parts(g["term"]),
            }
        )

    def top_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", sort=False, as_index=False).agg(
            df=("df_part", "sum"), tf_total=("tf_part", "sum")
        )
        agg = agg.sort_values(
            ["df", "term"], ascending=[False, True], kind="mergesort"
        ).head(n_out)
        return agg[["term", "df", "tf_total"]]

    parts = (
        _read_docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(top_of_partition, batch_format="pandas")
    )
    out = parts.to_pandas()  # <= _N_TERM_PARTS * n_out rows
    out = out.sort_values(
        ["df", "term"], ascending=[False, True], kind="mergesort"
    ).head(n_out).reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


TOP_TERMS_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS tk
  FROM documents
),
tf AS (SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY doc_id, tk),
agg AS (
  SELECT tk AS term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
  FROM tf GROUP BY tk
),
ranked AS (
  SELECT row_number() OVER (ORDER BY df DESC, term) AS rank,
         term, df, tf_total
  FROM agg
)
SELECT rank, term, df, tf_total FROM ranked WHERE rank <= {_TOP_TERMS_N}
"""


_MG_K = 256


def _mg_summary_batch(t: pa.Table, k: int) -> pa.Table:
    """One batch -> its MG(k) summary plus a term="" token-total marker row
    (module-level so the empty-summary edge is unit-testable)."""
    _, terms, tfs, doclens = tokenize_counts_arrow(t["text"])
    n_tokens = int(doclens.astype(np.int64).sum())
    tt = pa.table({"term": terms, "tf": pa.array(tfs.astype(np.int64))})
    g = tt.group_by("term").aggregate([("tf", "sum")])
    cnt = g["tf_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    gterms = g["term"]
    if cnt.size > k:
        thresh = np.partition(cnt, cnt.size - k - 1)[cnt.size - k - 1]
        cnt = cnt - thresh
        keep = cnt > 0
        gterms = gterms.combine_chunks().filter(pa.array(keep)) if isinstance(
            gterms, pa.ChunkedArray
        ) else gterms.filter(pa.array(keep))
        cnt = cnt[keep]
    # the batch's token total rides a dedicated term="" marker row
    # (est=0), emitted even when the truncated summary is EMPTY (a batch
    # of all-equal counts > k truncates to nothing) — dropping it would
    # lose that batch's share of N and break est <= true <= est+err_ub
    if isinstance(gterms, pa.ChunkedArray):
        gterms = gterms.combine_chunks()
    terms_out = pa.concat_arrays([gterms, pa.array([""], gterms.type)])
    est_out = np.concatenate([cnt, np.zeros(1, np.int64)])
    ntok_col = np.zeros(est_out.size, np.int64)
    ntok_col[-1] = n_tokens
    return pa.table(
        {
            "term": terms_out,
            "est": pa.array(est_out, pa.int64()),
            "n_tokens": pa.array(ntok_col, pa.int64()),
            "part": _term_parts(terms_out),
        }
    )


def top_terms_sketch(sf_dir: str, k: int = _MG_K, n_out: int = _TOP_TERMS_N):
    """Misra-Gries heavy hitters over total term frequency (rows-only entry;
    the error bound is pytest-asserted against exact counts).

    Each batch emits an MG(k) summary (<= k rows, vectorized: one Arrow
    group-sum then one argpartition); summaries are merged associatively
    (sum same-term counts, subtract the (k+1)-th largest, drop <= 0 —
    Agarwal et al., "Mergeable Summaries", PODS 2012).  The per-term
    summation runs as a coarse term-hash-partition reduce on the cluster
    (summing before truncating is the tightest valid merge order), so the
    driver sees only the DEDUPED candidate terms plus per-partition token
    totals — not n_blocks * k rows — and applies the single final
    truncation.  Every estimate satisfies est <= true <= est + err_ub with
    err_ub = (N - M)/(k+1) (N = total tokens, M = retained mass)."""

    def mg_of_batch(t: pa.Table) -> pa.Table:
        return _mg_summary_batch(t, k)

    def sum_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=False, as_index=False)["est"].sum()
        # the partition's share of N rides one marker row (term="")
        out.loc[len(out)] = ["", 0]
        ntok = np.zeros(len(out), np.int64)
        ntok[-1] = int(g["n_tokens"].sum())
        out["n_tokens"] = ntok
        return out[["term", "est", "n_tokens"]]

    pdf = (
        _read_docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(mg_of_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(sum_of_partition, batch_format="pandas")
        .to_pandas()
    )  # deduped candidate terms + one marker row per partition
    if len(pdf) == 0:
        return pd.DataFrame(columns=["term", "est_tf", "err_ub"])
    n_total = int(pdf["n_tokens"].sum())
    merged = pdf[pdf["term"] != ""][["term", "est"]].reset_index(drop=True)
    cnt = merged["est"].to_numpy()
    if cnt.size > k:
        thresh = np.partition(cnt, cnt.size - k - 1)[cnt.size - k - 1]
        merged["est"] = cnt - thresh
        merged = merged[merged["est"] > 0]
    retained = int(merged["est"].sum())
    err_ub = (n_total - retained) // (k + 1) + 1
    out = merged.rename(columns={"est": "est_tf"}).sort_values(
        ["est_tf", "term"], ascending=[False, True], kind="mergesort"
    ).head(n_out).reset_index(drop=True)
    out["err_ub"] = np.int64(err_ub)
    return out


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: top keywords per document — the classic
# "describe each doc by its most distinctive terms" stage (tagging, topic
# sampling, index-time boosting).
_KEYWORDS_TOP = 3


# vocab rows the driver will collect + broadcast (same size class as the
# IndexReader's per-shard df map; ~24 B/row => ~0.5 GB at the default)
_KW_BCAST_BUDGET_ROWS = 20_000_000


def keywords_tfidf(
    sf_dir: str,
    top: int = _KEYWORDS_TOP,
    df_broadcast_budget_rows: int = _KW_BCAST_BUDGET_ROWS,
):
    """Per-doc top-k terms by tf*ln(n_docs/df), ties broken by term ASC.

    Adaptive, q3-style: pass (1) is the same vocab-scale df aggregate as
    top_terms (coarse term-hash partitions, vectorized combine).  Under the
    row budget the df table is collected once and broadcast via ray.put and
    pass (2) is one streaming corpus pass (per-batch Arrow index_in lookup,
    vectorized score + per-doc top-k).  ABOVE the budget nothing
    vocab-scale ever reaches the driver: (doc,term,tf) rows and (term,df)
    rows ride the SAME coarse term-hash partitions (a union, one shuffle),
    scores are merged per partition, and a second coarse shuffle on a
    doc-hash key finishes the per-doc top-k — both shuffles are
    P-way(coarse), never per-key."""
    import ray

    def df_partials(t: pa.Table) -> pa.Table:
        _, terms, _, _ = tokenize_counts_arrow(t["text"])
        tt = pa.table({"term": terms, "one": pa.array(np.ones(len(terms), np.int64))})
        g = tt.group_by("term").aggregate([("one", "sum")])
        return pa.table(
            {
                "term": g["term"],
                "df_part": g["one_sum"],
                "part": _term_parts(g["term"]),
            }
        )

    def df_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", sort=False, as_index=False).agg(
            df=("df_part", "sum")
        )

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    n_docs = docs.count()
    df_ds = (
        docs.map_batches(df_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(df_of_partition, batch_format="pandas")
        .materialize()  # vocab-scale by construction; executed exactly once
    )
    if df_ds.count() > df_broadcast_budget_rows:
        return _keywords_tfidf_distributed(docs, df_ds, n_docs, top)
    # Ray emits zero-column placeholder blocks for empty partitions
    df_tbl = pa.concat_tables(
        [t for t in (ray.get(r) for r in df_ds.to_arrow_refs()) if t.num_columns]
    )
    vocab = df_tbl["term"].combine_chunks()
    dfs = df_tbl["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    bcast = ray.put((vocab, dfs))

    def score_batch(t: pa.Table) -> pa.Table:
        v, d = ray.get(bcast)
        doc_idx, terms, tfs, _ = tokenize_counts_arrow(t["text"])
        pos = pc.index_in(terms, value_set=v).to_numpy(zero_copy_only=False)
        idf = np.log(float(n_docs) / d[pos.astype(np.int64)])
        score = np.round(tfs.astype(np.float64) * idf, 6)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pdf = pd.DataFrame(
            {
                "doc_id": ids[doc_idx],
                "term": terms.to_pandas(),
                "tfidf_r6": score,
            }
        )
        pdf = pdf.sort_values(
            ["doc_id", "tfidf_r6", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        pdf["rank"] = pdf.groupby("doc_id", sort=False).cumcount() + 1
        pdf = pdf[pdf["rank"] <= top]
        return pa.Table.from_pandas(
            pdf[["doc_id", "rank", "term", "tfidf_r6"]], preserve_index=False
        )

    return docs.map_batches(score_batch, batch_format="pyarrow", zero_copy_batch=True)


_N_DOC_PARTS = 64


def _keywords_tfidf_distributed(docs, df_ds, n_docs: int, top: int):
    """Above-budget tfidf path: nothing vocab-scale on the driver.

    (doc,term,tf) rows and (term,df) rows share one union dataset keyed by
    the SAME coarse term-hash partition; a per-partition pandas merge scores
    every (doc,term); a second coarse shuffle on hash(doc_id) finishes the
    per-doc top-k.  df rows are tagged with doc_id = -1 (doc ids in the
    corpus are non-negative)."""

    def tf_rows(t: pa.Table) -> pa.Table:
        doc_idx, terms, tfs, _ = tokenize_counts_arrow(t["text"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _term_parts(terms),
                "term": terms.cast(pa.string()),
                "doc_id": pa.array(ids[doc_idx].astype(np.int64), pa.int64()),
                "val": pa.array(tfs.astype(np.int64), pa.int64()),
            }
        )

    def df_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": _term_parts(t["term"]),
                "term": t["term"].cast(pa.string()),
                "doc_id": pa.array(np.full(len(t), -1, np.int64), pa.int64()),
                "val": t["df"].cast(pa.int64()),
            }
        )

    union = docs.map_batches(
        tf_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(df_ds.map_batches(df_rows, batch_format="pyarrow"))

    def merge_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        dfm = g[g["doc_id"] < 0][["term", "val"]].rename(columns={"val": "df"})
        tfm = g[g["doc_id"] >= 0]
        m = tfm.merge(dfm, on="term", how="inner")
        score = np.round(
            m["val"].to_numpy(np.float64)
            * np.log(float(n_docs) / m["df"].to_numpy(np.float64)),
            6,
        )
        ids = m["doc_id"].to_numpy(np.int64)
        docpart = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 6)
        return pd.DataFrame(
            {
                "docpart": docpart.astype(np.int64),
                "doc_id": ids,
                "term": m["term"],
                "tfidf_r6": score,
            }
        )

    def topk_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "tfidf_r6", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.assign(rank=g.groupby("doc_id", sort=False).cumcount() + 1)
        g = g[g["rank"] <= top]
        return g[["doc_id", "rank", "term", "tfidf_r6"]].astype({"rank": np.int64})

    return (
        union.groupby("part")
        .map_groups(merge_of_partition, batch_format="pandas")
        .groupby("docpart")
        .map_groups(topk_of_partition, batch_format="pandas")
    )


KEYWORDS_TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS tk
  FROM documents
),
tf AS (SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY doc_id, tk),
df AS (SELECT tk, count(*) AS df FROM tf GROUP BY tk),
stats AS (SELECT (SELECT count(*) FROM documents) AS n),
scored AS (
  SELECT tf.doc_id, tf.tk AS term,
         round(tf.tf * ln(s.n * 1.0 / df.df), 6) AS tfidf_r6
  FROM tf JOIN df ON df.tk = tf.tk CROSS JOIN stats s
),
ranked AS (
  SELECT doc_id, term, tfidf_r6,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_r6 DESC, term) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tfidf_r6 FROM ranked WHERE rank <= {_KEYWORDS_TOP}
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021 §A1.1): the fraction of a
# doc covered by its most frequent 1/2/3-gram.  High values flag boilerplate
# and degenerate repetition — a standard pre-training quality filter.


def repetition_scores(sf_dir: str):
    """Per-doc top-{1,2,3}-gram frequency fractions (round 6; 0.0 when the
    doc has no n-grams of that order).  Exact string n-grams via the shared
    ngram_stream_arrow kernel, so the op is oracle-checked — per-(doc, gram)
    counts and maxima are one np.unique + np.maximum.at per order."""

    def fn(t: pa.Table) -> pa.Table:
        n_rows = len(t)
        out = {"doc_id": t["doc_id"]}
        stream = token_array_stream(t["text"])  # one split for all 3 orders
        for n in (1, 2, 3):
            codes, parents, vocab = ngram_from_stream(*stream, n)
            top = np.zeros(n_rows, np.float64)
            tot = np.bincount(parents, minlength=n_rows).astype(np.float64)
            if codes.size:
                nv = len(vocab)
                key = parents * nv + codes
                ukey, counts = np.unique(key, return_counts=True)
                np.maximum.at(top, ukey // nv, counts.astype(np.float64))
            frac = np.divide(
                top, tot, out=np.zeros(n_rows, np.float64), where=tot > 0
            )
            out[f"top{n}_frac"] = pa.array(np.round(frac, 6), pa.float64())
        return pa.table(out)

    return _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


REPETITION_SCORES_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
uni AS (
  SELECT doc_id, max(c) AS m, sum(c) AS tot FROM (
    SELECT doc_id, tk, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tk FROM tok)
    GROUP BY doc_id, tk
  ) GROUP BY doc_id
),
pos2 AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(toks)-1, 0))) AS i, toks
  FROM tok
),
big AS (
  SELECT doc_id, max(c) AS m, sum(c) AS tot FROM (
    SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g, count(*) AS c
    FROM pos2 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
pos3 AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(toks)-2, 0))) AS i, toks
  FROM tok
),
tri AS (
  SELECT doc_id, max(c) AS m, sum(c) AS tot FROM (
    SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g, count(*) AS c
    FROM pos3 GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT d.doc_id,
       round(coalesce(u.m * 1.0 / u.tot, 0), 6) AS top1_frac,
       round(coalesce(b.m * 1.0 / b.tot, 0), 6) AS top2_frac,
       round(coalesce(t.m * 1.0 / t.tot, 0), 6) AS top3_frac
FROM documents d
LEFT JOIN uni u USING (doc_id)
LEFT JOIN big b USING (doc_id)
LEFT JOIN tri t USING (doc_id)
"""


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

"""Single-process reference implementation (the conformance oracle).

The analog of the reference's golden validation harness
(/root/reference/compare_embeddings.py:388-470 over validation_set.csv): a
plain-Python, no-Ray implementation of the whole pipeline — dedup, extract,
tokenize, exhaustive BM25, filters, two-stage rerank — that the distributed
engine must match rank-identically (docIDs AND float64 scores) per
FIXTURES.md §3.

Determinism rules shared with the engine (engine/query.py):
- idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)   (Lucene-style, >= 0)
- impact = tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
- per-doc score = sum of idf * impact contributions added in ascending
  lexicographic term order (float64; duplicate query terms count once)
- tie-break (score DESC, doc_id ASC); N counts all deduped docs (empty too)
- avgdl = total_tokens / N as float64
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .analyze import DEFAULT_ANALYZER, AnalyzerConfig, tokenize
from .extract import extract_text
from .schema import B, K1, doc_id_of_url, ts_to_us


@dataclass
class OracleDoc:
    doc_id: int
    url: str
    warc_ts: int  # microseconds
    lang: str
    text: str
    doclen: int
    tf: dict = field(default_factory=dict)


class OracleIndex:
    """In-memory exhaustive index over a pages table."""

    def __init__(self, pages: pa.Table, analyzer: AnalyzerConfig = DEFAULT_ANALYZER):
        self.analyzer = analyzer
        rows = pages.to_pylist()
        # keep-latest dedup per url: max (warc_ts, row order) wins
        by_url: dict[str, tuple] = {}
        for order, r in enumerate(rows):
            ts_us = ts_to_us(r["warc_ts"])
            key = (ts_us, order)
            if r["url"] not in by_url or key > by_url[r["url"]][0]:
                by_url[r["url"]] = (key, r, ts_us)
        self.docs: dict[int, OracleDoc] = {}
        self.postings: dict[str, dict[int, int]] = {}
        total_len = 0
        for _, r, ts_us in by_url.values():
            text = extract_text(r["html"])
            did = doc_id_of_url(r["url"])
            toks = tokenize(text, analyzer)
            doc = OracleDoc(did, r["url"], ts_us, r["lang"], text, len(toks))
            for t in toks:
                doc.tf[t] = doc.tf.get(t, 0) + 1
            for t, c in doc.tf.items():
                self.postings.setdefault(t, {})[did] = c
            self.docs[did] = doc
            total_len += len(toks)
        self.n_docs = len(self.docs)
        self.avgdl = float(total_len) / self.n_docs if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return float(np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0))

    def _allowed(self, doc: OracleDoc, lang_filter, ts_min, ts_max) -> bool:
        if lang_filter is not None and doc.lang != lang_filter:
            return False
        if ts_min is not None and doc.warc_ts < ts_min:
            return False
        if ts_max is not None and doc.warc_ts > ts_max:
            return False
        return True

    def search(
        self,
        query_text: str,
        k: int = 10,
        lang_filter: str | None = None,
        ts_min: int | None = None,
        ts_max: int | None = None,
        prior_weight: float = 0.0,
    ) -> list[tuple[int, float]]:
        """Exhaustive BM25 top-k -> [(doc_id, score)] best-first.

        With prior_weight > 0 runs the two-stage rerank (reference analog:
        /root/reference/streamlit_app.py:317-364, `sim + w*ln(citations)`):
        pool = max(50, 10k) BM25 candidates, rescored with
        score + prior_weight * ln(1 + doclen).
        """
        terms = sorted(set(tokenize(query_text, self.analyzer)))
        scores: dict[int, float] = {}
        for t in terms:  # ascending term order == engine's summation order
            plist = self.postings.get(t)
            if not plist:
                continue
            w = self.idf(t)
            for did, tf in plist.items():
                doc = self.docs[did]
                if not self._allowed(doc, lang_filter, ts_min, ts_max):
                    continue
                impact = tf * (K1 + 1.0) / (
                    tf + K1 * ((1.0 - B) + (B * doc.doclen) / self.avgdl)
                )
                scores[did] = scores.get(did, 0.0) + w * impact
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        if prior_weight > 0.0:
            pool = ranked[: max(50, 10 * k)]
            rescored = [
                (did, s + prior_weight * float(np.log1p(self.docs[did].doclen)))
                for did, s in pool
            ]
            rescored.sort(key=lambda kv: (-kv[1], kv[0]))
            return rescored[:k]
        return ranked[:k]

    def search_boolean(
        self,
        query_text: str,
        k: int = 10,
        lang_filter: str | None = None,
        ts_min: int | None = None,
        ts_max: int | None = None,
    ) -> list[tuple[int, float]]:
        """Exhaustive boolean-operator BM25 (engine/query.py parse_query
        syntax): must/must-not/phrase/not-phrase eligibility, then plain
        BM25 over the unique scoring terms in ascending term order —
        the conformance target of IndexReader.search_boolean."""
        from .query import MAX_PREFIX_EXPANSIONS, contains_sequence, parse_query

        bq = parse_query(query_text, self.analyzer)

        def _expand(prefix: str) -> list[str]:
            cands = sorted(
                ((t, len(p)) for t, p in self.postings.items()
                 if t.startswith(prefix)),
                key=lambda x: (-x[1], x[0]),
            )
            return sorted(t for t, _ in cands[:MAX_PREFIX_EXPANSIONS])

        exp_should: list[str] = []
        must_groups: list[set[str]] = []
        exp_not: list[str] = []
        for p in bq.should_prefix:
            exp_should.extend(_expand(p))
        for p in bq.must_prefix:
            g = _expand(p)
            if not g:
                return []
            must_groups.append(set(g))
        for p in bq.must_not_prefix:
            exp_not.extend(_expand(p))
        scoring = sorted(
            set(bq.scoring_terms)
            | set(exp_should)
            | {t for g in must_groups for t in g}
        )
        if not scoring:
            return []
        required = set(bq.required_terms)
        excluded = set(bq.must_not) | set(exp_not)
        scores: dict[int, float] = {}
        for t in scoring:  # ascending term order == engine summation order
            plist = self.postings.get(t)
            if not plist:
                continue
            w = self.idf(t)
            for did, tf in plist.items():
                doc = self.docs[did]
                if not self._allowed(doc, lang_filter, ts_min, ts_max):
                    continue
                if any(r not in doc.tf for r in required):
                    continue
                if any(x in doc.tf for x in excluded):
                    continue
                if any(
                    not any(g_t in doc.tf for g_t in g) for g in must_groups
                ):
                    continue
                impact = tf * (K1 + 1.0) / (
                    tf + K1 * ((1.0 - B) + (B * doc.doclen) / self.avgdl)
                )
                scores[did] = scores.get(did, 0.0) + w * impact
        if bq.phrases or bq.not_phrases:
            from .analyze import tokenize as _tok

            slops = bq.phrase_slops or (0,) * len(bq.phrases)
            nslops = bq.not_phrase_slops or (0,) * len(bq.not_phrases)

            def _ok(did: int) -> bool:
                toks = _tok(self.docs[did].text, self.analyzer)
                return all(
                    contains_sequence(toks, p, s)
                    for p, s in zip(bq.phrases, slops)
                ) and not any(
                    contains_sequence(toks, p, s)
                    for p, s in zip(bq.not_phrases, nslops)
                )

            scores = {d: s for d, s in scores.items() if _ok(d)}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def expected_topk_table(pages: pa.Table, queries: pa.Table) -> pa.Table:
    """Golden expected_topk table (FIXTURES.md §3) for a query table."""
    idx = OracleIndex(pages)
    qid_out, rank_out, url_out, did_out, score_out = [], [], [], [], []
    for q in queries.to_pylist():
        res = idx.search(
            q["query_text"],
            k=q["k"],
            lang_filter=q.get("lang_filter"),
            ts_min=ts_to_us(q.get("ts_min")),
            ts_max=ts_to_us(q.get("ts_max")),
            prior_weight=q.get("prior_weight") or 0.0,
        )
        for r, (did, score) in enumerate(res, start=1):
            qid_out.append(q["query_id"])
            rank_out.append(r)
            url_out.append(idx.docs[did].url)
            did_out.append(did)
            score_out.append(score)
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int32()),
            "url": pa.array(url_out, pa.string()),
            "doc_id": pa.array(did_out, pa.uint64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )

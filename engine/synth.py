"""Deterministic synthetic corpus generator (FIXTURES.md §1-§2).

Everything is a pure function of (seed, row index): no wall clock, no global
RNG state, so any process — driver, test, bench, or a Ray task — regenerates
identical bytes.  The HTML for each page is constructed so that
extract.extract_text(html) inverts it exactly back to `text`
(the byte-identical contract is therefore a real round-trip property, checked
by tests/test_extract.py, not a tautology: the extractor never sees `text`).

Mirrors the reference's golden-corpus strategy (validation_set.csv, consumed
by /root/reference/compare_embeddings.py:388-470): a fixed corpus + a fixed
query set with oracle-computed expected results.
"""

from __future__ import annotations

import hashlib
import html as _html
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import PAGES_SCHEMA

SEED = 42
VOCAB_SIZE = 10_000
N_HOSTS = 50
ZIPF_ALPHA = 1.1
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_CATEGORIES = ["news", "blog", "docs", "shop", "forum", "wiki", "misc"]
_UNICODE_TOKENS = ["café", "naïve", "a&b", "x<y", "em—dash", "élan"]
_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "yu",
    "zan", "bel", "cor", "dun", "fir", "gal", "hem", "jin", "kol", "lum",
]


def _make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic pronounceable lowercase-ASCII vocabulary, unique words."""
    words = []
    nsyl = len(_SYLLABLES)
    for i in range(size):
        a, rem = divmod(i, nsyl * nsyl)
        b, c = divmod(rem, nsyl)
        words.append(_SYLLABLES[a % nsyl] + _SYLLABLES[b] + _SYLLABLES[c])
    return words


VOCAB = _make_vocab()
# head terms (FIXTURES.md: ~20 terms in a majority of docs) are simply the top
# Zipf ranks; ranks follow 1/(r+1)^alpha
_ZIPF_P = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_ALPHA)
_ZIPF_P /= _ZIPF_P.sum()
_ZIPF_CUM = np.cumsum(_ZIPF_P)
HEAD_TERMS = VOCAB[:20]


def _rng(i: int, tag: int = 0) -> np.random.Generator:
    return np.random.default_rng([SEED, tag, i])


def _doc_hash(i: int) -> str:
    return hashlib.blake2b(f"doc-{SEED}-{i}".encode(), digest_size=6).hexdigest()


def _doc_tokens(i: int) -> list[str]:
    rng = _rng(i, tag=1)
    length = int(np.clip(np.round(rng.lognormal(5.0, 0.6)), 8, 4000))
    if i == 13:  # max-length doc fixture
        length = 3000
    ids = np.searchsorted(_ZIPF_CUM, rng.random(length), side="right")
    toks = [VOCAB[j] for j in ids]
    if i % 100 == 7:  # ~1% unicode/entity edge-case rows
        for k, ut in enumerate(_UNICODE_TOKENS):
            if k * 7 + 3 < len(toks):
                toks[k * 7 + 3] = ut
    return toks


def _doc_text(i: int) -> str:
    """title line + paragraph lines, single-space-joined tokens per line."""
    if i == 3 or i == 5:  # empty-html / empty-body fixtures
        return ""
    toks = _doc_tokens(i)
    rng = _rng(i, tag=2)
    title_len = int(rng.integers(3, 9))
    title = " ".join(toks[:title_len])
    rest = toks[title_len:]
    lines = [title]
    pos = 0
    while pos < len(rest):
        plen = int(rng.integers(30, 61))
        lines.append(" ".join(rest[pos : pos + plen]))
        pos += plen
    return "\n".join(lines)


def _html_of_text(i: int, text: str) -> bytes:
    """Deterministic HTML wrapper that extract.extract_text inverts exactly.

    Includes entities, nested divs, inline <b>, a <script> block, a <style>
    block and comments (FIXTURES.md §1) — all of which the extractor must
    strip without perturbing the text bytes.
    """
    if i == 3:
        return b""
    lines = text.split("\n") if text else []
    title = lines[0] if lines else ""
    paras = lines[1:]
    esc_title = _html.escape(title)
    parts = [
        "<html><head><title>",
        esc_title,
        '</title><style>body { font: 12px sans-serif; }</style></head><body>',
    ]
    if lines:
        parts.append(f"<h1>{esc_title}</h1>")
    for j, p in enumerate(paras):
        toks = p.split(" ")
        esc = [
            f"<b>{_html.escape(t)}</b>" if (i + j + k) % 17 == 0 else _html.escape(t)
            for k, t in enumerate(toks)
        ]
        content = " ".join(esc)
        parts.append(f"<!-- para {j} -->")
        if j % 3 == 0:
            parts.append(f'<div class="sec"><p>{content}</p></div>')
        else:
            parts.append(f"<p>{content}</p>")
        if j == 0:
            parts.append("<script>var tracker = 1 < 2 && 'x';</script>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def make_page(i: int, n_rows: int) -> dict:
    """Row i of the pages table (deterministic; FIXTURES.md §1)."""
    # duplicate-url fixture: row 11 re-crawls row 10's url with a newer ts
    src = 10 if (i == 11 and n_rows > 11) else i
    url = (
        f"https://site{src % N_HOSTS}.example/"
        f"{_CATEGORIES[src % len(_CATEGORIES)]}/{_doc_hash(src)}"
    )
    text = _doc_text(i)
    lang = {18: "de", 19: "fr"}.get(i % 20, "en")
    return {
        "url": url,
        "warc_ts": EPOCH_US + i * 37_000_000,
        "html": _html_of_text(i, text),
        "text": text,
        "lang": lang,
    }


def gen_pages_table(n: int) -> pa.Table:
    return gen_pages_range(0, n, n)


def gen_pages_range(start: int, stop: int, n_total: int) -> pa.Table:
    return _rows_to_table([make_page(i, n_total) for i in range(start, stop)])


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def write_pages(out_dir: str, n_rows: int, num_files: int = 8) -> list[str]:
    """Write the corpus as `num_files` parquet files (the input-partition
    granularity the checkpointed build keys on).  Parallelized over Ray when a
    session is up, else sequential — identical bytes either way."""
    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n_rows, num_files + 1).astype(int)
    spans = [
        (f, int(bounds[f]), int(bounds[f + 1]))
        for f in range(num_files)
        if bounds[f] < bounds[f + 1]
    ]

    def _write(span: tuple[int, int, int]) -> str:
        f, lo, hi = span
        path = os.path.join(out_dir, f"pages-{f:05d}.parquet")
        pq.write_table(gen_pages_range(lo, hi, n_rows), path)
        return path

    import ray

    if ray.is_initialized():
        task = ray.remote(num_cpus=1)(_write)
        return ray.get([task.remote(s) for s in spans])
    return [_write(s) for s in spans]


# ---------------------------------------------------------------------------
# fixed conformance query set (FIXTURES.md §2; 73 queries like the
# reference's validation_set.csv)


def gen_queries_table(n: int = 73) -> pa.Table:
    qids, qtexts, ks, langf, tsmin, tsmax, prior = [], [], [], [], [], [], []
    mid = VOCAB[100:1000]
    rare = VOCAB[5000:]
    for q in range(n):
        rng = _rng(q, tag=3)
        terms = []
        nterms = int(rng.integers(2, 6))
        terms.append(HEAD_TERMS[int(rng.integers(0, len(HEAD_TERMS)))])
        while len(terms) < nterms - 1:
            terms.append(mid[int(rng.integers(0, len(mid)))])
        if q % 3 == 0:
            terms.append(rare[int(rng.integers(0, len(rare)))])
        if q % 11 == 0:
            terms.append(f"zzoov{q}")  # OOV term
        qids.append(q)
        qtexts.append(" ".join(terms[:5]))
        ks.append([1, 5, 10, 20][q % 4])
        langf.append("en" if q % 5 == 0 else None)
        if q % 7 == 0:
            tsmin.append(EPOCH_US)
            tsmax.append(EPOCH_US + 600 * 37_000_000)
        else:
            tsmin.append(None)
            tsmax.append(None)
        prior.append(0.25 if q % 13 == 0 else 0.0)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "query_text": pa.array(qtexts, pa.string()),
            "k": pa.array(ks, pa.int32()),
            "lang_filter": pa.array(langf, pa.string()),
            "ts_min": pa.array(tsmin, pa.timestamp("us")),
            "ts_max": pa.array(tsmax, pa.timestamp("us")),
            "prior_weight": pa.array(prior, pa.float64()),
        }
    )

"""HTML -> text extraction with a byte-identical contract.

The engine's analog of the reference's LaTeX->clean-text chain
(/root/reference/parsed_papers_to_vector_rds/stacks_parsing/latex_parse.py:292-316,
/root/reference/latex_clean.py:11-159, comment stripping at
/root/reference/ec2/parse_papers/__main__.py:75-83): a deterministic,
pure-Python normalization pipeline whose output is required to be
byte-identical per url against the oracle (BASELINE.json input_hint).

Extraction spec (the single source of truth — synth.py constructs HTML that
this spec inverts, and oracle.py calls this same function):

1. decode UTF-8 (errors="replace")
2. drop HTML comments ``<!-- ... -->``
3. drop ``<script>``/``<style>`` elements including their content
4. drop the ``<head>`` element including its content
5. closing block tags (p, div, h1..h6, li, ul, ol) and ``<br>`` become "\n"
6. every remaining tag is removed
7. HTML entities are unescaped (``&amp;`` -> ``&`` etc.)
8. lines are stripped; empty lines dropped; joined with "\n"

Used inside ``map_batches(extract_batch, batch_format="pyarrow")`` —
stateless task, no actor needed (regexes are module-level compiled).
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from .schema import doc_ids_of_urls

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.S | re.I)
_HEAD_RE = re.compile(r"<head\b.*?</head\s*>", re.S | re.I)
_BLOCK_CLOSE_RE = re.compile(r"</(?:p|div|h[1-6]|li|ul|ol)\s*>|<br\s*/?>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html_bytes: bytes | None) -> str:
    """Apply the extraction spec to one page. Deterministic, locale-free."""
    if html_bytes is None or len(html_bytes) == 0:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", s)
    s = _SCRIPT_RE.sub("", s)
    s = _STYLE_RE.sub("", s)
    s = _HEAD_RE.sub("", s)
    s = _BLOCK_CLOSE_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


class _StrictHTMLExtractor(HTMLParser):
    """Event-driven extractor implementing the SAME output spec as
    ``extract_text`` via the stdlib tokenizer instead of regexes — the second
    real strategy of the fall-through chain (the reference ships three
    interchangeable parsers with per-paper dispatch,
    ec2/parse_arxiv_papers/__main__.py:42-47, tex_method/parse.py:74-112,
    plastex_method/parse.py:135-195).

    STRICT: it raises ValueError on any construct where the two
    implementations could diverge (unclosed script/style/head at EOF, a
    literal ``<`` in text, an entity it cannot faithfully reproduce, unknown
    declarations) — on such pages the chain falls through to the regex
    strategy, so the chain's OUTPUT always equals the extraction spec; on
    pages where this parser succeeds the result is byte-identical (asserted
    over the synth corpus in tests/test_extract.py).
    """

    _BLOCK_NL = frozenset(
        {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol"}
    )
    _DROP = frozenset({"script", "style", "head"})

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.parts: list[str] = []
        self._drop_stack: list[str] = []

    def handle_starttag(self, tag, attrs):
        if self._drop_stack:
            if tag in self._DROP:
                self._drop_stack.append(tag)
            return
        if tag in self._DROP:
            self._drop_stack.append(tag)
        elif tag == "br":
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if self._drop_stack:
            return
        if tag == "br":
            self.parts.append("\n")
        elif tag in self._BLOCK_NL:
            # the regex spec removes e.g. <p/> WITHOUT a newline; the
            # default start+end dispatch would emit one — refuse instead
            raise ValueError(f"self-closing block tag <{tag}/>")

    def handle_endtag(self, tag):
        if self._drop_stack:
            if tag == self._drop_stack[-1]:
                self._drop_stack.pop()
            elif tag in self._DROP:
                raise ValueError(f"mismatched </{tag}> inside dropped element")
            return
        if tag in self._DROP:
            raise ValueError(f"unbalanced </{tag}>")
        if tag in self._BLOCK_NL:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._drop_stack:
            return
        if "<" in data:
            # the tokenizer left a raw '<' in text (e.g. "a < b"); the regex
            # spec may instead eat up to a later '>' — ambiguous, refuse
            raise ValueError("unparsed '<' in text")
        self.parts.append(data)

    def handle_entityref(self, name):
        if self._drop_stack:
            return
        u = _html.unescape(f"&{name};")
        if u == f"&{name};":
            raise ValueError(f"unknown entity &{name};")
        self.parts.append(u)

    def handle_charref(self, name):
        if self._drop_stack:
            return
        self.parts.append(_html.unescape(f"&#{name};"))

    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def unknown_decl(self, data):
        raise ValueError(f"unknown declaration <![{data}]>")

    def finish(self) -> str:
        self.close()
        if self._drop_stack:
            raise ValueError(f"unclosed <{self._drop_stack[-1]}> at EOF")
        if self.rawdata:
            raise ValueError("unparsed trailing markup at EOF")
        lines = [ln.strip() for ln in "".join(self.parts).split("\n")]
        return "\n".join(ln for ln in lines if ln)


def extract_text_strict(html_bytes: bytes | None) -> str:
    """Strict tokenizer-based extraction strategy (see _StrictHTMLExtractor).
    Identical output to ``extract_text`` where it succeeds; raises where the
    page is malformed enough that the implementations could disagree."""
    if html_bytes is None or len(html_bytes) == 0:
        return ""
    p = _StrictHTMLExtractor()
    p.feed(html_bytes.decode("utf-8", errors="replace"))
    return p.finish()


def extract_batch(
    batch: pa.Table,
    *,
    chain: tuple[str, ...] | None = None,
    timeout_s: float | None = None,
) -> pa.Table:
    """pages batch -> extracted batch (EXTRACTED_SCHEMA).

    Per-row Python call is unavoidable for the regex chain (same shape as the
    reference's per-paper parser, SURVEY.md §2.2 M1-M16) but each call is
    pure CPU over one page — this stage scales linearly with cores.

    ``chain`` selects per-row extraction strategies by import path with
    fall-through on failure; ``timeout_s`` additionally routes rows through
    the killable sidecar of engine/sandbox.py so one adversarial page cannot
    wedge a build task (the reference's killable per-paper parse,
    ec2/parse_arxiv_papers/__main__.py:54-103).
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    if timeout_s:
        from .sandbox import DEFAULT_CHAIN, get_extractor

        texts = get_extractor(tuple(chain or DEFAULT_CHAIN), timeout_s).extract_many(htmls)
    elif chain:
        from .sandbox import resolve

        fns = [resolve(p) for p in chain]

        def _run(h):
            for fn in fns:
                try:
                    return fn(h)
                except Exception:
                    continue
            return ""

        texts = [_run(h) for h in htmls]
    else:
        texts = [extract_text(h) for h in htmls]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids_of_urls(urls), type=pa.uint64()),
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def dedup_latest_in_batch(batch: pa.Table) -> pa.Table:
    """Within-batch keep-latest-by-url (SURVEY.md §2.7 D1 map-side combine).

    Cross-partition duplicates are handled by the global loser-set broadcast
    in build.py; this keeps each partition's partials already deduped.
    Keeps the row with max (warc_ts) per url; ties broken by later row order
    (last writer wins, matching the reference's ON CONFLICT DO UPDATE).
    """
    urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
    ts = batch.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.arange(len(urls))
    # sort by (url, ts, order) then keep the last row of each url run
    idx = np.lexsort((order, ts, urls))
    sorted_urls = urls[idx]
    is_last = np.ones(len(urls), dtype=bool)
    if len(urls) > 1:
        is_last[:-1] = sorted_urls[:-1] != sorted_urls[1:]
    keep = np.sort(idx[is_last])
    return batch.take(pa.array(keep))

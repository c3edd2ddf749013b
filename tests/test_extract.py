"""Byte-identical extraction contract (BASELINE.json input_hint):
engine extract_text(html) must equal the `text` column byte-for-byte per url."""

import pyarrow as pa

import pytest

from engine import synth
from engine.extract import (
    dedup_latest_in_batch,
    extract_batch,
    extract_text,
    extract_text_strict,
)


def test_extraction_byte_identical_t1():
    pages = synth.gen_pages_table(1000)
    for r in pages.to_pylist():
        got = extract_text(r["html"])
        assert got == r["text"], f"extraction mismatch for {r['url']}"


def test_extract_edge_cases():
    assert extract_text(b"") == ""
    assert extract_text(None) == ""
    assert extract_text(b"<html><head><title>t</title></head><body></body></html>") == ""
    # entities round-trip
    assert extract_text(b"<p>a&amp;b x&lt;y</p>") == "a&b x<y"
    # script/style/comment content dropped
    assert (
        extract_text(b"<body><script>var x = '<p>no</p>';</script><p>yes</p></body>")
        == "yes"
    )
    assert extract_text(b"<body><!-- no --><style>p{}</style><p>ok</p></body>") == "ok"
    # block boundaries become newlines; inline tags vanish without spaces
    assert extract_text(b"<div><p>a <b>bb</b> c</p><p>d</p></div>") == "a bb c\nd"


def test_strict_extractor_byte_identical_on_wellformed_pages():
    """The tokenizer-based strategy must agree byte-for-byte with the regex
    spec wherever it succeeds — and it must succeed on the whole synth
    corpus (well-formed HTML with entities, scripts, styles, comments)."""
    pages = synth.gen_pages_table(500)
    for r in pages.to_pylist():
        assert extract_text_strict(r["html"]) == r["text"], r["url"]


def test_strict_extractor_rejects_ambiguous_markup():
    # unclosed <script> swallows everything to EOF -> refuse
    with pytest.raises(ValueError):
        extract_text_strict(b"<body><script>var x = 1;<p>hi</p></body>")
    # raw '<' in text: the regex spec may eat to a later '>' -> refuse
    with pytest.raises(ValueError):
        extract_text_strict(b"<p>a < b > c</p>")
    # unclosed <head> -> the regex spec would leak the title text -> refuse
    with pytest.raises(ValueError):
        extract_text_strict(b"<html><head><title>T</title><body><p>x</p>")
    # well-formed edge cases still agree with the spec
    for h in (
        b"",
        b"<p>a&amp;b x&lt;y &#65;</p>",
        b"<body><script>var x = '<p>no</p>';</script><p>yes</p></body>",
        b"<div><p>a <b>bb</b> c</p><p>d</p></div>",
        b"<ul><li>one</li><li>two</li></ul>",
        b"line one<br>line two<br/>three",
    ):
        assert extract_text_strict(h) == extract_text(h), h


def test_chain_fallthrough_recovers_malformed_page():
    """A page that breaks the strict strategy is recovered by the regex
    strategy THROUGH THE SIDECAR (the reference's per-paper parser dispatch,
    ec2/parse_arxiv_papers/__main__.py:42-47): chain output == spec output
    for every row, malformed or not."""
    from engine.sandbox import DEFAULT_CHAIN, get_extractor

    malformed = b"<body><script>var x = 1;<p>leaks per spec</p></body>"
    good = synth.gen_pages_table(5)["html"].to_pylist()
    ex = get_extractor(DEFAULT_CHAIN, timeout_s=10.0)
    for h in [malformed, *good]:
        assert ex.extract_one(h) == extract_text(h)


def test_extract_batch_schema_and_docids():
    pages = synth.gen_pages_table(50)
    out = extract_batch(pages)
    assert out.column_names == ["doc_id", "url", "warc_ts", "lang", "text"]
    from engine.schema import doc_id_of_url

    rows = out.to_pylist()
    for r in rows:
        assert r["doc_id"] == doc_id_of_url(r["url"])
        assert 0 <= r["doc_id"] < 2**63


def test_dedup_latest_in_batch():
    t = pa.table(
        {
            "url": ["a", "b", "a", "c"],
            "warc_ts": pa.array([100, 50, 200, 10], pa.timestamp("us")),
            "x": [1, 2, 3, 4],
        }
    )
    out = dedup_latest_in_batch(t)
    rows = {r["url"]: r["x"] for r in out.to_pylist()}
    assert rows == {"a": 3, "b": 2, "c": 4}


def test_fixture_has_dup_url():
    pages = synth.gen_pages_table(100)
    urls = pages["url"].to_pylist()
    assert urls[10] == urls[11]
    ts = pages["warc_ts"].to_pylist()
    assert ts[11] > ts[10]
    assert len(set(urls)) == 99

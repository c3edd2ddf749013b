"""Killable extraction sandbox: a poison page cannot stall a build (T4)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from engine._testing import POISON
from engine.sandbox import TimeoutExtractor


def test_sandbox_kills_hung_strategy_and_continues():
    ex = TimeoutExtractor(("engine._testing:hang_on_poison",), timeout_s=0.5)
    try:
        good = b"<html><body><p>hello world</p></body></html>"
        assert ex.extract_one(good) == "hello world"
        assert ex.extract_one(POISON + good) == ""  # killed, no fallback
        assert ex.restarts == 1
        # sidecar was restarted transparently; next rows still work
        assert ex.extract_one(good) == "hello world"
    finally:
        ex.close()


def test_sandbox_falls_through_to_next_strategy():
    ex = TimeoutExtractor(
        ("engine._testing:hang_on_poison", "engine.extract:extract_text"),
        timeout_s=0.5,
    )
    try:
        page = POISON + b"<html><body><p>rescued text</p></body></html>"
        assert ex.extract_one(page) == "rescued text"  # strategy 2 saves it
        assert ex.restarts == 1
    finally:
        ex.close()


def test_exception_strategy_falls_through_without_kill():
    ex = TimeoutExtractor(
        ("engine._testing:raise_on_poison", "engine.extract:extract_text"),
        timeout_s=2.0,
    )
    try:
        page = POISON + b"<html><body><p>ok</p></body></html>"
        assert ex.extract_one(page) == "ok"
        assert ex.restarts == 0  # exception != hang: no kill needed
    finally:
        ex.close()


def test_poison_page_cannot_stall_a_build(tmp_path):
    """End-to-end: one poisoned page in a pages partition; the build with a
    sandboxed chain completes, the fallback strategy rescues the page, and
    every other doc is indexed normally."""
    from engine import synth
    from engine.build import build_index
    from engine.query import IndexReader

    pages_dir = str(tmp_path / "pages")
    synth.write_pages(pages_dir, 120, num_files=2)
    f0 = os.path.join(pages_dir, sorted(os.listdir(pages_dir))[0])
    tbl = pq.read_table(f0)
    htmls = tbl["html"].to_pylist()
    from engine.extract import extract_text

    # poison a page whose ground-truth extraction is non-empty (synth plants
    # empty-page fixtures whose correct text IS "")
    target = next(i for i, h in enumerate(htmls) if len(extract_text(h)) > 10)
    want_text = extract_text(htmls[target])
    htmls[target] = POISON + htmls[target]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("html"), "html", pa.array(htmls, pa.binary())
    )
    pq.write_table(tbl, f0)

    idx = str(tmp_path / "idx")
    m = build_index(
        pages_dir, idx, num_partitions=2,
        extract_chain=(
            "engine._testing:hang_on_poison", "engine.extract:extract_text",
        ),
        extract_timeout_s=1.0,
    )
    assert m["n_docs"] == 120 - 1  # synth's one duplicate url
    # the poisoned doc was rescued by the fallback: byte-identical text
    poisoned_url = tbl["url"][target].as_py()
    from engine.schema import doc_id_of_url

    reader = IndexReader(idx)
    doc = reader.fetch_docs([doc_id_of_url(poisoned_url)], columns=["doc_id", "text"])
    assert doc.num_rows == 1 and doc["text"][0].as_py() == want_text
    shutil.rmtree(idx, ignore_errors=True)

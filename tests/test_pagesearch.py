"""Pages-path flagship: HTML rendering inverts through extraction, the
cross-partition re-crawl dedup picks the v2 body, and lang/ts filters
restrict the top-k (the DuckDB gate covers score parity; these tests pin
the pipeline-level behaviors)."""

import pyarrow.parquet as pq

from engine.extract import extract_text
from engine.ops import pagesearch

SF = "/root/testdata/sf0.001"


def test_render_html_inverts_to_text():
    docs = pq.read_table(SF + "/documents.parquet", columns=["text"])
    for text in docs["text"].to_pylist()[:50]:
        got = extract_text(pagesearch.render_html(text))
        # the two <p> halves re-join with '\n'; tokens must be unchanged
        assert got.replace("\n", " ").strip() == text.strip()


def test_pages_flagship_dedup_and_filters():
    df = pagesearch.pages_bm25_topk(SF)
    assert list(df.columns) == ["query_id", "rank", "url", "score_r6"]
    assert set(df["query_id"]) <= set(range(len(pagesearch.PAGE_QUERIES)))
    # every hit respects its query's lang filter (url -> doc_id -> lang)
    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "lang"])
    lang_of = dict(zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist()))
    for qid, grp in df.groupby("query_id"):
        want_lang = pagesearch.PAGE_QUERIES[int(qid)][1]
        for url in grp["url"]:
            did = int(url.rsplit("/", 1)[1])
            assert lang_of[did] == want_lang, (qid, url)
        # ranks are 1..n contiguous, scores non-increasing
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        s = list(grp["score_r6"])
        assert all(a >= b for a, b in zip(s, s[1:]))


def test_recrawled_doc_serves_v2_body():
    reader = pagesearch._index_for(SF)
    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    recrawled = [
        (d, t) for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if d % pagesearch.RECRAWL_MOD == 0
    ]
    assert recrawled
    import numpy as np

    from engine.schema import doc_id_of_url

    for did, text in recrawled[:3]:
        h = doc_id_of_url(f"http://docs.example/{did}")
        tbl = reader.fetch_docs([h], columns=["doc_id", "text"])
        assert tbl.num_rows == 1
        stored = tbl["text"][0].as_py().replace("\n", " ").strip()
        assert stored == (text + " v2").strip(), did

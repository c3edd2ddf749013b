"""End-to-end conformance: distributed build + BMW query vs the
single-process oracle (FIXTURES.md §3) — rank-identical docIDs AND float64
scores on the fixed 73-query set, byte-identical extracted text per url."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from engine import synth
from engine.build import build_index
from engine.oracle import OracleIndex, expected_topk_table
from engine.query import IndexReader

N_DOCS = 1000


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    pages_dir = str(root / "pages")
    index_dir = str(root / "index")
    synth.write_pages(pages_dir, N_DOCS, num_files=6)
    metrics = build_index(pages_dir, index_dir, num_partitions=3)
    return pages_dir, index_dir, metrics


def test_build_metrics(built_index):
    _, _, metrics = built_index
    # 1000 generated rows, one duplicated url -> 999 docs in the index
    assert metrics["n_docs"] == N_DOCS - 1
    assert metrics["n_terms"] > 100
    assert metrics["avgdl"] > 0
    assert metrics["n_hot_terms"] > 0, "Zipf head should produce salted terms"


def test_extracted_byte_identical(built_index):
    pages_dir, index_dir, _ = built_index
    pages = synth.gen_pages_table(N_DOCS)
    truth = {}
    for r in pages.to_pylist():
        # keep-latest per url: later row index wins in the fixture
        truth[r["url"]] = r["text"]
    ext = pads.dataset(os.path.join(index_dir, "extracted")).to_table(
        columns=["url", "warc_ts", "text"]
    )
    # pick the latest row per url (extracted keeps losers as doc-store rows)
    best = {}
    for r in ext.to_pylist():
        if r["url"] not in best or r["warc_ts"] > best[r["url"]][0]:
            best[r["url"]] = (r["warc_ts"], r["text"])
    assert set(best) == set(truth)
    for url, (_, text) in best.items():
        assert text == truth[url], f"byte mismatch for {url}"


@pytest.mark.parametrize("method", ["bmw", "vectorized", "maxscore", "auto"])
def test_topk_rank_identical(built_index, method):
    pages_dir, index_dir, _ = built_index
    pages = synth.gen_pages_table(N_DOCS)
    queries = synth.gen_queries_table(73)
    expected = expected_topk_table(pages, queries)
    reader = IndexReader(index_dir)
    got = reader.topk_table(queries, method=method)
    assert got.num_rows == expected.num_rows, (
        f"result count mismatch: {got.num_rows} vs {expected.num_rows}"
    )
    e, g = expected.to_pylist(), got.to_pylist()
    for i, (er, gr) in enumerate(zip(e, g)):
        assert gr["query_id"] == er["query_id"] and gr["rank"] == er["rank"]
        assert gr["doc_id"] == er["doc_id"], (
            f"row {i} q{er['query_id']} rank {er['rank']}: "
            f"doc {gr['doc_id']} != {er['doc_id']}"
        )
        assert gr["score"] == er["score"], (
            f"row {i} q{er['query_id']}: score {gr['score']!r} != {er['score']!r}"
        )
        assert gr["url"] == er["url"]


def test_filters_and_rerank_present(built_index):
    # the query set must actually exercise filters and the rerank path
    queries = synth.gen_queries_table(73).to_pylist()
    assert any(q["lang_filter"] for q in queries)
    assert any(q["ts_min"] is not None for q in queries)
    assert any(q["prior_weight"] > 0 for q in queries)


def test_search_basics(built_index):
    _, index_dir, _ = built_index
    reader = IndexReader(index_dir)
    res = reader.search(synth.HEAD_TERMS[0], k=5)
    assert len(res) == 5
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    assert reader.search("zzqqoovnothing", k=5) == []
    # filter-only-lang query returns only en docs
    res = reader.search(synth.HEAD_TERMS[0], k=10, lang_filter="de")
    docs = reader.fetch_docs([d for d, _ in res], columns=["doc_id", "lang", "warc_ts"])
    assert set(docs["lang"].to_pylist()) <= {"de"}


def test_oracle_against_bruteforce_sanity():
    """Cross-check the oracle itself with an independent numpy BM25."""
    pages = synth.gen_pages_table(200)
    idx = OracleIndex(pages)
    from engine.analyze import tokenize
    from engine.schema import B, K1

    q = synth.HEAD_TERMS[0] + " " + synth.VOCAB[150]
    terms = sorted(set(tokenize(q)))
    scores = {}
    for t in terms:
        df = len(idx.postings.get(t, {}))
        if not df:
            continue
        w = float(np.log((idx.n_docs - df + 0.5) / (df + 0.5) + 1.0))
        for did, tf in idx.postings[t].items():
            dl = idx.docs[did].doclen
            imp = tf * (K1 + 1.0) / (tf + K1 * ((1.0 - B) + (B * dl) / idx.avgdl))
            scores[did] = scores.get(did, 0.0) + w * imp
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = idx.search(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_sparse_path_bitwise_equals_dense(built_index):
    """The sparse (sort+reduceat) scorer returns bitwise-identical float64
    scores to the dense accumulator, with and without metadata filters."""
    _, index_dir, _ = built_index
    r = IndexReader(index_dir)
    queries = [
        synth.VOCAB[500] + " " + synth.VOCAB[800],
        synth.HEAD_TERMS[0] + " " + synth.VOCAB[300] + " " + synth.VOCAB[900],
    ]
    for q in queries:
        terms = sorted(set(t for t in q.split()))
        tcs = []
        for t in terms:
            chunks = [c for c in r._load_chunks(t) if c[0].size]
            if chunks:
                tcs.append((t, r.idf(t), chunks))
        for mask in (None, r._filter_mask("en", None, None)):
            assert r._sparse(tcs, 10, mask) == r._vectorized(tcs, 10, mask)


def test_segments_store_dense_docnos(built_index):
    """FORMAT_VERSION 9 structural contract: every decoded posting id is a
    dense docno in [0, n_docmeta) — NOT a raw 64-bit url-hash — and mapping
    docnos through the doc_id-sorted docmeta order recovers exactly the
    oracle's posting doc_ids per term.  This is what lets filter masks index
    postings directly and cuts the dominant v8 segment bytes (~2^64/df
    delta gaps) to ~N/df."""
    pages_dir, index_dir, metrics = built_index
    r = IndexReader(index_dir)
    r._load_docmeta()
    meta_ids = r._docmeta[0]
    oracle = OracleIndex(synth.gen_pages_table(N_DOCS))
    terms = [synth.HEAD_TERMS[0], synth.VOCAB[300], synth.VOCAB[800]]
    for t in terms:
        chunks = r._load_chunks(t)
        docnos = np.sort(np.concatenate([c[0] for c in chunks]))
        assert docnos.size == r.df(t)
        assert docnos.max() < meta_ids.size  # dense, not hash-valued
        got_ids = np.sort(meta_ids[docnos.astype(np.int64)])
        want = np.sort(
            np.array(sorted(oracle.postings[t]), dtype=np.uint64)
        )
        assert np.array_equal(got_ids, want), t

"""Query actor pool: distributed serving stays rank-identical to a local
reader, and the pool fans a query list across actors."""

import pytest

from engine import synth
from engine.build import build_index
from engine.query import IndexReader
from engine.serve import QueryPool


@pytest.fixture(scope="module")
def served_index(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    pages_dir = str(root / "pages")
    synth.write_pages(pages_dir, 500, num_files=4)
    index_dir = str(root / "index")
    build_index(pages_dir, index_dir, num_partitions=2)
    return index_dir


def test_pool_matches_local_reader(served_index):
    local = IndexReader(served_index)
    pool = QueryPool(served_index, num_actors=3)
    try:
        queries = [
            {"query_text": q["query_text"], "k": q["k"]}
            for q in synth.gen_queries_table(20).to_pylist()
        ]
        got = pool.search_many([dict(q) for q in queries])
        for q, res in zip(queries, got):
            assert res == local.search(q["query_text"], k=q["k"])
        # single-query path too
        one = pool.search(queries[0]["query_text"], k=queries[0]["k"])
        assert one == local.search(queries[0]["query_text"], k=queries[0]["k"])
    finally:
        pool.shutdown()

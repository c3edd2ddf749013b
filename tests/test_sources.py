"""Second ingest format (zip-of-JSONL) + union, and list-typed column ops."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_jsonl_zip_roundtrip_and_union():
    from engine.ops.multisource import _sources_for, docs_union_sources

    got = docs_union_sources(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet").to_pandas()
    assert len(got) == len(docs)
    assert sorted(got["doc_id"]) == sorted(docs["doc_id"])
    # src discriminator follows the split rule; text round-tripped intact
    by_id = docs.set_index("doc_id")
    for _, r in got.sample(50, random_state=0).iterrows():
        want_src = "parquet" if r["doc_id"] % 2 == 0 else "jsonl_zip"
        assert r["src"] == want_src
        assert r["n_chars"] == len(by_id.loc[r["doc_id"], "text"])
    # the zip side actually exists on disk as zip archives
    import os
    import zipfile

    _, zip_dir = _sources_for(SF)
    zips = [f for f in os.listdir(zip_dir) if f.endswith(".zip")]
    assert zips
    with zipfile.ZipFile(os.path.join(zip_dir, zips[0])) as zf:
        assert any(n.endswith(".jsonl") for n in zf.namelist())


def test_authors_list_construction_vectorized():
    from engine.ops.listops import NUM_AUTHORS, authors_of

    ids = np.arange(200, dtype=np.int64)
    lists = authors_of(ids).to_pylist()
    for did, authors in zip(ids, lists):
        assert len(authors) == 1 + did % 3
        assert len(set(authors)) == len(authors)  # distinct within a doc
        for i, a in enumerate(authors):
            assert a == f"author_{(did * 7 + i * 13) % NUM_AUTHORS}"

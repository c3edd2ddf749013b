"""Profile warm BM25 query latency over the persisted 1.5M bench index.

    python scripts/profile_query.py [index_dir]

Prints per-method p50/p95 over the 73-query conformance set plus a breakdown
of the slowest queries (term count, total postings, chosen path).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine import synth
from engine.analyze import tokenize
from engine.query import IndexReader


def main() -> None:
    index_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rayft_iter_idx_1500000"
    reader = IndexReader(index_dir)
    qtbl = synth.gen_queries_table(73).to_pylist()

    # warm pass
    for q in qtbl:
        reader.search(q["query_text"], k=q["k"])

    rows = []
    for q in qtbl:
        terms = sorted(set(tokenize(q["query_text"], reader.analyzer)))
        postings = sum(reader._df.get(t, 0) for t in terms)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            reader.search(q["query_text"], k=q["k"])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows.append((best * 1e3, len(terms), postings, q["query_id"],
                     q["lang_filter"] is not None or q["ts_min"] is not None))
    lat = np.array([r[0] for r in rows])
    print(f"n={len(lat)} p50={np.percentile(lat,50):.2f}ms "
          f"p95={np.percentile(lat,95):.2f}ms max={lat.max():.2f}ms mean={lat.mean():.2f}ms")
    rows.sort(reverse=True)
    print("slowest 12: (ms, n_terms, postings, qid, filtered)")
    for r in rows[:12]:
        print(f"  {r[0]:8.2f}ms terms={r[1]} postings={r[2]:>9} qid={r[3]} filt={r[4]}")


if __name__ == "__main__":
    main()

"""Profile the full index build at a given CPU count; prints phase timings.

    python scripts/profile_build.py <ncpus> [n_docs]

Used to chase the north-rule scaling bar (BASELINE.json: >=0.8 efficiency
from N to 4N); run in fresh processes at 8 and 32 cpus on the same corpus.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ncpu = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from engine import synth  # noqa: F401  (worker warm import below)

    corpus = os.path.join(tempfile.gettempdir(), f"rayft_bench_pages_{n_docs}_32")
    assert os.path.exists(os.path.join(corpus, ".complete")), corpus

    def _warm(b):
        import engine.build  # noqa: F401
        return b

    ray.data.range(1024).map_batches(_warm, batch_size=8).count()
    ray.data.read_parquet(corpus).count()

    from engine.build import build_index

    index_dir = tempfile.mkdtemp(prefix="rayft_prof_idx_")
    try:
        t0 = time.perf_counter()
        m = build_index(corpus, index_dir, num_partitions=8)
        total = time.perf_counter() - t0
        out_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(index_dir) for f in fs
        )
        print(json.dumps({
            "ncpu": ncpu,
            "n_docs": m["n_docs"],
            "total_s": round(total, 1),
            "docs_per_s": round(m["n_docs"] / total, 1),
            "phase_seconds": m["phase_seconds"],
            "index_gb": round(out_bytes / 1e9, 2),
        }))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

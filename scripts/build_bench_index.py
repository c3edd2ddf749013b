"""Build (and keep) the big bench index for query-latency iteration.

    python scripts/build_bench_index.py [n_docs] [ncpus]

Generates the deterministic synthetic corpus (engine/synth.py) if missing and
builds the index to /tmp/rayft_iter_idx_<n_docs>, skipping if already built.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    corpus = os.path.join(tempfile.gettempdir(), f"rayft_bench_pages_{n_docs}_32")
    marker = os.path.join(corpus, ".complete")
    if not os.path.exists(marker):
        from engine import synth

        shutil.rmtree(corpus, ignore_errors=True)
        t0 = time.perf_counter()
        synth.write_pages(corpus, n_docs, num_files=32)
        with open(marker, "w") as f:
            f.write("ok")
        print(f"corpus gen: {time.perf_counter() - t0:.1f}s", flush=True)

    index_dir = os.path.join(tempfile.gettempdir(), f"rayft_iter_idx_{n_docs}")
    if os.path.exists(os.path.join(index_dir, "stats.json")):
        print(f"index exists: {index_dir}", flush=True)
        return

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from engine.build import build_index

    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.perf_counter()
    m = build_index(corpus, index_dir, num_partitions=8)
    print(json.dumps({
        "n_docs": m["n_docs"],
        "build_s": round(time.perf_counter() - t0, 1),
        "phase_seconds": m["phase_seconds"],
        "index_dir": index_dir,
    }), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

"""`ray job submit` entrypoint for cluster index builds (the north rule's
job-submission surface; the reference's analog is its cron/systemd-driven
`python -m ec2.parse_arxiv_papers` batch runs).

On a real fixed-size cluster:

    ray job submit --working-dir . -- \
        python scripts/job_build.py --input /shared/pages \
            --index-dir /shared/idx --num-shards 64

Inside a submitted job `ray.init()` connects to the hosting cluster; in this
sandbox the same command runs standalone (RAY_ADDRESS=local starts a local
node), so the script is testable end-to-end on one box.  The script owns its
Ray session (library code never calls ray.init), prints ONE JSON line of
build metrics on success, and exits nonzero on failure so the job status
reflects the build.

Resubmitting the SAME job after a preemption or failure resumes: every build
phase checkpoints per partition under a lineage manifest
(engine/checkpoint.py), so finished phases — and, sharded, finished shards —
are skipped and only unfinished work re-runs.  That per-partition
lineage+metrics resume is exactly the driver-loss story `ray job submit`
needs and is asserted by tests/test_resume.py and test_serve.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root (under `ray job submit --working-dir .` the job's cwd) on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="job_build")
    p.add_argument("--input", required=True,
                   help="pages parquet dir/file(s); comma-separated for many")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--num-shards", type=int, default=0,
                   help="0 = one index; N>0 = doc-sharded build_sharded(N)")
    p.add_argument("--partitions", type=int, default=8,
                   help="exchange partitions per index")
    p.add_argument("--positions", action="store_true",
                   help="store token positions (phrase/proximity off postings)")
    p.add_argument("--docs-table", action="store_true",
                   help="input is a documents(doc_id, text, lang) table")
    p.add_argument("--smoke-query", default=None,
                   help="run this query post-build as a health check")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # in a submitted job this connects to the hosting cluster; standalone
        # (RAY_ADDRESS=local) it starts a local node
        ray.init(include_dashboard=False, logging_level="ERROR",
                 ignore_reinit_error=True)
    try:
        inputs = args.input.split(",") if "," in args.input else args.input
        kind = "documents" if args.docs_table else "pages"
        t0 = time.perf_counter()
        if args.num_shards > 0:
            from engine.serve import build_sharded

            shard_dirs = build_sharded(
                inputs, args.index_dir, args.num_shards,
                num_partitions=args.partitions,
                input_kind=kind, store_positions=args.positions,
            )
            out = {"status": "ok", "mode": "sharded",
                   "shards": len(shard_dirs), "index_dir": args.index_dir,
                   "build_s": round(time.perf_counter() - t0, 3)}
        else:
            from engine.build import build_index

            metrics = build_index(
                inputs, args.index_dir,
                num_partitions=args.partitions,
                input_kind=kind, store_positions=args.positions,
            )
            out = {"status": "ok", "mode": "single",
                   "index_dir": args.index_dir,
                   "build_s": round(time.perf_counter() - t0, 3),
                   "n_docs": metrics.get("n_docs"),
                   "metrics": {k: v for k, v in metrics.items()
                               if isinstance(v, (int, float, str))}}
        if args.smoke_query:
            if args.num_shards > 0:
                from engine.serve import ShardedQueryPool

                pool = ShardedQueryPool(shard_dirs)
                hits = pool.search(args.smoke_query, k=5)
                pool.shutdown()
            else:
                from engine.query import IndexReader

                hits = IndexReader(args.index_dir).search(args.smoke_query, k=5)
            out["smoke_query_hits"] = len(hits)
        print(json.dumps(out))
        return 0
    except Exception as e:  # job status must reflect the failure
        print(json.dumps({"status": "error", "error": f"{type(e).__name__}: {e}"}))
        return 1
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

"""10x scale probe (round-4 verdict #8): run the heavy grouped kernels at
sf0.1 and at a deterministic 10x synthesis of it ("sf1"), and report the
wall-time ratio per op.

A coarse-partition kernel whose cost is linear in rows should show ratio
~10 (modulo fixed overhead amortizing, which pushes the ratio BELOW 10);
superlinear ratios (>10x + slack) flag a group-count-sensitive stage.

The 10x tables are derived from the existing sf0.1 fixtures (no external
data): each replica k shifts ids into a fresh range and substitutes every
5th token with a replica-tagged variant, so within-replica dup/shingle
structure is preserved exactly (10x the groups) while every 8-token span
and most shingles DIFFER across replicas — replicas don't collapse into
giant cross-replica dup cliques (a token-rotation variant did: rotation
preserves the shingle set, and minhash clustered 49.9k/50k docs).  Events
shift user_id per replica -> 10x the session/user groups at the same
per-user density.

Usage: python scripts/scale_probe.py  (prints one JSON line)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/rayft_sf1_probe"
REPLICAS = 10


def synth_10x() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(OUT, ".complete")
    if os.path.exists(marker):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    docs = pq.read_table(os.path.join(SF, "documents.parquet"))
    n_docs = docs.num_rows
    texts = docs["text"].to_pylist()
    parts = []
    for k in range(REPLICAS):
        if k == 0:
            rot = texts
        else:
            rot = []
            for t in texts:
                w = t.split(" ")
                for i in range(0, len(w), 5):
                    w[i] = f"r{k}x{w[i]}"
                rot.append(" ".join(w))
        parts.append(
            pa.table(
                {
                    "doc_id": pa.compute.add(docs["doc_id"], k * n_docs),
                    "text": pa.array(rot, pa.string()),
                    "lang": docs["lang"],
                    "source": docs["source"],
                    "n_chars": docs["n_chars"],
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(OUT, "documents.parquet"))
    ev = pq.read_table(os.path.join(SF, "events.parquet"))
    n_ev = ev.num_rows
    n_users = 1 + int(pa.compute.max(ev["user_id"]).as_py() or 0)
    parts = [
        pa.table(
            {
                "event_id": pa.compute.add(ev["event_id"], k * n_ev),
                "ts": ev["ts"],
                "user_id": pa.compute.add(ev["user_id"], k * n_users),
                "event_type": ev["event_type"],
                "value": ev["value"],
                "props": ev["props"],
            }
        )
        for k in range(REPLICAS)
    ]
    pq.write_table(pa.concat_tables(parts), os.path.join(OUT, "events.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return OUT


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from bench import calibrate
    from engine.ops import dedup, relational

    big = synth_10x()
    out = {"sf_small": SF, "sf_big": big, "replicas": REPLICAS,
           "box_calibration_docs_per_s": calibrate()}

    def consume(res):
        import pandas as pd
        import pyarrow as pa

        if isinstance(res, (pd.DataFrame, pa.Table)):
            return len(res)
        return res.count()

    for name, fn in [
        ("events_sessionize", relational.events_sessionize),
        ("dup_span_fraction", dedup.dup_span_fraction),
        ("minhash_dup_clusters", dedup.minhash_dup_clusters),
    ]:
        consume(fn(SF))  # warm (worker import, page cache)
        t0 = time.perf_counter()
        n_small = consume(fn(SF))
        small_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_big = consume(fn(big))
        big_s = time.perf_counter() - t0
        out[name] = {
            "small_s": round(small_s, 2),
            "big_s": round(big_s, 2),
            "ratio": round(big_s / small_s, 2),
            "rows_small": int(n_small),
            "rows_big": int(n_big),
        }
    out["box_calibration_end_docs_per_s"] = calibrate()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

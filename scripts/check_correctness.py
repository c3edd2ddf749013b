"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive values).  Usage:

    python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"schema: {sorted(got.columns)} vs {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows: {len(got)} vs {len(want)}")
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c], w[c]
            if pd.api.types.is_float_dtype(gv):
                ok = np.allclose(gv.fillna(-1e300), wv.fillna(-1e300), rtol=0, atol=0)
            else:
                ok = gv.equals(wv)
            if not ok:
                if pd.api.types.is_float_dtype(gv):
                    diff = ~np.isclose(
                        gv.fillna(-1e300).to_numpy(), wv.fillna(-1e300).to_numpy(),
                        rtol=0, atol=0,
                    )
                else:
                    diff = (gv != wv).to_numpy()
                i = int(np.argmax(diff))
                problems.append(
                    f"col {c}: {int(diff.sum())} diffs, first at row {i}: "
                    f"{gv.iloc[i]!r} vs {wv.iloc[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, sqls = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            continue
        try:
            want = con.sql(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = compare(name, got, want)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"pass {name}: {len(got)} rows ({dt:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

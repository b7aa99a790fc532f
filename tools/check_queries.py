"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side on one sf dir, compare
row-count + schema + order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda x: tuple(x.tolist()) if hasattr(x, "tolist")
                else (tuple(x) if isinstance(x, (list, tuple)) else x)
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if len(got) != len(want):
        errs.append(f"rows {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        return errs
    g, w = canon(got), canon(want)
    if len(g) != len(w):
        return errs
    for c in g.columns:
        gv, wv = g[c], w[c]
        if wv.dtype.kind == "f" or gv.dtype.kind == "f":
            a = gv.to_numpy(dtype=float)
            b = wv.to_numpy(dtype=float)
            both_nan = np.isnan(a) & np.isnan(b)
            if not (np.array_equal(a[~both_nan], b[~both_nan])):
                bad = np.flatnonzero(~both_nan & (a != b))[:3]
                errs.append(f"col {c}: {len(np.flatnonzero(a!=b))} float mismatches e.g. idx {bad.tolist()} {a[bad][:3]} vs {b[bad][:3]}")
        else:
            eq = gv.reset_index(drop=True).equals(wv.reset_index(drop=True))
            if not eq:
                neq = [i for i, (x, y) in enumerate(zip(gv, wv)) if x != y and not (pd.isna(x) and pd.isna(y))][:3]
                if neq:
                    errs.append(f"col {c}: mismatch at {neq} {[ (gv.iloc[i], wv.iloc[i]) for i in neq ]}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd/comma-joined filter would otherwise run NOTHING and
        # print a vacuous "FAILS: 0"
        print(f"ERROR: unknown query names {sorted(unknown)}")
        sys.exit(2)
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray error {type(ex).__name__}: {ex}")
            fails += 1
            continue
        t1 = time.time()
        if name not in sqls:
            print(f"ROWS-ONLY {name}: {len(got)} rows ({t1-t0:.1f}s)")
            continue
        try:
            want = con.sql(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: sql error {ex}")
            fails += 1
            continue
        errs = compare(name, got, want)
        if errs:
            fails += 1
            print(f"FAIL {name} ({t1-t0:.1f}s): " + "; ".join(errs))
        else:
            print(f"OK   {name}: {len(got)} rows ({t1-t0:.1f}s ray, {time.time()-t1:.1f}s sql)")
    print("FAILS:", fails)
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

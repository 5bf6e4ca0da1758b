"""Simulate the driver's correctness gate locally.

Runs every __ray_entry__.queries() callable against its oracle_sql()
twin on a testdata tier and reports row-count / schema / value matches
(exact, after sorting columns by name and rows by all columns).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, eng: pd.DataFrame, ora: pd.DataFrame) -> bool:
    if len(eng) != len(ora):
        print(f"FAIL {name}: rows {len(eng)} vs {len(ora)}")
        return False
    e, o = canon(eng), canon(ora)
    if list(e.columns) != list(o.columns):
        print(f"FAIL {name}: cols {list(e.columns)} vs {list(o.columns)}")
        return False
    ok = True
    for c in e.columns:
        ev, ov = e[c].to_numpy(), o[c].to_numpy()
        if ev.dtype.kind == "f" or ov.dtype.kind == "f":
            same = np.array_equal(ev.astype(np.float64), ov.astype(np.float64))
            if not same:
                d = np.abs(ev.astype(np.float64) - ov.astype(np.float64))
                print(f"FAIL {name}.{c}: max float diff {np.nanmax(d):.3e} "
                      f"({int((d > 0).sum())} rows)")
                ok = False
        elif not np.array_equal(ev, ov):
            bad = int((ev != ov).sum())
            i = int(np.nonzero(ev != ov)[0][0])
            print(f"FAIL {name}.{c}: {bad} mismatches, first at {i}: "
                  f"{ev[i]!r} vs {ov[i]!r}")
            ok = False
    if ok:
        print(f"OK   {name}: {len(eng)} rows")
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    failed = []
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            eng = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: engine raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        t1 = time.time()
        sql = sqls.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle ({len(eng)} rows)")
            continue
        try:
            ora = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        t2 = time.time()
        if not compare(name, eng, ora):
            failed.append(name)
        else:
            print(f"     engine {t1-t0:.1f}s oracle {t2-t1:.1f}s")
    ray.shutdown()
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

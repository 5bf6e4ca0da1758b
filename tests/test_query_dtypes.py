"""Dtype stability: every oracled query's pandas dtypes must equal
its DuckDB oracle's dtypes at sf0.001 AND sf0.01 (VERDICT r3 #7: an
upcast that only bites when a group is empty at one scale must not
hide in the untested scale).

Round 2's only red driver row (events_asof) was exactly this class of
bug — values identical, but a pandas null-fill upcast shipped an int64
id column as float64 and broke the value hash. Catch it locally for
every query instead of once per round (VERDICT r2 #8)."""

import glob
import os

import duckdb
import pandas as pd
import pytest

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _oracle_con(sf):
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _names():
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    return sorted(set(qs) & set(osql))


@pytest.mark.parametrize("sf", SCALES)
@pytest.mark.parametrize("name", _names())
def test_query_dtypes_match_oracle(name, sf, ray_session):
    import __ray_entry__ as e

    res = e.queries()[name](sf)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    ora = _oracle_con(sf).execute(e.oracle_sql()[name]).df()
    assert sorted(res.columns) == sorted(ora.columns), \
        f"{name}: column sets differ"
    got = {c: str(res[c].dtype) for c in res.columns}
    want = {c: str(ora[c].dtype) for c in ora.columns}
    assert got == want, f"{name}: dtype mismatch {got} vs {want}"

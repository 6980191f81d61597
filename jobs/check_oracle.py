"""Local correctness harness: run every SQL-oracle query through the
Ray engine AND DuckDB, compare row count + sorted values.

Usage: python jobs/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(sorted(a.columns)) != list(sorted(b.columns)):
        return False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if (ka in "iu") != (kb in "iu"):
            return False, f"col {c} dtype kind differs: {a[c].dtype} vs {b[c].dtype}"
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0):
                bad = np.flatnonzero(av.astype(float) != bv.astype(float))[:3]
                return False, f"col {c} differs at {bad}: {av[bad]} vs {bv[bad]}"
        else:
            if not (av == bv).all():
                bad = np.flatnonzero(av != bv)[:3]
                return False, f"col {c} differs at {bad}: {av[bad]} vs {bv[bad]}"
    return True, "ok"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = 0
    for name, sql in sqls.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(qs[name](sf_dir))
            want = con.execute(sql).fetchdf()
            ok, msg = compare(got, want)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

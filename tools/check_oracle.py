"""Local stand-in for the driver's correctness gate: run engine queries
and their DuckDB oracle SQL side by side, compare rows/schema/values
(columns sorted by name, rows sorted by all columns — the driver hashes
order-insensitively).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd


def to_df(out) -> pd.DataFrame:
    if hasattr(out, "to_pandas"):
        return out.to_pandas()
    if isinstance(out, pd.DataFrame):
        return out
    import pyarrow as pa

    if isinstance(out, pa.Table):
        return out.to_pandas()
    raise TypeError(type(out))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> dict:
    res = {"rows_match": len(a) == len(b), "schema_match": None, "hash_match": None,
           "engine_rows": len(a), "oracle_rows": len(b), "detail": ""}
    a, b = canon(a), canon(b)
    res["schema_match"] = list(a.columns) == list(b.columns) and all(
        str(a[c].dtype) == str(b[c].dtype) for c in a.columns
    )
    if not res["schema_match"]:
        res["detail"] = f"engine {[(c, str(a[c].dtype)) for c in a.columns]} vs oracle {[(c, str(b[c].dtype)) for c in b.columns]}"
    if res["rows_match"]:
        try:
            eq = True
            for c in a.columns:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                if np.issubdtype(av.dtype, np.floating) or np.issubdtype(np.asarray(bv).dtype, np.floating):
                    ok = np.allclose(av.astype(np.float64), np.asarray(bv, np.float64), rtol=0, atol=0, equal_nan=True)
                else:
                    ok = (pd.Series(av).fillna("__n__") == pd.Series(bv).fillna("__n__")).all()
                if not ok:
                    eq = False
                    bad = np.flatnonzero(~(pd.Series(av).fillna("__n__") == pd.Series(bv).fillna("__n__")).to_numpy())[:3]
                    res["detail"] += f" col {c} mismatch at rows {bad.tolist()}: {av[bad][:3]} vs {np.asarray(bv)[bad][:3]}"
            res["hash_match"] = eq
        except Exception as e:  # noqa: BLE001
            res["hash_match"] = False
            res["detail"] += f" compare error: {e}"
    return res


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import os

    os.environ["GDAL_RAY_ORACLE_SF"] = sf_dir
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in sqls]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in names:
        if name not in sqls:
            print(f"{name}: NO ORACLE")
            continue
        t0 = time.time()
        try:
            edf = to_df(qs[name](sf_dir))
            t_eng = time.time() - t0
            t0 = time.time()
            odf = con.execute(sqls[name]).fetchdf()
            t_sql = time.time() - t0
            r = compare(edf, odf)
            ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
            if not ok:
                failures += 1
            print(f"{name}: {'PASS' if ok else 'FAIL'} rows={r['engine_rows']}/{r['oracle_rows']} "
                  f"schema={r['schema_match']} hash={r['hash_match']} "
                  f"eng={t_eng:.1f}s sql={t_sql:.1f}s {r['detail'][:400]}", flush=True)
        except Exception as e:  # noqa: BLE001
            failures += 1
            import traceback

            traceback.print_exc()
            print(f"{name}: ERROR {e}", flush=True)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

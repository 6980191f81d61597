"""Independent reference implementations -> inline DuckDB oracles.

Many operators (sketches, rasters, tiles) are not expressible in plain
SQL over the input tables.  For those, the oracle is a GOLDEN result
computed by an INDEPENDENT single-process reference implementation
(separately-coded algorithms in this package — never the engine's
stages), rendered as a self-contained ``SELECT * FROM (VALUES ...)``
statement that DuckDB evaluates with no filesystem access.  This is
the checksum-golden discipline of the reference's
autotest/pyscripts/test_gdal2tiles.py:85-121, made visible to the
correctness driver.

Goldens are cached as parquet under /tmp/gdal_ray_oracle/<ver>/<scale>
keyed by the fixture scale, so repeated ``oracle_sql()`` calls render
instantly.

This package must NOT import from gdal_ray.stages / gdal_ray.pipelines
(independence); sharing pure *format* helpers (codecs to read the
input bytes, the checksum definition that IS the output format) is
allowed and noted per-use.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/gdal_ray_oracle/v5"

# Self-invalidating cache: each golden's cache file name embeds a
# content hash of the reference-impl module that builds it (plus its
# oracle_ref dependency closure and this file), so editing a reference
# implementation automatically orphans exactly ITS stale goldens — no
# manual version bump, and an edit to one module does not force the
# expensive re-render of every other module's goldens.
_MODULE_DEPS = {
    "rasterref": ("rasterref",),
    "tileref": ("tileref", "rasterref"),  # tileref imports rasterref
    "geomref": ("geomref", "tileref", "rasterref"),  # geomref -> tileref
    "textref": ("textref",),
    "annref": ("annref",),
}
_FP_CACHE: dict[str, str] = {}


def _module_fingerprint(modname: str) -> str:
    """Hash of the golden module's source + its oracle_ref deps +
    __init__.py."""
    short = modname.rsplit(".", 1)[-1]
    if short in _FP_CACHE:
        return _FP_CACHE[short]
    import hashlib

    pkg = os.path.dirname(__file__)
    h = hashlib.blake2b(digest_size=6)
    for f in _MODULE_DEPS.get(short, (short,)) + ("__init__",):
        with open(os.path.join(pkg, f + ".py"), "rb") as fh:
            h.update(fh.read())
    _FP_CACHE[short] = h.hexdigest()
    return _FP_CACHE[short]


def _scale_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "unknown"


def _sql_lit(v, dtype) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if np.issubdtype(dtype, np.floating):
        # DuckDB's decimal parse can be 1 ulp off; a dyadic rational
        # m / 2^k evaluates exactly (both operands and the quotient are
        # representable), so the golden double round-trips bit-exactly
        f = float(v)
        if f == 0.0 or not np.isfinite(f) or abs(f) >= 2.0**53:
            return repr(f)
        m, n = f.as_integer_ratio()
        if n > 2**60:  # denominator itself must parse exactly
            return repr(f)
        return f"({m} / {n}.0)" if n > 1 else f"{m}.0"
    if np.issubdtype(dtype, np.integer):
        return str(int(v))
    if np.issubdtype(dtype, np.bool_):
        return "TRUE" if v else "FALSE"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _sql_type(dtype) -> str:
    if np.issubdtype(dtype, np.floating):
        return "DOUBLE"
    if np.issubdtype(dtype, np.integer):
        return "BIGINT"
    if np.issubdtype(dtype, np.bool_):
        return "BOOLEAN"
    return "VARCHAR"


def values_sql(df: pd.DataFrame, order_by: list[str]) -> str:
    """Render a DataFrame as a typed inline-VALUES SELECT."""
    cols = list(df.columns)
    if len(df) == 0:
        sel = ", ".join(
            f"CAST(NULL AS {_sql_type(df[c].dtype)}) AS {c}" for c in cols
        )
        return f"SELECT {sel} WHERE FALSE"
    dtypes = {c: df[c].dtype for c in cols}
    rows = []
    first = True
    for tup in df.itertuples(index=False, name=None):
        if first:
            vals = ", ".join(
                f"CAST({_sql_lit(v, dtypes[c])} AS {_sql_type(dtypes[c])})"
                for v, c in zip(tup, cols)
            )
            first = False
        else:
            vals = ", ".join(_sql_lit(v, dtypes[c]) for v, c in zip(tup, cols))
        rows.append(f"({vals})")
    body = ",\n".join(rows)
    ob = ", ".join(order_by)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({', '.join(cols)}) ORDER BY {ob}"


def _registry():
    # name -> (builder(sf_dir) -> pd.DataFrame, order_by columns)
    from . import annref, geomref, rasterref, textref, tileref

    reg = {}
    reg.update(textref.GOLDENS)
    reg.update(annref.GOLDENS)
    reg.update(rasterref.GOLDENS)
    reg.update(tileref.GOLDENS)
    reg.update(geomref.GOLDENS)
    return reg


def _cache_path(name: str, sf_dir: str) -> str:
    builder, _ = _registry()[name]
    fp = _module_fingerprint(builder.__module__)
    return os.path.join(CACHE_ROOT, _scale_tag(sf_dir), f"{name}.{fp}.parquet")


def golden_df(name: str, sf_dir: str) -> pd.DataFrame:
    """Compute (or load cached) golden for one query at a scale."""
    builder, _ = _registry()[name]
    cache = _cache_path(name, sf_dir)
    if os.path.exists(cache):
        return pq.read_table(cache).to_pandas()
    df = builder(sf_dir)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = cache + f".tmp.{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, cache)
    return df


def _render_one(args: tuple) -> str:
    name, sf_dir = args
    golden_df(name, sf_dir)
    return name


def golden_sql(name: str, sf_dir: str) -> str:
    reg = _registry()
    _, order_by = reg[name]
    return values_sql(golden_df(name, sf_dir), order_by)


def render_missing(names: list[str], sf_dir: str) -> None:
    """Render any un-cached goldens with a process pool (builders are
    pure sf_dir -> DataFrame functions; the expensive single-process
    reference impls — contour, footprint, viewshed — otherwise
    serialize a full-suite render into an hour at sf0.01)."""
    missing = [n for n in names if not os.path.exists(_cache_path(n, sf_dir))]
    if len(missing) <= 1:
        return
    try:
        import concurrent.futures as cf

        workers = min(8, len(missing), os.cpu_count() or 4)
        with cf.ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_render_one, [(n, sf_dir) for n in missing]))
    except Exception:
        pass  # sequential fallback happens naturally in golden_df


def golden_oracle_sql(sf_dir: str) -> dict[str, str]:
    """All driver-facing golden oracle SQL statements for a scale
    ('part_*' goldens are composition inputs only, not queries)."""
    names = [n for n in _registry() if n.startswith("q")]
    render_missing(names, sf_dir)
    return {name: golden_sql(name, sf_dir) for name in names}


def golden_names() -> list[str]:
    return list(_registry())

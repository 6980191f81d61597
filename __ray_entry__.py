"""Driver contract for the gdal_ray engine (Ray Data target).

``entry()`` runs the flagship pipeline (image chips x polygons spatial
join + caption carry-through) at sf0.001 scale; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (plus the
training-data additions); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every SQL-expressible query (the rest are rows-only checked by
the driver and golden-tested in pytest).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or in gdal_ray library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: spatial join of the image-chip table against the
    polygon layer (cell co-partitioned, exactly-once) at smoke scale;
    returns the joined rows with captions carried through."""
    from gdal_ray.pipelines.queries import q23_spatial_join_images

    return q23_spatial_join_images("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from gdal_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """SQL-expressible oracles (static strings over the testdata views)
    plus golden-backed oracles: independent single-process reference
    implementations (gdal_ray.oracle_ref) rendered as self-contained
    inline-VALUES SELECTs at the driver's correctness scale (sf0.01;
    override with GDAL_RAY_ORACLE_SF for local checks)."""
    import os

    from gdal_ray.oracle_ref import golden_oracle_sql
    from gdal_ray.pipelines.queries import COMBINED_ORACLES, ORACLE_SQL

    sf_dir = os.environ.get("GDAL_RAY_ORACLE_SF", "/root/testdata/sf0.01")
    out = dict(ORACLE_SQL)
    out.update(golden_oracle_sql(sf_dir))
    out.update({name: fn(sf_dir) for name, fn in COMBINED_ORACLES.items()})
    return out

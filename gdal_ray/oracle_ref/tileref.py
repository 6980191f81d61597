"""Reference implementations for the tiling/mosaic queries —
single-process numpy, separately coded from the engine's stages.  The
WebMercator tile formulas are public math (gdal2tiles GlobalMercator,
gdal2tiles.py:422-497), restated here independently."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

ORIGIN_SHIFT = 20037508.342789244
INITIAL_RES = 156543.03392804097


def _fixture_paths(sf_dir: str):
    # input provisioning only: the fixture tables ARE the query inputs
    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    return ensure_fixtures(scale_for_sf_dir(sf_dir))


def _tile_of(m: np.ndarray, zoom: int) -> np.ndarray:
    px = (m + ORIGIN_SHIFT) / (INITIAL_RES / (1 << zoom))
    return np.maximum(np.ceil(px / 256.0) - 1, 0).astype(np.int64)


# -------------------------------------------------- q22 envelope cover


def q22_images_cells(sf_dir: str, zoom: int = 10) -> pd.DataFrame:
    t = pq.read_table(
        _fixture_paths(sf_dir)["images"], columns=["minx", "miny", "maxx", "maxy"]
    )
    tx0 = _tile_of(t.column("minx").to_numpy(), zoom)
    ty0 = _tile_of(t.column("miny").to_numpy(), zoom)
    n1 = (1 << zoom) - 1
    tx1 = np.minimum(_tile_of(t.column("maxx").to_numpy(), zoom), n1)
    ty1 = np.minimum(_tile_of(t.column("maxy").to_numpy(), zoom), n1)
    counts: dict[int, int] = {}
    for a, b, c, d in zip(tx0, tx1, ty0, ty1):
        for x in range(a, b + 1):
            for y in range(c, d + 1):
                cell = (zoom << 58) | (x << 29) | y
                counts[cell] = counts.get(cell, 0) + 1
    cells = np.asarray(sorted(counts), dtype=np.int64)
    return pd.DataFrame(
        {"cell": cells, "n": np.asarray([counts[c] for c in cells], np.int64)}
    )


GOLDENS: dict = {
    "q22_images_cells": (q22_images_cells, ["cell"]),
}

"""Driver registry (sources.registry) — the GDALOpenEx /
GDALIdentifyDriver front door: magic-byte sniffing + dispatch across
every format family the engine writes."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources.registry import identify, open_raster, open_vector


@pytest.fixture(scope="module")
def rngimg():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    return img, img[:, :, 0].copy()


def test_identify_raster_matrix(tmp_path, rngimg):
    import os

    from gdal_ray.functions.codecs import encode_png
    from gdal_ray.functions.jpegc import encode_jpeg
    from gdal_ray.functions.webp import encode_webp
    from gdal_ray.sources.grib2 import write_grib2
    from gdal_ray.sources.gtiff import write_cog
    from gdal_ray.sources.hdf5 import write_hdf5_latest
    from gdal_ray.sources.nitf import write_nitf
    from gdal_ray.sources.ntv2 import write_gtx
    from gdal_ray.sources.simple_rasters import (write_aaigrid,
                                                 write_bmp, write_pnm)

    img, g = rngimg
    d = str(tmp_path)
    cases = []
    p = os.path.join(d, "a.tif"); write_cog(p, img)
    cases.append((p, "gtiff"))
    p = os.path.join(d, "b.png")
    open(p, "wb").write(encode_png(img)); cases.append((p, "png"))
    p = os.path.join(d, "c.jpg")
    open(p, "wb").write(encode_jpeg(img)); cases.append((p, "jpeg"))
    p = os.path.join(d, "w.webp")
    open(p, "wb").write(encode_webp(img)); cases.append((p, "webp"))
    p = os.path.join(d, "e.bmp"); write_bmp(p, g)
    cases.append((p, "bmp"))
    p = os.path.join(d, "f.pgm"); write_pnm(p, g)
    cases.append((p, "pnm"))
    p = os.path.join(d, "h.h5")
    write_hdf5_latest(p, {"x": g.astype("<f8")})
    cases.append((p, "hdf5"))
    p = os.path.join(d, "i.grib2")
    write_grib2(p, [{"values": g.astype(float), "lat1": 60.0,
                     "lon1": 0.0, "di": 1.0, "dj": 1.0}])
    cases.append((p, "grib2"))
    p = os.path.join(d, "j.ntf"); write_nitf(p, [{"values": g}])
    cases.append((p, "nitf"))
    p = os.path.join(d, "k.asc"); write_aaigrid(p, g.astype(float))
    cases.append((p, "aaigrid"))
    p = os.path.join(d, "m.gtx")
    write_gtx(p, 0.0, 0.0, 1.0, 1.0, g[:4, :4].astype(float))
    cases.append((p, "gtx"))
    for path, want in cases:
        assert identify(path) == want, path
        out = open_raster(path)
        assert out["driver"] == want
    # unknown content errors loudly, naming the registry
    junk = os.path.join(d, "junk.bin")
    open(junk, "wb").write(b"\x00" * 64)
    with pytest.raises(ValueError, match="no driver"):
        identify(junk)


def test_identify_vector_and_dispatch(tmp_path, rngimg, ray_session):
    import os

    from gdal_ray.functions.geom import wkb_point
    from gdal_ray.sources.gpkg import write_gpkg
    from gdal_ray.sources.shapefile import write_shapefile

    t = pa.table({"geometry": [wkb_point(1.0, 2.0),
                               wkb_point(3.0, 4.0)],
                  "name": ["a", "b"]})
    d = str(tmp_path)
    shp = os.path.join(d, "v.shp")
    write_shapefile(t, shp)
    assert identify(shp) == "shapefile"
    assert open_vector(shp).count() == 2
    gj = os.path.join(d, "v.geojson")
    open(gj, "w").write(
        '{"type": "FeatureCollection", "features": [{"type": '
        '"Feature", "geometry": {"type": "Point", "coordinates": '
        '[1, 2]}, "properties": {}}]}')
    assert identify(gj) == "geojson"
    assert open_vector(gj).count() == 1
    gp = os.path.join(d, "v.gpkg")
    write_gpkg(t, gp)
    assert identify(gp) == "gpkg"
    assert open_vector(gp).count() == 2
    # raster/vector mismatch errors loudly
    with pytest.raises(ValueError, match="vector driver"):
        open_raster(shp)
    bmp = os.path.join(d, "r.bmp")
    from gdal_ray.sources.simple_rasters import write_bmp

    write_bmp(bmp, rngimg[1])
    with pytest.raises(ValueError, match="raster driver"):
        open_vector(bmp)
    # zarr3 directory sniffing
    from gdal_ray.sources.registry import identify as ident
    import json

    zd = os.path.join(d, "z.zarr")
    os.makedirs(zd)
    json.dump({"zarr_format": 3, "node_type": "array"},
              open(os.path.join(zd, "zarr.json"), "w"))
    assert ident(zd) == "zarr3"


def test_describe_raster_and_vector(tmp_path, ray_session):
    """describe() — the gdalinfo/ogrinfo front-door analog: driver,
    size, dtype, min/max and georef lines for rasters; feature count,
    fields, geometry kinds and extent for vectors."""
    import numpy as np

    from gdal_ray.functions import geom as G
    from gdal_ray.sources.mif import write_mif
    from gdal_ray.sources.registry import describe
    from gdal_ray.sources.terrain_rasters import write_ehdr

    img = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "d.bil")
    write_ehdr(p, img, ul_map=(500015.0, 4199985.0), dims=(30.0, 30.0))
    rep = describe(p)
    assert "Driver: ehdr" in rep
    assert "Size: 4 x 3 x 2" in rep
    assert "Type: int16" in rep
    assert "Min/Max: 0 / 23" in rep
    assert "ul_map: (500015.0, 4199985.0)" in rep

    import pyarrow as pa

    sq = np.array([[0, 0], [5, 0], [5, 5], [0, 5], [0, 0]], float)
    t = pa.table({
        "geometry": pa.array([G.wkb_polygon([sq]),
                              G.wkb_point(9.0, 9.0)], pa.binary()),
        "name": pa.array(["a", "b"], pa.string()),
    })
    vp = str(tmp_path / "v.mif")
    write_mif(vp, t)
    rep2 = describe(vp)
    assert "Driver: mif" in rep2
    assert "Feature Count: 2" in rep2
    assert "polygon (1)" in rep2 and "point (1)" in rep2
    assert "Extent: (0, 0) - (9, 9)" in rep2

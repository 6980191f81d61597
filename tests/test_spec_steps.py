"""Reference step-algebra registry: every `gdal raster/vector ...`
pipeline step name is replayable from a serialized JSON spec
(apps/gdalalg_raster_*.cpp / gdalalg_vector_*.cpp analogs).  These
tests run multi-step specs end-to-end and check parity against the
direct stage calls the steps delegate to."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.functions import codecs
from gdal_ray.pipelines.spec import list_steps, run_pipeline


def test_registry_covers_reference_step_names():
    steps = set(list_steps())
    # gdal raster pipeline steps (apps/gdalalg_raster_*.cpp)
    for name in (
        "hillshade slope aspect tri tpi roughness color_map clean_collar "
        "clip convert calc reclassify unscale nodata_to_alpha color_merge "
        "stack resize scale select reproject mosaic tile overview footprint "
        "polygonize proximity sieve fill_nodata contour viewshed pansharpen "
        "rgb_to_palette info index edit create update pixel_info set_type"
    ).split():
        assert f"raster_{name}" in steps, name
    # gdal vector pipeline steps (apps/gdalalg_vector_*.cpp)
    for name in (
        "filter sql select concat buffer simplify segmentize swap_xy "
        "make_valid set_geom_type explode_collections reproject geom "
        "grid grid_invdist grid_invdistnn grid_nearest grid_average "
        "grid_linear grid_data_metrics rasterize clip erase layer_algebra "
        "simplify_coverage index info edit sample"
    ).split():
        assert f"vector_{name}" in steps, name


def test_raster_translate_chain_parity(ray_session, smoke_fixtures):
    """resize -> scale via spec == direct translate composition."""
    import ray.data as rd

    from gdal_ray.stages.translate import translate_images

    spec = [
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 12},
        {"step": "raster_resize", "w": 32, "h": 32, "resampling": "near",
         "concurrency": 1},
        {"step": "raster_scale", "src_min": 0, "src_max": 255,
         "dst_min": 10, "dst_max": 240, "concurrency": 1},
        {"step": "checksum"},
    ]
    got = run_pipeline(spec).to_pandas().sort_values("image_id")

    base = rd.read_parquet(smoke_fixtures["images"]).limit(12)
    direct = translate_images(base, concurrency=1, out_size=(32, 32),
                              resampling="near")
    direct = translate_images(direct, concurrency=1,
                              scale=(0, 255, 10, 240))
    from gdal_ray.stages.stats import image_checksums

    want = image_checksums(direct).to_pandas().sort_values("image_id")
    assert got["cs_r"].tolist() == want["cs_r"].tolist()
    assert got["cs_g"].tolist() == want["cs_g"].tolist()


def test_raster_dem_and_palette_steps(ray_session, smoke_fixtures):
    out = run_pipeline([
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 6},
        {"step": "raster_hillshade", "concurrency": 1},
    ]).to_pandas()
    assert len(out) == 6

    pal = run_pipeline([
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 4},
        {"step": "raster_rgb_to_palette", "n_colors": 8, "concurrency": 1},
    ]).to_pandas()
    assert len(pal) == 4
    assert set(pal.columns) == {"image_id", "palette", "indices"}
    assert all(len(p) == 8 * 3 for p in pal["palette"])


def test_raster_convert_and_calc(ray_session, smoke_fixtures):
    conv = run_pipeline([
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 5},
        {"step": "raster_convert", "fmt": "raw"},
    ]).to_pandas()
    assert (conv["fmt"] == "raw").all()
    # raw payload decodes to the same pixels as the original
    src = pq.read_table(
        glob.glob(smoke_fixtures["images"] + "/*.parquet")[0]
    ).to_pandas().set_index("image_id")
    for _, row in conv.iterrows():
        orig = src.loc[row["image_id"]]
        want = codecs.decode(orig["bytes"], orig["w"], orig["h"], orig["fmt"])
        got = codecs.decode(row["bytes"], row["w"], row["h"], "raw")
        assert (got == want).all()

    # chain: lossless convert first so the calc round-trip is bit-exact
    # even for chips whose native fmt is lossy (jpeg)
    calc = run_pipeline([
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 3},
        {"step": "raster_convert", "fmt": "raw"},
        {"step": "raster_calc", "expr": "(A + B) / 2", "concurrency": 1},
    ]).to_pandas()
    for _, row in calc.iterrows():
        orig = src.loc[row["image_id"]]
        img = codecs.decode(orig["bytes"], orig["w"], orig["h"], orig["fmt"])
        want = np.clip(np.floor(
            (img[:, :, 0].astype(np.float64) + img[:, :, 1]) / 2 + 0.5
        ), 0, 255).astype(np.uint8)
        got = codecs.decode(row["bytes"], row["w"], row["h"], "raw")
        assert (got[:, :, 0] == want).all()
        assert (got[:, :, 2] == want).all()  # broadcast across bands


def test_raster_convert_webp_lossless(ray_session, smoke_fixtures):
    conv = run_pipeline([
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 4},
        {"step": "raster_convert", "fmt": "webp"},
    ]).to_pandas()
    assert (conv["fmt"] == "webp").all()
    src = pq.read_table(
        glob.glob(smoke_fixtures["images"] + "/*.parquet")[0]
    ).to_pandas().set_index("image_id")
    for _, row in conv.iterrows():
        orig = src.loc[row["image_id"]]
        want = codecs.decode(orig["bytes"], orig["w"], orig["h"], orig["fmt"])
        got = codecs.decode(row["bytes"], row["w"], row["h"], "webp")
        assert (got == want).all()  # VP8L is lossless
        assert bytes(row["bytes"])[:4] == b"RIFF"


def test_raster_create_update_pixel_info(ray_session, tmp_path):
    canvases = run_pipeline([
        {"step": "raster_create", "n": 3, "w": 24, "h": 24, "fill": 7,
         "parallelism": 1},
    ])
    df = canvases.to_pandas()
    assert len(df) == 3
    img = codecs.decode(df["bytes"][0], 24, 24, "raw")
    assert (img == 7).all()

    # patch layer: same ids, 8x8 fill 200
    patch_payload = codecs.encode(np.full((8, 8, 3), 200, np.uint8), "raw")
    patch = pa.table({
        "image_id": pa.array(df["image_id"].tolist(), pa.string()),
        "bytes": pa.array([patch_payload] * 3, pa.binary()),
        "w": pa.array([8] * 3, pa.int32()),
        "h": pa.array([8] * 3, pa.int32()),
        "fmt": pa.array(["raw"] * 3, pa.string()),
    })
    pq.write_table(patch, str(tmp_path / "patch.parquet"))

    upd = run_pipeline([
        {"step": "raster_create", "n": 3, "w": 24, "h": 24, "fill": 7,
         "parallelism": 1},
        {"step": "raster_update", "patch_path": str(tmp_path),
         "xoff": 4, "yoff": 4},
    ]).to_pandas()
    assert len(upd) == 3 and (upd["op"] == "update").all()
    out = np.frombuffer(upd["data"][0], np.uint8).reshape(24, 24, 3)
    assert (out[4:12, 4:12] == 200).all()
    assert (out[:4] == 7).all() and (out[:, :4] == 7).all()

    pix = run_pipeline([
        {"step": "raster_create", "n": 2, "w": 16, "h": 16, "fill": 9,
         "parallelism": 1},
        {"step": "raster_pixel_info", "positions": [[0, 0], [15, 15]],
         "concurrency": 1},
    ]).to_pandas()
    assert len(pix) == 4
    assert (pix["rgb"] == 9 * 65536 + 9 * 256 + 9).all()


def test_raster_set_type_and_index(ray_session, smoke_fixtures):
    st = run_pipeline([
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 4},
        {"step": "raster_set_type", "dtype": "float32"},
    ]).to_pandas()
    assert (st["fmt"] == "raw_float32").all()
    arr = np.frombuffer(st["bytes"][0], np.float32)
    assert len(arr) == st["w"][0] * st["h"][0] * 3

    idx = run_pipeline([
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 10},
        {"step": "raster_index", "zoom": 10},
    ]).to_pandas()
    assert "cell" in idx.columns and "bytes" not in idx.columns
    assert len(idx) >= 10  # chips spanning >1 cell replicate


def test_vector_filter_sample_info(ray_session, smoke_fixtures):
    import ray.data as rd

    total = rd.read_parquet(smoke_fixtures["points"]).count()
    flt = run_pipeline([
        {"step": "read_parquet", "path": smoke_fixtures["points"]},
        {"step": "vector_filter", "where": "pid % 2 = 0"},
    ]).to_pandas()
    assert 0 < len(flt) < total
    assert (flt["pid"] % 2 == 0).all()

    info = run_pipeline([
        {"step": "read_parquet", "path": smoke_fixtures["points"]},
        {"step": "vector_info"},
    ]).to_pandas()
    assert info["n"][0] == total
    assert info["minx"][0] < info["maxx"][0]

    samp = run_pipeline([
        {"step": "read_parquet", "path": smoke_fixtures["points"]},
        {"step": "vector_sample", "key_col": "pid", "frac": 0.25},
    ]).count()
    assert 0.1 * total < samp < 0.4 * total


def test_vector_clip_erase_partition(ray_session, smoke_fixtures):
    total = run_pipeline([
        {"step": "read_parquet", "path": smoke_fixtures["points"]},
    ]).count()
    clip = run_pipeline([
        {"step": "read_parquet", "path": smoke_fixtures["points"]},
        {"step": "vector_clip", "clip_path": smoke_fixtures["polygons"],
         "zoom": 10},
    ]).count()
    erase = run_pipeline([
        {"step": "read_parquet", "path": smoke_fixtures["points"]},
        {"step": "vector_erase", "clip_path": smoke_fixtures["polygons"],
         "zoom": 10},
    ]).count()
    assert clip > 0 and erase > 0
    assert clip + erase == total  # exact partition, exactly-once


def test_vector_geom_and_edit_steps(ray_session, tmp_path):
    sq = pa.table({
        "fid": pa.array([1], pa.int64()),
        "xs": pa.array([[0.0, 100.0, 100.0, 0.0]], pa.list_(pa.float64())),
        "ys": pa.array([[0.0, 0.0, 100.0, 100.0]], pa.list_(pa.float64())),
    })
    pq.write_table(sq, str(tmp_path / "rings.parquet"))
    cen = run_pipeline([
        {"step": "read_parquet", "path": str(tmp_path)},
        {"step": "vector_geom", "op": "centroid"},
    ]).to_pandas()
    assert cen["cx_milli"][0] == 50_000 and cen["cy_milli"][0] == 50_000

    simp = run_pipeline([
        {"step": "read_parquet", "path": str(tmp_path)},
        {"step": "vector_simplify", "tolerance": 1.0},
    ]).to_pandas()
    assert simp["n_out"][0] == 4

    ed = run_pipeline([
        {"step": "read_parquet", "path": str(tmp_path)},
        {"step": "vector_edit", "rename": {"fid": "feature_id"},
         "set_const": {"layer": "sq"}},
    ]).to_pandas()
    assert "feature_id" in ed.columns and (ed["layer"] == "sq").all()

    with pytest.raises(ValueError, match="vector_geom op"):
        run_pipeline([
            {"step": "read_parquet", "path": str(tmp_path)},
            {"step": "vector_geom", "op": "nope"},
        ])


def test_vector_layer_algebra_spec_matches_direct(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.join import overlay_layers

    got = run_pipeline([
        {"step": "read_parquet", "path": smoke_fixtures["polygons"]},
        {"step": "vector_layer_algebra", "other_path": smoke_fixtures["polygons"],
         "op": "intersection", "zoom": 10, "fid_col": "fid"},
    ]).count()

    def rn(out):
        return rd.read_parquet(smoke_fixtures["polygons"]).map_batches(
            lambda t, _o=out: t.rename_columns(
                [_o if c == "fid" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )

    want = overlay_layers(rn("fid_a"), rn("fid_b"), "intersection",
                          zoom=10).count()
    assert got == want > 0


def test_vector_convert_read_write_steps(ray_session, tmp_path):
    """`gdal vector convert` analog: vector_read/vector_write through
    every boundary driver, identical WKB at each hop."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.functions.geom import wkb_point, wkb_polygon

    def ring(cx, cy, h):
        return np.array(
            [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h],
             [cx - h, cy + h], [cx - h, cy - h]], np.float64)

    wkbs = [wkb_point(float(i), float(i % 5)) if i % 2
            else wkb_polygon([ring(i * 3.0, i * 2.0, 1.0)])
            for i in range(24)]
    t = pa.table({"geometry": pa.array(wkbs, pa.binary()),
                  "tag": pa.array([f"x{i}" for i in range(24)])})
    import ray.data as rd

    src = rd.from_arrow(t)
    gpkg = str(tmp_path / "a.gpkg")
    run_pipeline([{"step": "vector_write", "path": gpkg,
                   "layer": "f"}], src).to_pandas()
    fgb = str(tmp_path / "b.fgb")
    out = run_pipeline([
        {"step": "vector_read", "path": gpkg},
        {"step": "vector_select", "columns": ["geometry", "tag"]},
        {"step": "vector_write", "path": fgb},
    ]).to_pandas()
    assert int(out["n"].iloc[0]) == 24
    back = run_pipeline([{"step": "vector_read", "path": fgb}]).to_pandas()
    assert sorted(zip(back["tag"], back["geometry"])) == sorted(
        zip(t.column("tag").to_pylist(), wkbs))
    # driver inference failure is loud
    import pytest

    with pytest.raises(ValueError, match="driver"):
        run_pipeline([{"step": "vector_read", "path": "x.unknown"}])


def test_vector_buffer_step_polygon_mode(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rows = pa.table({
        "fid": pa.array([1], pa.int64()),
        "xs": pa.array([[0.0, 8000.0, 8000.0, 0.0]],
                       pa.list_(pa.float64())),
        "ys": pa.array([[0.0, 0.0, 6000.0, 6000.0]],
                       pa.list_(pa.float64())),
    })
    out = run_pipeline(
        [{"step": "vector_buffer", "radius": 500.0,
          "geometry": "polygons"}], rd.from_arrow(rows)).to_pandas()
    import numpy as np

    expect = 8000 * 6000 + 2 * (8000 + 6000) * 500 \
        + 16.0 * 500 * 500 * np.sin(np.pi / 16.0)
    assert abs(out["area"].iloc[0] - expect) < 1e-6 * expect


def test_vector_buffer_step_line_mode(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rows = pa.table({
        "fid": pa.array([1], pa.int64()),
        "xs": pa.array([[0.0, 8000.0]], pa.list_(pa.float64())),
        "ys": pa.array([[0.0, 0.0]], pa.list_(pa.float64())),
    })
    out = run_pipeline(
        [{"step": "vector_buffer", "radius": 500.0,
          "geometry": "lines"}], rd.from_arrow(rows)).to_pandas()
    expect = 2 * 500.0 * 8000.0 + 16.0 * 500.0 ** 2 * np.sin(np.pi / 16.0)
    assert abs(out["area"].iloc[0] - expect) < 1e-9 * expect


def test_mdim_pipeline_steps(ray_session, tmp_path):
    """`gdal mdim convert` analog: zarr -> transpose -> reduce ->
    zarr, replayed from a serialized spec, matches the direct calls."""
    import numpy as np

    from gdal_ray.sources.zarr import read_zarr, write_zarr
    from gdal_ray.stages import mdim as M

    spec = M.MDSpec((24, 32, 32), (8, 16, 16), "int64")
    fill = lambda i, j, k: (i * 7 + j * 3 + k) % 50  # noqa: E731
    src = str(tmp_path / "src.zarr")
    write_zarr(M.mdim_create(spec, fill, parallelism=4), spec,
               src).to_pandas()

    out = run_pipeline([
        {"step": "mdim_read_zarr", "path": src},
        {"step": "mdim_transpose", "perm": [2, 0, 1]},
        {"step": "mdim_reduce", "op": "sum", "axis": 1},
        {"step": "mdim_checksums", "tag": "t"},
    ]).to_pandas()
    # direct composition
    zds, zspec = read_zarr(src)
    tr, tr_spec = M.mdim_transpose(zds, zspec, (2, 0, 1))
    rd_, rd_spec = M.mdim_reduce(tr, tr_spec, "sum", 1)
    ref = M.mdim_chunk_checksums(rd_, rd_spec, "t").to_pandas()
    assert sorted(zip(out["image_id"], out["cs"])) == sorted(
        zip(ref["image_id"], ref["cs"]))

    # write half: spec-driven zarr sink reads back checksum-identical
    dst = str(tmp_path / "dst.zarr")
    run_pipeline([
        {"step": "mdim_read_zarr", "path": src},
        {"step": "mdim_resample2x", "axes": [1, 2]},
        {"step": "mdim_write_zarr", "path": dst},
    ]).to_pandas()
    back, back_spec = read_zarr(dst)
    assert back_spec.shape == (24, 16, 16)
    rs, rs_spec = M.mdim_resample2x(zds2 := read_zarr(src)[0], zspec,
                                    (1, 2))
    a = M.mdim_chunk_checksums(back, back_spec, "x").to_pandas()
    b = M.mdim_chunk_checksums(rs, rs_spec, "x").to_pandas()
    assert sorted(zip(a["image_id"], a["cs"])) == sorted(
        zip(b["image_id"], b["cs"]))

    # loud failure without a reader step
    import pytest
    import ray.data as rd2

    with pytest.raises(TypeError, match="MDimHandle"):
        run_pipeline([{"step": "mdim_transpose", "perm": [0, 1, 2]}],
                     rd2.range(1))


def test_registry_signature_contract():
    """Every registered step is a callable whose first parameter is the
    threaded dataset and whose remaining parameters are keyword-able
    (what run_pipeline invokes) — catches signature drift across the
    whole registry without needing per-step fixtures."""
    import inspect

    from gdal_ray.pipelines import spec as S

    for name in list_steps():
        fn = S._REGISTRY[name]
        sig = inspect.signature(fn)
        params = list(sig.parameters.values())
        assert params, f"{name}: no parameters"
        first = params[0]
        assert first.kind in (first.POSITIONAL_ONLY,
                              first.POSITIONAL_OR_KEYWORD), name
        for p in params[1:]:
            assert p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY,
                              p.VAR_KEYWORD), (
                f"{name}: param {p.name} not keyword-addressable")


def test_grid_export_import_steps(ray_session, tmp_path):
    """JSON-driven bulk grid export/import: chips out to one grid
    file per row through a zoo driver, sniffed back in bit-equal;
    resume skips existing files."""
    import numpy as np
    import ray.data as rd

    from gdal_ray.pipelines.spec import run_pipeline

    rng = np.random.default_rng(67)
    rows = []
    for i in range(6):
        g = rng.integers(-500, 500, (9, 7)).astype(np.float64)
        rows.append({"image_id": f"c{i:03d}", "grid": g.tobytes(),
                     "w": 7, "h": 9})
    src = rd.from_items(rows)
    out_dir = str(tmp_path / "grids")
    counters = run_pipeline(
        [{"step": "grid_export", "path": out_dir,
          "driver": "gsbg"}], src).to_pandas()
    assert counters.written.sum() == 6 and counters.skipped.sum() == 0
    back = run_pipeline(
        [{"step": "grid_import", "path": out_dir}]).to_pandas()
    assert sorted(back.image_id) == [f"c{i:03d}" for i in range(6)]
    assert set(back.driver) == {"gsbg"}
    for r in rows:
        got = back[back.image_id == r["image_id"]].iloc[0]
        a = np.frombuffer(got.grid, np.float64).reshape(got.h, got.w)
        b = np.frombuffer(r["grid"], np.float64).reshape(9, 7)
        np.testing.assert_array_equal(a, b)
    # resume: second export skips everything
    counters2 = run_pipeline(
        [{"step": "grid_export", "path": out_dir,
          "driver": "gsbg"}], src).to_pandas()
    assert counters2.written.sum() == 0 and counters2.skipped.sum() == 6
    # a second driver (hf2) through the same steps
    out2 = str(tmp_path / "g2")
    run_pipeline([{"step": "grid_export", "path": out2,
                   "driver": "hf2"}], src).to_pandas()
    back2 = run_pipeline(
        [{"step": "grid_import", "path": out2}]).to_pandas()
    assert set(back2.driver) == {"hf2"} and len(back2) == 6

"""Band statistics/histogram vs numpy oracle; pipeline-spec runner."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from gdal_ray.functions import codecs


@pytest.fixture(scope="module")
def decoded_all(smoke_fixtures):
    t = pq.read_table(
        glob.glob(smoke_fixtures["images"] + "/*.parquet")[0],
        columns=["bytes", "w", "h", "fmt"],
    ).to_pydict()
    return [
        codecs.decode(t["bytes"][i], t["w"][i], t["h"][i], t["fmt"][i])
        for i in range(len(t["bytes"]))
    ]


def test_band_statistics_matches_numpy(ray_session, smoke_fixtures, decoded_all):
    import ray.data as rd

    from gdal_ray.stages.stats import band_statistics

    got = band_statistics(rd.read_parquet(smoke_fixtures["images"])).to_pandas()
    allpix = np.concatenate([im.reshape(-1, 3) for im in decoded_all]).astype(np.float64)
    for b in range(3):
        row = got[got.band == b].iloc[0]
        assert row["n"] == len(allpix)
        assert row["min"] == allpix[:, b].min()
        assert row["max"] == allpix[:, b].max()
        assert np.isclose(row["mean"], allpix[:, b].mean())
        assert np.isclose(row["stddev"], allpix[:, b].std())


def test_band_histogram_matches_numpy(ray_session, smoke_fixtures, decoded_all):
    import ray.data as rd

    from gdal_ray.stages.stats import band_histogram

    got = band_histogram(rd.read_parquet(smoke_fixtures["images"])).to_pandas()
    allpix = np.concatenate([im.reshape(-1, 3) for im in decoded_all])
    for b in range(3):
        want = np.bincount(allpix[:, b], minlength=256)
        sub = got[got.band == b].set_index("bucket")["count"]
        full = np.zeros(256, dtype=np.int64)
        full[sub.index.to_numpy()] = sub.to_numpy()
        assert (full == want).all()


def test_pipeline_spec_runner(ray_session, smoke_fixtures, tmp_path):
    from gdal_ray.pipelines.spec import list_steps, run_pipeline

    assert "warp" in list_steps() and "tiles" in list_steps()
    spec = [
        {"step": "read_images", "path": smoke_fixtures["images"]},
        {"step": "limit", "n": 40},
        {
            "step": "warp",
            "dst_srs": "EPSG:4326",
            "resampling": "near",
            "concurrency": 1,
        },
        {"step": "checksum"},
    ]
    out = run_pipeline(spec)
    df = out.to_pandas()
    assert len(df) == 40
    assert {"image_id", "cs_r", "cs_g", "cs_b"} <= set(df.columns)


def test_pipeline_spec_unknown_step(ray_session):
    from gdal_ray.pipelines.spec import run_pipeline

    with pytest.raises(KeyError, match="unknown pipeline step"):
        run_pipeline([{"step": "nope"}])

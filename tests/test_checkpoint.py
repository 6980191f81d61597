"""Resume semantics (golden case 8, FIXTURES.md): killed-job rerun
skips completed partitions; lineage counters sum to input counts."""

import os

import pyarrow.parquet as pq


def _tiles(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.tiles import build_base_tiles

    imgs = rd.read_parquet(smoke_fixtures["images"])
    return build_base_tiles(imgs, zoom=9, resampling="near").materialize()


def test_partitioned_write_resume(ray_session, smoke_fixtures, tmp_path):
    from gdal_ray.state.checkpoint import Manifest, read_partitioned, write_partitioned

    tiles = _tiles(ray_session, smoke_fixtures)
    out = str(tmp_path / "sink")
    counters = write_partitioned(tiles, out, key_col="cell", shift=6).to_pandas()
    n_rows = tiles.count()
    assert counters.rows.sum() == n_rows
    assert not counters.skipped.any()

    man = Manifest(out)
    s = man.summary()
    assert s["rows"] == n_rows and s["n_partitions"] == len(counters)

    # lineage records carry key ranges and id hashes
    rec = next(iter(man.completed().values()))
    assert {"pid", "rows", "bytes", "key_min", "key_max", "id_hash"} <= rec.keys()

    # simulate a partial failure: delete one partition's manifest+data
    victim = int(counters.pid.iloc[0])
    os.remove(man.done_path(victim))
    mtimes = {
        int(p): os.path.getmtime(os.path.join(out, f"pid={p}", "data.parquet"))
        for p in counters.pid
        if int(p) != victim
    }

    counters2 = write_partitioned(tiles, out, key_col="cell", shift=6).to_pandas()
    assert counters2.rows.sum() == n_rows
    by_pid = counters2.set_index("pid")["skipped"]
    assert not by_pid[victim]  # recomputed
    assert by_pid.drop(victim).all()  # everything else skipped
    for p, mt in mtimes.items():  # completed outputs untouched
        assert os.path.getmtime(os.path.join(out, f"pid={p}", "data.parquet")) == mt

    # read-back equals original rows
    back = read_partitioned(out)
    assert back.count() == n_rows
    assert set(back.schema().names) >= {"cell", "z", "x", "y", "tile_bytes"}

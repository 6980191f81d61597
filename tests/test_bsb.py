"""BSB nautical charts (sources.bsb): header/stream anchors, full
multi-byte RLE decode, the one-pixel-short quirk, palette expansion,
registry dispatch, distributed drive.

Reference behavior: frmts/bsb/bsb_read.c.
"""

import numpy as np
import pytest

from gdal_ray.sources.bsb import read_bsb, write_bsb


def test_bsb_roundtrip_and_anchors(tmp_path):
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 255, (7, 3)).astype(np.uint8)
    idx = rng.integers(1, 8, (12, 17)).astype(np.uint8)
    p = str(tmp_path / "c.kap")
    write_bsb(p, idx, pal, name="TESTCHART")
    raw = open(p, "rb").read()
    head = raw[:raw.index(b"\x1a\x00")].decode()
    assert "VER/2.0" in head
    assert "BSB/NA=TESTCHART,NU=,RA=17,12" in head
    assert "RGB/1," in head and "RGB/7," in head
    body = raw[raw.index(b"\x1a\x00") + 2:]
    assert body[0] == 3                     # color size for values<8
    assert body[1] == 1                     # first line number (1-based)
    m = read_bsb(p)
    np.testing.assert_array_equal(m["idx"], idx)
    np.testing.assert_array_equal(m["rgb"], m["palette"][idx])
    assert m["color_size"] == 3


def test_bsb_multibyte_runs_and_quirk(tmp_path):
    """Hand-assembled stream independent of the writer: a 300-pixel
    run coded as value|0x80|hi + lo continuation, and the reference's
    one-pixel-short scanline quirk (bsb_read.c:874-878)."""
    cs, shift = 3, 4
    hdr = (b"VER/2.0\r\nBSB/NA=x,NU=,RA=300,2,DU=254\r\n"
           b"RGB/1,10,20,30\r\n")
    rows = bytearray(hdr + b"\x1a\x00" + bytes([cs]))
    rows += bytes([1, (5 << shift) | 0x80 | 2, 43, 0x00])  # 300 x 5
    rows += bytes([2, (1 << shift) | 0x80 | 2, 42, 0x00])  # 299 x 1
    p = str(tmp_path / "r.kap")
    open(p, "wb").write(bytes(rows))
    m = read_bsb(p)
    assert (m["idx"][0] == 5).all()
    assert (m["idx"][1, :-1] == 1).all() and m["idx"][1, -1] == 0


def test_bsb_registry_and_distributed(ray_session, tmp_path):
    import pyarrow as pa
    import ray

    from gdal_ray.sources.registry import identify, open_raster

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 255, (3, 3)).astype(np.uint8)
    root = str(tmp_path)
    ds = ray.data.from_items(
        [{"i": i, "chip": rng.integers(1, 4, (8, 9)).astype(
            np.uint8).tobytes()} for i in range(6)])

    def drive(b):
        out = []
        for i, raw in zip(b["i"].to_pylist(), b["chip"].to_pylist()):
            chip = np.frombuffer(raw, np.uint8).reshape(8, 9)
            p = f"{root}/c{i}.kap"
            write_bsb(p, chip, pal)
            ok = (identify(p) == "bsb"
                  and np.array_equal(open_raster(p)["idx"], chip))
            out.append({"i": i, "ok": ok})
        return pa.Table.from_pylist(out)

    res = ds.map_batches(drive, batch_format="pyarrow").take_all()
    assert len(res) == 6 and all(r["ok"] for r in res)

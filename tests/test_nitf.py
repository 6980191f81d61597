"""NITF 2.1 source/sink (sources.nitf): header byte anchors against
the MIL-STD-2500C fixed-width field layout, blocked-image round trips
(MONO/RGB x IMODE B/P x partial edge blocks), IGEOLO corner coding,
the FL/HL/LISH/LI length accounting, and the distributed segment
reader.

Reference behavior: frmts/nitf (nitffile.c / nitfimage.c).
"""

import numpy as np
import pytest

from gdal_ray.sources.nitf import (
    _dms_lat,
    _dms_lon,
    _parse_dms,
    read_nitf,
    read_nitf_rows,
    write_nitf,
)

CORNERS = [(44.5, -115.25), (44.5, -115.0), (44.25, -115.0),
           (44.25, -115.25)]


def test_header_byte_anchors(tmp_path):
    """Fixed-width ASCII fields at their spec offsets: FHDR/FVER,
    CLEVEL, OSTAID, FL at 342 (12 digits), HL at 354 (6), NUMI at
    360 (3), LISH/LI table."""
    p = str(tmp_path / "a.ntf")
    vals = np.arange(48, dtype=np.uint8).reshape(6, 8)
    write_nitf(p, [{"values": vals, "nppbh": 8, "nppbv": 8}],
               ostaid="STATION1")
    buf = open(p, "rb").read()
    assert buf[0:9] == b"NITF02.10"
    assert buf[9:11] == b"03"                      # CLEVEL
    assert buf[11:15] == b"BF01"                   # STYPE
    assert buf[15:25] == b"STATION1  "             # OSTAID
    fl = int(buf[342:354])
    hl = int(buf[354:360])
    assert fl == len(buf)
    assert int(buf[360:363]) == 1                  # NUMI
    lish = int(buf[363:369])
    li = int(buf[369:379])
    assert li == 8 * 8                             # one 8x8 block
    assert hl + lish + li == fl
    # image subheader magic + IC=NC + IMODE=B in the stream
    assert buf[hl:hl + 2] == b"IM"
    sub = buf[hl:hl + lish]
    assert b"NC" in sub and b"MONO" in sub and b"INT" in sub


def test_mono_roundtrip_partial_blocks(tmp_path):
    """rows/cols not multiples of the block size: edge blocks are
    zero-padded on disk, cropped on read."""
    p = str(tmp_path / "m.ntf")
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 256, (45, 70)).astype(np.uint8)
    write_nitf(p, [{"values": vals, "nppbh": 32, "nppbv": 32,
                    "iid1": "CHIP01", "icom": ["first comment",
                                               "second"]}])
    m = read_nitf(p)[0]
    assert m["iid1"] == "CHIP01"
    assert (m["nbpr"], m["nbpc"]) == (3, 2)
    assert m["icom"] == ["first comment", "second"]
    np.testing.assert_array_equal(m["values"], vals)
    assert "corners" not in m


@pytest.mark.parametrize("imode", ["B", "P"])
def test_rgb_roundtrip_both_imodes(tmp_path, imode):
    p = str(tmp_path / f"rgb_{imode}.ntf")
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 256, (30, 50, 3)).astype(np.uint8)
    write_nitf(p, [{"values": vals, "imode": imode, "nppbh": 16,
                    "nppbv": 16, "corners": CORNERS}])
    m = read_nitf(p)[0]
    assert m["irep"] == "RGB" and m["imode"] == imode
    np.testing.assert_array_equal(m["values"], vals)
    # corners survive at 1-arcsecond dms granularity (exact here)
    for got, want in zip(m["corners"], CORNERS):
        assert abs(got[0] - want[0]) < 1 / 3600.0 + 1e-9
        assert abs(got[1] - want[1]) < 1 / 3600.0 + 1e-9


def test_igeolo_dms_coding():
    assert _dms_lat(44.5) == b"443000N"
    assert _dms_lat(-1.25) == b"011500S"
    assert _dms_lon(-115.25) == b"1151500W"
    assert _dms_lon(7.0) == b"0070000E"
    assert _parse_dms(b"443000N", False) == 44.5
    assert _parse_dms(b"1151500W", True) == -115.25


def test_multi_segment_and_rows_reader(tmp_path, ray_session):
    p = str(tmp_path / "multi.ntf")
    rng = np.random.default_rng(7)
    imgs = [
        {"values": rng.integers(0, 256, (20, 20)).astype(np.uint8),
         "nppbh": 16, "nppbv": 16, "iid1": "SEG0"},
        {"values": rng.integers(0, 256, (10, 40, 3)).astype(np.uint8),
         "nppbh": 16, "nppbv": 16, "iid1": "SEG1",
         "corners": CORNERS, "imode": "P"},
    ]
    write_nitf(p, imgs)
    segs = read_nitf(p)
    assert [s["iid1"] for s in segs] == ["SEG0", "SEG1"]
    np.testing.assert_array_equal(segs[0]["values"], imgs[0]["values"])
    np.testing.assert_array_equal(segs[1]["values"], imgs[1]["values"])

    rows = read_nitf_rows(p, parallelism=2).take_all()
    rows.sort(key=lambda r: r["seg_id"])
    assert rows[0]["iid1"] == "SEG0" and rows[0]["nbands"] == 1
    assert np.isnan(rows[0]["lat_ul"])
    got = np.frombuffer(rows[1]["values"], np.uint8).reshape(10, 40, 3)
    np.testing.assert_array_equal(got, imgs[1]["values"])
    assert abs(rows[1]["lat_ul"] - 44.5) < 1e-9


def test_guards(tmp_path):
    with pytest.raises(ValueError, match="uint8"):
        write_nitf(str(tmp_path / "x.ntf"),
                   [{"values": np.ones((4, 4), np.uint16)}])
    with pytest.raises(ValueError, match="IMODE"):
        write_nitf(str(tmp_path / "x.ntf"),
                   [{"values": np.ones((4, 4), np.uint8), "imode": "S"}])
    p = str(tmp_path / "bad.ntf")
    open(p, "wb").write(b"NITF02.00" + b" " * 400)
    with pytest.raises(ValueError, match="NITF 2.1"):
        read_nitf(p)


def test_rpc00b_tre(tmp_path):
    """RPC00B TREs: 1041-byte field layout, IXSHD round trip, and the
    wiring into the engine's RPC transformer (the gdal NITF RPC
    metadata path)."""
    from gdal_ray.functions.rpc import RPCModel, synth_rpc
    from gdal_ray.sources.nitf import (
        rpc00b_to_rpc,
        rpc_model_of_segment,
        rpc_to_rpc00b,
    )

    # field-exact parameters (representable in the decimal widths)
    base = synth_rpc(5, 64, 64)
    exact = dict(base)
    exact.update(line_off=32.0, samp_off=32.0, line_scale=32.0,
                 samp_scale=32.0, lat_off=44.1250, long_off=-115.2500,
                 height_off=500.0, lat_scale=0.1250, long_scale=0.2500,
                 height_scale=500.0)
    tre = rpc_to_rpc00b(exact)
    assert len(tre) == 1041
    assert tre[0:1] == b"1"                      # SUCCESS
    assert tre[26:34] == b"+44.1250"             # LAT_OFF field
    assert tre[34:43] == b"-115.2500"            # LONG_OFF field
    back = rpc00b_to_rpc(tre)
    for k in ("lat_off", "long_off", "line_off", "samp_scale",
              "height_scale"):
        assert back[k] == exact[k], k

    img = np.random.default_rng(1).integers(0, 256, (64, 64)).astype(
        np.uint8)
    p = str(tmp_path / "rpc.ntf")
    write_nitf(p, [{"values": img, "tres": [("RPC00B", tre)]}])
    seg = read_nitf(p)[0]
    assert [t for t, _d in seg["tres"]] == ["RPC00B"]
    np.testing.assert_array_equal(seg["values"], img)
    # transformer built from the TRE agrees with the direct model
    m1 = RPCModel(**exact)
    m2 = rpc_model_of_segment(seg)
    lon = np.array([exact["long_off"] + 0.01])
    lat = np.array([exact["lat_off"] - 0.005])
    a, b = m1.forward(lon, lat), m2.forward(lon, lat)
    # only the 7-significant-digit coefficient quantization remains
    assert abs(a[0][0] - b[0][0]) < 1e-3
    assert abs(a[1][0] - b[1][0]) < 1e-3
    import pytest as _pt
    with _pt.raises(ValueError, match="no RPC00B"):
        rpc_model_of_segment({"tres": []})


# ------------------------------------------------------- IC=C3 (JPEG)


def _smooth(h, w):
    x = np.linspace(0.0, 6.0, w)
    y = np.linspace(0.0, 4.0, h)
    return (np.sin(x)[None, :] * np.cos(y)[:, None] * 100.0 + 128.0)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10.0 * np.log10(255.0 ** 2 / mse)


def test_c3_mono_multiblock_model_exact(tmp_path):
    """IC=C3 MONO: per-block grayscale JPEG streams; decoded pixels
    equal jpeg_model_gray of each (edge-padded) block — the codec's
    lossless-entropy oracle contract — and PSNR >= 40."""
    from gdal_ray.functions.jpegc import jpeg_model_gray

    p = str(tmp_path / "c3m.ntf")
    mono = _smooth(310, 520).clip(0, 255).astype(np.uint8)
    write_nitf(p, [{"values": mono, "ic": "C3", "quality": 90,
                    "nppbh": 128, "nppbv": 128}])
    segs = read_nitf(p)
    assert segs[0]["ic"] == "C3"
    assert len(segs[0]["comrat"]) == 4
    dec = segs[0]["values"]
    assert dec.shape == mono.shape
    assert _psnr(dec, mono) >= 40.0
    # block (0,0) is interior: model-exact equality
    blk = mono[:128, :128]
    assert np.array_equal(dec[:128, :128], jpeg_model_gray(blk, 90))


def test_c3_rgb_imode_p_roundtrip(tmp_path):
    p = str(tmp_path / "c3r.ntf")
    base = _smooth(200, 260)
    rgb = np.stack([base, base * 0.8 + 20.0, 255.0 - base],
                   axis=-1).clip(0, 255).astype(np.uint8)
    write_nitf(p, [{"values": rgb, "ic": "C3", "imode": "P",
                    "quality": 90, "corners": CORNERS}])
    segs = read_nitf(p)
    dec = segs[0]["values"]
    assert dec.shape == rgb.shape
    assert _psnr(dec, rgb) >= 40.0
    assert segs[0]["corners"] == [(round(a * 4) / 4, round(b * 4) / 4)
                                  for a, b in CORNERS]


def test_c3_subheader_byte_anchors(tmp_path):
    """IC at its spec offset reads 'C3' followed by the 4-char COMRAT
    (present only for compressed IC) — the NC layout is unchanged."""
    p = str(tmp_path / "c3a.ntf")
    mono = _smooth(64, 64).clip(0, 255).astype(np.uint8)
    write_nitf(p, [{"values": mono, "ic": "C3", "nppbh": 64,
                    "nppbv": 64}])
    buf = open(p, "rb").read()
    hl = int(buf[354:360])
    sub = buf[hl:]
    assert sub[:2] == b"IM"
    i = sub.index(b"C3")
    comrat = sub[i + 2:i + 6]
    assert comrat.replace(b".", b"").isdigit()


def test_c3_guards(tmp_path):
    mono = np.zeros((16, 16), np.uint8)
    rgb = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="IMODE=P"):
        write_nitf(str(tmp_path / "x.ntf"),
                   [{"values": rgb, "ic": "C3", "imode": "B"}])
    with pytest.raises(ValueError, match="unsupported"):
        write_nitf(str(tmp_path / "x.ntf"),
                   [{"values": mono, "ic": "C8"}])


def test_c3_distributed_rows_reader(tmp_path, ray_session):
    """read_nitf_rows decodes C3 segments in ranged-read tasks."""
    p = str(tmp_path / "c3d.ntf")
    mono = _smooth(150, 150).clip(0, 255).astype(np.uint8)
    write_nitf(p, [
        {"values": mono, "ic": "C3", "quality": 90},
        {"values": mono, "ic": "NC"},
    ])
    rows = read_nitf_rows(p, parallelism=2).take_all()
    assert len(rows) == 2
    by_id = {r["seg_id"]: r for r in rows}
    dec = np.frombuffer(by_id[0]["values"], np.uint8).reshape(150, 150)
    exact = np.frombuffer(by_id[1]["values"], np.uint8).reshape(150, 150)
    assert np.array_equal(exact, mono)
    assert _psnr(dec, mono) >= 40.0


# ---------------------------------------------- masked IC (NM / M3)


def test_masked_nm_sparse_exact(tmp_path):
    """IC=NM: blank blocks are blocked out of the file via the Image
    Data Mask table (IMDATOFF/BMRLNTH + 0xFFFFFFFF records); present
    blocks read back exactly and the file shrinks accordingly."""
    import os as _os

    sparse = np.zeros((512, 512), np.uint8)
    sparse[:128, :128] = (np.arange(128 * 128) % 251).reshape(
        128, 128).astype(np.uint8)
    p = str(tmp_path / "nm.ntf")
    write_nitf(p, [{"values": sparse, "ic": "NM"}])
    segs = read_nitf(p)
    assert segs[0]["ic"] == "NM"
    assert np.array_equal(segs[0]["values"], sparse)
    # 3 of 4 blocks masked out: data well under the dense size
    assert _os.path.getsize(p) < 512 * 512 // 2


def test_masked_mask_table_byte_anchors(tmp_path):
    """Mask table anchors: IMDATOFF = table length, BMRLNTH=4,
    TMRLNTH=0, big-endian offsets with 0xFFFFFFFF for absent."""
    sparse = np.zeros((512, 512), np.uint8)
    sparse[:256, :256] = 7
    p = str(tmp_path / "anchor.ntf")
    write_nitf(p, [{"values": sparse, "ic": "NM"}])
    buf = open(p, "rb").read()
    hl = int(buf[354:360])
    lish = int(buf[363:369])
    dpos = hl + lish
    import struct as st
    imdatoff, bmrlnth, tmrlnth, tp = st.unpack(">IHHH",
                                               buf[dpos:dpos + 10])
    assert bmrlnth == 4 and tmrlnth == 0
    n_blocks = 4                     # 512/256 x 512/256
    assert imdatoff == 10 + 4 * n_blocks
    offs = st.unpack(">4I", buf[dpos + 10:dpos + 26])
    assert offs[0] == 0              # first block present
    assert offs.count(0xFFFFFFFF) == 3


def test_masked_m3_jpeg_blocks(tmp_path):
    base = _smooth(300, 250).clip(0, 255).astype(np.uint8)
    sparse = np.zeros((512, 512), np.uint8)
    sparse[212:512, 0:250] = base
    p = str(tmp_path / "m3.ntf")
    write_nitf(p, [{"values": sparse, "ic": "M3", "quality": 90}])
    segs = read_nitf(p)
    assert segs[0]["ic"] == "M3"
    assert len(segs[0]["comrat"]) == 4
    dec = segs[0]["values"]
    assert _psnr(dec, sparse) >= 40.0
    # fully-blank top-right block decodes to exact zeros
    assert (dec[:256, 256:] == 0).all()


def test_masked_rgb_p_and_guard(tmp_path):
    rgbs = np.zeros((512, 512, 3), np.uint8)
    rgbs[256:, 256:, :] = 99
    p = str(tmp_path / "nmp.ntf")
    write_nitf(p, [{"values": rgbs, "ic": "NM", "imode": "P"}])
    assert np.array_equal(read_nitf(p)[0]["values"], rgbs)
    with pytest.raises(ValueError, match="IMODE=P"):
        write_nitf(str(tmp_path / "x.ntf"),
                   [{"values": rgbs, "ic": "NM", "imode": "B"}])

"""Multimodal audio/video stages: payload codecs, feature math, stub
routing, and the actor-pool plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import media as M


def test_audio_payload_roundtrip():
    s = (np.sin(np.arange(5000) / 10.0) * 12000).astype(np.int16)
    blob = M.encode_audio_pcm16(s, sr=16000)
    out, sr = M.decode_audio(blob, "pcm16")
    assert sr == 16000 and (out == s).all()


def test_video_payload_roundtrip():
    frames = (np.arange(5 * 6 * 4 * 3) % 256).astype(np.uint8).reshape(
        5, 6, 4, 3
    )
    blob = M.encode_video_rawv(frames)
    out = M.decode_video(blob, "rawv")
    assert out.shape == (5, 6, 4, 3) and (out == frames).all()


def test_unsupported_codecs_raise():
    blob = M.encode_audio_pcm16(np.zeros(100, np.int16))
    with pytest.raises(NotImplementedError, match="opus"):
        M.decode_audio(blob, "opus")
    vb = M.encode_video_rawv(np.zeros((2, 4, 4, 3), np.uint8))
    with pytest.raises(NotImplementedError, match="h264"):
        M.decode_video(vb, "h264")


def test_audio_features_math():
    # alternating +/- block signal: exact energy and zcr by hand
    s = np.tile(np.array([1000, -1000], np.int16), 512)  # 1024 samples
    st = M.AudioFeatures(win=512, hop=256)
    nf, zcr, energy = st._features(s)
    assert nf == 3
    assert energy == 3 * 512 * 1000 * 1000
    assert zcr == 3 * 511  # every adjacent pair flips sign


def test_stage_plumbing_routes_unsupported(ray_session):
    import ray.data as rd

    clips = []
    for k in (0, 1, 2, 17, 34):  # 0, 17, 34 -> opus (k % 17 == 0)
        blob, codec = M.synth_audio_clip(k)
        clips.append({"media_id": f"a{k}", "bytes": blob, "codec": codec})
    ds = rd.from_items(clips).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    out = M.audio_features(ds).to_pandas()
    assert len(out) == 5
    bad = out[out.status == "unsupported"]
    ok = out[out.status == "ok"]
    assert set(bad.media_id) == {"a0", "a17", "a34"}
    assert (ok.n_frames > 0).all() and (ok.energy > 0).all()


def test_video_frame_sample_stage(ray_session):
    import ray.data as rd

    blob, codec = M.synth_video_clip(1)
    assert codec == "rawv"
    ds = rd.from_items(
        [{"media_id": "v1", "bytes": blob, "codec": codec}]
    )
    out = M.video_frame_sample(ds, every=4).to_pandas()
    n = 8 + (1 * 11) % 25
    assert len(out) == len(range(0, n, 4))
    assert (out.n_frames == n).all() and (out.status == "ok").all()
    # first sampled frame checksum matches a direct decode
    frames = M.decode_video(blob, "rawv")
    from gdal_ray.functions import checksum

    cs0 = int(sum(checksum.checksum_band(frames[0, :, :, b]) for b in range(3)))
    assert int(out[out.frame_idx == 0].cs.iloc[0]) == cs0


def test_video_frame_neardup_across_clips(ray_session):
    """Round-4 integration: sampled frames feed the phash near-dup
    shuffle; two clips sharing identical frame content produce
    cross-clip pairs at hamming 0."""
    import ray.data as rd

    blob, _ = M.synth_video_clip(1)
    # clip v2 = the same payload under a different media_id
    ds = rd.from_items(
        [
            {"media_id": "vA", "bytes": blob, "codec": "rawv"},
            {"media_id": "vB", "bytes": blob, "codec": "rawv"},
        ]
    )
    pairs = M.video_frame_neardup_pairs(ds, every=4, max_hamming=0).to_pandas()
    # every sampled frame of vA matches the same frame of vB
    n = 8 + (1 * 11) % 25
    n_sampled = len(range(0, n, 4))
    cross = pairs[
        pairs.id_a.str.startswith("vA") != pairs.id_b.str.startswith("vA")
    ]
    same_frame = cross[
        cross.id_a.str.split("/f").str[1] == cross.id_b.str.split("/f").str[1]
    ]
    assert len(same_frame) == n_sampled
    assert (pairs.hamming == 0).all()


def test_image_quality_metrics_exact():
    import numpy as np

    from gdal_ray.stages.media import image_quality_metrics

    # uniform gray image: zero laplacian variance, zero entropy
    img = np.full((8, 8, 3), 100, np.uint8)
    b, lv, e = image_quality_metrics(img)
    g = (77 * 100 + 150 * 100 + 29 * 100) >> 8
    assert b == 1000 * g and lv == 0 and e == 0

    # checkerboard: high laplacian variance, 1-bit entropy
    img = np.zeros((8, 8, 3), np.uint8)
    img[::2, 1::2] = 255
    img[1::2, ::2] = 255
    b, lv, e = image_quality_metrics(img)
    assert e == 1000  # two equal-mass luma bins -> exactly 1 bit
    assert lv > 100000  # extreme high-frequency content


def test_scene_cut_detection(ray_session):
    """Scene cuts: two synthetic scenes joined at a known frame —
    the cut lands exactly there; a static clip has none; non-rawv
    codecs pass through as unsupported-counter rows."""
    import ray.data as rd

    from gdal_ray.stages.media import SceneCuts, encode_video_rawv

    rng = np.random.default_rng(42)
    a = rng.integers(0, 60, (4, 8, 8, 3)).astype(np.uint8)
    b = rng.integers(180, 255, (3, 8, 8, 3)).astype(np.uint8)
    clip = np.concatenate([a, b])
    static = np.tile(a[:1], (5, 1, 1, 1))
    ds = rd.from_items([
        {"media_id": "cutat4", "codec": "rawv",
         "payload": encode_video_rawv(clip)},
        {"media_id": "static", "codec": "rawv",
         "payload": encode_video_rawv(static)},
        {"media_id": "weird", "codec": "h264", "payload": b"x"},
    ])
    rows = {r["media_id"]: r for r in ds.map_batches(
        SceneCuts, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs=dict(threshold=60.0)).take_all()}
    assert rows["cutat4"]["n_cuts"] == 1
    assert list(rows["cutat4"]["cut_frames"]) == [4]
    assert rows["static"]["n_cuts"] == 0
    assert rows["weird"]["n_frames"] == 0


def test_spectral_features_pure_tones(ray_session):
    """Spectral centroid / rolloff / dominant frequency on pure
    tones: a 1 kHz sine's dominant bin and centroid land at ~1 kHz, a
    4 kHz sine's at ~4 kHz, rolloff >= centroid, and unsupported
    codecs pass through as counter rows."""
    import ray.data as rd

    from gdal_ray.stages.media import SpectralFeatures, encode_audio_pcm16

    sr = 16000
    t = np.arange(sr) / sr
    tone1 = (np.sin(2 * np.pi * 1000 * t) * 12000).astype(np.int16)
    tone4 = (np.sin(2 * np.pi * 4000 * t) * 12000).astype(np.int16)
    ds = rd.from_items([
        {"media_id": "t1k", "codec": "pcm16",
         "bytes": encode_audio_pcm16(tone1, sr)},
        {"media_id": "t4k", "codec": "pcm16",
         "bytes": encode_audio_pcm16(tone4, sr)},
        {"media_id": "bad", "codec": "opus", "bytes": b"x"},
    ])
    rows = {r["media_id"]: r for r in ds.map_batches(
        SpectralFeatures, batch_format="pyarrow",
        concurrency=1).take_all()}
    assert abs(rows["t1k"]["dominant_hz"] - 1000.0) < 32.0
    assert abs(rows["t4k"]["dominant_hz"] - 4000.0) < 32.0
    assert abs(rows["t1k"]["centroid_hz"] - 1000.0) < 150.0
    assert rows["t4k"]["centroid_hz"] > rows["t1k"]["centroid_hz"]
    for k in ("t1k", "t4k"):
        assert rows[k]["rolloff_hz"] >= rows[k]["centroid_hz"] - 64.0
    assert rows["bad"]["status"] == "unsupported"


def test_silence_stats_exact(ray_session):
    """Silence detection: hand-built clip with silence-tone-silence
    layout gives exact frame counts (int64-exact energy compares),
    leading/trailing runs, and unsupported counter rows."""
    import ray.data as rd

    from gdal_ray.stages.media import SilenceStats, encode_audio_pcm16

    sr = 16000
    win, hop = 512, 256
    sil = np.zeros(sr // 2, np.int16)                 # 0.5 s silence
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * 440 * t) * 9000).astype(np.int16)
    clip = np.concatenate([sil, tone, sil])
    ds = rd.from_items([
        {"media_id": "c", "codec": "pcm16",
         "bytes": encode_audio_pcm16(clip, sr)},
        {"media_id": "allq", "codec": "pcm16",
         "bytes": encode_audio_pcm16(np.zeros(4096, np.int16), sr)},
        {"media_id": "bad", "codec": "mp3", "bytes": b"x"},
    ])
    rows = {r["media_id"]: r for r in ds.map_batches(
        SilenceStats, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"win": win, "hop": hop}).take_all()}
    c = rows["c"]
    # exact reference computed the same integer way
    n = len(clip)
    n_frames = 1 + (n - win) // hop
    idx = np.arange(win)[None, :] + np.arange(n_frames)[:, None] * hop
    fr = clip.astype(np.int64)[idx]
    silent = (fr * fr).sum(axis=1) < 1000 * win
    assert c["n_frames"] == n_frames
    assert c["silent_frames"] == int(silent.sum())
    assert c["leading_silent"] == int(np.argmax(~silent))
    assert c["trailing_silent"] == int(np.argmax(~silent[::-1]))
    assert c["silent_runs"] == 2
    assert c["status"] == "ok"
    aq = rows["allq"]
    assert aq["silent_frames"] == aq["n_frames"] > 0
    assert aq["leading_silent"] == aq["n_frames"]
    assert rows["bad"]["status"] == "unsupported"


def test_loudness_and_resample(ray_session):
    """Loudness: full-scale square wave = 0 dBFS RMS and peak with
    every sample counted clipped; half-scale sine ~= -9.03 dBFS peak.
    Resample: 8 kHz -> 16 kHz doubles the length and keeps a pure
    tone's dominant bin; identity resample is bit-exact."""
    import ray.data as rd

    from gdal_ray.stages.media import (AudioResample, LoudnessStats,
                                       decode_audio,
                                       encode_audio_pcm16,
                                       resample_linear)

    sr = 8000
    square = np.full(sr, 32767, np.int16)
    square[::2] = -32767
    t = np.arange(sr) / sr
    half = (np.sin(2 * np.pi * 440 * t) * 16384).astype(np.int16)
    ds = rd.from_items([
        {"media_id": "sq", "codec": "pcm16",
         "bytes": encode_audio_pcm16(square, sr)},
        {"media_id": "half", "codec": "pcm16",
         "bytes": encode_audio_pcm16(half, sr)},
    ])
    rows = {r["media_id"]: r for r in ds.map_batches(
        LoudnessStats, batch_format="pyarrow",
        concurrency=1).take_all()}
    sq = rows["sq"]
    assert sq["clipped"] == sr
    assert abs(sq["rms_dbfs"] - 20 * np.log10(32767 / 32768)) < 1e-12
    assert sq["peak_dbfs"] == sq["rms_dbfs"]
    assert abs(rows["half"]["peak_dbfs"]
               - 20 * np.log10(16384 / 32768)) < 1e-6

    # resample stage
    out = {r["media_id"]: r for r in ds.map_batches(
        AudioResample, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"dst_sr": 16000}).take_all()}
    s2, sr2 = decode_audio(bytes(out["half"]["bytes"]), "pcm16")
    assert sr2 == 16000 and len(s2) == 2 * sr
    # dominant bin stays at 440 Hz after resampling
    mag = np.abs(np.fft.rfft(s2.astype(np.float64)))
    dom = np.fft.rfftfreq(len(s2), 1 / 16000)[mag.argmax()]
    assert abs(dom - 440.0) < 2.0
    # identity is bit-exact
    np.testing.assert_array_equal(resample_linear(half, sr, sr), half)


def test_frame_quality_and_borders(ray_session):
    """Duplicate/black/flat frame counters and letterbox border
    detection: hand-built clips with known structure give exact
    counts; unsupported codecs stay counter rows."""
    import ray.data as rd

    from gdal_ray.stages.media import (BorderStats, FrameQuality,
                                       encode_video_rawv,
                                       uniform_border)

    rng = np.random.default_rng(3)
    live = rng.integers(16, 255, (2, 12, 16, 3)).astype(np.uint8)
    frames = np.concatenate([
        live[:1], live[:1],                 # one duplicate pair
        np.zeros((2, 12, 16, 3), np.uint8),  # two black (also flat)
        np.full((1, 12, 16, 3), 200, np.uint8),  # one flat non-black
        live[1:],
    ])
    # letterbox the whole clip: 2 rows top/bottom, 3 cols left/right
    boxed = np.zeros_like(frames)
    boxed[:, 2:-2, 3:-3] = frames[:, 2:-2, 3:-3]
    ds = rd.from_items([
        {"media_id": "c", "codec": "rawv",
         "bytes": encode_video_rawv(frames)},
        {"media_id": "b", "codec": "rawv",
         "bytes": encode_video_rawv(boxed)},
        {"media_id": "bad", "codec": "h264", "bytes": b"x"},
    ])
    rows = {r["media_id"]: r for r in ds.map_batches(
        FrameQuality, batch_format="pyarrow", concurrency=1).take_all()}
    c = rows["c"]
    assert c["n_frames"] == 6
    assert c["dup_frames"] == 2      # dup pair + black pair
    assert c["black_frames"] == 2
    assert c["flat_frames"] == 3     # two black + one solid 200
    assert rows["bad"]["status"] == "unsupported"

    bords = {r["media_id"]: r for r in ds.map_batches(
        BorderStats, batch_format="pyarrow", concurrency=1).take_all()}
    b = bords["b"]
    assert (b["top"], b["bottom"], b["left"], b["right"]) == (2, 2, 3, 3)
    # an unboxed random frame has tiny/no uniform border
    assert bords["c"]["top"] <= 1
    # direct function anchors incl. full-flat frame
    assert uniform_border(np.zeros((5, 7), np.uint8)) == (5, 0, 7, 0)

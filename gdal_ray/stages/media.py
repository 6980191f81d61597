"""Multimodal (audio / video) columns: opaque binary payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

Engine addition beyond the reference (SURVEY.md §2.1 note: GDAL's
format zoo covers imagery; a 100-TB training-data pipeline also
carries audio/video).  The data model mirrors the image convention
used everywhere else in this repo: one row per clip, an opaque
``bytes`` column, small typed metadata columns (codec, rates, counts),
and vectorized per-batch kernels.

Codec support is explicit and gated:

- ``pcm16`` audio (self-describing AUD0 header + int16 LE samples) and
  ``rawv`` video (VID0 header + concatenated raw RGB frames) decode
  for real, in numpy.
- Compressed codecs (opus/mp3/h264/...) are NOT implemented in this
  container (no decoder libs): ``decode_audio``/``decode_video`` raise
  ``NotImplementedError`` with the codec name, and the pipeline-level
  stages ROUTE those rows to an explicit ``unsupported`` counter
  instead of crashing — the no-silent-drops rule: a 100-TB run sees
  exactly how many clips were skipped and why.  Swapping in a native
  codec behind the same registry keeps every downstream stage intact.

All feature math is integer-exact (int16 samples -> int64 energies,
sign-change counts), so engine<->golden comparisons are exact.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

AUDIO_MAGIC = b"AUD0"
VIDEO_MAGIC = b"VID0"


# ------------------------------------------------------------- payloads


def encode_audio_pcm16(samples: np.ndarray, sr: int = 16000) -> bytes:
    """AUD0 | u16 channels | u16 reserved | u32 sr | u32 n | int16 LE."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    return (
        AUDIO_MAGIC
        + struct.pack("<HHII", 1, 0, sr, len(s))
        + s.tobytes()
    )


def decode_audio(payload: bytes, codec: str = "pcm16"):
    """-> (samples int16[n], sr).  Only pcm16 is implemented here."""
    if codec != "pcm16":
        raise NotImplementedError(
            f"audio codec {codec!r}: no decoder in this environment "
            "(plug a native decoder into decode_audio behind the same "
            "signature)"
        )
    if payload[:4] != AUDIO_MAGIC:
        raise ValueError("bad audio magic")
    _ch, _r, sr, n = struct.unpack_from("<HHII", payload, 4)
    samples = np.frombuffer(payload, dtype="<i2", count=n, offset=16)
    return samples, sr


def encode_video_rawv(frames: np.ndarray) -> bytes:
    """VID0 | u16 w | u16 h | u16 n_frames | u16 reserved | raw RGB."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = f.shape
    return VIDEO_MAGIC + struct.pack("<HHHH", w, h, n, 0) + f.tobytes()


def decode_video(payload: bytes, codec: str = "rawv") -> np.ndarray:
    """-> frames uint8[n, h, w, 3].  Only rawv is implemented here."""
    if codec != "rawv":
        raise NotImplementedError(
            f"video codec {codec!r}: no decoder in this environment"
        )
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("bad video magic")
    w, h, n, _ = struct.unpack_from("<HHHH", payload, 4)
    return np.frombuffer(payload, dtype=np.uint8, offset=12).reshape(
        n, h, w, 3
    )


# ------------------------------------------------------- feature stages


class AudioFeatures:
    """Actor-pool stage: per-clip frame-level features over hop
    windows — frame ENERGY (sum of squares, exact int64) and
    ZERO-CROSSING count.  Window plan built once per actor.

    Output rows: (media_id, n_frames, zcr_total, energy_total) plus an
    `unsupported` count column folded upstream by the caller."""

    def __init__(self, win: int = 512, hop: int = 256):
        self.win = win
        self.hop = hop

    def _features(self, samples: np.ndarray):
        n = len(samples)
        if n < self.win:
            return 0, 0, 0
        n_frames = 1 + (n - self.win) // self.hop
        idx = (
            np.arange(self.win)[None, :]
            + np.arange(n_frames)[:, None] * self.hop
        )
        frames = samples.astype(np.int64)[idx]
        energy = int((frames * frames).sum())
        sign = frames >= 0
        zcr = int((sign[:, 1:] != sign[:, :-1]).sum())
        return n_frames, zcr, energy

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        out = {"media_id": [], "n_frames": [], "zcr": [], "energy": [],
               "status": []}
        for mid, blob, codec in zip(ids, blobs, codecs_):
            try:
                samples, _sr = decode_audio(blob, codec)
            except NotImplementedError:
                out["media_id"].append(mid)
                out["n_frames"].append(0)
                out["zcr"].append(0)
                out["energy"].append(0)
                out["status"].append("unsupported")
                continue
            nf, zcr, en = self._features(samples)
            out["media_id"].append(mid)
            out["n_frames"].append(nf)
            out["zcr"].append(zcr)
            out["energy"].append(en)
            out["status"].append("ok")
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "zcr": pa.array(out["zcr"], pa.int64()),
                "energy": pa.array(out["energy"], pa.int64()),
                "status": pa.array(out["status"], pa.string()),
            }
        )


class VideoFrameSample:
    """Actor-pool stage: sample every k-th frame of each clip and emit
    one IMAGE-convention row per sampled frame.  ``emit="cs"`` carries
    a band checksum; ``emit="phash"`` carries the frame's perceptual
    hash in the ``cs`` column, making the output directly consumable by
    stages.dedup.phash_neardup_pairs (frame-level dedup ACROSS clips —
    media_id/frame_idx become the image_id)."""

    def __init__(self, every: int = 4, emit: str = "cs"):
        from ..functions import checksum, phash

        self.every = every
        self.emit = emit
        self.cs_band = checksum.checksum_band
        self.phash64 = phash.phash64

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        mid_o, fi_o, nf_o, cs_o, st_o = [], [], [], [], []
        for mid, blob, codec in zip(ids, blobs, codecs_):
            try:
                frames = decode_video(blob, codec)
            except NotImplementedError:
                mid_o.append(mid)
                fi_o.append(-1)
                nf_o.append(0)
                cs_o.append(0)
                st_o.append("unsupported")
                continue
            n = frames.shape[0]
            for fi in range(0, n, self.every):
                mid_o.append(mid)
                fi_o.append(fi)
                nf_o.append(n)
                if self.emit == "phash":
                    h = int(self.phash64(frames[fi]))
                    cs_o.append(h - (1 << 64) if h >= (1 << 63) else h)
                else:
                    cs_o.append(
                        int(sum(self.cs_band(frames[fi, :, :, b])
                                for b in range(3)))
                    )
                st_o.append("ok")
        return pa.table(
            {
                "media_id": pa.array(mid_o, pa.string()),
                "frame_idx": pa.array(fi_o, pa.int64()),
                "n_frames": pa.array(nf_o, pa.int64()),
                "cs": pa.array(cs_o, pa.int64()),
                "status": pa.array(st_o, pa.string()),
            }
        )


def audio_features(clips, win: int = 512, hop: int = 256,
                   concurrency=(1, 8)):
    return clips.map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(win=win, hop=hop),
        batch_format="pyarrow",
        batch_size=32,  # binary payloads: small batches
        concurrency=concurrency,
    )


def video_frame_sample(clips, every: int = 4, emit: str = "cs",
                       concurrency=(1, 8)):
    return clips.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs=dict(every=every, emit=emit),
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )


def video_frame_neardup_pairs(clips, every: int = 4, max_hamming: int = 6):
    """End-to-end frame-level near-dup across video clips: sample
    frames -> per-frame phash -> the banded phash near-dup shuffle.
    Returns (id_a, id_b, hamming) over 'media_id/f<idx>' frame ids."""
    import pyarrow.compute as pc

    from .dedup import phash_neardup_pairs

    frames = video_frame_sample(clips, every=every, emit="phash")

    def as_images(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("status"), pa.scalar("ok")))
        fid = pc.binary_join_element_wise(
            t.column("media_id"),
            pc.cast(t.column("frame_idx"), pa.string()),
            "/f",
        )
        return pa.table({"image_id": fid, "phash": t.column("cs")})

    return phash_neardup_pairs(
        frames.map_batches(as_images, batch_format="pyarrow"),
        max_hamming=max_hamming,
    )


# -------------------------------------------- deterministic clip synth
#
# Clip payloads are pure functions of an integer key (formulas mirrored
# by the rasterref golden): audio = two quantized sinusoids + a
# sawtooth at key-derived frequencies; video = moving gradient frames.


def synth_audio_clip(key: int) -> tuple[bytes, str]:
    n = 8000 + (key * 37) % 8000
    f1 = 3 + (key * 7) % 40
    f2 = 50 + (key * 13) % 200
    i = np.arange(n, dtype=np.float64)
    s = (
        9000.0 * np.sin(2.0 * np.pi * f1 * i / 16000.0)
        + 4000.0 * np.sin(2.0 * np.pi * f2 * i / 16000.0)
    )
    saw = ((i * (1 + key % 5)) % 4096) - 2048.0
    samples = np.floor(s + saw + 0.5).astype(np.int16)
    codec = "opus" if key % 17 == 0 else "pcm16"
    return encode_audio_pcm16(samples), codec


def synth_video_clip(key: int) -> tuple[bytes, str]:
    w, h = 32, 24
    n = 8 + (key * 11) % 25
    fr = np.arange(n, dtype=np.int64)[:, None, None]
    yy = np.arange(h, dtype=np.int64)[None, :, None]
    xx = np.arange(w, dtype=np.int64)[None, None, :]
    r = np.broadcast_to((xx * 8 + fr * 5 + key) % 256, (n, h, w))
    g = np.broadcast_to((yy * 11 + fr * 3 + key * 7) % 256, (n, h, w))
    b = np.broadcast_to((xx + yy + fr * 9) % 256, (n, h, w))
    frames = np.stack([r, g, b], axis=-1).astype(np.uint8)
    codec = "h264" if key % 19 == 0 else "rawv"
    return encode_video_rawv(frames), codec


# ------------------------------------------------------- image quality


def image_quality_metrics(img: "np.ndarray") -> tuple[int, int, int]:
    """Integer-exact image quality metrics for training-data filtering
    (the image analog of the text quality scorer; engine addition).

    Returns (brightness_milli, lapvar_milli, entropy_milli) over the
    integer luma ``(77R + 150G + 29B) >> 8``:

    - brightness: round-half-up milli of the luma mean, pure integer
      arithmetic ``(2000*S + n) // (2*n)``;
    - Laplacian variance (blur detector): interior 4-neighbour
      Laplacian, exact integer moment sums, then THE shared IEEE
      expression ``s2/n2 - (s1/n2)**2`` (mirrored verbatim by the
      rasterref golden — same floats, same rounding);
    - 256-bin luma entropy in milli-bits, shared expression
      ``-(p*log2(p)).sum()`` over the positive bins.
    """
    g = (
        77 * img[:, :, 0].astype(np.int64)
        + 150 * img[:, :, 1].astype(np.int64)
        + 29 * img[:, :, 2].astype(np.int64)
    ) >> 8
    h, w = g.shape
    n = h * w
    bright_m = int((2000 * int(g.sum()) + n) // (2 * n))
    if h > 2 and w > 2:
        lap = (
            4 * g[1:-1, 1:-1]
            - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
        )
        n2 = (h - 2) * (w - 2)
        s1 = int(lap.sum())
        s2 = int((lap * lap).sum())
        var = s2 / n2 - (s1 / n2) ** 2
        lapvar_m = int(np.floor(var * 1000.0 + 0.5))
    else:
        lapvar_m = 0
    cnt = np.bincount(g.reshape(-1).astype(np.int64), minlength=256)
    p = cnt[cnt > 0] / n
    ent = float(-(p * np.log2(p)).sum())
    ent_m = int(np.floor(ent * 1000.0 + 0.5))
    return bright_m, lapvar_m, ent_m


class ImageQuality:
    """Actor-pool stage: decode each chip once, emit the integer-exact
    quality metric row (image_id, bright_m, lapvar_m, entropy_m)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions import codecs

        cols = {
            c: t.column(c).to_pylist()
            for c in ("image_id", "bytes", "w", "h", "fmt")
        }
        n = t.num_rows
        out = np.empty((n, 3), np.int64)
        for i in range(n):
            img = codecs.decode(
                cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i]
            )
            out[i] = image_quality_metrics(img)
        return pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "bright_m": pa.array(out[:, 0]),
                "lapvar_m": pa.array(out[:, 1]),
                "entropy_m": pa.array(out[:, 2]),
            }
        )

class SceneCuts:
    """Actor-pool stage: scene-cut detection over video frame
    sequences (the video-curation step an LLM-data pipeline runs
    before frame sampling; engine addition).  Per clip: mean absolute
    inter-frame pixel difference (exact integer sums -> float64 once),
    a cut wherever the difference exceeds ``threshold``.  Output one
    row per clip: media_id, n_frames, n_cuts, cut_frames
    (list<int32> of the first frame index of each new scene),
    mean_delta.  Unsupported codecs pass through as
    n_frames = 0 rows (the media-suite unsupported-counter
    discipline)."""

    def __init__(self, threshold: float = 12.0):
        self.threshold = float(threshold)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        payloads = t.column("payload").to_pylist()
        out = {"media_id": [], "n_frames": [], "n_cuts": [],
               "cut_frames": [], "mean_delta": []}
        for mid, codec, payload in zip(ids, codecs_, payloads):
            if codec != "rawv":
                out["media_id"].append(mid)
                out["n_frames"].append(0)
                out["n_cuts"].append(0)
                out["cut_frames"].append([])
                out["mean_delta"].append(0.0)
                continue
            frames = decode_video(payload).astype(np.int64)
            n = len(frames)
            if n < 2:
                out["media_id"].append(mid)
                out["n_frames"].append(n)
                out["n_cuts"].append(0)
                out["cut_frames"].append([])
                out["mean_delta"].append(0.0)
                continue
            diffs = np.abs(frames[1:] - frames[:-1]).reshape(
                n - 1, -1).sum(axis=1)
            per_px = diffs.astype(np.float64) / frames[0].size
            cuts = (np.flatnonzero(per_px > self.threshold) + 1)
            out["media_id"].append(mid)
            out["n_frames"].append(n)
            out["n_cuts"].append(int(len(cuts)))
            out["cut_frames"].append(cuts.astype(np.int32).tolist())
            out["mean_delta"].append(float(per_px.mean()))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "n_frames": pa.array(out["n_frames"], pa.int32()),
            "n_cuts": pa.array(out["n_cuts"], pa.int32()),
            "cut_frames": pa.array(out["cut_frames"],
                                   pa.list_(pa.int32())),
            "mean_delta": pa.array(out["mean_delta"], pa.float64()),
        })

class SpectralFeatures:
    """Actor-pool stage: per-clip spectral summary over hop windows —
    the audio-curation signals (speech/music/noise separation inputs;
    engine addition).  Per window: rFFT magnitude spectrum -> spectral
    CENTROID (magnitude-weighted mean frequency, Hz) and ROLLOFF
    (the 85th-percentile-energy frequency); clip rows carry the
    across-window means plus the dominant-bin frequency of the whole
    clip.  The Hann window and rfft plan are built once per actor;
    everything is float64 numpy (deterministic).  Unsupported codecs
    -> status='unsupported' counter rows."""

    def __init__(self, win: int = 512, hop: int = 256,
                 rolloff: float = 0.85):
        self.win = win
        self.hop = hop
        self.rolloff = float(rolloff)
        self.hann = 0.5 - 0.5 * np.cos(
            2.0 * np.pi * np.arange(win) / win)

    def _features(self, samples: np.ndarray, sr: int):
        n = len(samples)
        if n < self.win:
            return 0, 0.0, 0.0, 0.0
        n_frames = 1 + (n - self.win) // self.hop
        idx = (np.arange(self.win)[None, :]
               + np.arange(n_frames)[:, None] * self.hop)
        frames = samples.astype(np.float64)[idx] * self.hann[None, :]
        mag = np.abs(np.fft.rfft(frames, axis=1))
        freqs = np.fft.rfftfreq(self.win, d=1.0 / sr)
        tot = mag.sum(axis=1)
        ok = tot > 0
        cent = np.zeros(n_frames)
        cent[ok] = (mag[ok] * freqs[None, :]).sum(axis=1) / tot[ok]
        # rolloff: first frequency where cumulative energy crosses
        # the threshold fraction
        en = mag * mag
        cum = np.cumsum(en, axis=1)
        tot_e = cum[:, -1]
        roll = np.zeros(n_frames)
        ok_e = tot_e > 0
        if ok_e.any():
            thresh = self.rolloff * tot_e[ok_e, None]
            first = (cum[ok_e] >= thresh).argmax(axis=1)
            roll[ok_e] = freqs[first]
        dom = float(freqs[en.sum(axis=0).argmax()])
        return (n_frames, float(cent.mean()), float(roll.mean()), dom)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        out = {"media_id": [], "n_frames": [], "centroid_hz": [],
               "rolloff_hz": [], "dominant_hz": [], "status": []}
        for mid, blob, codec in zip(ids, blobs, codecs_):
            try:
                samples, sr = decode_audio(blob, codec)
            except NotImplementedError:
                out["media_id"].append(mid)
                out["n_frames"].append(0)
                out["centroid_hz"].append(0.0)
                out["rolloff_hz"].append(0.0)
                out["dominant_hz"].append(0.0)
                out["status"].append("unsupported")
                continue
            nf, cent, roll, dom = self._features(samples, sr)
            out["media_id"].append(mid)
            out["n_frames"].append(nf)
            out["centroid_hz"].append(cent)
            out["rolloff_hz"].append(roll)
            out["dominant_hz"].append(dom)
            out["status"].append("ok")
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "n_frames": pa.array(out["n_frames"], pa.int64()),
            "centroid_hz": pa.array(out["centroid_hz"], pa.float64()),
            "rolloff_hz": pa.array(out["rolloff_hz"], pa.float64()),
            "dominant_hz": pa.array(out["dominant_hz"], pa.float64()),
            "status": pa.array(out["status"], pa.string()),
        })



class SilenceStats:
    """Actor-pool stage: silence detection per clip — the audio
    curation gate (trim/drop decisions before training).  Hop-window
    int64 energies compare EXACTLY against ``threshold`` (mean-square
    per sample, int64 domain: a window is silent when
    sum(s^2) < threshold * win), so engine<->golden rows are integer-
    exact.  Output per clip: total / silent / leading / trailing
    silent frame counts and the number of contiguous silent runs.
    Unsupported codecs -> status='unsupported' counter rows."""

    def __init__(self, win: int = 512, hop: int = 256,
                 threshold: int = 1000):
        self.win = win
        self.hop = hop
        self.threshold = int(threshold)

    def _stats(self, samples: np.ndarray):
        n = len(samples)
        if n < self.win:
            return 0, 0, 0, 0, 0
        n_frames = 1 + (n - self.win) // self.hop
        idx = (np.arange(self.win)[None, :]
               + np.arange(n_frames)[:, None] * self.hop)
        frames = samples.astype(np.int64)[idx]
        energy = (frames * frames).sum(axis=1)
        silent = energy < self.threshold * self.win
        n_sil = int(silent.sum())
        lead = int(np.argmax(~silent)) if not silent.all() else n_frames
        trail = (int(np.argmax(~silent[::-1]))
                 if not silent.all() else n_frames)
        runs = int(np.count_nonzero(np.diff(
            np.concatenate([[False], silent]).astype(np.int8)) == 1))
        return n_frames, n_sil, lead, trail, runs

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        cols = {k: [] for k in ("media_id", "n_frames", "silent_frames",
                                "leading_silent", "trailing_silent",
                                "silent_runs", "status")}
        for mid, blob, codec in zip(ids, blobs, codecs_):
            try:
                samples, _sr = decode_audio(blob, codec)
            except NotImplementedError:
                vals = (0, 0, 0, 0, 0)
                status = "unsupported"
            else:
                vals = self._stats(samples)
                status = "ok"
            cols["media_id"].append(mid)
            for k, v in zip(("n_frames", "silent_frames",
                             "leading_silent", "trailing_silent",
                             "silent_runs"), vals):
                cols[k].append(v)
            cols["status"].append(status)
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.string()),
            "n_frames": pa.array(cols["n_frames"], pa.int64()),
            "silent_frames": pa.array(cols["silent_frames"], pa.int64()),
            "leading_silent": pa.array(cols["leading_silent"], pa.int64()),
            "trailing_silent": pa.array(cols["trailing_silent"], pa.int64()),
            "silent_runs": pa.array(cols["silent_runs"], pa.int64()),
            "status": pa.array(cols["status"], pa.string()),
        })


class LoudnessStats:
    """Actor-pool stage: clip loudness — RMS and peak in dBFS
    (full-scale = 32768 for pcm16), from the exact int64 sum of
    squares with a single float64 finalize.  The curation inputs for
    too-quiet / clipped-clip filters.  Output: sum_sq (exact int64),
    n_samples, rms_dbfs, peak_dbfs, clipped sample count
    (|s| == 32767)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        cols = {k: [] for k in ("media_id", "n_samples", "sum_sq",
                                "rms_dbfs", "peak_dbfs", "clipped",
                                "status")}
        for mid, blob, codec in zip(ids, blobs, codecs_):
            try:
                samples, _sr = decode_audio(blob, codec)
            except NotImplementedError:
                row = (0, 0, float("-inf"), float("-inf"), 0,
                       "unsupported")
            else:
                s = samples.astype(np.int64)
                n = len(s)
                ssq = int((s * s).sum())
                peak = int(np.abs(s).max()) if n else 0
                rms_db = (20.0 * np.log10(
                    np.sqrt(ssq / n) / 32768.0)
                    if ssq > 0 else float("-inf"))
                pk_db = (20.0 * np.log10(peak / 32768.0)
                         if peak > 0 else float("-inf"))
                row = (n, ssq, float(rms_db), float(pk_db),
                       int((np.abs(s) == 32767).sum()), "ok")
            cols["media_id"].append(mid)
            for k, v in zip(("n_samples", "sum_sq", "rms_dbfs",
                             "peak_dbfs", "clipped", "status"), row):
                cols[k].append(v)
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.string()),
            "n_samples": pa.array(cols["n_samples"], pa.int64()),
            "sum_sq": pa.array(cols["sum_sq"], pa.int64()),
            "rms_dbfs": pa.array(cols["rms_dbfs"], pa.float64()),
            "peak_dbfs": pa.array(cols["peak_dbfs"], pa.float64()),
            "clipped": pa.array(cols["clipped"], pa.int64()),
            "status": pa.array(cols["status"], pa.string()),
        })


def resample_linear(samples: np.ndarray, src_sr: int,
                    dst_sr: int) -> np.ndarray:
    """Deterministic linear-interpolation sample-rate conversion:
    output length = floor(n * dst/src), sample k taken at source
    position k * src/dst (float64 interp, rounded to int16 with
    floor(x+0.5) like the raster kernels)."""
    if src_sr == dst_sr:
        return samples.astype(np.int16)
    n = len(samples)
    m = int(n * dst_sr // src_sr)
    pos = np.arange(m, dtype=np.float64) * (src_sr / dst_sr)
    i0 = np.minimum(pos.astype(np.int64), n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = pos - i0
    s = samples.astype(np.float64)
    out = s[i0] * (1.0 - frac) + s[i1] * frac
    return np.clip(np.floor(out + 0.5), -32768, 32767).astype(np.int16)


class AudioResample:
    """Actor-pool stage: rewrite every clip's payload at ``dst_sr``
    via :func:`resample_linear` (the batch sample-rate normalization
    step before feature extraction / training).  Unsupported codecs
    pass through untouched with status='unsupported'."""

    def __init__(self, dst_sr: int = 16000):
        self.dst_sr = int(dst_sr)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        o_bytes, o_sr, o_n, o_status = [], [], [], []
        for blob, codec in zip(blobs, codecs_):
            try:
                samples, sr = decode_audio(blob, codec)
            except NotImplementedError:
                o_bytes.append(blob)
                o_sr.append(0)
                o_n.append(0)
                o_status.append("unsupported")
                continue
            out = resample_linear(samples, sr, self.dst_sr)
            o_bytes.append(encode_audio_pcm16(out, self.dst_sr))
            o_sr.append(self.dst_sr)
            o_n.append(len(out))
            o_status.append("ok")
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "bytes": pa.array(o_bytes, pa.binary()),
            "codec": pa.array(
                ["pcm16" if s == "ok" else c
                 for s, c in zip(o_status, codecs_)], pa.string()),
            "sr": pa.array(o_sr, pa.int64()),
            "n_samples": pa.array(o_n, pa.int64()),
            "status": pa.array(o_status, pa.string()),
        })


class FrameQuality:
    """Actor-pool stage: per-clip frame-level curation counters, all
    integer-exact — the video analogs of the audio silence gate:

    - ``dup_frames``: consecutive frames that are BYTE-IDENTICAL to
      their predecessor (frozen video / padding detection);
    - ``black_frames``: frames whose every sample is <= ``black_max``
      (fade/black-segment detection);
    - ``flat_frames``: frames with a single distinct value (any solid
      color, black included).

    Unsupported codecs -> status='unsupported' counter rows."""

    def __init__(self, black_max: int = 8):
        self.black_max = int(black_max)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        cols = {k: [] for k in ("media_id", "n_frames", "dup_frames",
                                "black_frames", "flat_frames",
                                "status")}
        for mid, blob, codec in zip(ids, blobs, codecs_):
            try:
                fr = decode_video(blob, codec)
            except NotImplementedError:
                row = (0, 0, 0, 0, "unsupported")
            else:
                n = len(fr)
                flat = fr.reshape(n, -1).astype(np.int64)
                dup = int((flat[1:] == flat[:-1]).all(axis=1).sum()) \
                    if n > 1 else 0
                black = int((flat <= self.black_max).all(axis=1).sum())
                solid = int((flat == flat[:, :1]).all(axis=1).sum())
                row = (n, dup, black, solid, "ok")
            cols["media_id"].append(mid)
            for k, v in zip(("n_frames", "dup_frames", "black_frames",
                             "flat_frames"), row[:4]):
                cols[k].append(v)
            cols["status"].append(row[4])
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.string()),
            "n_frames": pa.array(cols["n_frames"], pa.int64()),
            "dup_frames": pa.array(cols["dup_frames"], pa.int64()),
            "black_frames": pa.array(cols["black_frames"], pa.int64()),
            "flat_frames": pa.array(cols["flat_frames"], pa.int64()),
            "status": pa.array(cols["status"], pa.string()),
        })


def uniform_border(img: np.ndarray, tol: int = 4) -> tuple:
    """Letterbox / pillarbox detection for one (h, w[, 3]) frame:
    count of top/bottom/left/right rows/cols whose samples all sit
    within ``tol`` of the frame's corner value — integer-exact.
    Returns (top, bottom, left, right)."""
    a = np.asarray(img, dtype=np.int64)
    if a.ndim == 2:
        a = a[:, :, None]
    ref = a[0, 0]

    def run(axis_slices):
        cnt = 0
        for sl in axis_slices:
            if np.abs(a[sl] - ref).max() <= tol:
                cnt += 1
            else:
                break
        return cnt

    h, w = a.shape[:2]
    top = run([np.s_[i, :, :] for i in range(h)])
    bottom = run([np.s_[h - 1 - i, :, :] for i in range(h - top)])
    left = run([np.s_[:, j, :] for j in range(w)])
    right = run([np.s_[:, w - 1 - j, :] for j in range(w - left)])
    return top, bottom, left, right


class BorderStats:
    """Actor-pool stage: letterbox borders of every clip's FIRST
    frame (the crop-decision input before training) via
    :func:`uniform_border`."""

    def __init__(self, tol: int = 4):
        self.tol = int(tol)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        blobs = t.column("bytes").to_pylist()
        codecs_ = t.column("codec").to_pylist()
        cols = {k: [] for k in ("media_id", "top", "bottom", "left",
                                "right", "status")}
        for mid, blob, codec in zip(ids, blobs, codecs_):
            try:
                fr = decode_video(blob, codec)
            except NotImplementedError:
                row = (0, 0, 0, 0, "unsupported")
            else:
                row = (*uniform_border(fr[0], self.tol), "ok")
            cols["media_id"].append(mid)
            for k, v in zip(("top", "bottom", "left", "right"),
                            row[:4]):
                cols[k].append(v)
            cols["status"].append(row[4])
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.string()),
            "top": pa.array(cols["top"], pa.int64()),
            "bottom": pa.array(cols["bottom"], pa.int64()),
            "left": pa.array(cols["left"], pa.int64()),
            "right": pa.array(cols["right"], pa.int64()),
            "status": pa.array(cols["status"], pa.string()),
        })

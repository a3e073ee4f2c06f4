"""Multimodal audio/video columns: opaque binary + typed metadata.

The training-data-pipeline axis of the brief: audio and video payloads
ride as opaque ``binary`` columns next to typed metadata, decoded only
inside Arrow-batched UDFs — the same contract as the image table.

What is REAL in-container (no stubs):
- **WAV (RIFF PCM)**: encode + decode, pure stdlib struct + NumPy —
  16-bit mono/stereo. WAV needs no codec library.
- **Audio features**: RMS energy, zero-crossing rate, spectral
  centroid (NumPy rFFT) — vectorized per clip inside ``mapInPandas``.
- **Frame container ("GSMJ")**: a Motion-JPEG-style concatenation of
  independently-encoded frames (PNG or JPEG via the in-repo codecs)
  with a length-prefixed index — frame-sampling reads ONLY the
  sampled frames' byte ranges (the pruning a real MJPEG/MP4 reader
  does with its sample table).

What is STUBBED loudly: compressed audio (MP3/Opus) and inter-frame
video codecs (H.264/VP9) raise ``NotImplementedError`` naming the
library a cluster deploy would add (ffmpeg/PyAV); the Spark-side
plumbing — schema, batching, per-range frame reads — is identical
either way, so swapping the decode body is a one-function change.

Scale: clips/videos are rows; every operator is a ``mapInPandas``
over row batches with only sampled/windowed payload bytes touched.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.raster import codec

# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — real, stdlib-only
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sr: int) -> bytes:
    """16-bit PCM WAV. ``samples``: float in [-1, 1], shape (n,) or
    (n, channels)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    nch = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, sr, sr * nch * 2, nch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """→ (float64 samples in [-1, 1] shape (n, ch), sample_rate)."""
    b = bytes(buf)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        if b[:3] == b"ID3" or b[:2] == b"\xff\xfb":
            raise NotImplementedError(
                "MP3 decoding requires ffmpeg/audioread — only RIFF PCM "
                "WAV is implemented in-container"
            )
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    sr = nch = bits = None
    data = None
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (ln,) = struct.unpack_from("<I", b, off + 4)
        if tag == b"fmt ":
            afmt, nch, sr, _, _, bits = struct.unpack_from("<HHIIHH", b, off + 8)
            if afmt != 1 or bits != 16:
                raise NotImplementedError("only 16-bit PCM WAV supported")
        elif tag == b"data":
            data = b[off + 8 : off + 8 + ln]
        off += 8 + ln + (ln & 1)
    if data is None or sr is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    return pcm.reshape(-1, nch), int(sr)


# ---------------------------------------------------------------------------
# GSMJ frame container — length-prefixed independent frames
# ---------------------------------------------------------------------------

GSMJ_MAGIC = b"GSMJ1\x00"


def frames_encode(frames: list[np.ndarray], fmt: str = "png", fps: float = 10.0) -> bytes:
    """Concatenate independently coded frames with a byte-range index
    (the role of an MP4 sample table): header = magic, n, fps, then n
    (offset, length) pairs, then the frame payloads."""
    payloads = [codec.encode_image(f, fmt) for f in frames]
    head_len = len(GSMJ_MAGIC) + 4 + 8 + 16 * len(payloads)
    off = head_len
    index = []
    for p in payloads:
        index.append((off, len(p)))
        off += len(p)
    out = [GSMJ_MAGIC, struct.pack("<I", len(payloads)), struct.pack("<d", fps)]
    for o, ln in index:
        out.append(struct.pack("<QQ", o, ln))
    out.extend(payloads)
    return b"".join(out)


def frames_index(buf: bytes) -> tuple[int, float, list[tuple[int, int]]]:
    b = bytes(buf)
    if b[:6] != GSMJ_MAGIC:
        if b[4:8] == b"ftyp":
            raise NotImplementedError(
                "MP4/H.264 decoding requires ffmpeg/PyAV — only the GSMJ "
                "independent-frame container is implemented in-container"
            )
        raise ValueError("not a GSMJ frame container")
    (n,) = struct.unpack_from("<I", b, 6)
    (fps,) = struct.unpack_from("<d", b, 10)
    idx = [struct.unpack_from("<QQ", b, 18 + 16 * i) for i in range(n)]
    return n, fps, idx


def frame_decode(buf: bytes, i: int) -> np.ndarray:
    """Decode ONE frame by byte range — sampled reads never touch the
    other frames' bytes."""
    _, _, idx = frames_index(buf)
    off, ln = idx[i]
    return codec.decode_image(bytes(buf)[off : off + ln])


# ---------------------------------------------------------------------------
# Synthetic fixtures (deterministic, closed-form-oracle-able)
# ---------------------------------------------------------------------------


def audio_clips(spark: SparkSession, sf_dir: str, n_mod: int = 40) -> DataFrame:
    """Audio table from ``orders``: one 0.5 s mono sine clip per
    sampled order — frequency 220·(1 + okey%8), sr 8000, amplitude
    0.5. Pure tones make every feature closed-form: RMS = A/√2,
    ZCR = 2f/sr, spectral centroid = f."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % n_mod == 0
    )

    def gen(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                okey = int(r.o_orderkey)
                sr = 8000
                f0 = 220.0 * (1 + okey % 8)
                t = np.arange(sr // 2) / sr
                wave = 0.5 * np.sin(2 * np.pi * f0 * t)
                rows.append(
                    {
                        "media_id": f"aud-{okey}",
                        "okey": okey,
                        "bytes": wav_encode(wave, sr),
                        "sr": sr,
                        "n_samples": sr // 2,
                        "freq_hz": f0,
                        "caption": f"tone {f0:.0f} Hz order {okey}",
                    }
                )
            yield pd.DataFrame(rows)

    return orders.mapInPandas(
        gen,
        schema="media_id string, okey long, bytes binary, sr int, "
        "n_samples int, freq_hz double, caption string",
    )


def video_clips(
    spark: SparkSession, sf_dir: str, n_mod: int = 100, n_frames: int = 12
) -> DataFrame:
    """Video table from ``orders``: per sampled order, ``n_frames``
    32×32 PNG frames where frame k is the constant color
    (okey + 7·k) % 256 — a frame's pixel mean is closed-form."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % n_mod == 0
    )

    def gen(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                okey = int(r.o_orderkey)
                frames = [
                    np.full((32, 32, 3), (okey + 7 * k) % 256, np.uint8)
                    for k in range(n_frames)
                ]
                rows.append(
                    {
                        "media_id": f"vid-{okey}",
                        "okey": okey,
                        "bytes": frames_encode(frames, "png", fps=8.0),
                        "n_frames": n_frames,
                        "w": 32,
                        "h": 32,
                        "caption": f"clip order {okey}",
                    }
                )
            yield pd.DataFrame(rows)

    return orders.mapInPandas(
        gen,
        schema="media_id string, okey long, bytes binary, n_frames int, "
        "w int, h int, caption string",
    )


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------


def audio_features(clips: DataFrame) -> DataFrame:
    """Per-clip features, vectorized NumPy inside Arrow batches:
    (media_id, rms, zcr, centroid_hz, duration_s)."""

    def run(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                s, sr = wav_decode(r.bytes)
                x = s[:, 0]
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))) * sr
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
                centroid = float((spec * freqs).sum() / spec.sum())
                rows.append(
                    {
                        "media_id": r.media_id,
                        "okey": int(r.okey),
                        "rms": rms,
                        "zcr": zcr,
                        "centroid_hz": centroid,
                        "duration_s": len(x) / sr,
                    }
                )
            yield pd.DataFrame(rows)

    return clips.mapInPandas(
        run,
        schema="media_id string, okey long, rms double, zcr double, "
        "centroid_hz double, duration_s double",
    )


def frame_sample(videos: DataFrame, every: int = 4) -> DataFrame:
    """Sample every k-th frame by byte range (no full-clip decode) →
    (media_id, frame_idx, mean_value, w, h)."""

    def run(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                n, fps, idx = frames_index(r.bytes)
                for i in range(0, n, every):
                    off, ln = idx[i]
                    arr = codec.decode_image(bytes(r.bytes)[off : off + ln])
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "okey": int(r.okey),
                            "frame_idx": i,
                            "mean_value": float(arr.mean()),
                            "w": arr.shape[1],
                            "h": arr.shape[0],
                        }
                    )
            yield pd.DataFrame(rows)

    return videos.mapInPandas(
        run,
        schema="media_id string, okey long, frame_idx int, mean_value double, "
        "w int, h int",
    )


def audio_resample(clips: DataFrame, target_sr: int) -> DataFrame:
    """Linear-interpolation resample → (media_id, bytes, sr)."""

    def run(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                s, sr = wav_decode(r.bytes)
                n_out = int(round(s.shape[0] * target_sr / sr))
                t_out = np.arange(n_out) * (sr / target_sr)
                out = np.stack(
                    [
                        np.interp(t_out, np.arange(s.shape[0]), s[:, c])
                        for c in range(s.shape[1])
                    ],
                    axis=1,
                )
                rows.append(
                    {
                        "media_id": r.media_id,
                        "bytes": wav_encode(out, target_sr),
                        "sr": target_sr,
                        "n_samples": n_out,
                    }
                )
            yield pd.DataFrame(rows)

    return clips.mapInPandas(
        run, schema="media_id string, bytes binary, sr int, n_samples int"
    )

"""Audio/video multimodal column tests (WAV real, GSMJ frame container
real, compressed codecs loudly stubbed)."""

import numpy as np
import pytest

from gdal_spark.sources import media as M


def test_wav_roundtrip_mono_stereo():
    sr = 8000
    t = np.arange(1600) / sr
    mono = 0.3 * np.sin(2 * np.pi * 440 * t)
    s, sr2 = M.wav_decode(M.wav_encode(mono, sr))
    assert sr2 == sr and s.shape == (1600, 1)
    assert np.abs(s[:, 0] - mono).max() < 1.0 / 32767
    stereo = np.stack([mono, -mono], axis=1)
    s2, _ = M.wav_decode(M.wav_encode(stereo, sr))
    assert s2.shape == (1600, 2)
    assert np.abs(s2 - stereo).max() < 1.0 / 32767


def test_wav_rejects_mp3_loudly():
    with pytest.raises(NotImplementedError, match="MP3"):
        M.wav_decode(b"ID3\x04" + b"\x00" * 60)
    with pytest.raises(ValueError):
        M.wav_decode(b"nope" + b"\x00" * 60)


def test_frames_container_range_reads():
    frames = [np.full((8, 8, 3), c, np.uint8) for c in (10, 60, 200)]
    buf = M.frames_encode(frames, "png", fps=5.0)
    n, fps, idx = M.frames_index(buf)
    assert n == 3 and fps == 5.0
    # byte ranges are disjoint, ordered, and cover exactly the payloads
    assert idx[0][0] == 6 + 4 + 8 + 16 * 3
    for i in range(3):
        arr = M.frame_decode(buf, i)
        assert (arr == frames[i]).all()
    # frame 1's range really is a standalone PNG
    off, ln = idx[1]
    from gdal_spark.raster import codec

    assert (codec.decode_image(buf[off : off + ln]) == frames[1]).all()


def test_frames_rejects_mp4_loudly():
    fake_mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 40
    with pytest.raises(NotImplementedError, match="MP4"):
        M.frames_index(fake_mp4)


def test_audio_features_tone_closed_form(spark, sf_dir):
    clips = M.audio_clips(spark, sf_dir)
    feats = {r.okey: r for r in M.audio_features(clips).collect()}
    assert feats
    for okey, r in feats.items():
        f0 = 220.0 * (1 + okey % 8)
        assert abs(r.rms - 0.5 / np.sqrt(2)) < 1e-4
        assert abs(r.zcr / (2 * f0) - 1.0) < 0.01
        assert abs(r.centroid_hz - f0) < 0.5
        assert r.duration_s == pytest.approx(0.5)


def test_frame_sample_closed_form(spark, sf_dir):
    vids = M.video_clips(spark, sf_dir)
    rows = M.frame_sample(vids, every=4).collect()
    assert rows
    for r in rows:
        assert r.frame_idx in (0, 4, 8)
        assert r.mean_value == float((r.okey + 7 * r.frame_idx) % 256)
        assert (r.w, r.h) == (32, 32)


def test_audio_resample_preserves_tone(spark, sf_dir):
    clips = M.audio_clips(spark, sf_dir).limit(2)
    out = M.audio_resample(clips, 4000).collect()
    for r in out:
        s, sr = M.wav_decode(r.bytes)
        assert sr == 4000 and s.shape[0] == 2000
        # energy preserved through linear resample (tone << Nyquist)
        rms = float(np.sqrt((s[:, 0] ** 2).mean()))
        assert abs(rms - 0.5 / np.sqrt(2)) < 0.03

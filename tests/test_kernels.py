"""Built-in real multimodal kernels (ops/kernels.py): netpbm images
and WAV/PCM audio — exact-value twins computed independently here,
plus the Spark plumbing end-to-end via the pluggable-kernel contract."""

from __future__ import annotations

import io
import math
import wave

import numpy as np
import pytest

from sagan_spark.ops.kernels import (
    builtin_kernels,
    ppm_decode,
    ppm_features,
    wav_decode,
    wav_features,
)


def _ppm(w: int, h: int, comment: bool = False) -> bytes:
    hdr = b"P6\n" + (b"# a comment\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    px = bytes(((x + y + c) % 256) for y in range(h) for x in range(w) for c in range(3))
    return hdr + px


def _pgm(w: int, h: int) -> bytes:
    hdr = f"P5\n{w} {h}\n255\n".encode()
    return hdr + bytes((x * y) % 256 for y in range(h) for x in range(w))


def _wav(seconds: float = 0.05, rate: int = 8000, freq: float = 440.0,
         nch: int = 1, width: int = 2) -> bytes:
    n = int(seconds * rate)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        amp = 2 ** (8 * width - 1) - 1
        frames = bytearray()
        for i in range(n):
            v = int(amp * 0.5 * math.sin(2 * math.pi * freq * i / rate))
            if width == 1:
                sample = (v + 128).to_bytes(1, "little")
            else:
                sample = v.to_bytes(width, "little", signed=True)
            frames += sample * nch
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_ppm_decode_dims_and_comments():
    assert ppm_decode(_ppm(7, 5)) == {"width": 7, "height": 5, "n_frames": 1}
    assert ppm_decode(_ppm(3, 2, comment=True))["width"] == 3
    assert ppm_decode(_pgm(9, 4)) == {"width": 9, "height": 4, "n_frames": 1}


def test_ppm_decode_rejects_garbage():
    with pytest.raises(ValueError):
        ppm_decode(b"JFIF not a pnm")
    with pytest.raises(ValueError):
        ppm_decode(b"P6\n3 ")  # truncated header
    with pytest.raises(ValueError):
        ppm_features(_ppm(4, 3)[:-5])  # truncated pixels


def test_ppm_features_exact():
    raw = _ppm(4, 3)
    got = ppm_features(raw, bins=4)
    px = np.frombuffer(raw.split(b"\n", 3)[3], dtype=np.uint8)
    arr = px.reshape(3, 4, 3) / 255.0
    want_means = arr.mean(axis=(0, 1))
    assert np.allclose(got[:3], want_means)
    assert len(got) == 3 + 4 and abs(sum(got[3:]) - 1.0) < 1e-9


def test_pgm_features_gray_duplicates_channels():
    got = ppm_features(_pgm(6, 2), bins=4)
    assert got[0] == got[1] == got[2]


def test_wav_decode_dims():
    raw = _wav(seconds=0.05, rate=8000, nch=2)
    assert wav_decode(raw) == {"width": 8000, "height": 2, "n_frames": 400}
    with pytest.raises(ValueError):
        wav_decode(b"RIFFgarbage")


def test_wav_features_sine():
    got = wav_features(_wav(seconds=0.1, rate=8000, freq=440.0), n_bands=8)
    assert len(got) == 10
    # a 0.5-amplitude sine has RMS 0.5/sqrt(2) and ZCR ~ 2f/rate
    assert abs(got[0] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(got[1] - 2 * 440.0 / 8000) < 0.02
    # energy concentrates in the band containing 440 Hz (bin 44 of
    # 401 rfft bins -> band 0 of 8)
    assert got[2] == max(got[2:])


def test_wav_features_8bit_and_stereo():
    mono = wav_features(_wav(nch=1, width=1), n_bands=4)
    stereo = wav_features(_wav(nch=2, width=2), n_bands=4)
    assert len(mono) == len(stereo) == 6
    assert abs(mono[0] - stereo[0]) < 0.02  # same signal, same RMS


def test_builtin_kernel_registry():
    assert builtin_kernels("image/x-portable-pixmap") == (ppm_decode, ppm_features)
    assert builtin_kernels("audio/wav") == (wav_decode, wav_features)
    assert builtin_kernels("video/mp4") is None


def test_builtin_kernels_through_spark_plumbing(spark):
    from sagan_spark.ops.multimodal import decode_metadata, extract_features

    rows = [
        (0, _ppm(4, 3), "image/x-portable-pixmap"),
        (1, _ppm(6, 2), "image/x-portable-pixmap"),
    ]
    media = spark.createDataFrame(rows, "id long, payload binary, media_type string")
    meta = {r.id: (r.width, r.height) for r in
            decode_metadata(media, kernel=ppm_decode).collect()}
    assert meta == {0: (4, 3), 1: (6, 2)}

    feats = {r.id: list(r.embedding) for r in
             extract_features(media, kernel=ppm_features).collect()}
    assert np.allclose(feats[0], ppm_features(_ppm(4, 3)))

    arows = [(7, _wav(), "audio/wav")]
    audio = spark.createDataFrame(arows, "id long, payload binary, media_type string")
    am = decode_metadata(audio, kernel=wav_decode).collect()[0]
    assert (am.width, am.height, am.n_frames) == (8000, 1, 400)
    af = extract_features(audio, kernel=wav_features).collect()[0]
    assert np.allclose(list(af.embedding), wav_features(_wav()))

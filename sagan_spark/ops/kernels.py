"""Built-in REAL multimodal kernels for uncompressed formats.

The pluggable-kernel contract of :mod:`sagan_spark.ops.multimodal`
(``kernel=`` on decode_metadata / extract_features) is usually fed by
libjpeg/ffmpeg/CLIP in production.  Those libraries are not in this
container — but two media families need NO external code, so their
kernels ship here as real, importable defaults:

- **PPM/PGM images** (P6/P5 binary netpbm): header parse + numpy pixel
  math.  Netpbm is the interchange format every image toolchain can
  emit (``djpeg``, ImageMagick, ffmpeg all speak it), so a 100 TB
  pipeline can transcode once upstream and run fully real image
  decode/features in Spark with zero native deps.
- **WAV/PCM audio** (RIFF): stdlib :mod:`wave` + numpy DSP (RMS,
  zero-crossing rate, FFT band energies).

Compressed formats (JPEG/PNG/MP3/H.264) still need their codecs —
that remains the disclosed stub/plug-in surface.

Kernel contracts (multimodal.DecodeKernel / FeatureKernel):
``decode(bytes) -> {"width", "height", "n_frames"}`` and
``features(bytes) -> list[float]``.  For audio the dict maps
width=sample_rate, height=n_channels, n_frames=PCM frames (documented
here; the schema is media-agnostic and the names are image-shaped).

Every kernel is deterministic, raises ValueError on malformed input
(the mapInPandas stage surfaces it with the payload id), and is
importable on executors (no closure shipping needed).
"""

from __future__ import annotations

import io
import wave


# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------

def _pnm_header(raw: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary netpbm header (magic, width, height, maxval) and
    return (magic, width, height, maxval, pixel_offset).  Handles the
    format's ``#`` comments and arbitrary whitespace."""
    if raw[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: {raw[:2]!r}")
    magic = raw[:2]
    fields: list[int] = []
    i = 2
    n = len(raw)
    while len(fields) < 3:
        while i < n and raw[i : i + 1].isspace():
            i += 1
        if i < n and raw[i : i + 1] == b"#":  # comment to end of line
            while i < n and raw[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        start = i
        while i < n and not raw[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated netpbm header")
        fields.append(int(raw[start:i]))
    i += 1  # single whitespace byte after maxval, then pixel data
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"bad netpbm dimensions {w}x{h} maxval={maxval}")
    return magic, w, h, maxval, i


def ppm_decode(raw: bytes) -> dict:
    """DecodeKernel for P6 (RGB) / P5 (gray) netpbm images."""
    _, w, h, _, _ = _pnm_header(raw)
    return {"width": w, "height": h, "n_frames": 1}


def ppm_features(raw: bytes, bins: int = 8) -> list:
    """FeatureKernel for netpbm images: per-channel means (gray
    duplicated to 3) + a ``bins``-bucket luminance histogram, all
    normalized to [0, 1] — the classic color-moment + histogram
    descriptor, fully real pixel math."""
    import numpy as np

    magic, w, h, maxval, off = _pnm_header(raw)
    ch = 3 if magic == b"P6" else 1
    depth = 2 if maxval > 255 else 1
    need = w * h * ch * depth
    px = raw[off : off + need]
    if len(px) < need:
        raise ValueError(f"truncated pixel data: {len(px)} < {need}")
    arr = np.frombuffer(px, dtype=">u2" if depth == 2 else np.uint8)
    arr = arr.reshape(h, w, ch).astype(np.float64) / float(maxval)
    if ch == 1:
        arr = np.repeat(arr, 3, axis=2)
    means = arr.mean(axis=(0, 1))
    # Rec.601 luminance
    lum = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    hist, _ = np.histogram(lum, bins=bins, range=(0.0, 1.0))
    hist = hist / lum.size
    return [float(x) for x in means] + [float(x) for x in hist]


# ---------------------------------------------------------------------------
# WAV / PCM audio
# ---------------------------------------------------------------------------

_PCM_DTYPES = {1: "u1", 2: "<i2", 4: "<i4"}


def wav_decode(raw: bytes) -> dict:
    """DecodeKernel for RIFF/WAV: width=sample_rate,
    height=n_channels, n_frames=PCM frames (see module docstring for
    the field mapping)."""
    try:
        with wave.open(io.BytesIO(raw)) as w:
            return {
                "width": w.getframerate(),
                "height": w.getnchannels(),
                "n_frames": w.getnframes(),
            }
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a WAV payload: {e}") from e


def wav_features(raw: bytes, n_bands: int = 8) -> list:
    """FeatureKernel for WAV/PCM: [RMS, zero-crossing rate,
    n_bands mean |rfft| band magnitudes], computed on the mono mix,
    amplitudes normalized to [-1, 1] — real DSP, no codecs."""
    import numpy as np

    try:
        with wave.open(io.BytesIO(raw)) as w:
            width = w.getsampwidth()
            nch = w.getnchannels()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a WAV payload: {e}") from e
    dt = _PCM_DTYPES.get(width)
    if dt is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    x = np.frombuffer(frames, dtype=dt).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned
        x = x - 128.0
    x /= float(2 ** (8 * width - 1))
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    if x.size == 0:
        return [0.0] * (2 + n_bands)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    bands = [float(b.mean()) if b.size else 0.0 for b in np.array_split(mag, n_bands)]
    return [rms, zcr] + bands


#: media_type -> (DecodeKernel, FeatureKernel) for the formats with
#: real built-in kernels; anything else needs a plug-in (or the stub)
BUILTIN_KERNELS = {
    "image/x-portable-pixmap": (ppm_decode, ppm_features),
    "image/x-portable-graymap": (ppm_decode, ppm_features),
    "audio/wav": (wav_decode, wav_features),
    "audio/x-wav": (wav_decode, wav_features),
}


def builtin_kernels(media_type: str):
    """(decode, feature) kernel pair for ``media_type``, or None when
    only a stub/plug-in can serve it."""
    return BUILTIN_KERNELS.get(media_type)

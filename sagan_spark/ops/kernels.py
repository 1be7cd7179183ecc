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
- **PNG images** (8-bit grey / grey+alpha / RGB / RGBA / palette
  incl. tRNS alpha, non-interlaced): stdlib :mod:`zlib` inflate +
  numpy per-scanline unfiltering (all five PNG filter types) — the
  most common web image format, real end-to-end with zero native
  deps.  16-bit, sub-byte-depth and Adam7-interlaced PNGs raise
  ValueError (rare on the web; transcode upstream or plug a codec
  in).

Other compressed formats (JPEG/MP3/H.264) still need their codecs —
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
# PNG (stdlib zlib + numpy unfilter; spec: RFC 2083 / W3C PNG)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> bytes per pixel in the FILTERED stream (palette
#: pixels are 1-byte indices; the palette lookup happens post-unfilter)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(raw: bytes):
    """Yield (type, data) for each chunk, validating lengths and CRCs
    (a corrupt-at-rest payload must fail loudly, not decode to
    garbage features)."""
    import struct
    import zlib

    if raw[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG payload: {raw[:8]!r}")
    i, n = 8, len(raw)
    while i < n:
        if i + 8 > n:
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", raw[i : i + 4])
        ctype = raw[i + 4 : i + 8]
        if i + 12 + length > n:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = raw[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", raw[i + 8 + length : i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        i += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _parse_ihdr(data: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, stream_channels, bit_depth, color_type) from an
    IHDR payload, rejecting the unsupported shapes (16-bit / sub-byte
    depths / interlaced).  Palette (color type 3) is supported at depth
    8: the filtered stream carries 1-byte indices, resolved
    post-unfilter."""
    import struct

    if len(data) != 13:
        raise ValueError("bad IHDR length")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data
    )
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG unsupported")
    return w, h, _PNG_CHANNELS[color], depth, color


def _png_ihdr(raw: bytes) -> tuple[int, int, int, int, int]:
    """Header-only parse: validates and returns IHDR from the FIRST
    chunk, without walking (or CRC-ing) the rest of the file — the
    cheap path png_decode wants."""
    for ctype, data in _png_chunks(raw):
        if ctype != b"IHDR":
            raise ValueError("PNG first chunk is not IHDR")
        return _parse_ihdr(data)
    raise ValueError("empty PNG")


def _png_scan(raw: bytes):
    """ONE validated walk over all chunks: (ihdr, idat, plte, trns).
    png_pixels previously re-ran the chunk walk (with its per-chunk
    CRC) up to three times — IHDR, IDAT collection, palette — which
    triples the parse cost in the mapInPandas feature hot loop for
    identical results."""
    ihdr = None
    idat: list[bytes] = []
    plte = trns = None
    for ctype, data in _png_chunks(raw):
        if ihdr is None:
            if ctype != b"IHDR":
                raise ValueError("PNG first chunk is not IHDR")
            ihdr = _parse_ihdr(data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
    if ihdr is None:
        raise ValueError("empty PNG")
    return ihdr, b"".join(idat), plte, trns


def png_decode(raw: bytes) -> dict:
    """DecodeKernel for PNG: header-only parse (IHDR), no inflate."""
    w, h, _ch, _d, _color = _png_ihdr(raw)
    return {"width": w, "height": h, "n_frames": 1}


def _resolve_palette(plte, trns):
    """(palette, alpha): the PLTE payload as an (n, 3) uint8 array plus
    the optional tRNS alpha bytes (padded to 255 = opaque).  Raises
    when a palette image has no PLTE or the chunk is malformed."""
    import numpy as np

    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if len(plte) == 0 or len(plte) % 3 != 0 or len(plte) > 256 * 3:
        raise ValueError(f"bad PLTE length {len(plte)}")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if trns is None:
        return pal, None
    if len(trns) > pal.shape[0]:
        raise ValueError("tRNS longer than palette")
    alpha = np.full(pal.shape[0], 255, dtype=np.uint8)
    alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
    return pal, alpha


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_pixels(raw: bytes):
    """Full PNG decode to an (h, w, channels) uint8 numpy array:
    concatenated-IDAT zlib inflate, then per-scanline unfiltering.
    Filters None/Up vectorize whole-row; Sub is a per-byte-lane
    cumulative sum mod 256; Average/Paeth carry a true left-pixel
    dependency, so those (rare) rows walk bytes."""
    import zlib

    import numpy as np

    (w, h, ch, _depth, color), idat, plte, trns = _png_scan(raw)
    if not idat:
        raise ValueError("PNG has no IDAT data")
    try:
        flat = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * ch
    if len(flat) != h * (stride + 1):
        raise ValueError(
            f"PNG pixel data size {len(flat)} != expected {h * (stride + 1)}"
        )
    scan = np.frombuffer(flat, dtype=np.uint8).reshape(h, stride + 1)
    filters = scan[:, 0]
    rows = scan[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        if f == 0:  # None
            rec = row.copy()
        elif f == 2:  # Up
            rec = row + prev  # uint8 wraps mod 256
        elif f == 1:  # Sub: per-lane cumsum mod 256
            rec = row.reshape(-1, ch).astype(np.int64).cumsum(axis=0)
            rec = (rec % 256).astype(np.uint8).reshape(-1)
        else:
            if f not in (3, 4):
                raise ValueError(f"bad PNG filter byte {f} in row {y}")
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if f == 3:  # Average
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = int(prev[i - ch]) if i >= ch else 0
                    pred = _paeth(a, b, c)
                rec[i] = (int(row[i]) + pred) & 0xFF
        out[y] = rec
        prev = rec
    if color == 3:  # palette: resolve indices to RGB(A) post-unfilter
        pal, alpha = _resolve_palette(plte, trns)
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError(
                f"palette index {int(idx.max())} >= palette size {pal.shape[0]}"
            )
        rgb = pal[idx]  # (h, w, 3)
        if alpha is None:
            return rgb
        return np.concatenate([rgb, alpha[idx][..., None]], axis=2)
    return out.reshape(h, w, ch)


def png_features(raw: bytes, bins: int = 8) -> list:
    """FeatureKernel for PNG: the same color-moment + luminance-
    histogram descriptor as :func:`ppm_features` (per-channel RGB
    means with gray duplicated, alpha dropped, ``bins``-bucket
    luminance histogram, all in [0, 1]) — identical pixels give
    identical features regardless of container format."""
    import numpy as np

    arr = png_pixels(raw).astype(np.float64) / 255.0
    ch = arr.shape[2]
    if ch == 2:  # grey + alpha: drop alpha
        arr = arr[..., :1]
    elif ch == 4:  # RGBA: drop alpha
        arr = arr[..., :3]
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    means = arr.mean(axis=(0, 1))
    lum = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    hist, _ = np.histogram(lum, bins=bins, range=(0.0, 1.0))
    hist = hist / lum.size
    return [float(x) for x in means] + [float(x) for x in hist]


# ---------------------------------------------------------------------------
# JPEG metadata (SOF marker walk — ITU-T T.81 / ISO 10918-1 §B)
# ---------------------------------------------------------------------------

#: SOF_n marker codes carrying the frame header (0xC0–0xCF minus
#: DHT 0xC4, JPG 0xC8, DAC 0xCC): baseline, extended, progressive,
#: lossless, and their arithmetic/differential variants all share the
#: same precision/height/width/components layout (T.81 §B.2.2)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
#: parameterless markers: TEM, RST0–7, SOI, EOI (no length field)
_JPEG_STANDALONE = frozenset({0x01, 0xD8, 0xD9} | set(range(0xD0, 0xD8)))


def jpeg_decode(raw: bytes) -> dict:
    """DecodeKernel for JPEG — the web's dominant image format: a
    pure-stdlib marker walk to the first SOF segment yields
    width/height (T.81 §B.2.2 frame header: the two 16-bit fields
    after the precision byte).  Handles every SOF family member
    (baseline SOF0 through the arithmetic/differential variants),
    0xFF fill bytes between markers, and fails closed (ValueError)
    on sync loss, truncation, a DNL-deferred zero height, or an SOS
    reached before any SOF.  Pixel decode still needs a real codec —
    that remains the disclosed plug-in surface of ops/multimodal."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG payload: {raw[:2]!r}")
    i, n = 2, len(raw)
    while i < n:
        if raw[i] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at byte {i}")
        while i < n and raw[i] == 0xFF:  # fill bytes
            i += 1
        if i >= n:
            break
        code = raw[i]
        i += 1
        if code in _JPEG_STANDALONE:
            continue
        if i + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = int.from_bytes(raw[i : i + 2], "big")
        if seglen < 2 or i + seglen > n:
            raise ValueError(f"bad JPEG segment length {seglen} at byte {i}")
        if code in _JPEG_SOF:
            if seglen < 8:
                raise ValueError(f"short SOF segment ({seglen} bytes)")
            height = int.from_bytes(raw[i + 3 : i + 5], "big")
            width = int.from_bytes(raw[i + 5 : i + 7], "big")
            if width == 0 or height == 0:
                # height 0 = dimensions deferred to a DNL marker after
                # the first scan — fail closed rather than report 0
                raise ValueError("JPEG dimensions deferred (DNL) or zero")
            return {"width": width, "height": height, "n_frames": 1}
        if code == 0xDA:  # entropy-coded scan began without a SOF
            raise ValueError("JPEG SOS reached before any SOF marker")
        i += seglen
    raise ValueError("no SOF marker found in JPEG stream")


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
#: real built-in kernels; a None slot means that HALF still needs a
#: plug-in (JPEG: metadata is real, pixel features need a codec);
#: anything else needs a plug-in (or the stub) for both
BUILTIN_KERNELS = {
    "image/x-portable-pixmap": (ppm_decode, ppm_features),
    "image/x-portable-graymap": (ppm_decode, ppm_features),
    "image/png": (png_decode, png_features),
    "image/jpeg": (jpeg_decode, None),
    "image/jpg": (jpeg_decode, None),
    "audio/wav": (wav_decode, wav_features),
    "audio/x-wav": (wav_decode, wav_features),
}


def builtin_kernels(media_type: str):
    """(decode, feature) kernel pair for ``media_type`` — either slot
    may be None (that half is plug-in-only) — or None when no
    built-in serves the type at all."""
    return BUILTIN_KERNELS.get(media_type)

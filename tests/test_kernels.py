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


# ---------------------------------------------------------------------------
# PNG: tiny in-test encoder (forward-filters rows) -> exact-value twins
# ---------------------------------------------------------------------------

def _png_encode(arr: np.ndarray, filters=None) -> bytes:
    """Minimal PNG writer for 8-bit (h, w, ch) arrays with a chosen
    filter type per row — the encoder applies the spec's FORWARD
    filter so the kernel's unfilter is tested against independent
    math."""
    import struct
    import zlib

    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y, f in zip(range(h), filters):
        row = arr[y].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(ch, dtype=np.int64), row[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = row - pred
        raw += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _rand_img(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_png_decode_header_only():
    from sagan_spark.ops.kernels import png_decode

    assert png_decode(_png_encode(_rand_img(5, 7, 3))) == {
        "width": 7, "height": 5, "n_frames": 1,
    }


def test_png_pixels_roundtrip_all_filters():
    from sagan_spark.ops.kernels import png_pixels

    for ch in (1, 2, 3, 4):
        img = _rand_img(5, 6, ch, seed=ch)
        # one row per filter type, 0..4
        raw = _png_encode(img, filters=[0, 1, 2, 3, 4])
        got = png_pixels(raw)
        assert got.shape == (5, 6, ch)
        assert np.array_equal(got, img), f"ch={ch}"


def test_png_pixels_roundtrip_gradients():
    # smooth gradients are what Average/Paeth filters exist for; also
    # exercises a taller image where prev-row state must thread through
    from sagan_spark.ops.kernels import png_pixels

    y, x = np.mgrid[0:16, 0:9]
    img = np.stack([(y * 16) % 256, (x * 29) % 256, (y + x) % 256],
                   axis=2).astype(np.uint8)
    raw = _png_encode(img, filters=[4, 3] * 8)
    assert np.array_equal(png_pixels(raw), img)


def test_png_features_match_ppm_on_same_pixels():
    # identical pixels => identical descriptor regardless of container
    from sagan_spark.ops.kernels import png_features

    img = _rand_img(3, 4, 3, seed=9)
    hdr = f"P6\n4 3\n255\n".encode()
    assert np.allclose(
        png_features(_png_encode(img), bins=4),
        ppm_features(hdr + img.tobytes(), bins=4),
    )


def test_png_features_alpha_dropped():
    from sagan_spark.ops.kernels import png_features

    rgb = _rand_img(4, 4, 3, seed=2)
    rgba = np.concatenate([rgb, np.full((4, 4, 1), 77, np.uint8)], axis=2)
    assert np.allclose(png_features(_png_encode(rgba)),
                       png_features(_png_encode(rgb)))
    grey = _rand_img(4, 4, 1, seed=3)
    ga = np.concatenate([grey, np.full((4, 4, 1), 9, np.uint8)], axis=2)
    got = png_features(_png_encode(ga))
    assert got[0] == got[1] == got[2]  # grey duplicated to RGB


def test_png_rejects_unsupported_and_corrupt():
    import struct
    import zlib

    from sagan_spark.ops.kernels import png_decode, png_pixels

    ok = _png_encode(_rand_img(3, 3, 3))
    with pytest.raises(ValueError):
        png_decode(b"JFIF nope")
    # flip one IDAT byte -> CRC must catch it
    bad = bytearray(ok)
    idat_at = bytes(ok).index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError):
        png_pixels(bytes(bad))
    # 16-bit depth / palette / interlace rejected at the header
    def ihdr_png(depth=8, color=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        c = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        return b"\x89PNG\r\n\x1a\n" + c
    for kw in ({"depth": 16}, {"color": 5}, {"interlace": 1}):
        with pytest.raises(ValueError):
            png_decode(ihdr_png(**kw))


def test_png_through_spark_plumbing(spark):
    from sagan_spark.ops.kernels import png_decode, png_features
    from sagan_spark.ops.multimodal import decode_metadata, extract_features

    img = _rand_img(4, 6, 3, seed=5)
    rows = [(0, _png_encode(img), "image/png")]
    media = spark.createDataFrame(rows, "id long, payload binary, media_type string")
    m = decode_metadata(media, kernel=png_decode).collect()[0]
    assert (m.width, m.height, m.n_frames) == (6, 4, 1)
    f = extract_features(media, kernel=png_features).collect()[0]
    assert np.allclose(list(f.embedding), png_features(_png_encode(img)))
    assert builtin_kernels("image/png") == (png_decode, png_features)


def test_registry_dispatch_mixed_media(spark):
    """kernel='registry': one DataFrame mixing PNG, PPM and WAV rows
    decodes each through its own built-in kernel; an unregistered
    media_type fails loudly inside the task."""
    from sagan_spark.ops.kernels import png_features, wav_decode
    from sagan_spark.ops.multimodal import decode_metadata, extract_features

    img = _rand_img(4, 6, 3, seed=11)
    rows = [
        (0, _png_encode(img), "image/png"),
        (1, _ppm(5, 2), "image/x-portable-pixmap"),
        (2, _wav(), "audio/wav"),
    ]
    media = spark.createDataFrame(rows, "id long, payload binary, media_type string")
    meta = {r.id: (r.width, r.height, r.n_frames) for r in
            decode_metadata(media, kernel="registry").collect()}
    assert meta[0] == (6, 4, 1)
    assert meta[1] == (5, 2, 1)
    assert meta[2] == (8000, 1, 400) == tuple(wav_decode(_wav()).values())

    png_only = media.filter("media_type = 'image/png'")
    f = extract_features(png_only, kernel="registry").collect()[0]
    assert np.allclose(list(f.embedding), png_features(_png_encode(img)))

    bad = spark.createDataFrame(
        [(9, b"\x00\x00\x00\x18ftypmp42", "video/mp4")],
        "id long, payload binary, media_type string",
    )
    with pytest.raises(Exception, match="video/mp4"):
        decode_metadata(bad, kernel="registry").collect()
    # jpeg IS registered now (SOF metadata kernel) — garbage jpeg
    # bytes fail inside the kernel, not at the registry
    garbage = spark.createDataFrame(
        [(9, b"\xff\xd8jpeg", "image/jpeg")],
        "id long, payload binary, media_type string",
    )
    with pytest.raises(Exception, match="sync lost"):
        decode_metadata(garbage, kernel="registry").collect()


def _palettize(png_grey: bytes, pal: np.ndarray, trns: bytes | None = None) -> bytes:
    """Rewrite an 8-bit greyscale PNG (from _png_encode) into a palette
    PNG with the SAME filtered index stream: flip the IHDR color byte
    to 3 and splice PLTE (+ optional tRNS) in front of IDAT — so the
    palette path exercises the identical all-five-filters stream."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    sig, ihdr_chunk, rest = png_grey[:8], png_grey[8:33], png_grey[33:]
    assert ihdr_chunk[4:8] == b"IHDR"
    ihdr = bytearray(ihdr_chunk[8:21])
    ihdr[9] = 3  # color type byte (after w:4 h:4 depth:1)
    out = sig + chunk(b"IHDR", bytes(ihdr)) + chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + rest


def test_png_palette_roundtrip_all_filters():
    from sagan_spark.ops.kernels import png_decode, png_pixels

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, size=(5, 6, 1), dtype=np.uint8)
    raw = _palettize(_png_encode(idx, filters=[0, 1, 2, 3, 4]), pal)
    assert png_decode(raw) == {"width": 6, "height": 5, "n_frames": 1}
    got = png_pixels(raw)
    assert got.shape == (5, 6, 3)
    assert np.array_equal(got, pal[idx.reshape(5, 6)])


def test_png_palette_trns_alpha_padded():
    from sagan_spark.ops.kernels import png_pixels

    pal = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8).reshape(2, 2, 1)
    # tRNS covers only entry 0 -> entries 1,2 opaque (255)
    raw = _palettize(_png_encode(idx), pal, trns=bytes([128]))
    got = png_pixels(raw)
    assert got.shape == (2, 2, 4)
    assert np.array_equal(got[..., :3], pal[idx.reshape(2, 2)])
    assert got[0, 0, 3] == 128 and got[0, 1, 3] == 255 and got[1, 0, 3] == 255


def test_png_palette_malformed_rejected():
    from sagan_spark.ops.kernels import png_pixels

    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx_ok = np.zeros((2, 2, 1), np.uint8)
    grey = _png_encode(idx_ok)
    # index out of palette range
    oob = np.array([[0, 1], [1, 199]], np.uint8).reshape(2, 2, 1)
    with pytest.raises(ValueError, match="palette index"):
        png_pixels(_palettize(_png_encode(oob), pal))
    # missing PLTE: flip color byte without splicing the chunk
    import struct
    import zlib

    ihdr = bytearray(grey[16:29])
    ihdr[9] = 3
    no_plte = (grey[:8]
               + struct.pack(">I", 13) + b"IHDR" + bytes(ihdr)
               + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
               + grey[33:])
    with pytest.raises(ValueError, match="PLTE"):
        png_pixels(no_plte)
    # tRNS longer than the palette
    with pytest.raises(ValueError, match="tRNS"):
        png_pixels(_palettize(_png_encode(idx_ok), pal, trns=bytes([1, 2, 3])))


# ---------------------------------------------------------------------------
# JPEG SOF metadata kernel
# ---------------------------------------------------------------------------

def _jpeg_bytes(width, height, sof=0xC0, ncomp=3, fill=0, app0=True,
                pre_sof_extras=True):
    """Minimal-but-valid JPEG byte stream: SOI, optional APP0/JFIF and
    a DQT-ish opaque segment, the requested SOF marker, EOI."""
    out = bytearray(b"\xff\xd8")
    if app0:
        out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if pre_sof_extras:
        out += b"\xff\xdb" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
    out += b"\xff" * fill  # fill bytes are legal between markers
    comps = b"".join(bytes([i + 1, 0x11, 0x00]) for i in range(ncomp))
    payload = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") \
        + bytes([ncomp]) + comps
    out += bytes([0xFF, sof]) + (len(payload) + 2).to_bytes(2, "big") + payload
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_baseline_and_progressive():
    from sagan_spark.ops.kernels import jpeg_decode

    assert jpeg_decode(_jpeg_bytes(640, 480)) == {
        "width": 640, "height": 480, "n_frames": 1}
    # progressive (SOF2), 1-component grayscale, no APP0, fill bytes
    assert jpeg_decode(
        _jpeg_bytes(31, 7, sof=0xC2, ncomp=1, app0=False, fill=3)
    ) == {"width": 31, "height": 7, "n_frames": 1}
    # 16-bit dimensions survive (big images)
    assert jpeg_decode(_jpeg_bytes(65500, 40000)) == {
        "width": 65500, "height": 40000, "n_frames": 1}


def test_jpeg_decode_rejects_malformed():
    import pytest as _pytest

    from sagan_spark.ops.kernels import jpeg_decode

    with _pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG1234")
    with _pytest.raises(ValueError, match="no SOF|truncated"):
        jpeg_decode(b"\xff\xd8\xff\xd9")  # SOI + EOI, no frame
    ok = _jpeg_bytes(10, 10)
    with _pytest.raises(ValueError, match="sync lost"):
        jpeg_decode(b"\xff\xd8junk" + ok[2:])
    with _pytest.raises(ValueError, match="bad JPEG segment length"):
        jpeg_decode(ok[: len(ok) - 6])  # SOF length runs past the end
    # SOS before any SOF
    sos = b"\xff\xd8\xff\xda\x00\x04\x01\x00"
    with _pytest.raises(ValueError, match="SOS reached before"):
        jpeg_decode(sos)
    # DNL-deferred height fails closed
    with _pytest.raises(ValueError, match="DNL"):
        jpeg_decode(_jpeg_bytes(10, 0))


def test_jpeg_registry_decode_and_feature_gap(spark):
    from pyspark.sql import functions as F

    from sagan_spark.ops.kernels import builtin_kernels
    from sagan_spark.ops.multimodal import decode_metadata, extract_features

    pair = builtin_kernels("image/jpeg")
    assert pair is not None and pair[1] is None
    rows = [(1, _jpeg_bytes(320, 200), "image/jpeg"),
            (2, _jpeg_bytes(64, 64, sof=0xC2), "image/jpg")]
    media = spark.createDataFrame(
        rows, "id long, payload binary, media_type string")
    got = {r["id"]: (r["width"], r["height"], r["n_frames"])
           for r in decode_metadata(media, kernel="registry").collect()}
    assert got == {1: (320, 200, 1), 2: (64, 64, 1)}
    # the feature half stays plug-in-only and fails CLOSED with the
    # media type named (either row's task may surface first)
    import pytest as _pytest

    with _pytest.raises(Exception, match="image/jpe?g"):
        extract_features(media, kernel="registry").collect()

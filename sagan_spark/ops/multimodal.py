"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are Arrow-batched
`mapInPandas` stages.  The decode/feature KERNELS are pluggable
callables (``kernel=`` on :func:`decode_metadata` /
:func:`extract_features`): pass a real libjpeg/ffmpeg/CLIP kernel in
production; the default is a deterministic fake (``decode_stub=True``)
so tests pin exact values, and ``decode_stub=False`` without a kernel
raises NotImplementedError at CONSTRUCTION (the media libs are not in
this container).  The Spark-side plumbing — schema, batch shape,
partition-preserving iterator — is identical for every kernel.

REAL built-in kernels for the formats that need no external code ship
in :mod:`sagan_spark.ops.kernels`: netpbm images (PPM/PGM header parse
+ numpy color-moment/histogram features), PNG (stdlib zlib inflate +
numpy unfilter) and WAV/PCM audio (stdlib wave + numpy
RMS/ZCR/FFT-band features), with a media_type registry
(``kernels.builtin_kernels``; ``kernel="registry"`` dispatches per
row).  Only the remaining compressed formats (JPEG/MP3/H.264) are
plug-in-or-stub.  The non-stub branch is
exercised end-to-end in tests/test_kernels.py and
tests/test_multimodal.py.

Scale notes: mapInPandas streams Arrow record batches; binary payloads
never materialize on the driver, and per-batch memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decode kernel contract: bytes -> {"width": int, "height": int,
#: "n_frames": int}  (any missing key defaults to 0)
DecodeKernel = Callable[[bytes], dict]
#: feature kernel contract: bytes -> sequence of float (the embedding)
FeatureKernel = Callable[[bytes], "list[float]"]


def _fake_decode(b: bytes) -> dict:
    """Deterministic fake dimensions from a content digest."""
    digest = int.from_bytes(hashlib.sha256(b).digest()[:4], "big")
    return {
        "width": digest % 1920 + 1,
        "height": digest % 1080 + 1,
        "n_frames": digest % 300 + 1,
    }

MEDIA_META_SCHEMA = (
    "id long, media_type string, n_bytes long, content_sha string, "
    "width int, height int, n_frames int"
)


def attach_binary(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: wrap a text column as an opaque binary payload
    with a media_type tag (stands in for image/audio bytes)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/x-fake-media").alias("media_type"),
    )


def decode_metadata(
    media: DataFrame,
    decode_stub: bool = True,
    kernel: DecodeKernel | None = None,
) -> DataFrame:
    """Decode stage: binary payload -> typed metadata struct.

    ``kernel`` is the pluggable decoder (bytes -> dims dict, see
    DecodeKernel) — pass a libjpeg/ffmpeg-backed callable in
    production.  ``kernel="registry"`` dispatches PER ROW on
    ``media_type`` through the real built-in kernels
    (:func:`sagan_spark.ops.kernels.builtin_kernels`: netpbm, PNG,
    WAV); a media_type outside the registry raises ValueError inside
    the task, naming the type — fail-closed, never silently-stubbed.
    Without one, ``decode_stub=True`` (default) uses the
    deterministic fake so tests pin exact values, and
    ``decode_stub=False`` raises NotImplementedError HERE, at
    construction, not mid-job inside a task."""
    registry = kernel == "registry"
    if kernel is None:
        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires image/audio libs not present "
                "in this container; pass kernel=<bytes -> dims dict>"
            )
        kernel = _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if registry:
            from sagan_spark.ops.kernels import builtin_kernels

            def kernel_for(mt: str) -> DecodeKernel:
                pair = builtin_kernels(mt)
                if pair is None or pair[0] is None:
                    raise ValueError(
                        f"no built-in decode kernel for media_type {mt!r};"
                        " pass kernel=<callable> for compressed formats"
                    )
                return pair[0]
        for pdf in it:
            n_bytes, shas, ws, hs, fs = [], [], [], [], []
            for b, mt in zip(pdf["payload"], pdf["media_type"]):
                if b is None:
                    n_bytes.append(0)
                    shas.append("")
                    ws.append(0)
                    hs.append(0)
                    fs.append(0)
                    continue
                raw = bytes(b)
                n_bytes.append(len(raw))
                shas.append(hashlib.sha256(raw).hexdigest())
                dims = (kernel_for(mt) if registry else kernel)(raw)
                ws.append(int(dims.get("width", 0)))
                hs.append(int(dims.get("height", 0)))
                fs.append(int(dims.get("n_frames", 0)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "content_sha": shas,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_frames": pd.array(fs, dtype="int32"),
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(meta: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling stage: expand each media row into the frame indexes
    a sampler would decode (plumbing only — the frame grab is the
    stubbed kernel).  Narrow explode, no shuffle."""
    return meta.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_plan(meta: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize stage, metadata half: aspect-preserving target dimensions
    (the arithmetic every image pipeline runs before the kernel).  Pure
    Catalyst — the pixel kernel itself is the stubbed part (plug a
    Pillow/libvips pandas UDF over the payload where noted in
    decode_metadata)."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return meta.select(
        "id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_h"),
    )


def extract_features(
    media: DataFrame,
    dim: int = 64,
    decode_stub: bool = True,
    kernel: FeatureKernel | None = None,
) -> DataFrame:
    """Feature-extraction stage: binary payload -> embedding vector.

    ``kernel`` is the pluggable extractor (bytes -> float sequence, see
    FeatureKernel) — pass a CLIP/audio-fingerprint callable in
    production; its output length wins over ``dim``.
    ``kernel="registry"`` dispatches per row on ``media_type`` through
    the built-in kernels (netpbm/PNG/WAV; ValueError on anything
    else — same fail-closed contract as :func:`decode_metadata`; note
    image and audio kernels emit different-length descriptors, so mix
    media families only if the downstream op tolerates ragged
    dimensions).  Without one,
    ``decode_stub=True`` (default) derives a deterministic unit-norm
    vector from the payload digest so downstream composition is REAL
    and testable: the output feeds the similarity/dedup ops unchanged
    (array<double> `embedding` + id) — multimodal -> embeddings ->
    ANN/near-dup is the actual 100 TB pipeline shape.
    ``decode_stub=False`` without a kernel raises NotImplementedError
    at construction.  Arrow-batched mapInPandas; payloads never touch
    the driver."""
    import numpy as np

    registry = kernel == "registry"
    if kernel is None:
        if not decode_stub:
            raise NotImplementedError(
                "real feature extraction requires model/media libs not "
                "present in this container; pass kernel=<bytes -> floats>"
            )

        def kernel(raw: bytes) -> list[float]:
            seed = int.from_bytes(hashlib.sha256(raw).digest()[:4], "big")
            v = np.random.RandomState(seed).randn(dim)
            v /= max(float(np.linalg.norm(v)), 1e-12)
            return [float(x) for x in v]

    out_schema = "id long, embedding array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NULL payloads take a zero vector of the KERNEL'S dimensionality
        # (a custom kernel's output length wins over `dim`); a ragged
        # embedding column would silently truncate in the zip-based
        # cosine ops downstream.  (A partition containing ONLY nulls
        # cannot observe the kernel and falls back to `dim` — pass dim
        # matching your kernel when null payloads are possible.)
        if registry:
            from sagan_spark.ops.kernels import builtin_kernels

            def kernel_for(mt: str) -> FeatureKernel:
                pair = builtin_kernels(mt)
                if pair is None or pair[1] is None:
                    raise ValueError(
                        f"no built-in feature kernel for media_type {mt!r};"
                        " pass kernel=<callable> for compressed formats"
                        " (JPEG metadata decodes built-in, but its pixel"
                        " features need a codec)"
                    )
                return pair[1]
        out_dim: int | None = None
        pending_null: list[int] = []
        for pdf in it:
            embs: list = []
            for b, mt in zip(pdf["payload"], pdf["media_type"]):
                if b is None:
                    pending_null.append(len(embs))
                    embs.append(None)
                    continue
                v = [float(x) for x in (kernel_for(mt) if registry else kernel)(bytes(b))]
                if out_dim is None:
                    out_dim = len(v)
                embs.append(v)
            zero = [0.0] * (out_dim if out_dim is not None else dim)
            for k in pending_null:
                embs[k] = zero
            pending_null.clear()
            yield pd.DataFrame({"id": pdf["id"], "embedding": embs})

    return media.mapInPandas(batches, schema=out_schema)

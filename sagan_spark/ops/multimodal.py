"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are Arrow-batched
`mapInPandas` stages.  The decode kernels themselves are STUBBED
(`decode_stub=True` uses a deterministic fake; `False` raises
NotImplementedError — the image/audio libs are not in this container),
but the Spark-side plumbing — schema, batch shape, partition-preserving
iterator — is real and tested.

Scale notes: mapInPandas streams Arrow record batches; binary payloads
never materialize on the driver, and per-batch memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def decode_metadata(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode stage: binary payload -> typed metadata struct.

    With decode_stub=True the "decoder" derives deterministic fake
    dimensions from a content digest (so tests pin exact values);
    decode_stub=False marks where a real libjpeg/ffmpeg kernel plugs in.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this container; plug the kernel in here"
                )
            rows = {
                "id": pdf["id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "content_sha": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else ""
                ),
            }
            digest = pdf["payload"].map(
                lambda b: int.from_bytes(
                    hashlib.sha256(bytes(b)).digest()[:4], "big"
                ) if b is not None else 0
            )
            rows["width"] = (digest % 1920).astype("int32") + 1
            rows["height"] = (digest % 1080).astype("int32") + 1
            rows["n_frames"] = (digest % 300).astype("int32") + 1
            yield pd.DataFrame(rows)

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


def extract_features(media: DataFrame, dim: int = 64,
                     decode_stub: bool = True) -> DataFrame:
    """Feature-extraction stage: binary payload -> embedding vector.

    The real kernel (CLIP/audio fingerprint/...) is stubbed; the stub
    derives a deterministic unit-norm vector from the payload digest so
    downstream composition is REAL and testable: the output feeds the
    similarity/dedup ops unchanged (array<double> `embedding` + id) —
    multimodal -> embeddings -> ANN/near-dup is the actual 100 TB
    pipeline shape.  Arrow-batched mapInPandas; payloads never touch
    the driver."""
    import numpy as np

    out_schema = "id long, embedding array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real feature extraction requires model/media libs not "
                    "present in this container; plug the kernel in here"
                )
            embs = []
            for b in pdf["payload"]:
                if b is None:
                    embs.append([0.0] * dim)
                    continue
                seed = int.from_bytes(hashlib.sha256(bytes(b)).digest()[:4], "big")
                v = np.random.RandomState(seed).randn(dim)
                v /= max(float(np.linalg.norm(v)), 1e-12)
                embs.append([float(x) for x in v])
            yield pd.DataFrame({"id": pdf["id"], "embedding": embs})

    return media.mapInPandas(batches, schema=out_schema)

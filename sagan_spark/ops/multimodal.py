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

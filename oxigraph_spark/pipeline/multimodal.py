"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata (SURVEY.md §2.11).

The decode step is STUBBED (no image/audio libs in this container —
clearly marked below); everything Spark-side is real and tested: the
schema, the Arrow-batched ``mapInPandas`` plumbing, partition-size-aware
batching, and the metadata extraction contract.  Swapping the stub for
PIL/torchaudio changes one function body, nothing else.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("content", BinaryType()),    # opaque payload
    StructField("mime", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
    StructField("width", IntegerType()),     # decoded metadata (stub: derived)
    StructField("height", IntegerType()),
])


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Demo media table: treats encoded text bytes as the opaque payload
    (real pipelines read binary files via ``spark.read.format('binaryFile')``
    — same downstream shape)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"))


def _decode_stub(payload: bytes) -> tuple:
    """STUB — image decode is not available in this container.

    A real implementation does ``PIL.Image.open(io.BytesIO(payload))`` and
    returns true (width, height).  The stub derives deterministic fake
    dimensions from the payload length so the full pipeline remains
    testable end-to-end.
    """
    n = len(payload)
    return (n % 1920 + 1, (n * 7) % 1080 + 1)


def extract_features(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas``.

    This is the one place Python touches the data — batched columnar
    transfer, never row-at-a-time.  At 100 TB: payload column stays
    off-heap until the batch crosses to Python; keep
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` aligned with payload
    sizes so batches fit executor memory.
    """
    import hashlib

    def process(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            # columnar batch work (optimization guide §4.2): pull each
            # column ONCE as a plain list and loop over those —
            # ``iterrows()`` materializes a boxed Series per row and was
            # the dominant per-batch cost (~10× slower than the decode
            # stub itself); only the per-payload decode/hash calls
            # remain per-row, which is inherent to the operator.
            contents = [bytes(c) if c is not None else b""
                        for c in pdf["content"]]
            dims = [_decode_stub(c) for c in contents]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64").to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "n_bytes": [len(c) for c in contents],
                "checksum": [hashlib.sha256(c).hexdigest()
                             for c in contents],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
            })

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB — image resize is not available in this container.

    A real implementation decodes (PIL), resizes, re-encodes.  The stub
    produces a deterministic payload of the size a width×height raw
    buffer would have (truncate/cycle the input bytes), so downstream
    size-sensitive plumbing is exercised for real."""
    target = width * height
    if not payload:
        return bytes(target)
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize(media: DataFrame, width: int, height: int,
           batch_rows: int = 1024) -> DataFrame:
    """Payload-transforming resize in the same Arrow-batched
    ``mapInPandas`` shape a real decoder uses: binary in → binary out,
    MEDIA_SCHEMA preserved, mime re-tagged.  Only the per-image
    ``_resize_stub`` body changes when image libs are available."""
    mime = f"image/resized;{width}x{height}"

    def process(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            # columnar batch work (guide §4.2) — see extract_features
            contents = [bytes(c) if c is not None else b""
                        for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64").to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "content": [_resize_stub(c, width, height)
                            for c in contents],
                "mime": mime,
            })

    return media.mapInPandas(process, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB video frame sampling: emits (media_id, frame_no) rows the way a
    real decoder would; frame count derived deterministically from size."""
    n_frames = (F.length(F.col("content")) % 300 + 1).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)))
        .alias("frame_no"))

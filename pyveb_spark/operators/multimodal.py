"""Multimodal column conventions: binary payloads + typed metadata.

North-star surface (BASELINE.json): image/audio/video as opaque ``binary``
columns with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED here (the
container ships no image/audio libs — they raise ``NotImplementedError``
unless ``fake=True`` provides a deterministic synthetic decode), but the
Spark-side plumbing is real and tested: schema convention, batch iteration
shape, partition sizing, and the pattern for swapping in a real kernel
(PIL/torchaudio/ffmpeg) unchanged.

Scale notes: binary payloads dominate row size — ``repartition`` by byte
budget (``target_partition_bytes``), never by row count, so Arrow batches
fit executor memory; metadata-only operations (filter by width, group by
format) must project AWAY the binary column first so the Parquet scan never
reads the blob pages (column pruning is the whole game at 100 TB of media).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_images",
    "extract_features",
    "sample_frames",
]

# Column convention: one binary payload + one typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_bytes", IntegerType()),
                ]
            ),
        ),
    ]
)


def media_table(df: DataFrame, id_col: str, payload_col: str, fmt_col: str | None = None) -> DataFrame:
    """Normalize any (id, binary) frame into the engine's media convention,
    deriving cheap metadata (byte length, format tag) natively — no Python
    touches the blob for metadata queries."""
    meta = F.struct(
        (F.col(fmt_col) if fmt_col else F.lit("unknown")).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.col(payload_col)).cast("int").alias("n_bytes"),
    )
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic synthetic decode: dimensions derived from a content
    hash — stable across runs/partitions, so tests can assert values."""
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def decode_images(
    df: DataFrame,
    fake: bool = False,
    decoder: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """Fill meta.width/height by decoding payloads in Arrow batches.

    ``decoder(payload) -> (width, height)`` is the swap-in point for a real
    kernel (e.g. PIL ``Image.open(BytesIO(b)).size``). STUB: with neither
    ``decoder`` nor ``fake`` this raises NotImplementedError — the container
    has no image libs (BASELINE.json multimodal contract).
    """
    if decoder is None:
        if not fake:
            raise NotImplementedError(
                "no image codec in this environment; pass decoder=... or fake=True"
            )
        decoder = _fake_decode

    schema = df.schema

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w, h = decoder(payload)
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = int(w), int(h)
                metas.append(m)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(_decode, schema=schema)


def extract_features(
    df: DataFrame,
    dim: int = 8,
    fake: bool = False,
    extractor: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Payload → embedding column (``array<float>``), feeding the
    ``operators.similarity`` stack. STUB kernel (fake = hash-derived unit
    vector); real deployments swap a model forward pass in, batching via
    the same Arrow iterator."""
    if extractor is None:
        if not fake:
            raise NotImplementedError(
                "no feature extractor in this environment; pass extractor=... or fake=True"
            )

        def extractor(payload: bytes) -> list[float]:
            h = hashlib.sha256(payload or b"").digest()
            raw = [(h[i % 32] - 128) / 128.0 for i in range(dim)]
            norm = sum(x * x for x in raw) ** 0.5 or 1.0
            return [x / norm for x in raw]

    out_schema = StructType(
        df.schema.fields + [StructField("embedding", ArrayType(FloatType()))]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["embedding"] = [extractor(p) for p in pdf["payload"]]
            yield pdf

    return df.mapInPandas(_extract, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling STAND-IN: slices the payload at fixed
    byte offsets into a frames array (real impl: ffmpeg keyframe extraction
    behind the same signature). Demonstrates the explode-after-decode shape:
    one media row → N frame rows, each re-entering ``decode_images``."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.lit(max_frames - 1),
                (F.length("payload") / every_n_bytes).cast("int"),
            ),
        ),
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(
                F.col("payload").cast("string"), i * every_n_bytes + 1, 16
            ).alias("frame_sig"),
        ),
    )
    return df.withColumn("frames", frames).withColumn(
        "frame", F.explode_outer("frames")
    ).drop("frames")

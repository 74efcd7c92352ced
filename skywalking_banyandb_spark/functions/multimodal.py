"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched ``mapInPandas`` — the Spark-side plumbing for image/audio/video
feature extraction at 100 TB.

The decode step itself is STUBBED (no image/audio libs in this container):
:func:`decode_image` raises ``NotImplementedError`` unless a codec import
succeeds; tests and the oracle use :func:`synth_payload` (a deterministic
16-byte md5-derived fake) so the schema / partitioning / UDF signature /
batch-shape plumbing is real and verified even though the codec is fake.

Scale notes: mapInPandas streams Arrow batches — constant memory per task,
no collect; binary payloads stay opaque bytes end to end (no base64 blowup);
metadata travels as plain columns so filters on it push down to parquet
without touching payload bytes (column pruning keeps the scan narrow).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("mime", StringType()),
    ]
)


def synth_payload(text_col: Column) -> Column:
    """Deterministic fake binary payload: unhex(md5(text)) -> 16 bytes."""
    return F.unhex(F.md5(text_col))


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """documents -> multimodal table: (doc_id, payload BINARY, mime, width)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        synth_payload(F.col(text_col)).alias("payload"),
        F.lit("image/fake").alias("mime"),
        (F.length(F.col(text_col)) % 1024).alias("width"),
    )


def decode_image(payload: bytes) -> object:
    """Real decode — gated on codec availability (absent in this container)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "extract_features uses byte-level features instead"
        ) from e
    raise NotImplementedError("wire PIL decode here when the codec ships")


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction over the payload column.

    The pandas function sees pd.DataFrame batches (zero-copy Arrow); output
    schema is declared up front so Spark plans downstream operators without
    running Python.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": payload.map(len).astype("int32"),
                    "first_byte": payload.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "mime": pdf["mime"],
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def extract_features_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of attach_payload ∘ extract_features on the synth payload:
    first byte of unhex(md5(text)) == first two hex digits as an int."""
    hexd = "0123456789abcdef"
    d = lambda k: f"(strpos('{hexd}', substring(md5({text_col}), {k}, 1)) - 1)"
    return (
        f"SELECT {id_col} AS doc_id, 16 AS payload_len, "
        f"{d(1)} * 16 + {d(2)} AS first_byte, 'image/fake' AS mime FROM {table}"
    )

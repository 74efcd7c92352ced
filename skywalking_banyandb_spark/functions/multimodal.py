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


# --------------------------------------------------------------------------
# Frame sampling — the video/audio analogue: one input payload expands to
# N frame rows (variable-row mapInPandas output, the real streaming shape
# of a frame extractor). Frames are fixed-stride byte windows; per-frame
# features are byte aggregates. With a real codec the window becomes a
# decoded frame and the feature a model embedding — the Spark plumbing
# (Arrow batches, declared schema, row explosion, downstream partitioning)
# is identical, which is what this verifies.
# --------------------------------------------------------------------------

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_sum", IntegerType()),
    ]
)

_FRAME_WIDTH = 4


def sample_frames(df: DataFrame, frame_width: int = _FRAME_WIDTH) -> DataFrame:
    """Explode each payload into fixed-stride byte-window 'frames' with a
    per-frame byte-sum feature. Variable-row Arrow-batched output: a batch
    of n payloads yields n × (len/width) frame rows without ever
    materializing more than one Arrow batch per task."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(len(b) // frame_width):
                    w = b[i * frame_width:(i + 1) * frame_width]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(w)
                    sums.append(sum(w))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(frames, dtype=object),
                    "frame_sum": pd.Series(sums, dtype="int32"),
                }
            )

    return df.mapInPandas(_frames, FRAME_SCHEMA)


def sample_frames_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of attach_payload ∘ sample_frames on the synthetic
    16-byte payload: frame i = md5-hex bytes 4i..4i+3; byte j is the
    (2j+1, 2j+2) hex pair. frame_bytes is compared as its hex rendering
    (drivers stringify binary differently; the entry casts to hex)."""
    hexd = "0123456789abcdef"

    def byte(j):  # 0-based byte index into unhex(md5(text))
        return (f"((strpos('{hexd}', substring(h, {2*j+1}, 1)) - 1) * 16"
                f" + (strpos('{hexd}', substring(h, {2*j+2}, 1)) - 1))")

    frame_rows = []
    for i in range(4):
        bsum = " + ".join(byte(4 * i + j) for j in range(4))
        frame_rows.append(
            f"SELECT doc_id, {i} AS frame_idx, "
            f"substring(h, {8*i+1}, 8) AS frame_hex, "
            f"CAST({bsum} AS INTEGER) AS frame_sum "
            f"FROM (SELECT {id_col} AS doc_id, md5({text_col}) AS h FROM {table})"
        )
    union = " UNION ALL ".join(frame_rows)
    return f"SELECT * FROM ({union}) ORDER BY doc_id, frame_idx"

"""Multimodal column plumbing (C5): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side contract is fully real — schemas, partitioning, UDF
signatures, batch iteration via ``mapInPandas`` — while the actual
media decoding is STUBBED (the image/audio libraries are not in this
container). ``decode_stub=True`` substitutes a deterministic fake
"decoder" (byte-statistics standing in for pixels); ``False`` raises
NotImplementedError exactly where a real `PIL.Image.open` /
`soundfile.read` call plugs in.

Design for 100 TB of media:
- Binary payloads ride in Parquet as ``BinaryType`` next to their
  metadata struct — column pruning means metadata-only queries never
  read the bytes.
- ``mapInPandas`` streams Arrow record batches; peak executor memory
  is one batch of payloads, not one partition
  (spark.sql.execution.arrow.maxRecordsPerBatch controls batch rows).
- Feature extraction emits fixed-size vectors → downstream joins and
  ANN run on the small feature table, never re-reading media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, mime: string, width: int, height: int>"
)

FEATURE_SCHEMA = "doc_id long, n_bytes long, byte_mean double, byte_entropy_proxy double"

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long"


def to_media_table(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents table: payload = UTF-8
    bytes of the text (a deterministic stand-in for image bytes),
    typed metadata struct alongside."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Per-item features from binary payloads via mapInPandas (Arrow
    batches in, Arrow batches out — the sanctioned Python path)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decoder goes here: PIL.Image.open(io.BytesIO(payload))"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_mean = payloads.map(lambda b: (sum(b) / len(b)) if len(b) else 0.0)
            # cheap entropy proxy: distinct-byte fraction
            entropy = payloads.map(lambda b: (len(set(b)) / 256.0) if len(b) else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_mean": byte_mean.astype("float64"),
                    "byte_entropy_proxy": entropy.astype("float64"),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling shape for video payloads: one output row per
    sampled 'frame'. The stub samples byte offsets; a real decoder
    would seek keyframes. Demonstrates the 1→N mapInPandas fan-out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame decoder goes here (pyav/ffmpeg)")
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for idx, off in enumerate(range(0, n, every_n_bytes)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_bytes"].append(min(every_n_bytes, n - off))
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


def metadata_only_scan(media: DataFrame) -> DataFrame:
    """Metadata projection — never touches payload bytes (verify with
    .explain: ReadSchema excludes `payload`)."""
    return media.select("doc_id", "media_type", F.col("meta.n_bytes").alias("n_bytes"))

"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — binary columns, Arrow-batched
``mapInPandas`` with an explicit output schema, partition-sized batches —
while the actual media decode is stubbed (the decode libraries are not in
this container).  Swapping ``_decode_stub`` for PIL/ffmpeg keeps every plan
unchanged.

At scale: binary payloads ride in their own column so column pruning keeps
metadata-only queries from ever reading the bytes; decode fan-out is a
narrow ``mapInPandas`` (no shuffle), so 100 TB of media decodes at
partition parallelism with Arrow transfer only for the projected columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("feature", LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "image"
) -> DataFrame:
    """Demo payload: utf-8 bytes of the text column as the opaque binary.

    Real ingestion would read binaryFile sources
    (``spark.read.format("binaryFile")``) — shape is identical.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit(media_type)
    )


KNOWN_MEDIA_TYPES = ("image", "audio", "video")


def _decode_stub(payload: bytes, media_type: str = "image") -> tuple[int, int, int]:
    """Deterministic fake decode: (byte_len, first_byte, feature).

    A real implementation would decode the image/audio frame here and emit
    shape/duration/etc.  Raising NotImplementedError for unknown media types
    keeps the contract honest.
    """
    if media_type not in KNOWN_MEDIA_TYPES:
        raise NotImplementedError(
            f"no decoder for media_type {media_type!r}; known: "
            f"{KNOWN_MEDIA_TYPES}"
        )
    if payload is None:
        return 0, -1, 0
    first = payload[0] if payload else -1
    # "feature": sum of the first 8 bytes — stands in for a decoded signal.
    feature = sum(payload[:8])
    return len(payload), first, feature


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode over (doc_id, media_type, payload).

    ``mapInPandas`` so one Python worker handles a whole Arrow batch; the
    output schema is fixed and narrow regardless of payload size.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            decoded = pd.Series(decoded, index=pdf.index)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": decoded.map(lambda t: t[0]),
                    "first_byte": decoded.map(lambda t: t[1]),
                    "feature": decoded.map(lambda t: t[2]),
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        _decode, DECODED_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("out_len", IntegerType()),
    ]
)


def resize_media(df: DataFrame, target_bytes: int = 32) -> DataFrame:
    """Binary-in → binary-out transform plumbing (image resize shape).

    The stub truncates the payload to ``target_bytes`` — a real
    implementation decodes and resizes via PIL/ffmpeg in the same loop; the
    plan (narrow mapInPandas, no shuffle, binary column in and out, typed
    schema) is unchanged by that swap.  Downstream stages keep pruning: a
    metadata query over the output never deserializes ``payload``.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda p: None if p is None else bytes(p)[:target_bytes]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "out_len": resized.map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        _resize, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 64, every_n: int = 2
) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to one row per
    sampled frame (the 1→N ``mapInPandas`` shape — the batch yields MORE
    rows than it received, something a plain projection cannot express).

    The stub treats the payload as fixed-size frames and keeps every
    ``every_n``-th complete frame; a real implementation seeks keyframes
    with ffmpeg in the same loop.  Emits the frame's md5 so correctness is
    checkable without shipping frame bytes around.
    """
    import hashlib

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            md5s: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                for idx in range(0, len(raw) // frame_size, every_n):
                    chunk = raw[idx * frame_size : (idx + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(idx)
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_frames, FRAMES_SCHEMA)


EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def embed_media(
    df: DataFrame, dim: int = 8, window: int = 64, center: int = 105
) -> DataFrame:
    """Feature EXTRACTION into an embedding vector — the multimodal →
    similarity-search bridge: payload bytes → ``array<double>`` consumable
    by everything in :mod:`datapipe.similarity` / the embedding dedup ops.

    Deterministic stand-in for a real encoder (CLIP/CLAP et al. are not in
    this container): ``emb[d] = Σ (byte[d + dim·i] − center)`` over the
    first ``window`` payload bytes.  Centering makes coordinate signs vary
    with content, so downstream sign-LSH bucketing partitions the corpus
    instead of collapsing into one bucket (raw byte sums are always
    positive).  Swapping in a real encoder changes only this function —
    batch shape, Arrow transfer, output schema, and every downstream plan
    stay identical.
    """
    import numpy as np

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                raw = np.frombuffer(bytes(payload)[:window], dtype=np.uint8)
                embs.append(
                    [
                        float(raw[d::dim].astype(np.int64).sum())
                        - center * len(raw[d::dim])
                        for d in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "embedding": embs,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_embed, EMBED_SCHEMA)

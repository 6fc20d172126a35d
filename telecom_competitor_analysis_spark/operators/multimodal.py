"""Multimodal column plumbing (BASELINE.json north star): image/audio/video
as opaque ``binary`` columns with typed metadata, processed in
Arrow-batched Pandas stages via ``mapInPandas``.

The decode/feature-extract step is STUBBED (no image/audio libraries in
this container — see ``decode_image_batch``): the deterministic fake
derives "features" from the raw bytes so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and testable end-to-end.
Swapping in a real decoder is a one-function change.

Scale notes: binary payloads ride the shuffle only when explicitly
selected (column pruning drops them otherwise); mapInPandas streams
Arrow batches so peak memory is one batch per core, not one partition;
metadata-only queries never touch the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def as_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from any table with an id + string column:
    payload = utf-8 bytes of the string (deterministic fake image bytes),
    media_type round-robined over image/audio/video."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("byte_len"),
    )


def _fake_decode(payload: bytes | None) -> tuple[int | None, int | None, int | None, int | None]:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg (not
    installed here). A real implementation would be:

        raise NotImplementedError("install pillow/av and decode here")

    The fake derives width/height/frames/checksum from the bytes so tests
    can assert the full pipeline shape.
    """
    if payload is None:
        return None, None, None, None
    n = len(payload)
    checksum = sum(payload[:64]) + n
    width = 16 + (checksum % 64)
    height = 16 + ((checksum // 64) % 64)
    n_frames = 1 + (n % 8)
    return width, height, n_frames, checksum


def decode_media(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched). The UDF
    signature and batch iteration are production-shaped; only _fake_decode
    is a stub."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(
                lambda p: _fake_decode(bytes(p) if p is not None else None)
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "n_frames": decoded.map(lambda t: t[2]),
                    "checksum": decoded.map(lambda t: t[3]),
                }
            )
            yield out

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def with_frame_count(media: DataFrame) -> DataFrame:
    """Frame count from container METADATA, not decode: real video/audio
    containers carry the frame/sample count in their header, so a sampling
    plan can be built from a pure column expression over the byte length —
    no decoder in the loop, fully SQL-expressible (this is what makes
    ``q_frame_sample`` oracle-checkable). The arithmetic matches the stub
    decoder's ``_fake_decode`` (n_frames = 1 + byte_len % 8) so the
    header-derived and decode-derived counts agree on the test fixtures."""
    return media.withColumn(
        "n_frames", (F.lit(1) + F.col("byte_len") % 8).cast("int")
    )


def frame_sample(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling as a lateral explode over the frame index space —
    pure column ops (no bytes touched): one output row per sampled frame.
    Input needs only (media_id, media_type, n_frames): feed it either
    ``decode_media`` output or the metadata-only ``with_frame_count``."""
    return decoded.select(
        "media_id",
        "media_type",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("n_frames") - 1).cast("long"),
                F.lit(every_nth).cast("long"),
            )
        ).alias("frame_idx"),
    )


# Deterministic container headers for the fake payloads: real magic
# bytes (JPEG/PNG/RIFF/GIF) stamped by media_id % 5, with class 4 left
# headerless so the sniffing path exercises its 'unknown' branch. The
# declared media_type round-robins on % 3, so header and declaration
# DISAGREE for a deterministic subset — the mismatch class a
# content-type audit exists to find.
CONTAINER_HEADER_EXPR = (
    "CASE media_id % 5"
    " WHEN 0 THEN X'FFD8FF'"
    " WHEN 1 THEN X'89504E47'"
    " WHEN 2 THEN X'52494646'"
    " WHEN 3 THEN X'47494638'"
    " ELSE X'' END"
)

# Magic-byte sniff over the first-4-bytes hex string (8 hex chars; JPEG
# matches on its 3-byte signature). SHARED text with the DuckDB oracle:
# {h} is an 8-hex-char prefix column in both engines (Spark slices the
# BLOB before hexing — hex(substring(payload,1,4)); DuckDB lacks blob
# substring, so the oracle spells left(hex(payload), 8) — same value,
# the engine-side slice just keeps the map stage O(1) per row instead
# of O(payload)).
SNIFF_CASE = (
    "CASE WHEN substr({h}, 1, 6) = 'FFD8FF' THEN 'jpeg'"
    " WHEN {h} = '89504E47' THEN 'png'"
    " WHEN {h} = '52494646' THEN 'riff'"
    " WHEN {h} = '47494638' THEN 'gif'"
    " ELSE 'unknown' END"
)

SNIFF_FAMILY_CASE = (
    "CASE WHEN {s} IN ('jpeg', 'png', 'gif') THEN 'image'"
    " WHEN {s} = 'riff' THEN 'audio'"
    " ELSE 'unknown' END"
)


def with_container_header(media: DataFrame) -> DataFrame:
    """Prepend the deterministic magic-byte header to each payload."""
    return media.withColumn(
        "payload",
        F.concat(F.expr(CONTAINER_HEADER_EXPR), F.col("payload")),
    )


def sniff_media(media: DataFrame) -> DataFrame:
    """Magic-byte format detection: adds ``sniffed`` (container format)
    and ``sniffed_family`` (image/audio/unknown) from the payload's
    first 4 bytes — never from the declared media_type."""
    h = media.withColumn(
        "__h8", F.hex(F.expr("substring(payload, 1, 4)"))
    )
    return h.select(
        "*",
        F.expr(SNIFF_CASE.format(h="__h8")).alias("sniffed"),
    ).withColumn(
        "sniffed_family",
        F.expr(SNIFF_FAMILY_CASE.format(s="sniffed")),
    ).drop("__h8")

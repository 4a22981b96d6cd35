"""Multimodal column handling (SURVEY.md tier-X mandate: image/audio/video
as opaque binary columns with typed metadata).

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_payload`` raises ``NotImplementedError`` unless the deterministic
fake decoder is selected) — but everything Spark-side is real and tested:
the binary column, the metadata struct schema, the Arrow-batched
``mapInPandas`` plumbing, batch shapes, and partitioning.

Witnesses:
- ``q_multimodal_meta``: pure-SQL metadata extraction over synthesized
  binary payloads (oracle-checked EXACT);
- ``q_multimodal_features``: the ``mapInPandas`` feature-extraction path
  with the fake decoder — byte-level stats computed in pandas, and still
  oracle-checked EXACT because the fake features are arithmetic on the
  payload bytes (DuckDB recomputes them from the source text).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gasket_rs_spark.tables import load

_MODALITIES = ("image", "audio", "video")

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
        StructField("mean_byte", DoubleType()),
    ]
)


def decode_payload(payload: bytes, modality: str, fake: bool = False) -> bytes:
    """Decode an opaque media payload.

    Real decoders (PIL/librosa/ffmpeg) are not in this container — the
    Spark plumbing around this stub is the deliverable. ``fake=True``
    returns the payload unchanged (deterministic pass-through "decode").
    """
    if fake:
        return payload
    raise NotImplementedError(
        f"no {modality} codec in this environment; use fake=True for the "
        "deterministic pass-through decoder"
    )


def with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata a media table has.

    Payload is the utf-8 encoding of ``text`` (deterministic stand-in for
    real media bytes); modality cycles by doc_id.
    """
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return df.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        modality.alias("modality"),
        F.struct(
            F.octet_length("text").cast("bigint").alias("n_bytes"),
            (F.col("n_chars") % 1280).cast("bigint").alias("width"),
            (F.col("n_chars") % 720).cast("bigint").alias("height"),
        ).alias("meta"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payload columns, grouped by modality."""
    docs = with_payload(load(spark, sf_dir, "documents"))
    return (
        docs.groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.round(F.avg(F.col("meta.width")), 4).alias("avg_width"),
            F.round(F.avg(F.col("meta.height")), 4).alias("avg_height"),
            F.max(F.length("payload")).cast("bigint").alias("max_payload"),
        )
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    The pattern that matters at 100 TB: payloads stay partitioned, each
    Arrow batch is decoded in-process, and only the (tiny) feature vectors
    come back. The fake decoder keeps values deterministic so the oracle
    can recompute them from the source text.
    """
    # Project to exactly the columns the extractor needs BEFORE the Arrow
    # boundary — the metadata struct would otherwise ride along in every
    # batch (payload bytes dominate; don't double the transfer).
    docs = with_payload(load(spark, sf_dir, "documents")).select(
        "doc_id", "payload", "modality"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_payload(p, m, fake=True)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            # Byte statistics via numpy views over the payload buffers —
            # no interpreter loop over individual bytes (at 100 TB the
            # per-byte Python loop this replaces IS the job's runtime).
            arrays = [np.frombuffer(b, dtype=np.uint8) for b in decoded]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [a.size for a in arrays],
                    "first_byte": [int(a[0]) if a.size else None for a in arrays],
                    "last_byte": [int(a[-1]) if a.size else None for a in arrays],
                    "mean_byte": [
                        # floor(x*1e6+0.5)/1e6: same IEEE expression the
                        # oracle uses (round() impls disagree on half-grid).
                        # int(a.sum())/size (not a.mean()): pairwise-
                        # summation float differs from the oracle's exact
                        # integer-sum-then-divide on low-order bits.
                        math.floor(int(a.sum()) / a.size * 1000000 + 0.5) / 1000000
                        if a.size else None
                        for a in arrays
                    ],
                }
            )

    return docs.mapInPandas(extract, FEATURE_SCHEMA)


_N_FRAMES = 4


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: split each payload into N equal-size frames and
    emit per-frame metadata — the video-pipeline shape (sample k frames
    per asset, process each independently, keep the asset key).

    Uses binary slicing JVM-side (substring on the payload) + posexplode;
    a real decoder would replace the slicer inside the same plan shape.
    """
    docs = with_payload(load(spark, sf_dir, "documents")).where(
        F.col("modality") == "video"
    )
    plen = F.length("payload")
    frame_len = F.ceil(plen / _N_FRAMES).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(_N_FRAMES - 1)),
        # Column.substr accepts Column offsets (F.substring wants literals)
        lambda i: F.col("payload").substr((i * frame_len + 1).cast("int"), frame_len),
    )
    ex = docs.select("doc_id", F.posexplode(frames).alias("frame_idx", "frame"))
    return (
        ex.where(F.length("frame") > 0)
        .select(
            "doc_id",
            "frame_idx",
            F.length("frame").cast("bigint").alias("frame_bytes"),
            F.ascii(F.substring(F.col("frame").cast("string"), 1, 1)).cast("bigint").alias("first_byte"),
        )
    )


def q_multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize as a metadata transform: target box fit (max 224x224)
    preserving aspect ratio — the bookkeeping half of an image resize
    (the pixel half is the stubbed decoder)."""
    docs = with_payload(load(spark, sf_dir, "documents")).where(F.col("modality") == "image")
    w = F.greatest(F.col("meta.width"), F.lit(1))
    h = F.greatest(F.col("meta.height"), F.lit(1))
    scale = F.least(F.lit(224.0) / w, F.lit(224.0) / h, F.lit(1.0))
    return docs.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.floor(w * scale).cast("bigint").alias("new_width"),
        F.floor(h * scale).cast("bigint").alias("new_height"),
    )


ORACLES: dict[str, str] = {
    "multimodal_frame_sample": """
        WITH t AS (
            SELECT doc_id, text, octet_length(encode(text)) AS plen,
                   CAST(ceil(octet_length(encode(text)) / 4.0) AS INT) AS flen
            FROM documents
            WHERE doc_id % 3 = 2
        )
        SELECT doc_id, i AS frame_idx,
               length(substr(text, i * flen + 1, flen)) AS frame_bytes,
               unicode(substr(text, i * flen + 1, 1)) AS first_byte
        FROM t, (SELECT unnest([0, 1, 2, 3]) AS i)
        WHERE length(substr(text, i * flen + 1, flen)) > 0
    """,
    "multimodal_resize_meta": """
        WITH t AS (
            SELECT doc_id,
                   n_chars % 1280 AS width,
                   n_chars % 720 AS height,
                   greatest(n_chars % 1280, 1) AS w,
                   greatest(n_chars % 720, 1) AS h
            FROM documents
            WHERE doc_id % 3 = 0
        )
        SELECT doc_id, width, height,
               CAST(floor(w * least(224.0 / w, 224.0 / h, 1.0)) AS BIGINT) AS new_width,
               CAST(floor(h * least(224.0 / w, 224.0 / h, 1.0)) AS BIGINT) AS new_height
        FROM t
    """,
    "multimodal_meta": """
        WITH t AS (
            SELECT doc_id, text, n_chars,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality
            FROM documents
        )
        SELECT modality,
               count(*) AS n_assets,
               -- DuckDB sums BIGINT into HUGEINT (int128); the driver's
               -- canonicalizer materializes HUGEINT as float64, which
               -- hash-mismatches Spark's int64. Every integer sum in an
               -- oracle gets CAST AS BIGINT (round-1 array lesson, pt 2).
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               round(avg(n_chars % 1280), 4) AS avg_width,
               round(avg(n_chars % 720), 4) AS avg_height,
               max(octet_length(encode(text))) AS max_payload
        FROM t
        GROUP BY modality
    """,
    "multimodal_features": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               octet_length(encode(text)) AS n_bytes,
               unicode(substr(text, 1, 1)) AS first_byte,
               unicode(substr(text, length(text), 1)) AS last_byte,
               floor(list_avg(list_transform(string_split(text, ''),
                                             c -> unicode(c))) * 1000000 + 0.5) / 1000000 AS mean_byte
        FROM documents
    """,
}

"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded / feature-extracted through Arrow-batched pandas UDFs.

The decode step itself is STUBBED (no image/audio libraries ship in this
container): ``decode_image`` raises NotImplementedError unless a backend
is importable, and the tested path uses a deterministic byte-histogram
"feature extractor" so the Spark-side plumbing — binary schema, batch
shape, mapInPandas signature, partitioning — is real and exercised.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("mime_guess", T.StringType()),
    T.StructField("byte_histogram", T.ArrayType(T.LongType())),  # 16 bins
])

N_BINS = 16


def decode_image(payload: bytes):
    """Real decode would go through PIL/libvips; stubbed in this
    environment behind an import-try."""
    try:
        from PIL import Image  # noqa: F401
        import io as _io
        return Image.open(_io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image backend (PIL); "
            "this container ships none — use extract_features for the "
            "deterministic plumbing path") from exc


def _sniff_mime(payload: bytes) -> str:
    if payload.startswith(b"\x89PNG"):
        return "image/png"
    if payload.startswith(b"\xff\xd8"):
        return "image/jpeg"
    if payload[:5].lower() == b"<html":
        return "text/html"
    return "application/octet-stream"


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (url, payload): per-batch vectorized numpy byte
    histogram — the real shape a decode/resize/frame-sample stage has."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf >> 4, minlength=N_BINS)[:N_BINS]
                rows.append({
                    "url": url,
                    "n_bytes": int(buf.size),
                    "mime_guess": _sniff_mime(bytes(payload[:16])),
                    "byte_histogram": [int(x) for x in hist],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: treat generated page html as the opaque
    binary payload.  The payload table is exported to parquet so the
    DuckDB oracle can recompute every output — byte length, magic-bytes
    mime sniff, and the high-nibble histogram bins (via hex-string
    positional counting) — independently of the Arrow/numpy path."""
    from ..pipeline import generate_pages
    from .kg_oracle import EXPORT_DIR
    pages = generate_pages(spark, 200, partitions=4)
    path = EXPORT_DIR + "/payloads.parquet"
    pages.select("url", F.col("html").alias("payload")) \
        .write.mode("overwrite").parquet(path)
    features = extract_features(spark.read.parquet(path))
    return features.select(
        "url", "n_bytes", "mime_guess",
        F.element_at("byte_histogram", 1).alias("bin0"),
        F.element_at("byte_histogram", 8).alias("bin7"))


def _multimodal_sql() -> str:
    from .kg_oracle import EXPORT_DIR

    def nibble_count(hexchar):
        return ("CAST(len(list_filter(range(1, octet_length(payload) + 1), "
                "i -> substr(hx, 2*i - 1, 1) = '%s')) AS BIGINT)" % hexchar)

    return """
    WITH d AS (SELECT url, payload, hex(payload) AS hx
               FROM read_parquet('{path}/*.parquet'))
    SELECT url,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           CASE WHEN hx LIKE '89504E47%' THEN 'image/png'
                WHEN hx LIKE 'FFD8%' THEN 'image/jpeg'
                WHEN lower(substr(CAST(payload AS VARCHAR), 1, 5)) = '<html'
                     THEN 'text/html'
                ELSE 'application/octet-stream' END AS mime_guess,
           {bin0} AS bin0,
           {bin7} AS bin7
    FROM d
    """.format(path=EXPORT_DIR + "/payloads.parquet",
               bin0=nibble_count("0"), bin7=nibble_count("7"))


FRAME_BYTES = 256   # fake container: fixed-size frames
FRAME_STRIDE = 4    # sample every 4th frame
THUMB_STRIDE = 8    # "resize": keep every 8th byte of a sampled frame

FRAME_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_bytes", T.LongType()),
    T.StructField("frame_md5", T.StringType()),   # md5 over the hex text
    T.StructField("thumb_md5", T.StringType()),
])


def sample_frames(binary_df: DataFrame) -> DataFrame:
    """Frame-sampling + resize plumbing over opaque binary payloads: the
    payload is treated as a fixed-frame container (a DETERMINISTIC FAKE
    of a video decode — no codec libraries ship here; the Spark-side
    shape is real: Arrow-batched mapInPandas, one output row per sampled
    frame, numpy slicing inside the batch).  "Resize" keeps every
    ``THUMB_STRIDE``-th byte of the frame (a 1-D thumbnail).  Checksums
    are md5 over the UPPERCASE HEX of the slice so the DuckDB oracle can
    recompute them on VARCHAR (its md5 takes no BLOBs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                data = bytes(payload)
                n_frames = len(data) // FRAME_BYTES
                for idx in range(0, n_frames, FRAME_STRIDE):
                    frame = data[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                    thumb = frame[::THUMB_STRIDE]
                    rows.append({
                        "url": url,
                        "frame_idx": idx,
                        "frame_bytes": len(frame),
                        "frame_md5": hashlib.md5(frame.hex().upper()
                                                 .encode()).hexdigest(),
                        "thumb_md5": hashlib.md5(thumb.hex().upper()
                                                 .encode()).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return binary_df.mapInPandas(run, schema=FRAME_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: sampled-frame rows over the exported
    payload table (same export multimodal_features writes)."""
    from .kg_oracle import EXPORT_DIR
    multimodal_features(spark, sf_dir).count()   # ensures the export exists
    return sample_frames(spark.read.parquet(EXPORT_DIR + "/payloads.parquet"))


def _frame_sample_sql() -> str:
    from .kg_oracle import EXPORT_DIR
    # hex() emits 2 chars per byte: frame idx*2*FRAME_BYTES .. +2*FRAME_BYTES;
    # the thumbnail is every THUMB_STRIDE-th byte = every 2*stride hex pair
    return """
    WITH d AS (SELECT url, hex(payload) AS hx,
                      octet_length(payload) // {fb} AS n_frames
               FROM read_parquet('{path}/*.parquet')),
    frames AS (
        SELECT url, CAST(u.i AS BIGINT) AS frame_idx,
               substr(hx, CAST(u.i AS BIGINT) * {fb2} + 1, {fb2}) AS frame_hx
        FROM d, LATERAL (SELECT unnest(range(0, n_frames, {stride})) AS i) u
    )
    SELECT url, frame_idx,
           CAST(len(frame_hx) // 2 AS BIGINT) AS frame_bytes,
           md5(frame_hx) AS frame_md5,
           md5(list_aggregate(
                 list_transform(range(0, CAST(len(frame_hx) // {tb2} AS BIGINT)),
                                j -> substr(frame_hx, j * {tb2} + 1, 2)),
                 'string_agg', '')) AS thumb_md5
    FROM frames
    """.format(path=EXPORT_DIR + "/payloads.parquet", fb=FRAME_BYTES,
               fb2=2 * FRAME_BYTES, stride=FRAME_STRIDE,
               tb2=2 * THUMB_STRIDE)


QUERIES = {
    "multimodal_features": (multimodal_features, _multimodal_sql()),
    "multimodal_frame_sample": (multimodal_frame_sample, _frame_sample_sql()),
}

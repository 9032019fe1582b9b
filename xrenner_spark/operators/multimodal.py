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


QUERIES = {
    "multimodal_features": (multimodal_features, _multimodal_sql()),
}

"""Structured Streaming wrapper over the same KG kernel.

The reference is strictly batch (SURVEY.md §2.7: no streaming operators
exist in it), so streaming is an additive capability here: a continuous
ingestion mode for the identical per-document kernel.

Design: the fused extract+kernel stage is a stateless mapInPandas and is
therefore directly streamable; the chain/triple SQL stage self-joins the
kernel output three ways, which stream-stream join semantics cannot
express per-document-exactly — and chains never cross documents — so the
triple stage runs per micro-batch via ``foreachBatch`` (the canonical
reuse-batch-logic pattern).  Watermarked event-time aggregation over
``warc_ts`` is provided for monitoring/late-data demonstration.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lex import load_lex
from .pipeline import PAGES_SCHEMA, fused_extract_kernel_stage, triples_stage


def read_pages_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream of page parquet drops (each file = a WARC-ish
    ingestion unit)."""
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir))


def stream_pipeline(spark: SparkSession, source_dir: str, out_dir: str,
                    lex_dir: Optional[str] = None, available_now: bool = True):
    """Continuous KG construction: pages stream -> kernel -> per-batch
    triple emission with exactly-once file-sink semantics via the
    streaming checkpoint.  Returns the started StreamingQuery."""
    pages = read_pages_stream(spark, source_dir)
    bcast = spark.sparkContext.broadcast(load_lex(lex_dir))
    kernel_out = fused_extract_kernel_stage(pages, bcast)

    triples_path = os.path.join(out_dir, "triples")
    checkpoint = os.path.join(out_dir, "_checkpoint")

    def emit_triples(batch_df: DataFrame, batch_id: int):
        batch_df = batch_df.persist()
        try:
            batch_df.count()  # materialize before the 3-way join fan-out
            (triples_stage(batch_df)
             .withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").parquet(triples_path))
        finally:
            batch_df.unpersist()

    writer = (kernel_out.writeStream
              .foreachBatch(emit_triples)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def mention_rate_stream(kernel_out: DataFrame, window: str = "1 hour",
                        watermark: str = "1 day") -> DataFrame:
    """Watermarked event-time aggregation: mentions/docs per warc_ts
    window, tolerating late pages up to the watermark."""
    return (kernel_out
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window), "lang")
            .agg(F.sum(F.when(F.col("row_type") == "d", 1).otherwise(0))
                 .alias("docs"),
                 F.sum(F.when(F.col("row_type") == "m", 1).otherwise(0))
                 .alias("mentions"),
                 F.sum(F.when(F.col("error") != "", 1).otherwise(0))
                 .alias("errors")))

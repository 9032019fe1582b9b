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


def streaming_dedup(pages: DataFrame) -> DataFrame:
    """Cross-batch exact deduplication as a custom stateful operator
    (applyInPandasWithState): the first page with a given content hash
    passes through, every later arrival — in the same OR any later
    micro-batch — is dropped, with per-group state carrying the
    seen-count across batches.  This is the stateful streaming primitive
    a training-data ingest pipeline needs (the batch dedup operators
    can't see across micro-batches)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("content_hash", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("dup_of_prior_batch", T.BooleanType()),
    ])
    state_schema = T.StructType([T.StructField("seen", T.LongType())])

    def dedup_group(key, pdf_iter, state):
        seen = state.get[0] if state.exists else 0
        had_prior = seen > 0
        out = []
        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                if seen == 0:
                    out.append({"content_hash": key[0], "url": row.url,
                                "warc_ts": row.warc_ts, "text": row.text,
                                "lang": row.lang,
                                "dup_of_prior_batch": had_prior})
                seen += 1
        state.update((seen,))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(out, columns=cols)

    hashed = pages.withColumn("content_hash", F.md5("text"))
    return (hashed.groupBy("content_hash")
            .applyInPandasWithState(dedup_group, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


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

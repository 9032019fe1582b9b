"""Training-data pipeline operators over the document/embedding tables.

Each module exposes ``QUERIES: {name: (spark_fn, oracle_sql_or_None)}``
where ``spark_fn(spark, sf_dir) -> DataFrame`` is the distributed
implementation (built-in pyspark.sql functions — JVM/codegen path, no
Python UDFs) and the oracle is equivalent ANSI SQL for DuckDB.  Column
names and deterministic orderings are aligned so the driver's
order-insensitive value-hash comparison holds bit-for-bit.
"""

from . import (dedup, similarity, textstats, multimodal, ml_score,  # noqa: F401
               sampling, clustering, web)


def all_queries():
    out = {}
    for module in (dedup, similarity, textstats, multimodal, ml_score,
                   sampling, clustering, web):
        out.update(module.QUERIES)
    return out

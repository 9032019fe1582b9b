"""Similarity search over the embeddings table.

Embeddings are quantized to integers (round(x*1000)) before any dot
product so scores are exact int64 arithmetic — bit-identical between
Spark and the DuckDB oracle regardless of summation order.  Brute-force
cosine(top-k) is the baseline; sign-bucket LSH is the scale path (bucket
on the sign pattern of the leading dimensions, search within bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

N_QUERIES = 10
TOP_K = 3
LSH_BITS = 8


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (spark.read.parquet(sf_dir + "/embeddings.parquet")
           .repartition(spark.sparkContext.defaultParallelism, "vec_id"))
    q = F.transform("embedding", lambda x: F.round(x * 1000).cast("long"))
    return emb.select("vec_id", q.alias("q"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbours for the first N query vectors by integer
    dot product (ties broken by vec_id)."""
    vecs = _quantized(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES) \
        .select(F.col("vec_id").alias("query_id"), F.col("q").alias("qv"))
    scored = (queries.crossJoin(vecs)
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      _dot("qv", "q").alias("score")))
    win = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "score",
                    F.col("rank").cast("long").alias("rank")))


ANN_TOPK_SQL = """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(x*1000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    queries AS (SELECT vec_id AS query_id, qv FROM q WHERE vec_id < {nq}),
    scored AS (
        SELECT query_id, v.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(queries.qv, v.qv),
                                       p -> p[1] * p[2])) AS score
        FROM queries, q v
        WHERE v.vec_id != query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(score AS BIGINT) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
""".format(nq=N_QUERIES, k=TOP_K)


def ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: sign-pattern bucket on the leading dimensions, then
    exact integer scoring within the bucket only.  At 100 TB this turns
    the quadratic cross join into a bucket-local join whose cost follows
    the bucket histogram (2^bits buckets)."""
    vecs = _quantized(spark, sf_dir)
    bucket = None
    for b in range(LSH_BITS):
        bit = F.when(F.element_at("q", b + 1) >= 0, 1 << b).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    bucketed = vecs.withColumn("bucket", bucket.cast("long"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.bucket").alias("bucket"),
                     F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b"),
                     _dot("a.q", "b.q").alias("score")))
    win = Window.partitionBy("bucket").orderBy(
        F.col("score").desc(), F.col("vec_a").asc(), F.col("vec_b").asc())
    return (pairs.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= TOP_K)
            .select("bucket", "vec_a", "vec_b", "score",
                    F.col("rank").cast("long").alias("rank")))


def _bucket_sql_expr(prefix: str) -> str:
    return " + ".join(
        "CASE WHEN %sq[%d] >= 0 THEN %d ELSE 0 END" % (prefix, b + 1, 1 << b)
        for b in range(LSH_BITS))


ANN_LSH_SQL = """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(x*1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    bucketed AS (SELECT vec_id, q, CAST(%s AS BIGINT) AS bucket FROM q),
    pairs AS (
        SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_sum(list_transform(list_zip(a.q, b.q), p -> p[1]*p[2])) AS score
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    ranked AS (
        SELECT bucket, vec_a, vec_b, score,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY score DESC, vec_a ASC, vec_b ASC) AS rank
        FROM pairs
    )
    SELECT bucket, vec_a, vec_b, CAST(score AS BIGINT) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= %d
""" % (_bucket_sql_expr(""), TOP_K)


QUERIES = {
    "ann_topk_bruteforce": (ann_topk_bruteforce, ANN_TOPK_SQL),
    "ann_lsh_bucket": (ann_lsh_bucket, ANN_LSH_SQL),
}

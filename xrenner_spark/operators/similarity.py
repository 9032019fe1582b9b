"""Similarity search over the embeddings table.

Embeddings are quantized to integers (round(x*1000)) before any dot
product so scores are exact int64 arithmetic — bit-identical between
Spark and the DuckDB oracle regardless of summation order.  Brute-force
cosine(top-k) is the baseline; random-hyperplane LSH is the scale path:

- signatures are sign bits of Rademacher (±1-coefficient) hyperplane
  projections over ALL dimensions — seeded md5 coefficients are computed
  once in Python and embedded as literals in both the Spark plan and the
  DuckDB oracle, so the two engines hash bit-identically.  (Sign patterns
  of raw leading dims — the round-1 design — concentrate mass in a few
  buckets on correlated real embeddings; random projections don't.)
- N_TABLES hash tables are OR-combined (candidate if ANY table agrees),
  the standard recall lever.
- buckets larger than MAX_BUCKET are skipped (the skew guard: a hot
  bucket at 10^12 rows would otherwise go quadratic in one task).
- ranking is per QUERY VECTOR (window by query_id), answering the same
  top-k question as the brute-force baseline, never per bucket.
"""

from __future__ import annotations

import hashlib
import logging

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ._sizing import parquet_rows

_LOG = logging.getLogger(__name__)

N_QUERIES = 10
TOP_K = 3
EMB_DIM = 64          # embeddings.parquet vector width (all sf dirs)
N_TABLES = 18         # OR-combined hash tables (recall knob; see below)
N_BITS = 5            # BASE hyperplanes (bucket bits) per table
MAX_BITS = 16         # adaptive-bits ceiling (65k buckets/table)
TARGET_BUCKET = 64    # expected bucket occupancy the bit count aims for
MAX_BUCKET = 128      # skip over-full buckets: bounds worst-case group
                      # work at MAX_BUCKET^2 scored pairs per bucket

# At production N the bit count ADAPTS as log2(N / TARGET_BUCKET)
# (_n_bits below) so bucket occupancy — and with it per-query candidate
# work — stays constant; the recall knob is N_TABLES.  Every test sf
# (200 / 2,000 vectors) lands on the base 5 bits, so the static DuckDB
# oracle and the measured recall are unaffected by adaptivity.
#
# N_TABLES=18 is the round-5 default: the round-4 1M-vector measurement
# (scripts/ann_recall_tables.py, BENCH/BASELINE.md) put planted-pair
# recall at 0.857 / 0.944 / 0.979 for 12 / 18 / 24 tables with 18
# costing only ~+10% wall over 12 — the verdict-directed operating
# point.  The DuckDB oracle SQL is generated from the same constant so
# both engines always agree on the candidate set.


def _rademacher(table: int, bit: int) -> list:
    """Deterministic ±1 hyperplane coefficients (seeded md5, one byte per
    dimension) — reproducible across engines, machines and rounds."""
    out = []
    for d in range(EMB_DIM):
        h = hashlib.md5(("hp|%d|%d|%d" % (table, bit, d)).encode("utf8")).digest()
        out.append(1 if h[0] < 128 else -1)
    return out


HYPERPLANES = [[_rademacher(t, b) for b in range(MAX_BITS)]
               for t in range(N_TABLES)]


def _n_bits(n_vecs: int) -> int:
    """Bucket bits for a given corpus size: N/2^bits ≈ TARGET_BUCKET."""
    import math
    need = math.ceil(math.log2(max(n_vecs, 1) / TARGET_BUCKET)) \
        if n_vecs > TARGET_BUCKET else 0
    bits = max(N_BITS, min(MAX_BITS, need))
    _LOG.info("LSH geometry: N=%d vectors -> %d bucket bits x %d tables",
              n_vecs, bits, N_TABLES)
    return bits


def _corpus_size(spark: SparkSession, sf_dir: str) -> int:
    """Corpus row count from the parquet FOOTER — the round-4 advice
    fix: counting the quantized plan executed the scan + quantization
    twice per operator call (once for the count, once for the real
    job).  Footer metadata is exact and driver-side; a non-parquet
    layout falls back to one count() on the RAW scan (no quantization
    recompute)."""
    return parquet_rows(sf_dir + "/embeddings.parquet",
                        fallback_df=spark.read.parquet(
                            sf_dir + "/embeddings.parquet"))


def _corpus_bits(spark: SparkSession, sf_dir: str) -> int:
    return _n_bits(_corpus_size(spark, sf_dir))


def _n_subgroups(n_vecs: int) -> int:
    """Spark-group coarsening for the bucket scorers (r6): per-group
    applyInPandas machinery (arrow round trip + pandas frame build per
    group) measured ~0.2 ms/group — at TARGET_BUCKET occupancy that is
    2 s of pure overhead per million vectors.  Buckets are therefore
    packed ~(n_vecs/8192)-ways per table via pmod(bucket, n_sub) and
    looped inside the function with a pandas groupby; group payload
    stays bounded at ~8k rows regardless of corpus size."""
    return max(32, min(4096, -(-n_vecs // 8192)))


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (spark.read.parquet(sf_dir + "/embeddings.parquet")
           .repartition(spark.sparkContext.defaultParallelism, "vec_id"))
    q = F.transform("embedding", lambda x: F.round(x * 1000).cast("long"))
    return emb.select("vec_id", q.alias("q"))


def _dot(a, b):
    """Exact int64 dot product of two EMB_DIM array columns.

    Kept as the zip_with/aggregate fold on MEASURED grounds (r6): a flat
    64-term getItem sum — the 'codegen beats interpreted HOF' hypothesis
    — ran 3x SLOWER on the 200k-row bruteforce scoring (1.09 s vs
    3.23 s interleaved A/B at sf1.0); 128 per-row array accessors cost
    more than one interpreted fold over the pair array."""
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


def _bucketed(vecs: DataFrame, n_bits: int) -> DataFrame:
    """(vec_id, q) -> (vec_id, q, table_id, bucket): all N_TABLES bucket
    ids per vector via ONE Arrow-batched numpy position (a k x 64 int64
    GEMM against the 64 x (T*bits) hyperplane bank), then a JVM-side
    posexplode into per-table rows.

    Execution-strategy lesson (round 4, measured at 1M vectors):
    * the round-2 constant-folded higher-order-function formulation ran
      the projections through INTERPRETED lambdas -- O(N*T*bits*64)
      interpreted steps, >33 min at 1M vectors (fine at 2k, where it
      was chosen to dodge the ~11 s janino cost of inline literals);
    * inlining the +-1 signed sums as flat SQL (~10k CASE addends)
      drives janino past its compile cliff exactly like the 500-tree
      GBT (BENCH/BASELINE.md model-size boundary);
    * the Arrow GEMM computes the identical integers in seconds and is
      size-indifferent -- the same compiled-vs-runtime boundary call as
      operators/ml_score.py, landing on the runtime side."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    bank = np.array([[HYPERPLANES[t][b] for b in range(n_bits)]
                     for t in range(N_TABLES)],
                    dtype=np.int64).reshape(N_TABLES * n_bits, EMB_DIM).T
    powers = (np.int64(1) << np.arange(n_bits, dtype=np.int64))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("q", T.BinaryType()),
        T.StructField("buckets", T.ArrayType(T.LongType())),
    ])

    def run(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            M = np.array(pdf["q"].tolist(), dtype=np.int64)
            if M.size and abs(M).max() > 32767:
                raise ValueError(
                    "_bucketed int16 packing contract violated: a "
                    "quantized component exceeds 32767 (|x| > ~32.7 "
                    "before the x1000 quantization) — widen the packed "
                    "dtype here and in the np.frombuffer unpacks in "
                    "_score_buckets/_score_buckets_topk")
            bits = (M @ bank >= 0).astype(np.int64)
            buckets = bits.reshape(len(pdf), N_TABLES, n_bits) @ powers
            # the posexplode below duplicates q into every per-table row
            # before the bucket shuffle; packing the 64 int64s as 128
            # bytes of little-endian int16 (values are |x*1000|, far
            # inside int16) shrinks those shuffle rows ~4x (r6).  The
            # scorers unpack and compute in int64, identical integers.
            packed = [row.tobytes() for row in M.astype("<i2")]
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values,
                                "q": packed,
                                "buckets": list(buckets)})

    return (vecs.select("vec_id", "q").mapInPandas(run, schema=schema)
            .select("vec_id", "q", F.posexplode("buckets"))
            .withColumnRenamed("pos", "table_id")
            .withColumnRenamed("col", "bucket"))


def _grouped_apply(bucketed: DataFrame, run_bucket, schema,
                   n_sub: "int | None") -> DataFrame:
    """groupBy(table_id, bucket).applyInPandas(run_bucket), optionally
    COARSENED: with ``n_sub`` set, Spark groups on (table_id,
    pmod(bucket, n_sub)) and a pandas groupby loops the real buckets
    inside one call — identical output multiset, ~n_buckets/n_sub fewer
    arrow round trips (see _n_subgroups)."""
    import pandas as pd

    if n_sub is None:
        return (bucketed.groupBy("table_id", "bucket")
                .applyInPandas(run_bucket, schema))

    cols = [f.name for f in schema.fields]

    def run(pdf):
        outs = [run_bucket(g) for _, g in pdf.groupby("bucket", sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(outs, ignore_index=True)

    sub = bucketed.withColumn("_sub", F.pmod("bucket", F.lit(n_sub)))
    return sub.groupBy("table_id", "_sub").applyInPandas(run, schema)


def _score_buckets(bucketed: DataFrame, with_norms: bool = False,
                   cos_gate: "tuple[int, int] | None" = None,
                   n_sub: "int | None" = None) -> DataFrame:
    """Per-(table, bucket) exact pair scoring: one int64 GEMM per group
    (k x k from k x 64), emitting the strict upper triangle
    (vec_a < vec_b, each unordered pair once per table).  The size
    gates live inside the group function: singleton groups emit nothing
    and groups over MAX_BUCKET are dropped whole -- identical semantics
    to the former collect_list + size filter, but nothing materializes
    JVM-side and a mega-bucket costs only its Arrow transfer.

    ``cos_gate=(num, den)`` additionally applies the cosine threshold
    ``dot > 0 AND den*dot^2 >= num*|a|^2*|b|^2`` INSIDE the group
    function (requires with_norms).  The gate is a per-pair predicate
    on exact integers identical in every table that surfaces the pair,
    so filtering before the cross-table dedupe shuffle is equivalent to
    filtering after it — but the shuffle then carries only the passing
    pairs instead of the full O(bucket^2/2) triangle per table
    (round-4 lesson: the ungated triangle at 1M vectors is ~400M rows
    and did not complete; gated, the op runs in seconds)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if cos_gate is not None and not with_norms:
        raise ValueError("cos_gate requires with_norms=True (the gate "
                         "needs the Gram-diagonal norms; silently "
                         "skipping it would emit the ungated triangle)")
    fields = [T.StructField("vec_a", T.LongType()),
              T.StructField("vec_b", T.LongType()),
              T.StructField("score", T.LongType())]
    if with_norms:
        fields += [T.StructField("na2", T.LongType()),
                   T.StructField("nb2", T.LongType())]
    schema = T.StructType(fields)
    cols = [f.name for f in fields]

    def run(pdf):
        k = len(pdf)
        if k < 2 or k > MAX_BUCKET:
            return pd.DataFrame({c: [] for c in cols})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        M = np.frombuffer(b"".join(pdf["q"].tolist()),
                          dtype="<i2").reshape(k, -1).astype(np.int64)
        S = M @ M.T
        i, j = np.triu_indices(k, 1)
        out = {"vec_a": ids[i], "vec_b": ids[j], "score": S[i, j]}
        if with_norms:
            d = np.diagonal(S)
            out["na2"] = d[i]
            out["nb2"] = d[j]
            if cos_gate is not None:
                num, den = cos_gate
                dot = out["score"]
                keep = (dot > 0) & (den * dot * dot
                                    >= num * out["na2"] * out["nb2"])
                out = {c: v[keep] for c, v in out.items()}
        return pd.DataFrame(out)

    return _grouped_apply(bucketed, run, schema, n_sub)


def _score_buckets_topk(bucketed: DataFrame, top_k: int,
                        n_sub: "int | None" = None) -> DataFrame:
    """Per-(table, bucket) DIRECTED local top-k edges (query_id,
    neighbor_id, score) via one int64 Gram GEMM per group.

    Emitting each member's bucket-LOCAL top-k instead of the full pair
    triangle is EXACT for global top-k: if neighbor n belongs to query
    q's global candidate top-k and they share bucket B, then fewer than
    top_k vectors in B outrank n for q (each would itself be a global
    candidate above n) — so n is inside q's B-local top-k.  The union
    of local top-ks therefore contains every global winner, while the
    downstream shuffle shrinks from O(bucket^2 / 2) to O(bucket * k)
    rows per group (~5x at 64-member buckets, measured the difference
    between a 1M-vector run completing in minutes and not completing
    at all).  Ties break by ascending neighbor id, same as the final
    window: rows arrive id-sorted, so a STABLE argsort of the negated
    scores preserves that order within equal scores."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("query_id", T.LongType()),
                           T.StructField("neighbor_id", T.LongType()),
                           T.StructField("score", T.LongType())])

    def run(pdf):
        k = len(pdf)
        if k < 2 or k > MAX_BUCKET:
            return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                 "score": []})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        M = np.frombuffer(b"".join(pdf["q"].tolist()),
                          dtype="<i2").reshape(k, -1).astype(np.int64)
        S = M @ M.T
        np.fill_diagonal(S, -(2 ** 62))  # self never wins
        order = np.argsort(-S, axis=1, kind="stable")[:, :min(top_k, k - 1)]
        n_loc = order.shape[1]
        qi = np.repeat(ids, n_loc)
        ni = ids[order].ravel()
        sc = np.take_along_axis(S, order, axis=1).ravel()
        return pd.DataFrame({"query_id": qi, "neighbor_id": ni, "score": sc})

    return _grouped_apply(bucketed, run, schema, n_sub)


def ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: per-vector top-k over LSH candidates.

    Three shuffles total.  One Arrow position computes all N_TABLES
    bucket ids per vector (JVM posexplode, vectors carried along); ONE
    shuffle groups members per (table, bucket) into the Arrow pair
    scorer (size caps inside the group function); a pair-keyed groupBy
    dedupes across the OR-tables; mirroring both directions and the
    per-query-vector window rank the final top-k.  Bucket bits adapt to
    the corpus size (parquet-footer row count, no pre-job) so occupancy
    stays near TARGET_BUCKET at any N.  Carrying the (small, fixed-width) vectors
    through the bucket shuffle costs N_TABLES array copies per row but
    saves the two vec_id-keyed scoring joins a pairs-then-lookup plan
    would shuffle -- at 10^12 rows the join sides dwarf the signature
    fan-out."""
    vecs = _quantized(spark, sf_dir)
    n_vecs = _corpus_size(spark, sf_dir)
    n_bits = _n_bits(n_vecs)
    directed = _score_buckets_topk(_bucketed(vecs, n_bits), TOP_K,
                                   n_sub=_n_subgroups(n_vecs))
    # ONE query-keyed exchange finishes the job (r6; formerly a
    # pair-keyed dedupe exchange THEN a query-keyed window exchange):
    # per query at most N_TABLES * TOP_K directed edges arrive, the same
    # (query, neighbor) edge carrying an identical exact score from
    # every shared table — so array_distinct IS the pair dedupe, and the
    # comparator sort + slice reproduce the old window's
    # (score DESC, neighbor ASC) row_number <= K exactly, on <= 54
    # elements per row (interpreted-HOF OK regime).
    edges = (directed.groupBy("query_id")
             .agg(F.collect_list(F.struct("neighbor_id", "score"))
                  .alias("es")))
    top = edges.select("query_id", F.expr(
        "slice(array_sort(array_distinct(es), (a, b) -> "
        "CASE WHEN a.score > b.score THEN -1 "
        "WHEN a.score < b.score THEN 1 "
        "WHEN a.neighbor_id < b.neighbor_id THEN -1 "
        "WHEN a.neighbor_id > b.neighbor_id THEN 1 ELSE 0 END), "
        "1, %d)" % TOP_K).alias("top"))
    return (top.select("query_id", F.posexplode("top"))
            .select("query_id", F.col("col.neighbor_id").alias("neighbor_id"),
                    F.col("col.score").alias("score"),
                    (F.col("pos") + 1).cast("long").alias("rank")))


def _bucket_sql_expr(table: int) -> str:
    bits = []
    for b in range(N_BITS):
        coefs = "[" + ", ".join(str(c) for c in HYPERPLANES[table][b]) + "]"
        bits.append(
            "CASE WHEN list_sum(list_transform(list_zip(q, %s), p -> p[1]*p[2]))"
            " >= 0 THEN %d ELSE 0 END" % (coefs, 1 << b))
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _ann_lsh_sql() -> str:
    sig = "\n        UNION ALL ".join(
        "SELECT vec_id, q, %d AS table_id, %s AS bucket FROM q" % (t, _bucket_sql_expr(t))
        for t in range(N_TABLES))
    return """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(x*1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    sig AS (
        {sig}
    ),
    sizes AS (SELECT table_id, bucket, count(*) AS bsz
              FROM sig GROUP BY table_id, bucket),
    ok AS (SELECT s.vec_id, s.table_id, s.bucket
           FROM sig s JOIN sizes z
             ON s.table_id = z.table_id AND s.bucket = z.bucket
           WHERE z.bsz <= {cap}),
    cand AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM ok a JOIN ok b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id != b.vec_id
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               list_sum(list_transform(list_zip(qa.q, qb.q), p -> p[1]*p[2])) AS score
        FROM cand c
        JOIN q qa ON c.query_id = qa.vec_id
        JOIN q qb ON c.neighbor_id = qb.vec_id
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
    """.format(sig=sig, cap=MAX_BUCKET, k=TOP_K)


ANN_LSH_SQL = _ann_lsh_sql()


# ---------------------------------------------------------------------
# embedding-cosine near-duplicate detection (dedup by vector similarity)
# ---------------------------------------------------------------------

COS_T2_NUM, COS_T2_DEN = 16, 100  # tau = 0.4: cos >= tau <=> den*dot^2 >= num*|a|^2*|b|^2


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= 0.4, restricted to the
    random-hyperplane LSH candidate pairs (same tables/cap/adaptive bits
    as ann_lsh_bucket -- at 10^12 rows the all-pairs test is quadratic).
    The test stays in exact int64 arithmetic: vectors are unit-norm, so
    with round(x*1000) quantization den*dot^2 <= 1e14 and
    num*|a|^2*|b|^2 <= 1.6e13 both fit comfortably.  Norms come free as
    the Gram-matrix diagonal inside the shared Arrow bucket scorer, and
    the threshold is applied INSIDE the scorer (cos_gate): a per-pair
    predicate on table-invariant exact integers, so pre-shuffle
    filtering is equivalent to post-shuffle filtering — but the
    cross-table dedupe shuffles only the passing pairs; the full
    per-bucket triangle (~400M rows at 1M vectors, measured
    non-completing) never materializes."""
    vecs = _quantized(spark, sf_dir)
    n_vecs = _corpus_size(spark, sf_dir)
    n_bits = _n_bits(n_vecs)
    pairs = _score_buckets(_bucketed(vecs, n_bits), with_norms=True,
                           cos_gate=(COS_T2_NUM, COS_T2_DEN),
                           n_sub=_n_subgroups(n_vecs))
    return (pairs.groupBy("vec_a", "vec_b")
            .agg(F.min("score").alias("dot"))
            .select("vec_a", "vec_b", "dot"))


def _dedup_cosine_sql() -> str:
    sig = "\n        UNION ALL ".join(
        "SELECT vec_id, q, n2, %d AS table_id, %s AS bucket FROM n"
        % (t, _bucket_sql_expr(t)) for t in range(N_TABLES))
    return """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(x*1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    n AS (SELECT vec_id, q, list_sum(list_transform(q, x -> x*x)) AS n2 FROM q),
    sig AS (
        {sig}
    ),
    sizes AS (SELECT table_id, bucket, count(*) AS bsz
              FROM sig GROUP BY table_id, bucket),
    ok AS (SELECT s.vec_id, s.table_id, s.bucket
           FROM sig s JOIN sizes z
             ON s.table_id = z.table_id AND s.bucket = z.bucket
           WHERE z.bsz <= {cap}),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM ok a JOIN ok b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
    ),
    scored AS (
        SELECT c.vec_a, c.vec_b,
               list_sum(list_transform(list_zip(na.q, nb.q), t -> t[1]*t[2]))
                   AS dot,
               na.n2 AS na2, nb.n2 AS nb2
        FROM cand c
        JOIN n na ON c.vec_a = na.vec_id
        JOIN n nb ON c.vec_b = nb.vec_id
    )
    SELECT vec_a, vec_b, CAST(dot AS BIGINT) AS dot
    FROM scored
    WHERE dot > 0 AND dot * dot * {den} >= na2 * nb2 * {num}
    """.format(sig=sig, cap=MAX_BUCKET, num=COS_T2_NUM, den=COS_T2_DEN)


CENTROID_MIN_ID = 10  # centroid exemplars never come from query vectors
NPROBE = 5            # cells probed per query


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: a coarse quantizer partitions vectors into cells,
    each query probes its ``NPROBE`` nearest cells and searches only
    those inverted lists exactly.  This is the second scale path beside
    the LSH buckets: per-query work is |probed cells| x cell size
    instead of N, and the cell assignment is one broadcast of the
    centroid bank + a map-side argmax — no shuffle grows with the
    centroid count.

    The quantizer stands in for an offline-trained one, deterministically
    and engine-identically: one exemplar per known corpus cluster (the
    lowest non-query vec_id of each ``label``), so the DuckDB twin
    recomputes cells exactly; a production build k-means the centroids
    offline and broadcasts them the same way.  Cell assignment is exact
    int64 squared-Euclidean (a raw dot product favors long centroids);
    candidate scoring is the same exact int64 dot as the brute-force
    baseline.  Measured top-3 recall vs brute force at sf0.1:
    nprobe 3/4/5/6 -> 0.63/0.73/0.87/0.93 — the synthetic embeddings
    are only weakly clustered (top-3 neighbor dots ~0.4, labels
    scattered), so recall tracks the searched fraction; on a corpus
    with real cluster structure the same plan concentrates recall into
    few cells.  Default nprobe=5 (test_operators enforces >= 0.8)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = (spark.read.parquet(sf_dir + "/embeddings.parquet")
           .repartition(spark.sparkContext.defaultParallelism, "vec_id"))
    qcol = F.transform("embedding", lambda x: F.round(x * 1000).cast("long"))
    vecs = emb.select("vec_id", "label", qcol.alias("q")).cache()
    vecs.count()   # feeds centroids, assignment, probes and search
    cent_win = Window.partitionBy("label").orderBy(F.col("vec_id").asc())
    cents = (vecs.filter(F.col("vec_id") >= CENTROID_MIN_ID)
             .withColumn("r", F.row_number().over(cent_win))
             .filter(F.col("r") == 1)
             .select(F.col("label").alias("cent_id"), F.col("q").alias("cv")))
    # the quantizer is MODEL STATE (a handful of centroids): collect it
    # once and broadcast the numpy bank inside the assignment closure —
    # the round-4 scale lesson applies here too: the former
    # crossJoin(broadcast) + interpreted zip_with distance + per-vec_id
    # window was O(N*K*64) interpreted steps plus an N-partition window
    # (minutes at 1M vectors); the Arrow GEMM assigns in one pass
    cent_rows = sorted(cents.collect(), key=lambda r: r["cent_id"])
    cent_ids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
    C = np.array([r["cv"] for r in cent_rows], dtype=np.int64)
    c_norm = (C * C).sum(axis=1)  # |c|^2; |x|^2 is row-constant in argmin

    a_schema = T.StructType([T.StructField("vec_id", T.LongType()),
                             T.StructField("q", T.ArrayType(T.LongType())),
                             T.StructField("cent_id", T.IntegerType())])

    def assign(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            M = np.array(pdf["q"].tolist(), dtype=np.int64)
            # argmin_c |x-c|^2 == argmin_c (|c|^2 - 2 x.c); exact int64.
            # cent_ids ascend, so argmin's first-minimum tie-break IS the
            # lowest cent_id — same order the old window used
            d = c_norm[None, :] - 2 * (M @ C.T)
            best = np.argmin(d, axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values,
                                "q": pdf["q"].values,
                                "cent_id": cent_ids[best].astype(np.int32)})

    assigned = vecs.select("vec_id", "q").mapInPandas(assign, schema=a_schema)
    # query probes: top-NPROBE cells per query vector — a few rows, so
    # the declarative crossJoin + window formulation stays
    dist = F.aggregate(F.zip_with("q", "cv", lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)
    win = Window.partitionBy("vec_id").orderBy(
        F.col("cdist").asc(), F.col("cent_id").asc())
    probes = (vecs.filter(F.col("vec_id") < N_QUERIES)
              .crossJoin(F.broadcast(cents))
              .select("vec_id", "q", "cent_id", dist.alias("cdist"))
              .withColumn("r", F.row_number().over(win))
              .filter(F.col("r") <= NPROBE)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("q").alias("qv"), "cent_id"))
    # search only the probed inverted lists
    cand = (probes.join(assigned, "cent_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    _dot("qv", "q").alias("score"))
            .groupBy("query_id", "neighbor_id")   # de-dup multi-cell hits
            .agg(F.max("score").alias("score")))
    rank_win = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(rank_win))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "score",
                    F.col("rank").cast("long").alias("rank")))


ANN_IVF_SQL = """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(x*1000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    cents AS (
        SELECT label AS cent_id, qv AS cv FROM (
            SELECT e.label, q.qv,
                   row_number() OVER (PARTITION BY e.label
                                      ORDER BY e.vec_id ASC) AS r
            FROM embeddings e JOIN q ON e.vec_id = q.vec_id
            WHERE e.vec_id >= {base}
        ) WHERE r = 1
    ),
    scored_cells AS (
        SELECT q.vec_id, q.qv, c.cent_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY list_sum(list_transform(
                                      list_zip(q.qv, c.cv),
                                      p -> (p[1] - p[2]) * (p[1] - p[2])))
                                      ASC, c.cent_id ASC) AS r
        FROM q, cents c
    ),
    assigned AS (SELECT vec_id, qv, cent_id FROM scored_cells WHERE r = 1),
    probes AS (
        SELECT vec_id AS query_id, qv AS pqv, cent_id FROM scored_cells
        WHERE vec_id < {nq} AND r <= {np}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               max(list_sum(list_transform(list_zip(p.pqv, a.qv),
                                           z -> z[1] * z[2]))) AS score
        FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
        WHERE a.vec_id != p.query_id
        GROUP BY p.query_id, a.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id ASC) AS rank
        FROM cand
    )
    SELECT query_id, neighbor_id, CAST(score AS BIGINT) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
""".format(base=CENTROID_MIN_ID, nq=N_QUERIES, np=NPROBE, k=TOP_K)


QUERIES = {
    "ann_topk_bruteforce": (ann_topk_bruteforce, ANN_TOPK_SQL),
    "ann_lsh_bucket": (ann_lsh_bucket, ANN_LSH_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, _dedup_cosine_sql()),
}

"""Deterministic corpus sampling / quota operators.

Standard web-corpus training-data stages that sit next to dedup in a
100 TB pipeline:

* ``doc_split_stratified`` — reproducible train/val/test assignment by
  content-free hashing (md5 of the document id -> percentile bucket),
  reported stratified by language.  Pure map + a tiny-cardinality
  aggregate with map-side combine: one shuffle of |langs|x3 rows no
  matter the corpus size.

* ``doc_domain_cap`` — quota sampling: keep at most K documents per
  source/domain, chosen pseudo-randomly but deterministically (ordered
  by a per-doc md5 key).  The naive form is one ``row_number()`` window
  per domain — which at web scale dies on mega-domains (a single
  blogspot-sized key would serialize billions of rows through one
  task, and AQE's skew handling does NOT split window partitions).
  Implemented instead as an exact **two-phase top-K**: phase 1 ranks
  within (domain, salt) — S bounded sub-partitions per domain — and
  keeps K per sub-partition; phase 2 re-ranks the <= S*K survivors per
  domain and keeps K.  Top-K of the per-salt top-Ks always contains
  the global top-K, so the result is exactly the single-window answer
  (the DuckDB oracle computes it with one plain ``row_number()`` — an
  independent path), while the worst task ever sees max(rows-per-salt)
  ~ domain_size/S rows and the phase-2 input is bounded by S*K per
  domain.

Both use the repo's cross-engine md5->int recipe (15 hex chars ->
BIGINT), already oracle-validated by the dedup/minhash operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRAIN_PCT = 80      # hash-bucket < 80  -> train
VAL_PCT = 90        # hash-bucket < 90  -> val, else test
DOMAIN_CAP = 10     # max docs kept per source
SALTS = 8           # phase-1 sub-partitions per domain


def _hash_bucket(col):
    """Stable 0-99 bucket from md5 of a column (Spark side)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
            .cast("long") % 100)


def doc_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified report of the deterministic 80/10/10 split."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    bucket = _hash_bucket(F.col("doc_id"))
    split = (F.when(bucket < TRAIN_PCT, F.lit("train"))
             .when(bucket < VAL_PCT, F.lit("val"))
             .otherwise(F.lit("test")))
    return (docs.select("lang", split.alias("split"), "n_chars")
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


def doc_split_stratified_sql() -> str:
    return """
    WITH b AS (
        SELECT lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   %% 100 AS bucket
        FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < %d THEN 'train'
                WHEN bucket < %d THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY 1, 2
    """ % (TRAIN_PCT, VAL_PCT)


def doc_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep <= DOMAIN_CAP docs per source via skew-safe two-phase top-K
    (see module docstring); sort key = md5(doc_id) with doc_id tiebreak,
    so selection is pseudo-random yet replay-deterministic."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    hkey = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                   16, 10).cast("long"))
    salted = docs.select(
        "doc_id", "source", hkey.alias("hkey"),
        (F.pmod(F.hash("doc_id"), F.lit(SALTS))).alias("salt"))
    w1 = Window.partitionBy("source", "salt").orderBy("hkey", "doc_id")
    survivors = (salted
                 .withColumn("rn1", F.row_number().over(w1))
                 .filter(F.col("rn1") <= DOMAIN_CAP))
    w2 = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return (survivors
            .withColumn("keep_rank", F.row_number().over(w2))
            .filter(F.col("keep_rank") <= DOMAIN_CAP)
            .select("doc_id", "source", "keep_rank"))


def doc_domain_cap_sql() -> str:
    # independent path: ONE plain window — correct in DuckDB at oracle
    # scale, and exactly what the two-phase plan must reproduce
    return """
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                            doc_id
               ) AS keep_rank
        FROM documents
    )
    SELECT doc_id, source, keep_rank FROM ranked WHERE keep_rank <= %d
    """ % DOMAIN_CAP


QUERIES = {
    "doc_split_stratified": (doc_split_stratified, doc_split_stratified_sql()),
    "doc_domain_cap": (doc_domain_cap, doc_domain_cap_sql()),
}


# ---------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------

PACK_BUDGET = 4096  # tokens per packed training sequence


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to a fixed-token-budget training bin:
    documents stream in doc_id order into PACK_BUDGET-token sequences
    (concat-and-chunk packing; a doc belongs to the bin where its first
    token lands), i.e. ``bin = exclusive_prefix_sum(tokens) div budget``.

    The global running sum is the scale problem: one
    ``SUM() OVER (ORDER BY doc_id)`` window has no PARTITION BY, so
    Spark computes it in a SINGLE task — a non-starter at 100 TB.
    Implemented instead as a **distributed prefix sum**:

    1. deterministic monotone bucketing of doc_id into P ordered ranges
       (one O(1) max-id scalar pre-job, AQE-statistics-scale);
    2. local exclusive cumsum per bucket (window partitioned by pid);
    3. bucket totals — max inclusive prefix per pid, computed FROM the
       windowed branch so the pid exchange is shared — turned into
       bucket offsets by a window over that P-row frame and
       broadcast-joined back.

    The executed plan scans and shuffles the table ONCE (the totals
    branch is a ReusedExchange); every window is bounded by one
    bucket's rows.  The DuckDB oracle computes the same answer with
    the naive single global window — an independent path that is fine
    at oracle scale.
    """
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    # == size(filter(split(text,' '), w != '')) but lambda-free: higher-
    # order-function lambdas carry fresh variable ids that defeat plan
    # canonicalization, and without canonical equality Spark will not
    # reuse the pid exchange between the prefix and totals branches
    cost = F.regexp_count("text", F.lit("[^ ]+")).cast("long")
    par = max(spark.sparkContext.defaultParallelism, 8)
    # deterministic monotone bucketing (NOT spark_partition_id(): that is
    # a nondeterministic expression, which disqualifies the subtree from
    # exchange reuse and would force a second full scan+shuffle for the
    # totals branch).  One O(1) scalar pre-job — AQE-statistics-scale —
    # fixes the bucket boundaries
    max_id = docs.agg(F.max("doc_id")).first()[0] or 0
    sized = docs.select(
        "doc_id", cost.alias("n_tokens"),
        (F.col("doc_id") * par / (max_id + 1)).cast("int").alias("pid"))
    # pre-seed the join's IsNotNull(pid) in BOTH branches: otherwise the
    # null filter is pushed to the scan on the probe side only, the two
    # exchange subtrees stop being canonically equal, and the totals
    # branch re-scans and re-shuffles the whole table
    sized = sized.filter(F.col("pid").isNotNull())
    w_local = (Window.partitionBy("pid").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    local = sized.withColumn(
        "local_prefix", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)))
    # partition totals from the windowed branch itself (max of inclusive
    # prefix): the groupBy key equals the window partitioning, so Spark
    # reuses the pid exchange instead of re-scanning the table
    totals = (local
              .groupBy("pid")
              .agg(F.max(F.col("local_prefix") + F.col("n_tokens"))
                   .alias("ptotal")))
    w_off = (Window.orderBy("pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.withColumn(
        "poffset", F.coalesce(F.sum("ptotal").over(w_off), F.lit(0)))
    return (local.join(F.broadcast(offsets.select("pid", "poffset")), "pid")
            .select("doc_id", "n_tokens",
                    F.expr("(local_prefix + poffset) div %d" % PACK_BUDGET)
                    .alias("bin_id"),
                    ((F.col("local_prefix") + F.col("poffset"))
                     % PACK_BUDGET).alias("offset_in_bin")))


def pack_sequences_sql() -> str:
    return """
    WITH sized AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                   AS BIGINT) AS n_tokens
        FROM documents
    ),
    pfx AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS prefix
        FROM sized
    )
    SELECT doc_id, n_tokens,
           CAST(prefix // {budget} AS BIGINT) AS bin_id,
           CAST(prefix %% {budget} AS BIGINT) AS offset_in_bin
    FROM pfx
    """.format(budget=PACK_BUDGET) % ()


QUERIES["pack_sequences"] = (pack_sequences, pack_sequences_sql())


# ---------------------------------------------------------------------
# composed cleanse funnel
# ---------------------------------------------------------------------

MIN_CHARS = 200  # cleanse: minimum document length


def corpus_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard pretraining cleanse as ONE composed funnel —
    language filter -> length gate -> exact dedup (keep the smallest
    doc_id per md5 fingerprint) -> per-domain cap — reporting survivors
    per stage.

    Computed as a SINGLE-PASS flag pipeline rather than five chained
    sub-queries (which would scan the table five times for the five
    counts): each stage is a boolean column, dedup keepership is "my
    doc_id equals the min doc_id of stage-2 rows in my fingerprint
    partition" (one window), the domain cap is a running count of
    stage-3 survivors per source (one window), and the funnel is one
    conditional aggregation of the flags.  One scan, two bounded
    windows, one tiny agg — the DuckDB oracle recomputes it as the
    readable five-CTE chain, an independent path."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    f1 = F.col("lang") == "en"
    f2 = f1 & (F.col("n_chars") >= MIN_CHARS)
    flagged = docs.select(
        "doc_id", "source", f1.alias("f1"), f2.alias("f2"),
        F.md5("text").alias("fp"))
    w_fp = Window.partitionBy("fp")
    keeper_id = F.min(F.when(F.col("f2"), F.col("doc_id"))).over(w_fp)
    flagged = flagged.withColumn(
        "f3", F.col("f2") & (F.col("doc_id") == keeper_id))
    w_src = (Window.partitionBy("source").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, 0))
    kept_so_far = F.sum(F.when(F.col("f3"), 1).otherwise(0)).over(w_src)
    flagged = flagged.withColumn(
        "f4", F.col("f3") & (kept_so_far <= DOMAIN_CAP))
    agg = flagged.agg(
        F.count("*").alias("0_total"),
        F.sum(F.col("f1").cast("long")).alias("1_lang_en"),
        F.sum(F.col("f2").cast("long")).alias("2_min_len"),
        F.sum(F.col("f3").cast("long")).alias("3_dedup"),
        F.sum(F.col("f4").cast("long")).alias("4_domain_cap"))
    stack = ", ".join("'%s', `%s`" % (c, c) for c in agg.columns)
    return agg.select(F.expr(
        "stack(%d, %s) as (stage, n_docs)" % (len(agg.columns), stack)))


def corpus_cleanse_sql() -> str:
    return """
    WITH s1 AS (SELECT * FROM documents WHERE lang = 'en'),
    s2 AS (SELECT * FROM s1 WHERE n_chars >= {min_chars}),
    keeper AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text)),
    s3 AS (SELECT s2.* FROM s2 JOIN keeper USING (doc_id)),
    s4 AS (SELECT * FROM (
               SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
               FROM s3) WHERE rn <= {cap})
    SELECT stage, count(*) AS n_docs FROM (
        SELECT '0_total' AS stage, doc_id FROM documents
        UNION ALL SELECT '1_lang_en', doc_id FROM s1
        UNION ALL SELECT '2_min_len', doc_id FROM s2
        UNION ALL SELECT '3_dedup', doc_id FROM s3
        UNION ALL SELECT '4_domain_cap', doc_id FROM s4
    ) GROUP BY stage
    """.format(min_chars=MIN_CHARS, cap=DOMAIN_CAP)


QUERIES["corpus_cleanse"] = (corpus_cleanse, corpus_cleanse_sql())

"""Text analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

Everything stays in integer / single-division arithmetic so the DuckDB
oracle hashes identically (one IEEE division of identical operands is
deterministic across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# tiny inline stopword inventories for the n-gram/stopword language
# heuristic; real deployments broadcast full tables the same way
EN_STOPS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
ES_STOPS = ["el", "la", "de", "los", "las", "y", "en", "que", "un", "una"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (spark.read.parquet(sf_dir + "/documents.parquet")
            .repartition(spark.sparkContext.defaultParallelism, "doc_id"))


def _words(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("word"))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language guess: count hits per inventory, predict the
    winner (en on ties), with hit counts exposed for calibration."""
    words = _words(_docs(spark, sf_dir))
    en = F.sum(F.when(F.lower("word").isin(EN_STOPS), 1).otherwise(0))
    es = F.sum(F.when(F.lower("word").isin(ES_STOPS), 1).otherwise(0))
    return (words.groupBy("doc_id")
            .agg(en.alias("en_hits"), es.alias("es_hits"),
                 F.count("*").alias("n_words"))
            .select("doc_id", "en_hits", "es_hits", "n_words",
                    F.when(F.col("en_hits") >= F.col("es_hits"), "en")
                    .otherwise("es").alias("pred_lang")))


def _lang_id_sql() -> str:
    en = ", ".join("'%s'" % w for w in EN_STOPS)
    es = ", ".join("'%s'" % w for w in ES_STOPS)
    return """
    WITH words AS (
        SELECT doc_id, u.word
        FROM documents d,
             LATERAL (SELECT unnest(list_filter(string_split(d.text, ' '),
                                                x -> x != '')) AS word) u
    ),
    hits AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN lower(word) IN (%s) THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
               CAST(sum(CASE WHEN lower(word) IN (%s) THEN 1 ELSE 0 END) AS BIGINT) AS es_hits,
               count(*) AS n_words
        FROM words GROUP BY doc_id
    )
    SELECT doc_id, en_hits, es_hits, n_words,
           CASE WHEN en_hits >= es_hits THEN 'en' ELSE 'es' END AS pred_lang
    FROM hits
    """ % (en, es)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword quality signals + one composite
    ratio (single deterministic division)."""
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split("text", " "), lambda w: w != "")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(EN_STOPS)))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.regexp_count("text", F.lit(r"[.,;:!?]")).cast("long").alias("n_punct"),
        stop_hits.cast("long").alias("stop_hits"),
        (stop_hits.cast("double") / n_words.cast("double")).alias("stop_ratio"))


TEXT_QUALITY_SQL = """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
           CAST(len(list_filter(string_split(text, ' '),
                x -> lower(x) IN ({stops}))) AS BIGINT) AS stop_hits,
           CAST(len(list_filter(string_split(text, ' '),
                x -> lower(x) IN ({stops}))) AS DOUBLE)
             / CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS DOUBLE)
             AS stop_ratio
    FROM documents
""".format(stops=", ".join("'%s'" % w for w in EN_STOPS))


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens plus a BPE-ish regex token count
    (letter runs / digit runs / single other symbols)."""
    docs = _docs(spark, sf_dir)
    ws = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    bpe = F.regexp_count("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))
    return docs.select("doc_id",
                       ws.cast("long").alias("ws_tokens"),
                       bpe.cast("long").alias("bpe_tokens"))


TEXT_TOKEN_COUNT_SQL = r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT)
               AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
               AS BIGINT) AS bpe_tokens
    FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint for dedup/lineage joins."""
    docs = _docs(spark, sf_dir)
    normalized = F.regexp_replace(F.lower("text"), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).cast("long").alias("norm_len"))


TEXT_FINGERPRINT_SQL = r"""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
           CAST(length(regexp_replace(lower(text), '\s+', ' ', 'g')) AS BIGINT)
               AS norm_len
    FROM documents
"""


QUERIES = {
    "text_lang_id": (text_lang_id, _lang_id_sql()),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "text_token_count": (text_token_count, TEXT_TOKEN_COUNT_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
}

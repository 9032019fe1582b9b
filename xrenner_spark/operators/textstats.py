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
    # staged projection (the _ngram_frame rule): the word array is
    # referenced by three consumer columns, so it gets its own Project —
    # CollapseProject won't inline an expensive multi-referenced alias,
    # and each row splits once instead of ~5x
    staged = docs.select(
        "doc_id", "text",
        F.filter(F.split("text", " "), lambda w: w != "").alias("_w"))
    n_words = F.size("_w")
    stop_hits = F.size(F.filter(F.col("_w"),
                                lambda w: F.lower(w).isin(EN_STOPS)))
    return staged.select(
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


# ----------------------------------------------------------------------
# round 5: intra-document repetition + benchmark decontamination
# ----------------------------------------------------------------------

def _ngram_frame(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, grams): the document's word n-grams as an array column
    (empty when the doc has fewer than n words; the when() guard exists
    because sequence(1, k) DESCENDS for k < 1).  Built per ROW with
    higher-order functions — docs carry tens-to-thousands of tokens,
    far below the interpreted-HOF cliff (CLAUDE.md), and the map-side
    form needs NO shuffle, vs exploding every token into a corpus-wide
    window.

    STAGED projections: the word array and the bank each land in their
    own Project, referenced more than once downstream, so
    CollapseProject declines to inline them (it never duplicates an
    expensive multi-referenced alias) and every row computes the split
    ONCE and the bank ONCE.  The previous single-Project form built the
    bank once PER CONSUMER inside when() branches, where codegen
    subexpression elimination cannot reach — measured wall drop at 500k
    docs in BENCH/BASELINE.md.  Same rule as web.py's canonicalization:
    reference each deep subtree once."""
    words = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: w != "").alias("_w"))
    arr = F.col("_w")
    bank = F.when(
        F.size(arr) >= n,
        F.transform(F.sequence(F.lit(1), F.size(arr) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(arr, i, n)))
    ).otherwise(F.array().cast("array<string>"))
    return words.select("doc_id", bank.alias("grams"))


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition score: the fraction of
    duplicate word 3-grams, as an exact integer permille (single integer
    division — hashes identically in DuckDB).  Entirely map-side: the
    n-gram bank never leaves the row.

    Executed as a mapInPandas position (r6): the higher-order-function
    bank runs INTERPRETED per element (CLAUDE.md), and counting dup
    3-grams per row in CPython (C-level split/set) measured 2.5x faster
    at 50k docs (1.57 s -> 0.63 s interleaved A/B) with bit-identical
    integers — guide §4.2's batch-native-work regime.  Still no shuffle;
    only (doc_id, text) crosses the boundary."""
    from pyspark.sql import types as T

    docs = _docs(spark, sf_dir)
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("n_ngrams", T.LongType()),
                           T.StructField("n_distinct", T.LongType()),
                           T.StructField("dup_permille", T.LongType())])

    def run(it):
        import pandas as pd
        for pdf in it:
            ids, nn, nd, dp = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = [x for x in text.split(" ") if x != ""]
                n = len(w) - 2 if len(w) >= 3 else 0
                if n > 0:
                    d = len({" ".join(w[i:i + 3]) for i in range(n)})
                    p = (n - d) * 1000 // n
                else:
                    d = 0
                    p = 0
                ids.append(doc_id)
                nn.append(n)
                nd.append(d)
                dp.append(p)
            yield pd.DataFrame({"doc_id": ids, "n_ngrams": nn,
                                "n_distinct": nd, "dup_permille": dp})

    return docs.select("doc_id", "text").mapInPandas(run, schema)


TEXT_REPETITION_SQL = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS a
        FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(a) >= 3 THEN
                   list_transform(range(1, len(a) - 1),
                                  i -> array_to_string(list_slice(a, i, i + 2), ' '))
               ELSE [] END AS grams
        FROM arrs
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_ngrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CAST(CASE WHEN len(grams) > 0 THEN
                    (len(grams) - len(list_distinct(grams))) * 1000 // len(grams)
                ELSE 0 END AS BIGINT) AS dup_permille
    FROM g
"""


#: benchmark membership rule for the synthetic eval set: every 97th doc
DECONTAM_EVAL_MOD = 97
#: production decontamination uses ~13-grams; the small-sf testdata texts
#: are 10-99 words over a small vocabulary, so the pinned oracle uses 3
DECONTAM_NGRAM = 3


def corpus_decontaminate(spark: SparkSession, sf_dir: str,
                         n: int = DECONTAM_NGRAM) -> DataFrame:
    """Benchmark-decontamination screen: flag training documents sharing
    any word n-gram with the eval set (docs where doc_id %% 97 == 0 stand
    in for a held-out benchmark).  The eval n-gram bank is broadcast —
    eval sets are small by nature — so the scan side is one map-side
    broadcast hash join on exploded grams plus a partial-aggregated
    groupBy; no full-corpus shuffle of payloads."""
    docs = _docs(spark, sf_dir)
    grams = _ngram_frame(docs, n).select(
        "doc_id", F.explode("grams").alias("g"))
    eval_grams = (grams.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
                  .select("g").distinct())
    return (grams.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
            .join(F.broadcast(eval_grams), "g")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hits")))


# generated from DECONTAM_NGRAM so the oracle can NEVER diverge from the
# Spark side's default n (r5 advice); at n=3 the rendered text is
# byte-identical to the previous hardcoded form (pinned by
# test_decontaminate_sql_pinned)
CORPUS_DECONTAMINATE_SQL = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS a
        FROM documents
    ), grams AS (
        SELECT doc_id, array_to_string(list_slice(a, i, i + {hi}), ' ') AS g
        FROM arrs, LATERAL (SELECT unnest(range(1, greatest(len(a) - {lo}, 1))) AS i)
        WHERE len(a) >= {n}
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM grams c
    JOIN (SELECT DISTINCT g FROM grams WHERE doc_id %% 97 = 0) e USING (g)
    WHERE c.doc_id %% 97 != 0
    GROUP BY c.doc_id
""".format(hi=DECONTAM_NGRAM - 1, lo=DECONTAM_NGRAM - 2,
           n=DECONTAM_NGRAM).replace("%%", "%")


def text_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined driver query (catalog is pinned at the driver's 50-entry
    window — this row unions the text_repetition and
    corpus_decontaminate subplans verbatim in long format)."""
    rep = text_repetition(spark, sf_dir)
    dec = corpus_decontaminate(spark, sf_dir)
    return (rep.select("doc_id", F.lit("dup_permille").alias("metric"),
                       F.col("dup_permille").alias("value"))
            .unionAll(rep.select("doc_id", F.lit("n_ngrams").alias("metric"),
                                 F.col("n_ngrams").alias("value")))
            .unionAll(dec.select("doc_id",
                                 F.lit("decontam_hits").alias("metric"),
                                 F.col("n_hits").alias("value"))))


TEXT_HYGIENE_SQL = """
    WITH rep AS (%s), dec AS (%s)
    SELECT doc_id, 'dup_permille' AS metric, dup_permille AS value FROM rep
    UNION ALL
    SELECT doc_id, 'n_ngrams' AS metric, n_ngrams AS value FROM rep
    UNION ALL
    SELECT doc_id, 'decontam_hits' AS metric, n_hits AS value FROM dec
""" % (TEXT_REPETITION_SQL, CORPUS_DECONTAMINATE_SQL)


# ----------------------------------------------------------------------
# round 5: PII detection + redaction
# ----------------------------------------------------------------------

#: the three detector regexes — deliberately restricted to syntax with
#: IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB): character
#: classes, bounded repetition, \b word boundaries; no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: deterministic PII decoration of the test texts (they contain none):
#: every doc_id gets a variant-keyed suffix carrying known PII, written
#: identically in Spark SQL and DuckDB SQL — same device as web.py's
#: synthesized crawl
_PII_DECOR = (
    "CASE CAST(doc_id % 5 AS INT)"
    " WHEN 0 THEN ' contact alice.smith@Example-Mail.com now'"
    " WHEN 1 THEN concat(' call 415-555-', lpad(CAST(doc_id % 10000 AS"
    " {str}), 4, '0'), ' today')"
    " WHEN 2 THEN concat(' server 10.', CAST(doc_id % 256 AS {str}),"
    " '.0.1 down')"
    " WHEN 3 THEN concat(' mail bob@corp.example.org or 192.168.1.',"
    " CAST(doc_id % 200 AS {str}), ' fast')"
    " ELSE '' END")


def text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub — the standard pretraining redaction pass: count and
    redact emails, North-American phone numbers, and IPv4 literals.
    Counts run on the original text; redaction applies the three
    regexp_replace passes in a fixed order (email, phone, ip) and the
    md5 of the redacted text pins the full replacement semantics under
    the driver's hash (both engines' regexp_replace must agree on every
    byte).  Entirely map-side; at 100 TB this is a free rider on any
    scan that already reads the text column."""
    staged = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("concat(text, %s)" % _PII_DECOR.format(str="STRING"))
         .alias("_t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("_t"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>"),
        PII_IPV4, "<IP>")
    return staged.select(
        "doc_id",
        F.regexp_count("_t", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("_t", F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count("_t", F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"))


TEXT_PII_SQL = r"""
    WITH staged AS (
        SELECT doc_id, text || {decor} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{phone}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{ip}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(
               t, '{email}', '<EMAIL>', 'g'),
                  '{phone}', '<PHONE>', 'g'),
                  '{ip}', '<IP>', 'g')) AS redacted_md5
    FROM staged
""".format(decor=_PII_DECOR.format(str="VARCHAR"),
           # DuckDB string literals are standard SQL: backslashes pass
           # through verbatim, so the patterns embed unescaped
           email=PII_EMAIL, phone=PII_PHONE, ip=PII_IPV4)


QUERIES = {
    "text_lang_id": (text_lang_id, _lang_id_sql()),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "text_token_count": (text_token_count, TEXT_TOKEN_COUNT_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
    "text_hygiene": (text_hygiene, TEXT_HYGIENE_SQL),
    "text_pii": (text_pii, TEXT_PII_SQL),
}

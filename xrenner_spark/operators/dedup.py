"""Deduplication operators: exact hash, MinHash+LSH, SimHash, n-gram
Jaccard.

All hashing is md5-based so the DuckDB oracle computes bit-identical
values; similarity scores stay in exact integer arithmetic wherever a
float could diverge between engines.

Scale notes (100 TB design):
- exact: one shuffle on the 16-byte content hash (map-side combine).
- minhash: shingling + signature aggregation are map-side per doc; the
  only shuffle is the band-key self-join, whose fan-out is bounded by
  band-bucket sizes (skewed buckets are handled by AQE skew-join).
- shingle self-join (exact jaccard) is the expensive path and is only
  run on LSH candidates at scale; here it doubles as its own oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_HASHES = 8
BAND_SIZE = 2  # 4 bands of 2 -> candidate if any band matches


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # small single-file parquet arrives as one split; spread the map-side
    # work over the cluster (a real corpus arrives pre-split)
    return (spark.read.parquet(sf_dir + "/documents.parquet")
            .repartition(spark.sparkContext.defaultParallelism, "doc_id"))


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct 3-word shingles per document (JVM-side array ops).
    The word array is materialized once per row so the shingle lambda does
    not re-split the text per element."""
    with_words = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias("words"))
    words = F.col("words")
    tri = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 3),
            lambda i: F.concat_ws(" ", F.element_at(words, i + 1),
                                  F.element_at(words, i + 2),
                                  F.element_at(words, i + 3)))
    ).otherwise(F.array().cast("array<string>"))
    return (with_words.select("doc_id", F.explode(tri).alias("shingle"))
            .distinct())


_SHINGLES_SQL = """
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(words) - 1, 1)),
                  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x != '') AS words
          FROM documents)
    WHERE len(words) >= 3
"""


# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_docs(spark, sf_dir)
            .groupBy(F.md5("text").alias("content_hash"))
            .agg(F.count("*").alias("n_copies"),
                 F.min("doc_id").alias("keep_doc_id"))
            .select("content_hash", "n_copies", "keep_doc_id"))


DEDUP_EXACT_SQL = """
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
"""


# ---------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------

def _signatures(shingles: DataFrame) -> DataFrame:
    aggs = [F.min(F.md5(F.concat(F.lit(str(seed) + "|"), F.col("shingle"))))
            .alias("mh%d" % seed) for seed in range(N_HASHES)]
    return shingles.groupBy("doc_id").agg(*aggs)


def _signatures_sql() -> str:
    mins = ", ".join(
        "min(md5('%d|' || shingle)) AS mh%d" % (seed, seed) for seed in range(N_HASHES))
    return "SELECT doc_id, %s FROM shingles GROUP BY doc_id" % mins


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash signatures, with
    the estimated Jaccard (matching minhash fraction) per pair."""
    sigs = _signatures(_shingles(_docs(spark, sf_dir))).cache()
    sigs.count()  # materialize: reused by 4 band views and both join sides
    bands = None
    for band in range(N_HASHES // BAND_SIZE):
        cols = ["mh%d" % (band * BAND_SIZE + j) for j in range(BAND_SIZE)]
        b = sigs.select(
            "doc_id",
            F.md5(F.concat_ws("\x1f", F.lit(str(band)), *cols)).alias("band_key"))
        bands = b if bands is None else bands.unionAll(b)
    left = bands.alias("a")
    right = bands.alias("b")
    pairs = (left.join(right, (F.col("a.band_key") == F.col("b.band_key"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    matches = sum(
        F.when(F.col("sa.mh%d" % i) == F.col("sb.mh%d" % i), 1).otherwise(0)
        for i in range(N_HASHES))
    return (pairs
            .join(sa, pairs.doc_a == F.col("sa.doc_id"))
            .join(sb, pairs.doc_b == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", matches.cast("long").alias("sig_matches")))


def dedup_minhash_sql() -> str:
    bands = "\nUNION ALL\n".join(
        "SELECT doc_id, md5('%d' || chr(31) || mh%d || chr(31) || mh%d) AS band_key FROM sigs"
        % (band, band * BAND_SIZE, band * BAND_SIZE + 1)
        for band in range(N_HASHES // BAND_SIZE))
    matches = " + ".join(
        "CASE WHEN sa.mh%d = sb.mh%d THEN 1 ELSE 0 END" % (i, i)
        for i in range(N_HASHES))
    return """
    WITH shingles AS (%s),
    sigs AS (%s),
    bands AS (%s),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b, CAST(%s AS BIGINT) AS sig_matches
    FROM pairs p
    JOIN sigs sa ON p.doc_a = sa.doc_id
    JOIN sigs sb ON p.doc_b = sb.doc_id
    """ % (_SHINGLES_SQL, _signatures_sql(), bands, matches)


# ---------------------------------------------------------------------
# SimHash (16-bit, exact integer arithmetic)
# ---------------------------------------------------------------------

def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = (docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("word")))
    h = F.conv(F.substring(F.md5("word"), 1, 15), 16, 10).cast("long")
    bit_aggs = [
        F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias("s%d" % b)
        for b in range(16)]
    per_doc = words.groupBy("doc_id").agg(*bit_aggs)
    sim = None
    for b in range(16):
        term = F.when(F.col("s%d" % b) > 0, 1 << b).otherwise(0)
        sim = term if sim is None else sim + term
    return per_doc.select("doc_id", sim.cast("long").alias("simhash16"))


def dedup_simhash_sql() -> str:
    bit_aggs = ", ".join(
        "sum(((h >> %d) & 1) * 2 - 1) AS s%d" % (b, b) for b in range(16))
    sim = " + ".join(
        "CASE WHEN s%d > 0 THEN %d ELSE 0 END" % (b, 1 << b) for b in range(16))
    return """
    WITH words AS (
        SELECT doc_id, u.word
        FROM documents d,
             LATERAL (SELECT unnest(list_filter(string_split(d.text, ' '),
                                                x -> x != '')) AS word) u
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM words
    ),
    bits AS (SELECT doc_id, %s FROM hashed GROUP BY doc_id)
    SELECT doc_id, CAST(%s AS BIGINT) AS simhash16 FROM bits
    """ % (bit_aggs, sim)


# ---------------------------------------------------------------------
# exact n-gram Jaccard over shingle sets
# ---------------------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(_docs(spark, sf_dir)).cache()
    sh.count()  # materialize: reused by sizes and both self-join sides
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (inter
            .join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", "inter",
                    (F.col("sa.n") + F.col("sb.n") - F.col("inter")).alias("union_n"))
            .filter(F.col("inter") * 5 >= F.col("union_n"))  # jaccard >= 0.2
            .select("doc_a", "doc_b", "inter", "union_n"))


def dedup_ngram_jaccard_sql() -> str:
    return """
    WITH shingles AS (%s),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS union_n
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 5 >= sa.n + sb.n - inter
    """ % _SHINGLES_SQL


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, dedup_minhash_sql()),
    "dedup_simhash": (dedup_simhash, dedup_simhash_sql()),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, dedup_ngram_jaccard_sql()),
}

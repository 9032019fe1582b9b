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
  N_HASHES/BAND_SIZE are arguments — the defaults are the oracle-checked
  toy config; a production run passes 64-128 hashes (see
  BENCH/BASELINE.md for the 64-hash smoke numbers).
- the all-pairs shingle self-join (dedup_ngram_jaccard) explodes on
  high-df shingles and exists as the small-sf oracle twin only;
  dedup_jaccard_verify is the scale path: exact Jaccard computed ONLY
  over the minhash-LSH candidate pairs (verify-after-LSH), with a
  document-frequency cap dropping boilerplate shingles, so join fan-out
  is bounded by |candidates| * shingles-per-doc.
- dedup_simhash_pairs completes SimHash with the neighbour-pairing
  stage: band the 16-bit signature, bucket-join, exact hamming filter.
"""

from __future__ import annotations

import hashlib
import logging

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._sizing import parquet_rows

_LOG = logging.getLogger(__name__)

N_HASHES = 8
BAND_SIZE = 2   # 4 bands of 2 -> candidate if any band matches
MAX_DF = 100    # jaccard_verify: drop shingles in more docs than this
HAM_MAX = 3     # simhash_pairs: near-dup threshold (16-bit signature)

# minhash permutations: ONE md5 per shingle, then cheap integer mixes
# ((h*A_i + B_i) mod M) per permutation — 64 string-md5 min-aggregations
# measured 25x slower at 64 hashes.  M = 2^31-1 keeps every product
# below 2^62 (overflow-safe int64 in both engines); A/B are seeded md5
# constants so Spark and DuckDB compute bit-identical signatures.
MINHASH_PRIME = (1 << 31) - 1


def _mix_consts(i: int):
    d = hashlib.md5(("mh|%d" % i).encode("utf8")).digest()
    a = (int.from_bytes(d[:4], "big") % (MINHASH_PRIME - 1)) + 1
    b = int.from_bytes(d[4:8], "big") % MINHASH_PRIME
    return a, b


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
    # reads the table directly (no _docs pre-repartition, r6): the only
    # map-side work is one md5 per row before the partial aggregation,
    # so spreading the single-file scan first just shuffled every text
    # payload once for nothing — 0.74 s -> 0.44 s at 50k docs; a real
    # corpus arrives pre-split and hits the same plan
    return (spark.read.parquet(sf_dir + "/documents.parquet")
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

def _signatures(shingles: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    h = (F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
         % MINHASH_PRIME)
    hashed = shingles.select("doc_id", h.alias("h"))
    aggs = []
    for seed in range(n_hashes):
        a, b = _mix_consts(seed)
        aggs.append(F.min((F.col("h") * a + b) % MINHASH_PRIME)
                    .alias("mh%d" % seed))
    return hashed.groupBy("doc_id").agg(*aggs)


def _signatures_sql(n_hashes: int = N_HASHES) -> str:
    mins = ", ".join(
        "min((h * %d + %d) %% %d) AS mh%d"
        % (_mix_consts(seed) + (MINHASH_PRIME, seed)) for seed in range(n_hashes))
    return ("SELECT doc_id, %s FROM (SELECT doc_id, "
            "(('0x' || substr(md5(shingle), 1, 15))::BIGINT %% %d) AS h "
            "FROM shingles) GROUP BY doc_id" % (mins, MINHASH_PRIME))


def _band_pairs(sigs: DataFrame, n_hashes: int, band_size: int) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs whose signatures agree on
    at least one band.  ``sigs`` must be materialized by the caller (it
    feeds the band view and both join sides).

    Band rows come from ONE pass (explode of the per-band key array)
    instead of the former n_bands-way unionAll, which scanned the cached
    signature table once per band (r6; identical (doc_id, band_key)
    multiset — same md5 over the same concatenation)."""
    band_keys = F.array(*[
        F.md5(F.concat_ws(
            "\x1f", F.lit(str(band)),
            *["mh%d" % (band * band_size + j) for j in range(band_size)]))
        for band in range(n_hashes // band_size)])
    bands = sigs.select("doc_id", F.explode(band_keys).alias("band_key"))
    left = bands.alias("a")
    right = bands.alias("b")
    return (left.join(right, (F.col("a.band_key") == F.col("b.band_key"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str,
                      n_hashes: int = N_HASHES,
                      band_size: int = BAND_SIZE) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash signatures, with
    the estimated Jaccard (matching minhash fraction) per pair.  The
    defaults are the toy oracle config; production passes 64-128 hashes
    (the banding controls the precision/recall point of the candidate
    sieve — more bands of fewer rows raises recall)."""
    sigs = _signatures(_shingles(_docs(spark, sf_dir)), n_hashes).cache()
    sigs.count()  # materialize: reused by every band view and both join sides
    pairs = _band_pairs(sigs, n_hashes, band_size)
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    matches = sum(
        F.when(F.col("sa.mh%d" % i) == F.col("sb.mh%d" % i), 1).otherwise(0)
        for i in range(n_hashes))
    return (pairs
            .join(sa, pairs.doc_a == F.col("sa.doc_id"))
            .join(sb, pairs.doc_b == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", matches.cast("long").alias("sig_matches")))


def _bands_sql(n_hashes: int, band_size: int) -> str:
    return "\nUNION ALL\n".join(
        "SELECT doc_id, md5('%d' || %s) AS band_key FROM sigs"
        % (band, " || ".join("chr(31) || mh%d" % (band * band_size + j)
                             for j in range(band_size)))
        for band in range(n_hashes // band_size))


_PAIRS_SQL = """
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def dedup_minhash_sql(n_hashes: int = N_HASHES, band_size: int = BAND_SIZE) -> str:
    matches = " + ".join(
        "CASE WHEN sa.mh%d = sb.mh%d THEN 1 ELSE 0 END" % (i, i)
        for i in range(n_hashes))
    return """
    WITH shingles AS (%s),
    sigs AS (%s),
    bands AS (%s),
    pairs AS (%s)
    SELECT p.doc_a, p.doc_b, CAST(%s AS BIGINT) AS sig_matches
    FROM pairs p
    JOIN sigs sa ON p.doc_a = sa.doc_id
    JOIN sigs sb ON p.doc_b = sb.doc_id
    """ % (_SHINGLES_SQL, _signatures_sql(n_hashes),
           _bands_sql(n_hashes, band_size), _PAIRS_SQL, matches)


# ---------------------------------------------------------------------
# SimHash (16-bit, exact integer arithmetic)
# ---------------------------------------------------------------------

def _simhash(docs: DataFrame, n_bits: int, out_col: str) -> DataFrame:
    """Per-document SimHash of ``n_bits`` (exact integer arithmetic; the
    15-hex md5 prefix supplies up to 60 usable bits).

    Computed map-side in one Arrow position (r6): the former
    explode + n_bits-sum groupBy shuffled one row per WORD (2.5M rows at
    50k docs) to reassemble what is a purely per-document value; here
    nothing leaves the row and the bit arithmetic is one vectorized
    numpy pass per doc.  Integers are bit-identical: the same md5 UTF-8
    hex prefix, the same ±1 sums, the same >0 combine (verified by the
    unchanged DuckDB oracle hash)."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField(out_col, T.LongType())])

    #: giant-page guard: the per-doc bit matrix is built in word chunks so
    #: a pathological multi-million-word page costs O(CHUNK x n_bits)
    #: memory, not O(words x n_bits) — integer sums are associative, so
    #: chunked accumulation is bit-identical (r6 review fix)
    CHUNK = 65536

    def run(it):
        import hashlib
        import numpy as np
        import pandas as pd
        shifts = np.arange(n_bits, dtype=np.int64)
        powers = (np.int64(1) << shifts)
        for pdf in it:
            ids, sims = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = [x for x in text.split(" ") if x != ""]
                if not w:
                    continue  # the explode+groupBy form emitted no row
                sums = np.zeros(n_bits, dtype=np.int64)
                for lo in range(0, len(w), CHUNK):
                    hs = np.array(
                        [int(hashlib.md5(x.encode("utf8")).hexdigest()[:15],
                             16) for x in w[lo:lo + CHUNK]], dtype=np.int64)
                    sums += (2 * ((hs[:, None] >> shifts[None, :]) & 1) - 1) \
                        .sum(axis=0)
                ids.append(doc_id)
                sims.append(int((powers * (sums > 0)).sum()))
            yield pd.DataFrame({"doc_id": ids, out_col: sims})

    return docs.select("doc_id", "text").mapInPandas(run, schema)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash(_docs(spark, sf_dir), 16, "simhash16")


_SIMHASH_BIT_AGGS = ", ".join(
    "sum(((h >> %d) & 1) * 2 - 1) AS s%d" % (b, b) for b in range(16))
_SIMHASH_COMBINE = " + ".join(
    "CASE WHEN s%d > 0 THEN %d ELSE 0 END" % (b, 1 << b) for b in range(16))


def dedup_simhash_sql() -> str:
    bit_aggs = _SIMHASH_BIT_AGGS
    sim = _SIMHASH_COMBINE
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

#: dedup_ngram_jaccard is the all-pairs oracle twin of
#: dedup_jaccard_verify and is QUADRATIC on hot shingles by design; the
#: guard keeps it from ever being pointed at a web-scale corpus by
#: accident.  Every oracle sf (500 / 5,000 / 50,000 docs) is far below.
NGRAM_ALLPAIRS_MAX_DOCS = 100_000


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_docs = parquet_rows(sf_dir + "/documents.parquet",
                          fallback_df=spark.read.parquet(
                              sf_dir + "/documents.parquet"))
    if n_docs > NGRAM_ALLPAIRS_MAX_DOCS:
        raise ValueError(
            "dedup_ngram_jaccard is the all-pairs small-sf oracle twin "
            "(quadratic on hot shingles) and refuses %d docs "
            "(> %d); use dedup_jaccard_verify — the LSH-candidate-"
            "restricted exact-Jaccard scale path — instead"
            % (n_docs, NGRAM_ALLPAIRS_MAX_DOCS))
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


# ---------------------------------------------------------------------
# verify-after-LSH: exact Jaccard restricted to minhash candidate pairs
# ---------------------------------------------------------------------

def dedup_jaccard_verify(spark: SparkSession, sf_dir: str,
                         max_df: int = MAX_DF) -> DataFrame:
    """The scale path for exact n-gram Jaccard: compute it ONLY over the
    minhash-LSH candidate pairs (the all-pairs shingle self-join in
    dedup_ngram_jaccard is quadratic on hot shingles).  Shingles present
    in more than ``max_df`` documents are dropped first — boilerplate
    n-grams contribute no dedup signal and are exactly the hot join keys.
    Worst-case fan-out is |candidate pairs| * shingles-per-doc."""
    sh = _shingles(_docs(spark, sf_dir)).cache()
    sh.count()  # materialize: feeds signatures, df counts, and both pair sides
    hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
           .filter(F.col("df") > max_df).select("shingle"))
    kept = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sigs = _signatures(sh)
    pairs = _band_pairs(sigs, N_HASHES, BAND_SIZE)
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = kept.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = kept.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (pairs.join(sha, "doc_a").join(shb, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    # candidate pairs with zero surviving shared shingles drop out of
    # ``inter`` (inner join) — LSH false positives verified away
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (inter
            .join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", "inter",
                    (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
                    .alias("union_n"))
            .filter(F.col("inter") * 5 >= F.col("union_n")))


def dedup_jaccard_verify_sql(max_df: int = MAX_DF) -> str:
    return """
    WITH shingles AS (%s),
    kept AS (
        SELECT doc_id, shingle FROM shingles
        WHERE shingle IN (SELECT shingle FROM shingles
                          GROUP BY shingle HAVING count(*) <= %d)
    ),
    sigs AS (%s),
    bands AS (%s),
    pairs AS (%s),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS inter
        FROM pairs p
        JOIN kept a ON a.doc_id = p.doc_a
        JOIN kept b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.inter, sa.n + sb.n - i.inter AS union_n
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.inter * 5 >= sa.n + sb.n - i.inter
    """ % (_SHINGLES_SQL, max_df, _signatures_sql(N_HASHES),
           _bands_sql(N_HASHES, BAND_SIZE), _PAIRS_SQL)


# ---------------------------------------------------------------------
# SimHash neighbour pairing: band the signature, bucket-join, exact
# hamming filter (completes the simhash dedup path — signatures alone
# can't pair)
# ---------------------------------------------------------------------

#: docs above this count use the 60-bit scale signature; every test sf
#: (500 / 5,000 docs) stays on the oracle-pinned 16-bit configuration
SIMHASH_SCALE_THRESHOLD = 10_000
SIMHASH_SCALE_BITS = 60    # 4 bands x 15 bits -> 32k band-join keys


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str,
                        ham_max: int = HAM_MAX,
                        n_bits: "int | None" = None) -> DataFrame:
    """Near-duplicate pairs by SimHash: 4 bands — any pair within
    hamming distance 3 must agree on at least one band (pigeonhole), so
    the band bucket-join loses no true pair; exact popcount(xor) then
    filters.  One shuffle per side of the band join.

    ``n_bits`` is the signature width — the semantic knob: hamming<=3
    over 60 bits is a far stricter near-dup criterion than over 16.
    When left None it defaults by corpus size (round-5 advice fix: the
    switch is now an explicit, logged parameter rather than an
    invisible inference, and the size probe reads the parquet footer
    instead of paying a count() job): the 16-bit demo signature has
    only 4-bit bands = 64 join keys total, so at ANY large N every key
    is hot and the self-join goes quadratic (round-4 measurement: 50k
    templated docs -> 281M emitted pairs, 2 min; 500k would not
    finish).  Above SIMHASH_SCALE_THRESHOLD the default widens to 60
    bits (15-bit bands, 32k keys) — expected band occupancy N/2^15,
    AQE skew-join splitting whatever residual hot keys boilerplate
    creates.  Every test sf stays on the oracle-pinned 16-bit
    configuration.  Note the output is still honestly quadratic in
    true-duplicate cluster size (a 100-copy document yields C(100,2)
    pairs — that is the operator's contract); the production funnel
    runs exact dedup first (corpus_cleanse)."""
    docs = _docs(spark, sf_dir)
    if n_bits is None:
        n_docs = parquet_rows(sf_dir + "/documents.parquet",
                              fallback_df=docs)
        n_bits = SIMHASH_SCALE_BITS if n_docs > SIMHASH_SCALE_THRESHOLD \
            else 16
        _LOG.info("dedup_simhash_pairs: N=%d docs -> %d-bit signature "
                  "(hamming<=%d; pass n_bits= to pin the regime)",
                  n_docs, n_bits, ham_max)
    if n_bits % 4 != 0 or not 4 <= n_bits <= 60:
        raise ValueError("n_bits must be a multiple of 4 in [4, 60] "
                         "(4 bands; 15-hex md5 prefix = 60 usable bits), "
                         "got %r" % (n_bits,))
    band_bits = n_bits // 4
    band_mask = (1 << band_bits) - 1
    sims = _simhash(docs, n_bits, "sig").cache()
    sims.count()  # materialize: feeds 4 band views on both join sides
    bands = None
    for band in range(4):
        b = sims.select(
            "doc_id", "sig", F.lit(band).alias("band"),
            F.shiftright("sig", band * band_bits)
            .bitwiseAND(F.lit(band_mask)).alias("band_val"))
        bands = b if bands is None else bands.unionAll(b)
    pairs = (bands.alias("a")
             .join(bands.alias("b"),
                   (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_val") == F.col("b.band_val"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sig").alias("sim_a"),
                     F.col("b.sig").alias("sim_b"))
             .distinct())
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (pairs.select("doc_a", "doc_b",
                         hamming.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= ham_max))


def dedup_simhash_pairs_sql(ham_max: int = HAM_MAX) -> str:
    bands = "\nUNION ALL\n".join(
        "SELECT doc_id, simhash16, %d AS band, (simhash16 >> %d) & 15 AS band_val"
        " FROM sims" % (band, band * 4) for band in range(4))
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
    bits AS (SELECT doc_id, %s FROM hashed GROUP BY doc_id),
    sims AS (SELECT doc_id, CAST(%s AS BIGINT) AS simhash16 FROM bits),
    bands AS (%s),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash16 AS sim_a, b.simhash16 AS sim_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
    FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= %d
    """ % (_SIMHASH_BIT_AGGS, _SIMHASH_COMBINE, bands, ham_max)


def dedup_cluster_assign(spark: SparkSession, sf_dir: str,
                         max_iters: int = 16,
                         verified_pairs: "DataFrame | None" = None
                         ) -> DataFrame:
    """Duplicate-CLUSTER assignment: connected components over the
    VERIFIED near-dup pair graph (minhash-LSH candidates confirmed by
    exact Jaccard — dedup_jaccard_verify), then one canonical document
    per component (the keep-one step a training-data pipeline runs
    after pair detection — pairs alone over-delete transitive groups).
    Clustering runs on verified pairs, not raw sketch collisions: a
    16-bit simhash pair graph measured as ONE giant component at 5k
    docs (hash collisions chain transitively), while verified pairs
    stay sparse and components stay small.

    Components via iterative min-label propagation: each round is one
    co-keyed join (neighbor labels) + a map-side-combinable min
    aggregation over a monotonically DECREASING label multiset, so
    convergence is detected with a single sum() aggregate per round —
    no exceptAll, no distinct.  Round count is bounded by the component
    diameter (near-dup clusters are quasi-cliques, diameter 1-3;
    max_iters=16 is a hard cap), independent of corpus size — the same
    scaling argument as the tree-closure operator.  At 100 TB this is
    the standard label-propagation CC pattern: labels and edges shuffle
    on doc_id, AQE coalesces the shrinking frontier.

    ``verified_pairs`` lets a pipeline that already ran the verify
    funnel hand its (doc_a, doc_b) output in directly (round-5 fix: at
    500k docs the standalone recompute was ~40 s of the operator's
    62-83 s wall).  Either way the symmetric edge list is materialized
    ONCE (eager localCheckpoint) before the CC loop, so no round — and
    no label-lineage reset — re-executes the funnel."""
    pairs = verified_pairs if verified_pairs is not None \
        else dedup_jaccard_verify(spark, sf_dir)
    edges = (pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
             .unionAll(pairs.select(F.col("doc_b").alias("src"),
                                    F.col("doc_a").alias("dst")))
             ).localCheckpoint(eager=True)
    docs = spark.read.parquet(sf_dir + "/documents.parquet").select("doc_id")
    # eager localCheckpoint per round truncates the iterative lineage.
    # persist()+unpersist() is a TRAP here: unpersisting the previous
    # round's labels cascades (Spark uncaches dependent cached plans),
    # so every round silently recomputed its whole history — measured
    # 1.3s -> 168s per-round blowup by iteration 4.  On a real cluster
    # prefer reliable checkpoint(dir) over localCheckpoint for fault
    # tolerance; the algorithm is identical.
    labels = docs.select("doc_id", F.col("doc_id").alias("label")) \
        .localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        neighbor = (edges.join(labels, edges.dst == labels.doc_id)
                    .select(F.col("src").alias("doc_id"), "label"))
        labels = (labels.unionAll(neighbor)
                  .groupBy("doc_id").agg(F.min("label").alias("label"))
                  .localCheckpoint(eager=True))
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:   # min-labels decrease monotonically
            break
        prev_sum = new_sum
    return labels.select(
        "doc_id", F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_canonical"))


def dedup_cluster_assign_sql(max_df: int = MAX_DF) -> str:
    """DuckDB twin: bounded transitive closure over the symmetric pair
    graph via WITH RECURSIVE (UNION-deduplicated, so it terminates),
    component id = min reachable doc_id."""
    pairs_sql = dedup_jaccard_verify_sql(max_df)
    return """
    WITH RECURSIVE pairs AS (%s),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    )
    SELECT src AS doc_id, min(dst) AS cluster_id,
           (src = min(dst)) AS is_canonical
    FROM reach GROUP BY src
    """ % pairs_sql


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, dedup_minhash_sql()),
    "dedup_simhash": (dedup_simhash, dedup_simhash_sql()),
    "dedup_simhash_pairs": (dedup_simhash_pairs, dedup_simhash_pairs_sql()),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, dedup_ngram_jaccard_sql()),
    "dedup_jaccard_verify": (dedup_jaccard_verify, dedup_jaccard_verify_sql()),
    "dedup_cluster_assign": (dedup_cluster_assign, dedup_cluster_assign_sql()),
}

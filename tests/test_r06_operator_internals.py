"""Focused pins for the round-6 operator-internal optimizations.

The DuckDB oracle rows already pin end-to-end values; these tests pin the
internal contracts the optimizations introduced: the int16 packing guard,
coarse-vs-fine scorer-group equivalence, and the edge rows of the
map-side rewrites.
"""

import numpy as np
import pandas as pd
import pytest

from xrenner_spark.operators import similarity as S


def test_bucketed_int16_guard_raises(spark):
    """A quantized component beyond int16 must fail loudly, not wrap."""
    from pyspark.sql import types as T
    rows = [{"vec_id": 0, "q": [40000] + [0] * (S.EMB_DIM - 1)},
            {"vec_id": 1, "q": [1] * S.EMB_DIM}]
    schema = T.StructType([T.StructField("vec_id", T.LongType()),
                           T.StructField("q", T.ArrayType(T.LongType()))])
    df = spark.createDataFrame(rows, schema=schema)
    with pytest.raises(Exception, match="int16 packing contract"):
        S._bucketed(df, S.N_BITS).collect()


def test_grouped_apply_coarse_equals_fine(spark):
    """_score_buckets_topk must emit the identical multiset whether Spark
    groups per bucket (n_sub=None) or per coarse pmod subkey."""
    import hashlib
    rows = []
    for i in range(200):
        h = hashlib.md5(b"v%d" % i).digest()
        q = [(h[j % 16] % 401) - 200 for j in range(S.EMB_DIM)]
        rows.append({"vec_id": i, "q": q})
    vecs = spark.createDataFrame(pd.DataFrame(rows))
    b = S._bucketed(vecs.selectExpr("vec_id", "transform(q, x -> CAST(x AS LONG)) AS q"),
                    S.N_BITS)
    fine = sorted(map(tuple, S._score_buckets_topk(b, S.TOP_K).collect()))
    coarse = sorted(map(tuple,
                        S._score_buckets_topk(b, S.TOP_K, n_sub=7).collect()))
    assert fine == coarse and len(fine) > 0


def test_simhash_python_matches_reference_arithmetic():
    """The numpy bit pass must reproduce the md5-prefix/±1-sum/>0-combine
    arithmetic exactly (hand-computed for a two-word doc)."""
    import hashlib
    from xrenner_spark.operators.dedup import _simhash  # noqa: F401
    words = ["alpha", "beta"]
    hs = [int(hashlib.md5(w.encode("utf8")).hexdigest()[:15], 16)
          for w in words]
    expect = 0
    for b in range(16):
        s = sum(((h >> b) & 1) * 2 - 1 for h in hs)
        if s > 0:
            expect += 1 << b
    # replicate the vectorized path standalone
    shifts = np.arange(16, dtype=np.int64)
    arr = np.array(hs, dtype=np.int64)
    sums = (2 * ((arr[:, None] >> shifts[None, :]) & 1) - 1).sum(axis=0)
    got = int(((np.int64(1) << shifts) * (sums > 0)).sum())
    assert got == expect


def test_simhash_skips_wordless_docs(spark):
    from xrenner_spark.operators.dedup import _simhash
    docs = spark.createDataFrame(pd.DataFrame(
        [{"doc_id": 1, "text": "alpha beta"}, {"doc_id": 2, "text": "  "},
         {"doc_id": 3, "text": ""}]))
    out = _simhash(docs, 16, "simhash16").collect()
    # the former explode+groupBy emitted no row for wordless docs
    assert sorted(r.doc_id for r in out) == [1]


def test_text_repetition_short_doc_rows(spark, tmp_path):
    """Docs under 3 words emit (0, 0, 0) — same as the former HOF bank."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                    "text": ["one two", "a a a a"]})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))
    from xrenner_spark.operators.textstats import text_repetition
    rows = {r.doc_id: (r.n_ngrams, r.n_distinct, r.dup_permille)
            for r in text_repetition(spark, str(sf)).collect()}
    assert rows[1] == (0, 0, 0)
    assert rows[2] == (2, 1, 500)


def test_minhash_band_explode_matches_union_form(spark, tmp_path):
    """The single-explode band generation must produce the same
    (doc_id, band_key) multiset as the former per-band unionAll."""
    from pyspark.sql import functions as F
    from xrenner_spark.operators.dedup import (BAND_SIZE, N_HASHES,
                                               _shingles, _signatures)
    import pyarrow as pa
    import pyarrow.parquet as pq
    texts = ["the quick brown fox jumps over the lazy dog extra pad %d" % (i % 3)
             for i in range(20)]
    tbl = pa.table({"doc_id": pa.array(range(20), type=pa.int64()),
                    "text": texts})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))
    docs = spark.read.parquet(str(sf / "documents.parquet"))
    sigs = _signatures(_shingles(docs), N_HASHES)

    def bands_union(sigs):
        bands = None
        for band in range(N_HASHES // BAND_SIZE):
            cols = ["mh%d" % (band * BAND_SIZE + j) for j in range(BAND_SIZE)]
            b = sigs.select("doc_id", F.md5(F.concat_ws(
                "\x1f", F.lit(str(band)), *cols)).alias("band_key"))
            bands = b if bands is None else bands.unionAll(b)
        return bands

    def bands_explode(sigs):
        band_keys = F.array(*[
            F.md5(F.concat_ws("\x1f", F.lit(str(band)),
                  *["mh%d" % (band * BAND_SIZE + j) for j in range(BAND_SIZE)]))
            for band in range(N_HASHES // BAND_SIZE)])
        return sigs.select("doc_id", F.explode(band_keys).alias("band_key"))

    a = sorted(map(tuple, bands_union(sigs).collect()))
    b = sorted(map(tuple, bands_explode(sigs).collect()))
    assert a == b and len(a) == 20 * (N_HASHES // BAND_SIZE)

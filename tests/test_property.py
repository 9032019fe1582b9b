"""Property-based checks (hypothesis) for the portable model runtimes.

These complement the fixed fixtures in test_classify.py: the fixed-point
SQL compiler must agree with the numpy runtime for EVERY on-grid linear
model, and encoder output geometry must hold for arbitrary vocabularies.
"""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from xrenner_spark.kernel.classify import PortableClassifier
from xrenner_spark.operators.ml_score import SCALE, compile_linear_sql

settings.register_profile("ci", deadline=None, max_examples=60)
settings.load_profile("ci")


def _clf(headers, encoders, estimator):
    return PortableClassifier({"format": "xrenner-portable-classifier-v1",
                               "headers": headers, "encoders": encoders,
                               "estimator": estimator})


@given(
    coefs=st.lists(st.integers(-4096, 4096), min_size=1, max_size=12),
    intercept=st.integers(-4096, 4096),
    rows=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_linear_fixed_point_compile_matches_numpy_for_all_grid_models(
        coefs, intercept, rows, seed):
    est = {"type": "linear", "coef": [c / SCALE for c in coefs],
           "intercept": intercept / SCALE}
    cols = ["f%d" % i for i in range(len(coefs))]
    clf = _clf(cols, {}, est)
    rng = np.random.RandomState(seed)
    X = rng.randint(-100000, 100000, size=(rows, len(coefs))).astype(np.float64)
    runtime = clf.decision_raw(X) * SCALE
    con = duckdb.connect()
    con.register("xf", pd.DataFrame(X.astype(np.int64), columns=cols))
    expr = compile_linear_sql(est, cols)
    got = np.array([r[0] for r in
                    con.execute("SELECT CAST(%s AS BIGINT) FROM xf" % expr)
                    .fetchall()])
    assert np.array_equal(got, np.round(runtime).astype(np.int64))


@given(
    classes=st.lists(st.text(min_size=1, max_size=8), min_size=3,
                     max_size=10, unique=True),
    values=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=20),
)
def test_binarizer_rows_are_one_hot_or_zero(classes, values):
    clf = _clf(["f"], {"f": {"kind": "binarizer", "classes": classes}},
               {"type": "linear", "coef": [0.0] * len(classes),
                "intercept": 0.0})
    X = clf.encode_rows([{"f": v} for v in values])
    assert X.shape == (len(values), len(classes))
    sums = X.sum(axis=1)
    for v, row_sum, row in zip(values, sums, X):
        if v in classes or "_unknown_" in classes:
            assert row_sum == 1.0  # exactly one hot column
        else:
            assert row_sum == 0.0  # OOV with no _unknown_ class
        assert set(row) <= {0.0, 1.0}


@given(
    sentences=st.lists(
        st.lists(st.text(alphabet=st.characters(blacklist_categories=("Zs", "Cc")),
                         min_size=1, max_size=6), min_size=0, max_size=8)
        .map(" ".join),
        min_size=0, max_size=6),
)
def test_sequencer_flat_index_matches_token_count(sentences):
    from xrenner_spark.kernel.sequence import LexiconSequencer
    seq = LexiconSequencer({"format": "xrenner-portable-sequencer-v1",
                            "default": ["O", 0.5], "tags": {}})
    preds = seq.predict_proba(sentences)
    assert len(preds) == sum(len(s.split()) for s in sentences)
    assert all(p == ("O", 0.5) for p in preds)


@given(
    tokens=st.lists(st.integers(0, 10000), min_size=1, max_size=200),
    budget=st.integers(1, 8192),
)
def test_packing_arithmetic_invariants(tokens, budget):
    """bin/offset assignment from an exclusive prefix sum: offsets stay
    under budget and bin ids are non-decreasing in document order."""
    prefix = 0
    last_bin = 0
    for t in tokens:
        b, off = prefix // budget, prefix % budget
        assert 0 <= off < budget
        assert b >= last_bin
        last_bin = b
        prefix += t

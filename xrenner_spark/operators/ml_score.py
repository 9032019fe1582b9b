"""Batch model scoring compiled to Catalyst expressions.

The kernel scores coref candidate pairs with the portable-JSON
classifier runtime (kernel/classify.py, numpy, per-document batches).
At training-data scale the same models need to score BILLIONS of rows —
feature-matrix → probability over whole tables — and shipping that
through Python would put a row-at-a-time (or even Arrow-batched) UDF in
the hot path.  Instead this module **compiles the model into SQL
expressions** evaluated entirely JVM-side:

* linear model   → one fused multiply-add projection
* gradient-boosted trees → nested ``CASE WHEN`` per tree, summed

so scoring is a pure map stage inside whole-stage codegen — no shuffle,
no Python workers, filter/limit pushdown and column pruning intact.  At
100 TB this is the difference between a scan-speed scorer and a
Python-bound one.

Determinism contract: the compiler targets a **fixed-point grid**
(``SCALE = 1024``).  Features are the int64 milli-quantized embedding
used by every similarity oracle (round(x*1000) — the recipe the
dedup_embedding_cosine oracle already validates cross-engine);
coefficients / leaf values / thresholds must sit exactly on the 1/SCALE
grid (checked at compile time, ValueError otherwise).  All arithmetic
both engines run is then BIGINT — bit-identical in Spark, DuckDB and
the numpy runtime (binary fractions times small ints stay exact in
doubles), so the driver's value-hash comparison holds with no rounding
escape hatch.  Arbitrary float models can be snapped to the grid first
(quantization error ≤ 1/2048 per weight — negligible against model
noise; scripts/export_sklearn_model.py does this on request).

The random_forest / mlp estimator types stay runtime-only: their
per-tree probability averaging / matmuls have no exact fixed-point SQL
form; score those via kernel/classify.py (mapInPandas) when needed.

Model-size boundary (measured, sf0.01 local[8], depth-5 trees): the
compiled-CASE path is the right tool up to ~200 trees — SQL text grows
~1.2 KB/tree, plan compile is instant, and the one-time whole-stage
codegen cost is 2 s at 10 trees / 12 s at 200, after which scoring runs
warm at scan speed (0.5-1.6 s here).  At 500 trees Catalyst analysis /
janino effectively hang (>10 min) — beyond the boundary use
``score_with_runtime``: the same portable model evaluated by the numpy
runtime inside Arrow-batched ``mapInPandas``.  It is Python-bound but
model-size-indifferent, and bitwise-identical to the compiled path on
grid models (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 1024          # fixed-point denominator for model weights
N_FEATURES = 8        # leading embedding dims used by the demo models


def _fixed(value: float, what: str) -> int:
    scaled = value * SCALE
    snapped = round(scaled)
    if abs(scaled - snapped) > 1e-9:
        raise ValueError(
            "%s=%r is not on the 1/%d fixed-point grid; snap the model "
            "first (see module docstring)" % (what, value, SCALE))
    return int(snapped)


# ---------------------------------------------------------------------
# model → SQL compilation (shared text: Spark F.expr AND DuckDB run it)
# ---------------------------------------------------------------------

def compile_linear_sql(est: dict, cols) -> str:
    """``SCALE * decision_function`` as exact BIGINT SQL over integer
    feature columns."""
    terms = []
    for c, col in zip(est["coef"], cols):
        terms.append("(%d)*%s" % (_fixed(c, "coef"), col))
    terms.append(str(_fixed(est["intercept"], "intercept")))
    return "(" + " + ".join(terms) + ")"


def _tree_sql(tree: dict, cols, leaf_scaled, node: int = 0) -> str:
    if tree["left"][node] == -1:
        return str(leaf_scaled[node])
    return ("CASE WHEN %s <= %d THEN %s ELSE %s END"
            % (cols[tree["feature"][node]], int(tree["threshold"][node]),
               _tree_sql(tree, cols, leaf_scaled, tree["left"][node]),
               _tree_sql(tree, cols, leaf_scaled, tree["right"][node])))


def compile_gbt_sql(est: dict, cols) -> str:
    """``SCALE * raw_score`` for a gradient-boosted ensemble: learning
    rate folded into each leaf at compile time, trees summed as nested
    CASE expressions.  Thresholds must be integers (they compare against
    the int64-quantized features)."""
    lr = est["learning_rate"]
    parts = [str(_fixed(est["init_raw"], "init_raw"))]
    for tree in est["trees"]:
        for t in tree["threshold"]:
            if float(t) != int(t):
                raise ValueError("tree threshold %r is not an integer; "
                                 "quantized features are int64" % t)
        leaf_scaled = [_fixed(lr * v[0], "leaf") for v in tree["value"]]
        parts.append("(" + _tree_sql(tree, cols, leaf_scaled) + ")")
    return "(" + " + ".join(parts) + ")"


def compile_raw_sql(spec: dict, cols) -> str:
    est = spec["estimator"]
    if est["type"] == "linear":
        return compile_linear_sql(est, cols)
    if est["type"] == "gradient_boosting":
        return compile_gbt_sql(est, cols)
    raise ValueError("estimator type %r has no fixed-point SQL form "
                     "(runtime-only; see module docstring)" % est["type"])


# ---------------------------------------------------------------------
# committed demo models (hand-authored on the 1/SCALE grid)
# ---------------------------------------------------------------------

DEMO_LINEAR = {
    "format": "xrenner-portable-classifier-v1",
    "headers": ["f%d" % i for i in range(N_FEATURES)],
    "encoders": {},
    "estimator": {
        "type": "linear",
        "coef": [3 / SCALE, -7 / SCALE, 2 / SCALE, 11 / SCALE,
                 -5 / SCALE, 1 / SCALE, -2 / SCALE, 6 / SCALE],
        "intercept": 512 / SCALE,
    },
}

# two depth-2 stumps + one depth-1; all thresholds integral (features are
# milli-quantized, so 250 ≈ raw 0.25)
DEMO_GBT = {
    "format": "xrenner-portable-classifier-v1",
    "headers": ["f%d" % i for i in range(N_FEATURES)],
    "encoders": {},
    "estimator": {
        "type": "gradient_boosting",
        "learning_rate": 0.5,
        "init_raw": -256 / SCALE,
        "trees": [
            {"feature": [0, 1, 2, -2, -2, -2, -2],
             "threshold": [250, -100, 400, -2, -2, -2, -2],
             "left": [1, 3, 5, -1, -1, -1, -1],
             "right": [2, 4, 6, -1, -1, -1, -1],
             "value": [[0], [0], [0], [-512 / SCALE], [128 / SCALE],
                       [256 / SCALE], [640 / SCALE]]},
            {"feature": [3, -2, -2],
             "threshold": [0, -2, -2],
             "left": [1, -1, -1],
             "right": [2, -1, -1],
             "value": [[0], [-256 / SCALE], [384 / SCALE]]},
            {"feature": [4, 5, -2, -2, -2],
             "threshold": [100, -300, -2, -2, -2],
             "left": [1, 2, -1, -1, -1],
             "right": [4, 3, -1, -1, -1],
             "value": [[0], [0], [-128 / SCALE], [64 / SCALE],
                       [512 / SCALE]]},
        ],
    },
}

_COLS = ["f%d" % i for i in range(N_FEATURES)]


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings → int64 milli-quantized leading dims as named columns
    (the one engine-specific step: array indexing is 0-based here,
    1-based in DuckDB — everything after runs the same SQL text)."""
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    cols = [F.round(F.col("embedding").getItem(i) * 1000).cast("long")
            .alias("f%d" % i) for i in range(N_FEATURES)]
    return emb.select(F.col("vec_id"), *cols)


_FEATURES_SQL = """
    SELECT vec_id,
           {cols}
    FROM embeddings
""".format(cols=",\n           ".join(
    "CAST(round(embedding[%d]*1000) AS BIGINT) AS f%d" % (i + 1, i)
    for i in range(N_FEATURES)))


def clf_score_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every embedding with DEMO_LINEAR: single projection, no
    shuffle, whole-stage codegen end-to-end."""
    expr = compile_raw_sql(DEMO_LINEAR, _COLS)
    return (_features(spark, sf_dir)
            .select("vec_id",
                    F.expr(expr).cast("long").alias("score_x1024")))


def clf_score_linear_sql() -> str:
    return """
    WITH feats AS ({feats})
    SELECT vec_id, CAST({expr} AS BIGINT) AS score_x1024 FROM feats
    """.format(feats=_FEATURES_SQL, expr=compile_raw_sql(DEMO_LINEAR, _COLS))


def clf_score_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every embedding with DEMO_GBT (three CASE-trees summed) and
    keep only above-threshold rows — the filter sits on top of a pure
    map stage, so Catalyst collapses scan→score→filter into one codegen
    span."""
    expr = compile_raw_sql(DEMO_GBT, _COLS)
    return (_features(spark, sf_dir)
            .select("vec_id", F.expr(expr).cast("long").alias("score_x1024"))
            .filter(F.col("score_x1024") > 0))


def clf_score_gbt_sql() -> str:
    return """
    WITH feats AS ({feats}),
    scored AS (SELECT vec_id, CAST({expr} AS BIGINT) AS score_x1024 FROM feats)
    SELECT vec_id, score_x1024 FROM scored WHERE score_x1024 > 0
    """.format(feats=_FEATURES_SQL, expr=compile_raw_sql(DEMO_GBT, _COLS))


def clf_score_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME DEMO_GBT model scored via the large-model runtime path
    (numpy inside Arrow-batched mapInPandas) instead of the compiled
    CASE expression — it shares clf_score_gbt's DuckDB oracle, so a
    green driver row proves the two scoring paths agree bit-for-bit
    under the external hash, not just under pytest."""
    feats = _features(spark, sf_dir)
    scored = score_with_runtime(feats, DEMO_GBT)
    return scored.filter(F.col("score_x1024") > 0)


QUERIES = {
    "clf_score_linear": (clf_score_linear, clf_score_linear_sql()),
    "clf_score_gbt": (clf_score_gbt, clf_score_gbt_sql()),
    # registered below, after score_with_runtime is defined
}


def score_with_runtime(df: DataFrame, spec: dict, cols=None,
                       out_col: str = "score_x1024") -> DataFrame:
    """Large-model path: evaluate a portable classifier with the numpy
    runtime inside Arrow-batched mapInPandas (see the model-size
    boundary note in the module docstring).  Emits the same
    SCALE-scaled integer raw score as the compiled path for linear/GBT
    grid models; for random_forest/mlp the scaled score is
    probability*SCALE rounded."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..kernel.classify import PortableClassifier

    cols = list(cols or _COLS)
    passthrough = [f for f in df.schema.fields if f.name not in cols]
    schema = T.StructType(passthrough + [T.StructField(out_col, T.LongType())])

    def run(pdf_iter):
        clf = PortableClassifier(spec)  # per-worker; spec rides the closure
        for pdf in pdf_iter:
            X = pdf[cols].to_numpy(dtype="float64")
            raw = clf.decision_raw(X) * SCALE
            out = pdf[[f.name for f in passthrough]].copy()
            out[out_col] = pd.Series(raw).round().astype("int64").values
            yield out

    return df.mapInPandas(run, schema=schema)


QUERIES["clf_score_runtime"] = (clf_score_runtime, clf_score_gbt_sql())

"""Portable classifier runtime + classifier-mode coref path.

The reference scores candidate pairs through pickled sklearn estimators
(xrenner_classify.py:14-72); this sandbox has no sklearn and the
reference therefore cannot run its own classifier path here either, so
there are no reference-generated goldens for classifier-mode chains.
Correctness is carried by:

* hand-computed numpy fixtures for every encoder kind and estimator
  family (the adapter semantics are small and fully specified by the
  reference source);
* an end-to-end kernel test on a synthetic model variant proving the
  classifier (a) replaces the heuristic ranking, (b) enforces the
  below-threshold -> no-antecedent gate with cascade continuation, and
  (c) is forced off by rule_based=True (the reference's -r switch);
* exact equivalence between this runtime and the fixed-point SQL
  compilation in operators/ml_score.py, on Spark and in DuckDB.
"""

import json
import os
import shutil

import numpy as np
import pytest

from xrenner_spark.kernel import analyze_document
from xrenner_spark.kernel.classify import PortableClassifier
from xrenner_spark.lex import DEFAULT_MODEL_DIR, load_lex
from xrenner_spark.operators import ml_score

SIG = lambda z: np.exp(z) / (1 + np.exp(z))


def clf(headers, encoders, estimator):
    return PortableClassifier({"format": "xrenner-portable-classifier-v1",
                               "headers": headers, "encoders": encoders,
                               "estimator": estimator})


LINEAR = {"type": "linear", "coef": [2.0, -1.0], "intercept": 0.5}


# ---------------------------------------------------------------------
# encoders  (reference xrenner_classify.py:41-58)
# ---------------------------------------------------------------------

def test_numeric_passthrough_and_linear():
    c = clf(["a", "b"], {}, LINEAR)
    X = c.encode_rows([{"a": 3, "b": 4}, {"a": -1, "b": 0}])
    assert X.tolist() == [[3.0, 4.0], [-1.0, 0.0]]
    np.testing.assert_allclose(c.predict_proba(X),
                               SIG(np.array([3 * 2 - 4 + 0.5, -2 + 0.5])))


def test_binarizer_multiclass_and_oov():
    c = clf(["f"], {"f": {"kind": "binarizer",
                          "classes": ["_unknown_", "x", "y"]}},
            {"type": "linear", "coef": [0.0, 1.0, 2.0], "intercept": 0.0})
    X = c.encode_rows([{"f": "x"}, {"f": "y"}, {"f": "never-seen"}])
    assert X.tolist() == [[0, 1, 0], [0, 0, 1], [1, 0, 0]]


def test_binarizer_binary_single_column_quirk():
    # sklearn LabelBinarizer with two classes emits ONE column
    c = clf(["f"], {"f": {"kind": "binarizer", "classes": ["_unknown_", "x"]}},
            {"type": "linear", "coef": [1.0], "intercept": 0.0})
    X = c.encode_rows([{"f": "x"}, {"f": "oov"}])
    assert X.tolist() == [[1.0], [0.0]]


def test_ordinal_and_oov_raise():
    c = clf(["f"], {"f": {"kind": "ordinal", "classes": ["_unknown_", "p", "q"]}},
            {"type": "linear", "coef": [1.0], "intercept": 0.0})
    X = c.encode_rows([{"f": "q"}, {"f": "nope"}])
    assert X.tolist() == [[2.0], [0.0]]  # OOV -> _unknown_ index
    strict = clf(["f"], {"f": {"kind": "ordinal", "classes": ["p", "q"]}},
                 {"type": "linear", "coef": [1.0], "intercept": 0.0})
    with pytest.raises(ValueError, match="OOV"):
        strict.encode_rows([{"f": "nope"}])


def test_scale_encoder():
    c = clf(["f"], {"f": {"kind": "scale", "mean": 10.0, "scale": 2.0}}, LINEAR | {"coef": [1.0]})
    assert c.encode_rows([{"f": 14}]).tolist() == [[2.0]]


# ---------------------------------------------------------------------
# estimators  (reference xrenner_classify.py:63-72 dispatch)
# ---------------------------------------------------------------------

def test_gbt_matches_manual():
    est = ml_score.DEMO_GBT["estimator"]
    c = PortableClassifier(ml_score.DEMO_GBT)
    row = np.array([300.0, 50.0, 0.0, 1.0, 200.0, 0.0, 0.0, 0.0])
    # tree1: f0=300>250 -> right; f2=0<=400 -> leaf 256/1024
    # tree2: f3=1>0 -> leaf 384/1024 ; tree3: f4=200>100 -> leaf 512/1024
    manual = est["init_raw"] + 0.5 * (256 + 384 + 512) / 1024
    np.testing.assert_allclose(c.decision_raw(row.reshape(1, -1)), [manual])
    np.testing.assert_allclose(c.predict_proba(row.reshape(1, -1)), SIG(np.array([manual])))


def test_random_forest_probability_average():
    tree = {"feature": [0, -2, -2], "threshold": [0.0, -2, -2],
            "left": [1, -1, -1], "right": [2, -1, -1],
            "value": [[0, 0], [3, 1], [1, 3]]}  # leaf counts [n0, n1]
    c = clf(["f"], {}, {"type": "random_forest", "trees": [tree, tree]})
    np.testing.assert_allclose(c.predict_proba(np.array([[-1.0], [1.0]])),
                               [0.25, 0.75])


def test_mlp_forward():
    est = {"type": "mlp",
           "layers": [{"w": [[1.0, -1.0]], "b": [0.0, 0.0], "act": "relu"},
                      {"w": [[2.0], [2.0]], "b": [-1.0], "act": "identity"}]}
    c = clf(["f"], {}, est)
    # x=3: relu([3,-3])=[3,0] -> 3*2-1=5 -> sigmoid(5)
    np.testing.assert_allclose(c.predict_proba(np.array([[3.0]])), SIG(np.array([5.0])))


def test_unknown_estimator_and_format_rejected():
    with pytest.raises(ValueError, match="unknown estimator"):
        clf(["f"], {}, {"type": "svm"})
    with pytest.raises(ValueError, match="unsupported format"):
        PortableClassifier({"format": "v0", "headers": [], "estimator": {"type": "linear"}})


# ---------------------------------------------------------------------
# fixed-point SQL compilation (operators/ml_score.py)
# ---------------------------------------------------------------------

def test_compile_rejects_off_grid_weights():
    with pytest.raises(ValueError, match="fixed-point grid"):
        ml_score.compile_linear_sql({"coef": [0.1], "intercept": 0.0}, ["f0"])
    with pytest.raises(ValueError, match="no fixed-point SQL"):
        ml_score.compile_raw_sql({"estimator": {"type": "random_forest"}}, [])


def test_compiled_sql_equals_numpy_runtime_in_duckdb():
    import duckdb
    import pandas as pd
    rng = np.random.RandomState(11)
    X = rng.randint(-4000, 4000, size=(300, 8)).astype(np.float64)
    con = duckdb.connect()
    con.register("xf", pd.DataFrame(X.astype(np.int64), columns=ml_score._COLS))
    for spec in (ml_score.DEMO_LINEAR, ml_score.DEMO_GBT):
        runtime = PortableClassifier(spec).decision_raw(X) * ml_score.SCALE
        expr = ml_score.compile_raw_sql(spec, ml_score._COLS)
        got = np.array([r[0] for r in
                        con.execute("SELECT CAST(%s AS BIGINT) FROM xf" % expr).fetchall()])
        assert np.array_equal(got, np.round(runtime).astype(np.int64))


def test_spark_scorer_matches_numpy(spark):
    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet").orderBy("vec_id")
    rows = emb.select("vec_id", "embedding").collect()
    q = np.array([[round(float(x) * 1000) for x in r.embedding[:8]] for r in rows],
                 dtype=np.float64)
    for spec, fn in ((ml_score.DEMO_LINEAR, ml_score.clf_score_linear),
                     (ml_score.DEMO_GBT, ml_score.clf_score_gbt)):
        runtime = PortableClassifier(spec).decision_raw(q) * ml_score.SCALE
        expect = {r.vec_id: int(s) for r, s in zip(rows, np.round(runtime))}
        got = {r.vec_id: r.score_x1024 for r in fn(spark, sf_dir).collect()}
        for vid, s in got.items():
            assert s == expect[vid]
        if fn is ml_score.clf_score_gbt:  # filtered query: check the predicate
            assert set(got) == {v for v, s in expect.items() if s > 0}
        else:
            assert set(got) == set(expect)


# ---------------------------------------------------------------------
# kernel integration: classifier-mode best_candidate
# ---------------------------------------------------------------------

DOC = """1\tMary\tMary\tPROPN\tPROPN\tGender=Fem\t2\tcompound\t_\t_
2\tShelley\tShelley\tPROPN\tPROPN\tGender=Fem\t3\tnsubj\t_\t_
3\tpraised\tpraise\tVERB\tVERB\t_\t0\troot\t_\t_
4\tAlan\tAlan\tPROPN\tPROPN\t_\t5\tcompound\t_\t_
5\tTuring\tTuring\tPROPN\tPROPN\t_\t3\tobj\t_\t_
6\twith\twith\tADP\tADP\t_\t8\tcase\t_\t_
7\tClaude\tClaude\tPROPN\tPROPN\t_\t8\tcompound\t_\t_
8\tShannon\tShannon\tPROPN\tPROPN\t_\t3\tobl\t_\t_
9\t.\t.\tPUNCT\tPUNCT\t_\t3\tpunct\t_\t_

1\tHe\the\tPRON\tPRON\t_\t2\tnsubj\t_\t_
2\tsmiled\tsmile\tVERB\tVERB\t_\t0\troot\t_\t_
3\t.\t.\tPUNCT\tPUNCT\t_\t2\tpunct\t_\t_
"""


def make_clf_model(tmp_path, thresh=None):
    """models/web variant: use_classifiers=True and rule 7 ("remaining
    pronouns take any compatible recent mention") scored by a portable
    linear model that prefers antecedent lemma "Turing" (p=sigmoid(5))
    over anything else (p=0.5) — the opposite of the heuristic's
    recency preference for "Shannon"."""
    dst = str(tmp_path / ("web_clf_%s" % (thresh or "default")))
    shutil.copytree(DEFAULT_MODEL_DIR, dst)
    cfg_path = os.path.join(dst, "config.ini")
    cfg = open(cfg_path, encoding="utf8").read()
    assert "use_classifiers=False" in cfg
    open(cfg_path, "w", encoding="utf8").write(
        cfg.replace("use_classifiers=False", "use_classifiers=True"))
    rules_path = os.path.join(dst, "coref_rules.tab")
    rules = open(rules_path, encoding="utf8").read()
    old = 'form="pronoun";form!="pronoun";2;propagate\n'
    assert old in rules
    new = 'form="pronoun";form!="pronoun";2;propagate;demo.pkl%s\n' % (
        ";%s" % thresh if thresh is not None else "")
    open(rules_path, "w", encoding="utf8").write(rules.replace(old, new))
    model = {"format": "xrenner-portable-classifier-v1",
             "headers": ["d_tok", "t_lemma"],
             "encoders": {"d_tok": {"kind": "scale", "mean": 0.0, "scale": 2.0},
                          "t_lemma": {"kind": "binarizer",
                                      "classes": ["_unknown_", "Turing"]}},
             "estimator": {"type": "linear", "coef": [0.0, 5.0],
                           "intercept": 0.0}}
    json.dump(model, open(os.path.join(dst, "demo.pkl.json"), "w"))
    return dst


def _he(lex):
    res = analyze_document("clf_demo", DOC, lex)
    return [m for m in res.mentions if m["text"] == "He"][0]


def test_heuristic_baseline_picks_nearest():
    he = _he(load_lex())
    assert (he["antecedent"], he["matching_rule"]) == ("7_8", "7")  # Shannon


def test_classifier_overrides_heuristic(tmp_path):
    he = _he(load_lex(make_clf_model(tmp_path)))
    assert (he["antecedent"], he["matching_rule"]) == ("4_5", "7")  # Turing


def test_classifier_threshold_rejects_and_cascade_continues(tmp_path):
    # max prob sigmoid(5)=0.993 < 0.999 -> rule 7 returns None
    # (reference xrenner_compatible.py:648-652); the cascade then falls
    # through to the default lexical rule (rule_num 10)
    he = _he(load_lex(make_clf_model(tmp_path, thresh=0.999)))
    assert he["matching_rule"] == "10"


def test_rule_based_switch_forces_heuristic(tmp_path):
    # the reference's -r flag (xrenner_lex.py:106-107)
    he = _he(load_lex(make_clf_model(tmp_path), rule_based=True))
    assert (he["antecedent"], he["matching_rule"]) == ("7_8", "7")


def test_missing_classifier_fails_loudly(tmp_path):
    dst = make_clf_model(tmp_path)
    os.remove(os.path.join(dst, "demo.pkl.json"))
    with pytest.raises(IOError, match="demo.pkl"):
        load_lex(dst)


def test_classifier_lex_broadcasts_to_executors(spark, tmp_path):
    """A classifier-enabled LexModel must survive pickling into a Spark
    broadcast and score identically on executors (the distributed kernel
    path ships the model exactly this way)."""
    lex = load_lex(make_clf_model(tmp_path))
    bcast = spark.sparkContext.broadcast(lex)

    def run(pair):
        from xrenner_spark.kernel import analyze_document
        name, doc = pair
        res = analyze_document(name, doc, bcast.value)
        he = [m for m in res.mentions if m["text"] == "He"][0]
        return (he["antecedent"], he["matching_rule"])

    out = set(spark.sparkContext.parallelize(
        [("clf_demo_%d" % i, DOC) for i in range(8)], 4).map(run).collect())
    assert out == {("4_5", "7")}


def test_runtime_scorer_matches_compiled(spark):
    """score_with_runtime (Arrow-batched numpy, the large-model path)
    must equal the compiled-SQL path bitwise on grid models."""
    from pyspark.sql import functions as F
    sf_dir = "/root/testdata/sf0.001"
    feats = ml_score._features(spark, sf_dir)
    for spec in (ml_score.DEMO_LINEAR, ml_score.DEMO_GBT):
        sql = ml_score.compile_raw_sql(spec, ml_score._COLS)
        compiled = {r.vec_id: r.s for r in
                    feats.select("vec_id", F.expr(sql).cast("long").alias("s"))
                    .collect()}
        runtime = {r.vec_id: r.score_x1024 for r in
                   ml_score.score_with_runtime(feats, spec).collect()}
        assert runtime == compiled


def test_runtime_scorer_forest_path(spark):
    """random_forest has no SQL form; score_with_runtime must emit
    round(prob * SCALE) matching the local runtime."""
    tree = {"feature": [0, -2, -2], "threshold": [0.0, -2, -2],
            "left": [1, -1, -1], "right": [2, -1, -1],
            "value": [[0, 0], [3, 1], [1, 3]]}
    spec = {"format": "xrenner-portable-classifier-v1",
            "headers": ml_score._COLS, "encoders": {},
            "estimator": {"type": "random_forest",
                          "trees": [tree] * 8 }}
    # pad tree feature space: tree only reads f0; headers are 8 cols
    sf_dir = "/root/testdata/sf0.001"
    feats = ml_score._features(spark, sf_dir)
    rows = feats.orderBy("vec_id").collect()
    import numpy as np
    X = np.array([[r["f%d" % i] for i in range(8)] for r in rows],
                 dtype=np.float64)
    want = np.round(PortableClassifier(spec).decision_raw(X)
                    * ml_score.SCALE).astype(int)
    got = {r.vec_id: r.score_x1024 for r in
           ml_score.score_with_runtime(feats, spec).collect()}
    for r, w in zip(rows, want):
        assert got[r.vec_id] == w
    assert set(want.tolist()) == {256, 768}  # 0.25 / 0.75 * SCALE

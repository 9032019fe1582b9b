#!/usr/bin/env python
"""Convert a pickled xrenner classifier to the portable JSON format.

The reference ships coref classifiers as sklearn pickles next to
coref_rules.tab (loaded at xrenner_lex.py:526-563, adapted by
xrenner_classify.py).  xrenner_spark evaluates the dependency-free
portable format instead (xrenner_spark/kernel/classify.py).  Run THIS
script in an environment that has sklearn to convert:

    python scripts/export_sklearn_model.py model_dir/clf.pkl \
        model_dir/clf.pkl.json --headers headers.txt

The pickle is expected to hold the reference's (cls, encoder_dict,
headers) triple or a bare estimator (then --headers + --encoders give
the rest).  Supported estimator families mirror the reference adapter's
dispatch (xrenner_classify.py:19-26): linear (Ridge / ElasticNet /
LogisticRegression), RandomForest, GradientBoosting, MLP.

Optionally snap weights to the 1/1024 fixed-point grid (--snap) so the
model is also compilable to exact SQL by operators/ml_score.py.
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys

SCALE = 1024


def _fail(msg):
    sys.stderr.write(msg + "\n")
    sys.exit(2)


def _snap(x, snap):
    return round(x * SCALE) / SCALE if snap else float(x)


def tree_to_json(tree, snap=False, scale_leaves=1.0):
    import math
    t = tree.tree_
    if snap:
        # SQL compilation needs integer thresholds; over int-quantized
        # features `x <= t` == `x <= floor(t)`, so flooring is lossless
        # (sklearn splits on integer features sit at x.5)
        thresholds = [float(math.floor(x)) if x > -2 else float(x)
                      for x in t.threshold]
    else:
        thresholds = [float(x) for x in t.threshold]
    return {
        "feature": [int(f) for f in t.feature],
        "threshold": thresholds,
        "left": [int(x) for x in t.children_left],
        "right": [int(x) for x in t.children_right],
        "value": [[_snap(scale_leaves * v, snap) for v in row[0]]
                  for row in t.value],
    }


def estimator_to_json(cls, snap=False):
    name = type(cls).__name__
    if any(k in name for k in ("Ridge", "Elastic", "Logistic", "SGD")):
        coef = cls.coef_.reshape(-1)
        return {"type": "linear",
                "coef": [_snap(c, snap) for c in coef],
                "intercept": _snap(float(cls.intercept_), snap)}
    if "RandomForest" in name:
        return {"type": "random_forest",
                "trees": [tree_to_json(t) for t in cls.estimators_]}
    if "GradientBoosting" in name:
        try:  # prior log-odds (binomial deviance)
            import numpy as np
            p = cls.init_.class_prior_[1]
            init_raw = float(np.log(p / (1 - p)))
        except AttributeError:
            init_raw = 0.0
        if snap:
            # fold the learning rate into the leaves BEFORE snapping, so
            # lr*leaf sits on the grid compile_gbt_sql checks (snapping
            # the raw leaf with lr != 1 would land off-grid)
            return {"type": "gradient_boosting",
                    "learning_rate": 1.0,
                    "init_raw": _snap(init_raw, snap),
                    "trees": [tree_to_json(t[0], snap,
                                           scale_leaves=float(cls.learning_rate))
                              for t in cls.estimators_]}
        return {"type": "gradient_boosting",
                "learning_rate": float(cls.learning_rate),
                "init_raw": _snap(init_raw, snap),
                "trees": [tree_to_json(t[0], snap) for t in cls.estimators_]}
    if "MLP" in name:
        layers = []
        n = len(cls.coefs_)
        for i, (w, b) in enumerate(zip(cls.coefs_, cls.intercepts_)):
            act = cls.activation if i < n - 1 else "identity"
            layers.append({"w": [[float(v) for v in row] for row in w],
                           "b": [float(v) for v in b], "act": act})
        return {"type": "mlp", "layers": layers}
    _fail("unsupported estimator type: %s" % name)


def encoders_to_json(encoder_dict):
    out = {}
    for header, entry in (encoder_dict or {}).items():
        enc, kind = entry[0], entry[1]
        if kind == "binarizer":
            out[header] = {"kind": "binarizer",
                           "classes": [str(c) for c in enc.classes_]}
        elif kind == "scale":
            out[header] = {"kind": "scale",
                           "mean": float(enc.mean_.reshape(-1)[0]),
                           "scale": float(enc.scale_.reshape(-1)[0])}
        else:
            classes = getattr(enc, "classes_", None)
            if classes is None:  # OrdinalEncoder
                classes = enc.categories_[0]
            out[header] = {"kind": "ordinal",
                           "classes": [str(c) for c in classes]}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pickle_path")
    ap.add_argument("json_path")
    ap.add_argument("--headers", help="one feature name per line (if the "
                                      "pickle is a bare estimator)")
    ap.add_argument("--snap", action="store_true",
                    help="snap weights to the 1/1024 grid for exact SQL "
                         "compilation (ml_score.py)")
    args = ap.parse_args()

    try:
        import sklearn  # noqa: F401
    except ImportError:
        _fail("sklearn is not installed here; run this converter in the "
              "environment that trained the model")

    with open(args.pickle_path, "rb") as fh:
        blob = pickle.load(fh)
    if isinstance(blob, tuple) and len(blob) == 3:
        cls, encoder_dict, headers = blob
    else:
        cls, encoder_dict = blob, {}
        if not args.headers:
            _fail("bare estimator pickle: pass --headers")
        headers = [ln.strip() for ln in open(args.headers) if ln.strip()]

    spec = {"format": "xrenner-portable-classifier-v1",
            "headers": list(headers),
            "encoders": encoders_to_json(encoder_dict),
            "estimator": estimator_to_json(cls, snap=args.snap)}
    with open(args.json_path, "w") as fh:
        json.dump(spec, fh, indent=1)
    print("wrote %s (%s, %d headers)" % (
        args.json_path, spec["estimator"]["type"], len(headers)))


if __name__ == "__main__":
    main()

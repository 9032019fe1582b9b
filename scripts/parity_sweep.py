#!/usr/bin/env python
"""Mention-exact parity sweep vs the reference engine (sandbox-only).

Compares every mention field + chain partitions for N synthetic corpus
documents. Exits nonzero on any divergence.

Usage: python scripts/parity_sweep.py [start] [end]
"""
import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("XRENNER_REFERENCE", "/root/reference"))
sys.path.insert(0, REPO)
warnings.filterwarnings("ignore")

from xrenner import Xrenner  # noqa: E402
from xrenner_spark import load_lex  # noqa: E402
from xrenner_spark.corpus import build_document  # noqa: E402
from xrenner_spark.kernel import analyze_document  # noqa: E402

MODEL = os.environ.get(
    "XRENNER_MODEL", os.path.join(REPO, "xrenner_spark/models/web"))


def partitions(items, key):
    groups = {}
    for span, vals in items.items():
        groups.setdefault(vals[key], set()).add(span)
    return {frozenset(v) for v in groups.values()}


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    lex = load_lex(MODEL)
    bad = []
    for doc_id in range(start, end):
        conllu = build_document(doc_id)["conllu"]
        ref = Xrenner(model=MODEL, rule_based=True, no_seq=True)
        ref.analyze(conllu, "none")
        theirs = {}
        for m in ref.markables:
            ante = "" if isinstance(m.antecedent, str) else \
                "%d_%d" % (m.antecedent.start, m.antecedent.end)
            theirs["%d_%d" % (m.start, m.end)] = (
                m.text, m.entity, m.subclass,
                m.agree if m.agree is not None else "", m.form, m.definiteness,
                float(m.cardinality), m.coref_type, m.infstat,
                bool(m.coordinate), ante, str(m.group))
        res = analyze_document(str(doc_id), conllu, lex)
        mine = {m["mark_id"]: (
            m["text"], m["entity"], m["subclass"], m["agree"], m["form"],
            m["definiteness"], m["cardinality"], m["coref_type"], m["infstat"],
            m["coordinate"], m["antecedent"], str(m["group_id"]))
            for m in res.mentions}
        if set(mine) != set(theirs):
            bad.append((doc_id, "spans", set(mine) ^ set(theirs)))
            continue
        for span in mine:
            if mine[span][:11] != theirs[span][:11]:
                bad.append((doc_id, span, mine[span][:11], theirs[span][:11]))
                break
        if partitions(mine, 11) != partitions(theirs, 11):
            bad.append((doc_id, "groups"))
    print("sweep docs %d..%d: %d divergent" % (start, end, len(bad)))
    for b in bad[:10]:
        print(b)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

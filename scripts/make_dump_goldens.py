#!/usr/bin/env python
"""Golden fixture for the training-data dump sink (sandbox-only;
fixture committed): reference engine with lex.dump set, per doc.

Lines are stored SORTED: the reference iterates a raw Python set of
Markable objects when dumping (xrenner_compatible.py:600), so its row
ORDER is hash-incidental; row CONTENT (including the reciprocal-rank
score column) is deterministic because heuristic scores embed distinct
token positions and are therefore tie-free.

Usage: python scripts/make_dump_goldens.py [n_docs]
"""

import io
import json
import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("XRENNER_REFERENCE", "/root/reference")
MODEL = os.path.join(REPO, "xrenner_spark", "models", "web")
warnings.filterwarnings("ignore")
sys.path.insert(0, REFERENCE)
sys.path.insert(0, REPO)


def main():
    from xrenner import Xrenner
    from xrenner_spark.corpus import build_document

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    out = {}
    headers = []
    for i in range(n_docs):
        conllu = build_document(i)["conllu"]
        ref = Xrenner(model=MODEL, rule_based=True, no_seq=True)
        ref.lex.dump = io.StringIO()
        ref.lex.dump_types = set()
        ref.lex.dump_headers = []
        ref.set_doc_name(str(i))
        ref.analyze(conllu, "none")
        out[str(i)] = sorted(l for l in ref.lex.dump.getvalue().split("\n") if l)
        if ref.lex.dump_headers and not headers:
            headers = ref.lex.dump_headers
    path = os.path.join(REPO, "tests", "fixtures", "goldens_dump.json")
    with io.open(path, "w", encoding="utf8") as fh:
        json.dump({"headers": headers, "docs": out}, fh, ensure_ascii=False)
    print("dump goldens: %d docs, %d lines -> %s"
          % (n_docs, sum(len(v) for v in out.values()), path))


if __name__ == "__main__":
    main()

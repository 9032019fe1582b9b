#!/usr/bin/env python
"""Golden fixture for the external entity-oracle reader (sandbox-only;
fixture committed): builds a synthetic oracle file from a no-oracle
reference run (every proper mention's entity overridden with a rotating
label + a nonexistent span per sentence that must be ignored), then
re-runs the reference WITH the oracle and dumps its mentions.

Usage: python scripts/make_oracle_goldens.py [n_docs]
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

ENTS = ["animal", "plant", "substance", "event"]


def main():
    from xrenner import Xrenner
    from xrenner_spark.corpus import build_document

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    docs = [build_document(i)["conllu"] for i in range(n_docs)]

    oracle_blocks = []
    for conllu in docs:
        ref = Xrenner(model=MODEL, rule_based=True, no_seq=True)
        ref.analyze(conllu, "none")
        by_sent = {}
        for m in ref.markables:
            if m.form == "proper":
                off = m.sentence.start_offset
                by_sent.setdefault(m.sentence.text, []).append(
                    "%d,%d %s" % (m.start - off, m.end - off + 1,
                                  ENTS[(m.start + m.end) % 4]))
        for text, preds in by_sent.items():
            preds.append("90,95 animal")  # nonexistent span: must be ignored
            oracle_blocks.append("%s\nignored-line\n%s" % (text, "|".join(preds)))
    oracle_text = "\n\n".join(oracle_blocks)

    goldens = {}
    for i, conllu in enumerate(docs):
        ref = Xrenner(model=MODEL, rule_based=True, no_seq=True)
        ref.lex.read_oracle(oracle_text, as_text=True)
        ref.analyze(conllu, "none")
        goldens[str(i)] = [
            {"mark_id": "%d_%d" % (m.start, m.end), "text": m.text,
             "entity": m.entity, "subclass": m.subclass,
             "agree": m.agree if m.agree is not None else "",
             "coref_type": m.coref_type, "infstat": m.infstat,
             "group": str(m.group)}
            for m in ref.markables]

    out_path = os.path.join(REPO, "tests", "fixtures", "goldens_oracle.json")
    with io.open(out_path, "w", encoding="utf8") as fh:
        json.dump({"oracle_text": oracle_text, "n_docs": n_docs,
                   "docs": goldens}, fh, ensure_ascii=False)
    n = sum(len(v) for v in goldens.values())
    print("oracle goldens: %d docs, %d mentions -> %s" % (n_docs, n, out_path))


if __name__ == "__main__":
    main()

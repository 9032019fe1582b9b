#!/usr/bin/env python
"""Fire-drill for depedit generality (VERDICT r3 task 6): a third-party-
style depedit.ini exercising the constructs depedit_lite did NOT support
until round 4 — multi-relation chains and ``==`` field equality — run
through the REFERENCE DepEdit engine over corpus documents and byte-
compared against DepEditLite (sandbox-only; the committed fixture
carries a representative slice for pytest).

Usage: python scripts/make_depedit_chains.py [n_docs]
"""

import io
import json
import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("XRENNER_REFERENCE", "/root/reference")
warnings.filterwarnings("ignore")
sys.path.insert(0, REFERENCE)
sys.path.insert(0, REPO)

# A plausible third-party normalization config for UD English web text:
# rule 1 is a 3-node / 2-relation dependency chain (verb -> name head ->
# flat continuation), rule 2 combines field equality with a distance
# band (repeated-lemma NOUN pairs), rule 3 chains parenthood with
# adjacency to relabel determiner-adjacent possessives.
CHAIN_INI = """; third-party style: name-chain + repeated-lemma normalization
{name}=/PROPN/
{pred}=/VERB|ADJ/
pos=/{name}/;pos=/{name}/&func=/flat/;pos=/{pred}/\t#3>#1;#1>#2\t#2:morph=InName=Yes
pos=/NOUN/;pos=/NOUN/\t#1:lemma==#2;#1.1,30#2\t#2:func2=lemma-repeat
pos=/DET/;pos=/NOUN/;pos=/VERB/\t#1.#2;#3>#2\t#2:cpos=DETN
pos=/{pred}/;pos=/NOUN/;pos=/DET/\t#1>#2>#3\t#3:morph=Chain=Short
#S:speaker=/.+/;pos=/PRON/\t#1.1,1000#2\t#2:morph=InDialogue;#S:dialog=yes
#S:dialog=/yes/;pos=/{name}/\t#1>#2\t#2:func2=spoken-name;last
pos=/NOUN/\tnone\t#1:func2=never-reached-after-last-in-dialogue
"""


def main():
    from xrenner.modules.depedit import DepEdit

    from xrenner_spark.corpus import build_document
    from xrenner_spark.kernel.depedit_lite import DepEditLite

    class Opts:
        kill = "supertoks"
        quiet = True

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    lite = DepEditLite(CHAIN_INI.split("\n"))
    n_changed = n_div = 0
    cases = {}
    for doc_id in range(n_docs):
        conllu = build_document(doc_id)["conllu"]
        ref_engine = DepEdit(io.StringIO(CHAIN_INI), options=Opts())
        ref_out = ref_engine.run_depedit(conllu.split("\n"))
        if isinstance(ref_out, list):
            ref_out = "\n".join(ref_out)
        ours = lite.run(conllu)
        if ours != ref_out:
            n_div += 1
            if n_div <= 3:
                print("DIVERGE doc %d" % doc_id)
                for a, b in zip(ref_out.split("\n"), ours.split("\n")):
                    if a != b:
                        print("  ref  %r\n  ours %r" % (a, b))
        if ref_out.strip() != conllu.strip():
            n_changed += 1
            if len(cases) < 6:
                cases["chain_doc_%d" % doc_id] = {
                    "ini": CHAIN_INI, "input": conllu, "output": ref_out}
    print("docs=%d changed-by-rules=%d divergent=%d"
          % (n_docs, n_changed, n_div))
    if n_div:
        raise SystemExit(1)
    if n_changed == 0:
        raise SystemExit("config changed nothing — fixture would be vacuous")
    path = os.path.join(REPO, "tests", "fixtures", "depedit_chains.json")
    with io.open(path, "w", encoding="utf8") as fh:
        json.dump(cases, fh, indent=1, ensure_ascii=False)
    print("wrote %d cases -> %s" % (len(cases), path))


if __name__ == "__main__":
    main()

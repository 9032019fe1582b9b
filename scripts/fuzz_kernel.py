#!/usr/bin/env python
"""Differential kernel fuzz: RANDOM conllu documents (random trees,
vocabulary drawn half from the model's own gazetteers and half from
junk), this repo's kernel vs the reference engine, mention-exact
(sandbox-only; exits nonzero on first divergence).

Unlike parity_sweep.py (templated corpus) and
parity_sweep_adversarial.py (targeted corruption classes), this
explores the rule cascade's joint state space blind: arbitrary
dependency forests, random funcs/morphs, quotes, speakers, pronouns in
impossible positions.  Deterministic per seed.

Mismatches are retried against fresh reference runs with perturbed heap
layout: the reference breaks antecedent SCORE TIES by iteration order of
an address-hashed set() of Markables, i.e. nondeterministically across
processes (found by seed 15: a pronoun tied between two stacked
same-span mentions, reference split 4/4 over 8 process runs).  A doc
counts as divergent only if the reference never produces our reading.

Usage: python scripts/fuzz_kernel.py [n_docs] [seed]
"""

import os
import random
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("XRENNER_REFERENCE", "/root/reference"))
sys.path.insert(0, REPO)
warnings.filterwarnings("ignore")

MODEL = os.path.join(REPO, "xrenner_spark/models/web")

POS = ["NOUN", "VERB", "DET", "ADJ", "ADV", "PROPN", "PRON", "PUNCT",
       "NUM", "ADP", "CCONJ", "PART"]
FUNCS = ["nsubj", "obj", "det", "amod", "advmod", "conj", "punct", "nmod",
         "appos", "flat", "compound", "cc", "case", "nummod", "acl:relcl",
         "nmod:poss", "cop", "aux", "dep", "xcomp", "mark", "parataxis"]
MORPHS = ["_", "Number=Plur", "Gender=Fem", "Gender=Masc",
          "Gender=Neut|Number=Plur", "Tense=Past"]
JUNK = ["zorblax", "flumph", "qwerty", "x1", "...", "“", "”", "—", "don't",
        "U.S.", "re-do", "3,000", "½"]
PRONOUNS = ["he", "she", "it", "they", "him", "her", "them", "his", "its",
            "I", "you", "we"]


def load_vocab():
    import io
    heads = []
    with io.open(os.path.join(MODEL, "entity_heads.tab"),
                 encoding="utf8") as fh:
        for line in fh:
            if "\t" in line:
                heads.append(line.split("\t")[0])
    names = []
    with io.open(os.path.join(MODEL, "names.tab"), encoding="utf8") as fh:
        for line in fh:
            if line.strip():
                names.append(line.split("\t")[0].split(" ")[0])
    return heads[:400], names[:200]


def rand_doc(rng, heads, names):
    sents = []
    for _s in range(rng.randint(1, 5)):
        lines = []
        if rng.random() < 0.25:
            lines.append("# speaker=%s" % rng.choice(["Ada", "Bob", "x y"]))
        if rng.random() < 0.15:
            lines.append("# s_type=%s" % rng.choice(["decl", "q", "wh"]))
        n = rng.randint(1, 10)
        root = rng.randint(1, n)
        for i in range(1, n + 1):
            pos = rng.choice(POS)
            if pos == "PRON":
                w = rng.choice(PRONOUNS)
            elif pos == "PROPN":
                w = rng.choice(names + ["Zorbia"])
            elif pos == "NOUN":
                w = rng.choice(heads + JUNK)
            elif pos == "PUNCT":
                w = rng.choice([".", ",", '"', "?", ";", "“", "”"])
            else:
                w = rng.choice(heads + JUNK + ["the", "a", "signed", "big"])
            if i == root:
                head, func = 0, "root"
            else:
                # mostly acyclic (head on the path toward the root or an
                # earlier token), sometimes arbitrary (cycles: both
                # engines must raise identically)
                if rng.random() < 0.8:
                    pool = [j for j in range(1, i) if j != i] or [root]
                else:
                    pool = [j for j in range(1, n + 1) if j != i]
                head = rng.choice(pool)
                func = rng.choice(FUNCS)
            lemma = w.lower() if rng.random() < 0.8 else w
            morph = rng.choice(MORPHS)
            lines.append("%d\t%s\t%s\t%s\t%s\t%s\t%d\t%s\t_\t_"
                         % (i, w, lemma, pos, pos, morph, head, func))
        sents.append("\n".join(lines))
    return "\n\n".join(sents) + "\n"


def main():
    from xrenner import Xrenner

    from xrenner_spark import load_lex
    from xrenner_spark.kernel import analyze_document

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = random.Random(seed)
    heads, names = load_vocab()
    lex = load_lex(MODEL)

    def ref_run(doc):
        eng = Xrenner(model=MODEL, rule_based=True, no_seq=True)
        eng.analyze(doc, "none")
        return sorted(
            (m.start, m.end, m.text, m.entity, m.subclass,
             m.agree if m.agree is not None else "", m.form,
             m.definiteness, float(m.cardinality), m.coref_type,
             int(m.group), m.sentence.sent_num)
            for m in eng.markables)

    n_with_mentions = n_both_raise = n_tie_tolerated = 0
    for trial in range(n):
        doc = rand_doc(rng, heads, names)
        ref_err = our_err = None
        theirs = ours = None
        try:
            theirs = ref_run(doc)
        except (SystemExit, Exception) as e:  # noqa: BLE001
            ref_err = type(e).__name__
        try:
            res = analyze_document("fuzz", doc, lex)
            ours = sorted(
                (m["start"], m["end"], m["text"], m["entity"], m["subclass"],
                 m["agree"], m["form"], m["definiteness"],
                 float(m["cardinality"]), m["coref_type"], m["group_id"],
                 m["sent_num"])
                for m in res.mentions)
        except (SystemExit, Exception) as e:  # noqa: BLE001
            our_err = type(e).__name__
        if (ref_err is None) != (our_err is None):
            print("DIVERGE(error-shape) trial=%d seed=%d ref_err=%s our_err=%s"
                  % (trial, seed, ref_err, our_err))
            print(doc)
            raise SystemExit(1)
        if ref_err is not None:
            n_both_raise += 1
            continue
        if ours != theirs:
            # The reference resolves SCORE-TIED antecedent candidates by
            # iterating a raw set() of Markable objects — address-hashed,
            # so the winner depends on heap layout and flips across
            # processes (measured: 4/4 split over 8 runs on one fuzz
            # doc).  A mismatch only counts as divergence if the
            # reference NEVER produces our reading: re-run it with the
            # heap deliberately perturbed between attempts (shifts
            # set iteration order) and tolerate iff some run matches.
            # separate rng: pad draws must not consume the doc-generation
            # stream (retry count depends on the reference's heap layout,
            # so sharing rng would break per-seed reproducibility)
            pad_rng = random.Random(seed * 1_000_003 + trial)
            matched = False
            for _retry in range(8):
                _pad = ["x" * pad_rng.randrange(16, 4096)
                        for _ in range(pad_rng.randrange(1, 64))]
                try:
                    again = ref_run(doc)
                except (SystemExit, Exception):  # noqa: BLE001
                    break
                del _pad
                if again == ours:
                    matched = True
                    break
            if matched:
                n_tie_tolerated += 1
                n_with_mentions += 1
                continue
            print("DIVERGE trial=%d seed=%d" % (trial, seed))
            print(doc)
            print("theirs:", theirs)
            print("ours  :", ours)
            raise SystemExit(1)
        if theirs:
            n_with_mentions += 1
    print("kernel fuzz: %d docs, %d with mentions, %d both-raise, "
          "%d tie-tolerated, 0 divergent (seed=%d)"
          % (n, n_with_mentions, n_both_raise, n_tie_tolerated, seed))


if __name__ == "__main__":
    main()

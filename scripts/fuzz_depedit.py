#!/usr/bin/env python
"""Differential fuzz: random depedit configs x random documents, this
repo's DepEditLite vs the reference DepEdit, byte-compared (sandbox-
only; exits nonzero on the first divergence).

The generator draws from every supported construct class: multi-node
definitions with &-criteria / negation / regex-vs-exact values / {var}
substitution, all relation operators (adjacency, distance bands,
parenthood, == on real AND aliased fields) incl. ;-chains and the
#1>#2>#3 shorthand, #S: sentence-annotation nodes/actions, set actions
with $n groups, head reattachment, and `last`.

Deterministic per seed.
Usage: python scripts/fuzz_depedit.py [n] [seed] [--fixture]
  --fixture also writes the first 40 rule-changed cases (with the
  REFERENCE's outputs) to tests/fixtures/depedit_fuzz.json so pytest
  re-pins them without needing the reference at test time.
"""

import io
import json
import os
import random
import sys
import warnings

REFERENCE = "/root/reference"
warnings.filterwarnings("ignore")
sys.path.insert(0, REFERENCE)
sys.path.insert(0, ".")

POS = ["NOUN", "VERB", "DET", "ADJ", "ADV", "PROPN", "PRON", "PUNCT"]
WORDS = {"NOUN": ["cat", "dog", "bank", "report", "cat"],
         "VERB": ["ran", "saw", "signed"],
         "DET": ["the", "a"],
         "ADJ": ["big", "red"],
         "ADV": ["quickly"],
         "PROPN": ["Ada", "Paris"],
         "PRON": ["she", "it"],
         "PUNCT": [".", ";", ","]}
REAL_FIELDS = ["text", "pos", "lemma", "func", "morph", "num"]
ALIASED_FIELDS = ["form", "upos", "feats", "deprel", "misc"]
FUNCS = ["nsubj", "obj", "det", "amod", "advmod", "conj", "punct", "nmod"]


def rand_doc(rng):
    sents = []
    for _s in range(rng.randint(1, 3)):
        n = rng.randint(2, 8)
        lines = []
        if rng.random() < 0.4:
            lines.append("# speaker=%s" % rng.choice(["Ada", "Bob"]))
        if rng.random() < 0.2:
            lines.append("# s_type=%s" % rng.choice(["decl", "q"]))
        for i in range(1, n + 1):
            pos = rng.choice(POS)
            w = rng.choice(WORDS[pos])
            head = rng.choice([0] + [j for j in range(1, n + 1) if j != i])
            func = "root" if head == 0 else rng.choice(FUNCS)
            morph = rng.choice(["_", "Number=Plur", "Gender=Fem|Tense=Past"])
            lines.append("%d\t%s\t%s\t%s\t%s\t%s\t%d\t%s\t_\t_"
                         % (i, w, w.lower(), pos, pos, morph, head, func))
        sents.append("\n".join(lines))
    return "\n\n".join(sents) + "\n"


def rand_value(rng):
    return rng.choice([
        rng.choice(POS), "NOUN|VERB", "(cat|dog)", "(c.t)", "r.*n",
        "[A-Z].*", "the", "(a|;)", rng.choice(FUNCS)])


def rand_nodedef(rng, variables):
    crits = []
    for _ in range(rng.randint(1, 2)):
        attr = rng.choice(["pos", "text", "lemma", "func", "morph",
                           "position", "num", "upos", "form"])
        neg = "!" if rng.random() < 0.2 else ""
        if attr == "position":
            val = rng.choice(["first", "last", "mid"])
        elif attr == "num":
            val = str(rng.randint(1, 6))
        elif rng.random() < 0.25 and variables:
            val = "{%s}" % rng.choice(sorted(variables))
        else:
            val = rand_value(rng)
        crits.append("%s%s=/%s/" % (attr, neg, val))
    if rng.random() < 0.15:
        return "#S:%s=/%s/" % (rng.choice(["speaker", "s_type", "dlg"]),
                               rng.choice(["Ada", "Bob", ".+", "yes"]))
    return "&".join(crits)


def rand_rule(rng, variables):
    n_nodes = rng.randint(1, 4)
    nodes = [rand_nodedef(rng, variables) for _ in range(n_nodes)]
    if n_nodes == 1:
        rel = "none"
    else:
        rels = []
        avail = list(range(1, n_nodes + 1))
        # connect all nodes (random spanning chain) + optional extra rel
        order = avail[:]
        rng.shuffle(order)
        for i in range(len(order) - 1):
            a, b = order[i], order[i + 1]
            rels.append(rand_rel(rng, a, b))
        if rng.random() < 0.3:
            a, b = rng.sample(avail, 2)
            rels.append(rand_rel(rng, a, b))
        rel = ";".join(rels)
        if (rng.random() < 0.2 and len(rels) == n_nodes - 1
                and all(">" in r or "." in r for r in rels)):
            # occasionally rewrite as chain shorthand where legal
            try:
                rel = shorthand_join(rels)
            except ValueError:
                pass
    # $n is only safe when a POSITIVE criterion carries a capture group
    # (negated criteria yield no groups; the reference sys.exit()s on a
    # dangling $n at action time)
    has_groups = any("(" in crit and "!=" not in crit
                     for node in nodes for crit in node.split("&"))
    actions = []
    for _ in range(rng.randint(1, 2)):
        kind = rng.random()
        tgt = rng.randint(1, n_nodes)
        if kind < 0.5:
            attr = rng.choice(["morph", "func", "lemma", "func2", "pos"])
            val = rng.choice(["X", "Y=Z", "pre-$1"] if has_groups
                             else ["X", "Y=Z", "W"])
            actions.append("#%d:%s=%s" % (tgt, attr, val))
        elif kind < 0.65 and n_nodes >= 2:
            a, b = rng.sample(range(1, n_nodes + 1), 2)
            actions.append("#%d>#%d" % (a, b))
        elif kind < 0.8:
            actions.append("#S:%s=%s" % (rng.choice(["dlg", "seen"]),
                                         rng.choice(["yes", "no"])))
        elif kind < 0.9:
            actions.append("last")
        else:
            attr = rng.choice(REAL_FIELDS + ALIASED_FIELDS)
            # == relations are relations, not actions; emit a set instead
            actions.append("#%d:morph=M" % tgt)
    return "\t".join([";".join(nodes), rel, ";".join(actions)])


def rand_rel(rng, a, b):
    r = rng.random()
    if r < 0.3:
        return "#%d>#%d" % (a, b)
    if r < 0.5:
        return "#%d.#%d" % (a, b)
    if r < 0.7:
        lo = rng.randint(1, 3)
        return "#%d.%d,%d#%d" % (a, lo, lo + rng.randint(0, 5), b)
    field = rng.choice(REAL_FIELDS + ALIASED_FIELDS)
    return "#%d:%s==#%d" % (a, field, b)


def shorthand_join(rels):
    # rels like #1>#2, #2.#3 with matching endpoints -> #1>#2.#3
    out = rels[0]
    for r in rels[1:]:
        left = r.split(">")[0].split(".")[0].split(":")[0]
        if not out.endswith(left):
            raise ValueError("not chainable")
        out += r[len(left):]
    return out


def main():
    from xrenner.modules.depedit import DepEdit

    from xrenner_spark.kernel.depedit_lite import DepEditLite

    class Opts:
        kill = "supertoks"
        quiet = True

    args = [a for a in sys.argv[1:] if a != "--fixture"]
    write_fixture = "--fixture" in sys.argv
    n = int(args[0]) if len(args) > 0 else 500
    seed = int(args[1]) if len(args) > 1 else 40400
    rng = random.Random(seed)
    n_changed = n_loadfail = 0
    fixture_cases = {}
    for trial in range(n):
        variables = {}
        lines = []
        if rng.random() < 0.3:
            for v in ("v1", "v2")[: rng.randint(1, 2)]:
                variables[v] = rand_value(rng)
                lines.append("{%s}=/%s/" % (v, variables[v]))
        for _ in range(rng.randint(1, 3)):
            lines.append(rand_rule(rng, variables))
        ini = "\n".join(lines) + "\n"
        doc = rand_doc(rng)
        try:
            lite = DepEditLite(ini.split("\n"))
        except ValueError:
            n_loadfail += 1
            continue  # constructs we reject at load are out of scope here
        ref_engine = DepEdit(io.StringIO(ini), options=Opts())
        ref = ref_engine.run_depedit(doc.split("\n"))
        if isinstance(ref, list):
            ref = "\n".join(ref)
        ours = lite.run(doc)
        if ours != ref:
            print("DIVERGE trial=%d seed=%d" % (trial, seed))
            print("--- ini ---\n%s--- doc ---\n%s" % (ini, doc))
            print("--- ref ---\n%s\n--- ours ---\n%s" % (ref, ours))
            raise SystemExit(1)
        if ref.strip() != doc.strip():
            n_changed += 1
            if write_fixture and len(fixture_cases) < 40:
                fixture_cases["fuzz_s%d_t%d" % (seed, trial)] = {
                    "ini": ini, "input": doc, "output": ref}
    print("fuzz: %d trials, %d changed-by-rules, %d load-rejected, "
          "0 divergent (seed=%d)" % (n, n_changed, n_loadfail, seed))
    if write_fixture:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "fixtures",
            "depedit_fuzz.json")
        with io.open(path, "w", encoding="utf8") as fh:
            json.dump(fixture_cases, fh, indent=1, ensure_ascii=False)
        print("wrote %d fixture cases -> %s" % (len(fixture_cases), path))


if __name__ == "__main__":
    main()

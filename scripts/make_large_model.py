#!/usr/bin/env python
"""Generate a production-SCALE synthetic model variant: same schema and
config as models/web, but with gazetteers at realistic magnitudes
(~10^5 entries, the size of a real distributed .xrm model's tables —
the reference's shipped eng.xrm carries entity lists of that order).

Purpose: measure what every toy-model number hides — lexicon build
time, broadcast payload size, and kernel docs/s with realistic probe
dictionaries (see BENCH/BASELINE.md "large-model evidence").  The
generated vocabulary is disjoint from the synthetic corpus vocabulary
(pseudo-word stems); kernel output still shifts slightly because the
morph_index suffix buckets (built over entity_heads suffixes) now carry
evidence for unknown corpus heads — so the benchmark reports mention
counts alongside docs/s rather than claiming identical output.  Parity
is always measured on the toy model.

Output dir is untracked (default .large_model/) — regenerate on demand:
    python scripts/make_large_model.py [out_dir] [n_heads] [n_names]
"""

import hashlib
import io
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.path.join(REPO, "xrenner_spark", "models", "web")

ENTITIES = ["person", "place", "organization", "object", "abstract",
            "event", "animal", "plant", "time", "quantity"]
SUBCLASSES = {"person": ["person"], "place": ["city", "country", "river"],
              "organization": ["company", "university", "team"],
              "object": ["building", "artwork", "vehicle"],
              "abstract": ["concept"], "event": ["tournament", "war"],
              "animal": ["animal"], "plant": ["plant"],
              "time": ["time"], "quantity": ["quantity"]}

_SYL1 = ["vra", "zek", "plo", "qui", "marn", "tel", "gos", "hib", "juv", "kyr",
         "lum", "nof", "pex", "rit", "sev", "tov", "wul", "xan", "yer", "zob"]
_SYL2 = ["ach", "ber", "cam", "dor", "eth", "fin", "gar", "hol", "ive", "jun",
         "kel", "lor", "mus", "nar", "oth", "pel", "qua", "rin", "sol", "tur"]
_SYL3 = ["a", "e", "i", "o", "u", "ae", "io", "ua", "ei", "ou"]


def _h(*parts) -> int:
    return int.from_bytes(
        hashlib.md5("|".join(str(p) for p in parts).encode()).digest()[:8], "big")


def pseudo_word(seed: int, title: bool = False) -> str:
    """Injective for seeds < 1.6M: positional syllable decomposition, so
    sequential ids give distinct dictionary keys (probe-dict size is the
    thing under measurement)."""
    s = seed
    w = _SYL1[s % len(_SYL1)]; s //= len(_SYL1)
    w += _SYL2[s % len(_SYL2)]; s //= len(_SYL2)
    w += _SYL3[s % len(_SYL3)]; s //= len(_SYL3)
    if s:
        w += _SYL2[s % len(_SYL2)]; s //= len(_SYL2)
    if s:
        w += _SYL3[s % len(_SYL3)]
    return w.title() if title else w


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".large_model")
    n_heads = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    n_names = int(sys.argv[3]) if len(sys.argv) > 3 else 12000

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    shutil.copytree(BASE, out_dir)

    def append(name, lines):
        with io.open(os.path.join(out_dir, name), "a", encoding="utf8") as fh:
            fh.write("\n".join(lines) + "\n")

    # entity_heads: common-noun heads at production scale
    rows = []
    for i in range(n_heads):
        ent = ENTITIES[_h(i, "e") % len(ENTITIES)]
        sub = SUBCLASSES[ent][_h(i, "s") % len(SUBCLASSES[ent])]
        agree = "inanim" if ent not in ("person", "animal") else ""
        sub_agree = "%s/%s" % (sub, agree) if agree else sub
        rows.append("%s\t%s\t%s\t%d" % (pseudo_word(i), ent, sub_agree,
                                        1 + _h(i, "f") % 40))
    append("entity_heads.tab", rows)

    # entities: multi-token proper-name entries (2-3 tokens)
    rows = []
    for i in range(n_heads // 2):
        n_tok = 2 + _h(i, "nt") % 2
        toks = [pseudo_word(_h(i, "t", j) % 1600000, title=True) for j in range(n_tok)]
        ent = ENTITIES[_h(i, "e2") % len(ENTITIES)]
        sub = SUBCLASSES[ent][_h(i, "s2") % len(SUBCLASSES[ent])]
        rows.append("%s\t%s\t%s\t%d" % (" ".join(toks), ent, sub,
                                        1 + _h(i, "f2") % 9))
    append("entities.tab", rows)

    # names: "First Last" pairs (feeds first/last-name split + stop pairs)
    rows = []
    for i in range(n_names):
        first = pseudo_word(_h(i, "fn") % 1600000, title=True)
        last = pseudo_word(_h(i, "ln") % 1600000, title=True)
        agree = "male" if _h(i, "g") % 2 else "female"
        rows.append("%s %s\t%s" % (first, last, agree))
    append("names.tab", rows)

    # hasa / isa / similar / freqs at proportional scale
    append("hasa.tab", ["%s\t%s\t%d" % (pseudo_word(_h(i, "hp") % 1600000),
                                        pseudo_word(_h(i, "hd") % 1600000),
                                        1 + _h(i, "hn") % 7)
                        for i in range(n_heads // 6)])
    append("isa.tab", ["%s\t%s,%s" % (pseudo_word(_h(i, "ia") % 1600000),
                                      pseudo_word(_h(i, "ib") % 1600000),
                                      pseudo_word(_h(i, "ic") % 1600000))
                       for i in range(n_heads // 12)])
    append("freqs.tab", ["%s\t%d" % (pseudo_word(_h(i, "fq") % 1600000),
                                     1 + _h(i, "fv") % 5000)
                         for i in range(n_heads // 3)])

    sizes = {}
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isfile(p):
            sizes[name] = os.path.getsize(p)
    total_kb = sum(sizes.values()) / 1024.0
    print("large model -> %s  (%.0f KiB on disk)" % (out_dir, total_kb))
    for name in ("entity_heads.tab", "entities.tab", "names.tab",
                 "hasa.tab", "freqs.tab"):
        print("  %-18s %8.0f KiB" % (name, sizes[name] / 1024.0))


if __name__ == "__main__":
    main()

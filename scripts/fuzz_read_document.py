"""Differential fuzz: r6 merged read_document vs the round-start (d696660)
two-pass implementation, adversarial on whitespace-only lines, empty
lines, comments and multiword/ellipsis ids."""
import random, subprocess, sys, types
sys.path.insert(0, "/root/repo")

def load_old(rev, path):
    src = subprocess.check_output(["git", "-C", "/root/repo", "show", rev + ":" + path]).decode()
    src = src.replace("from . import", "from xrenner_spark.kernel import")
    src = src.replace("from .", "from xrenner_spark.kernel.")
    src = src.replace("from xrenner_spark.kernel..", "from xrenner_spark.")
    mod = types.ModuleType("old_parsing_base")
    exec(compile(src, "old:" + path, "exec"), mod.__dict__)
    return mod

old = load_old("d696660", "xrenner_spark/kernel/parsing.py")
import xrenner_spark.kernel.parsing as new
from xrenner_spark.lex import load_lex
lex = load_lex()

WORDS = ["Ada", "Lovelace", "the", "report", "liked", "a", "lot", "it", "He"]
POS = ["NOUN", "PROPN", "VERB", "DET", "PRON", "ADP"]

def rand_doc(rng):
    lines = []
    n_sents = rng.randint(0, 4)
    # leading junk
    for _ in range(rng.randint(0, 3)):
        lines.append(rng.choice(["", " ", "  ", "\t"[0:0], " \t"[0:1]]))
    for s in range(n_sents):
        if rng.random() < 0.4:
            lines.append("# speaker = spk%d" % rng.randint(1, 3))
        if rng.random() < 0.2:
            lines.append("# s_type = decl")
        if rng.random() < 0.15:
            lines.append(" ")  # mid-doc whitespace-only line
        n_toks = rng.randint(1, 5)
        for t in range(1, n_toks + 1):
            w = rng.choice(WORDS)
            p = rng.choice(POS)
            head = rng.randint(0, n_toks)
            if head == t: head = 0
            tid = str(t)
            if rng.random() < 0.05:
                tid = "%d-%d" % (t, t + 1)   # multiword range id
            elif rng.random() < 0.05:
                tid = "%d.1" % t             # ellipsis id
            lines.append("\t".join([tid, w, w.lower(), p, p, "_",
                                    str(head), "dep", "_", "_"]))
        gap = rng.randint(1, 3)
        lines.extend([""] * gap)
        if rng.random() < 0.15:
            lines.append(rng.choice([" ", "  "]))
            lines.extend([""] * rng.randint(0, 2))
    # trailing junk
    for _ in range(rng.randint(0, 3)):
        lines.append(rng.choice(["", " ", "  "]))
    return "\n".join(lines)

def snapshot(doc):
    toks = [(t.tid, t.text, t.lemma, t.pos, t.morph, t.head, t.func,
             t.quoted, t.sentence.sent_num) for t in doc.tokens[1:]]
    sents = [(s.sent_num, s.start_offset, s.token_count, s.length,
              s.text, s.speaker, s.s_type, s.mood) for s in doc.sentences]
    return (toks, sents, sorted(doc.lemma_freqs.items()), doc.token_count,
            sorted((k, tuple(v)) for k, v in doc.children.items()),
            sorted((k, tuple(v)) for k, v in doc.child_funcs.items()))

rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
bad = 0
for i in range(n):
    doc_text = rand_doc(rng)
    try:
        a = snapshot(old.read_document(doc_text, lex))
        ea = None
    except Exception as ex:
        a, ea = None, type(ex).__name__
    try:
        b = snapshot(new.read_document(doc_text, lex))
        eb = None
    except Exception as ex:
        b, eb = None, type(ex).__name__
    if a != b or ea != eb:
        bad += 1
        if bad <= 3:
            print("MISMATCH on doc %d (err %s vs %s):" % (i, ea, eb))
            print(repr(doc_text[:300]))
            if a is not None and b is not None:
                for x, y in zip(a, b):
                    if x != y:
                        print(" old:", str(x)[:200]); print(" new:", str(y)[:200])
print("fuzz: %d docs, %d mismatched" % (n, bad))

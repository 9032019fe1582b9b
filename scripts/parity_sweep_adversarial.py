#!/usr/bin/env python
"""Adversarial parity sweep vs the reference engine (sandbox-only).

Beyond the clean-corpus sweep (parity_sweep.py), this stresses the
cases a web corpus actually contains:

1. unicode  — curly quotes / unicode dashes / non-ASCII letters spliced
              into corpus documents (text, lemma and morph columns)
2. malformed — truncated token lines, non-numeric ids, stray text lines,
              doubled blank lines: parity means BOTH engines raise, or
              both succeed with identical mentions
3. empty    — empty / whitespace-only / comment-only documents
4. supertok — conllu supertoken (`1-2`) and ellipsis (`8.1`) ids
5. windowed — documents > max_sentences: the windowed path deliberately
              cuts cross-window coreference, so this REPORTS the
              divergence bound (mention-field mismatch rate vs the
              exact reference run) instead of requiring zero

Usage: python scripts/parity_sweep_adversarial.py [n_docs_per_class]
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
from xrenner_spark.kernel import (analyze_document,  # noqa: E402
                                  analyze_document_windowed)

MODEL = os.environ.get(
    "XRENNER_MODEL", os.path.join(REPO, "xrenner_spark/models/web"))


def ref_mentions(conllu):
    ref = Xrenner(model=MODEL, rule_based=True, no_seq=True)
    ref.analyze(conllu, "none")
    out = {}
    for m in ref.markables:
        ante = "" if isinstance(m.antecedent, str) else \
            "%d_%d" % (m.antecedent.start, m.antecedent.end)
        out["%d_%d" % (m.start, m.end)] = (
            m.text, m.entity, m.subclass,
            m.agree if m.agree is not None else "", m.form, m.definiteness,
            float(m.cardinality), m.coref_type, m.infstat,
            bool(m.coordinate), ante)
    return out


def my_mentions(conllu, lex, windowed=False, max_sentences=500):
    if windowed:
        res = analyze_document_windowed("d", conllu, lex,
                                        max_sentences=max_sentences)
    else:
        res = analyze_document("d", conllu, lex)
    return {m["mark_id"]: (
        m["text"], m["entity"], m["subclass"], m["agree"], m["form"],
        m["definiteness"], m["cardinality"], m["coref_type"], m["infstat"],
        m["coordinate"], m["antecedent"]) for m in res.mentions}


def compare_exact(conllu, lex, clean_conllu=None):
    """Classify one adversarial document.

    Returns (status, detail): 'ok' (identical output, or both engines
    raise), 'robust' (the REFERENCE crashes, we return sane output —
    when clean_conllu is given, "sane" additionally requires our output
    on the corrupted doc to equal the reference's on the clean doc),
    'fail' (we crash where the reference succeeds, or both succeed with
    different mentions — true semantic divergence)."""
    try:
        theirs = ref_mentions(conllu)
        ref_err = None
    except BaseException as exc:  # reference sys.exit()s on some inputs
        theirs, ref_err = None, type(exc).__name__
    try:
        mine = my_mentions(conllu, lex)
        my_err = None
    except BaseException as exc:
        mine, my_err = None, type(exc).__name__
    if ref_err is not None and my_err is not None:
        return "ok", "both raise (ref=%s mine=%s)" % (ref_err, my_err)
    if ref_err is None and my_err is not None:
        return "fail", "we crash where reference succeeds (%s)" % my_err
    if ref_err is not None:  # reference crashed, we survived
        if clean_conllu is not None:
            clean = ref_mentions(clean_conllu)
            if mine != clean:
                return "fail", ("survived ref crash (%s) but output differs"
                                " from reference-on-clean-doc" % ref_err)
        return "robust", "reference raises %s, we return %d mentions" % (
            ref_err, len(mine))
    if mine != theirs:
        missp = set(mine) ^ set(theirs)
        if missp:
            return "fail", "span diff %s" % sorted(missp)[:4]
        for span in mine:
            if mine[span] != theirs[span]:
                return "fail", "field diff %s %r vs %r" % (
                    span, mine[span], theirs[span])
    return "ok", ""


# ---------------------------------------------------------------------
# adversarial mutators (deterministic)
# ---------------------------------------------------------------------

def mutate_unicode(conllu, doc_id):
    reps = [("the", "“the”"), ("a", "—a"), ("report", "réport"),
            ("Mary", "Máry"), (".", "…")]
    text, lemma = reps[doc_id % len(reps)]
    out = []
    for line in conllu.split("\n"):
        cols = line.split("\t")
        if len(cols) >= 8 and cols[1] == text:
            cols[1] = lemma
        out.append("\t".join(cols))
    return "\n".join(out)


def mutate_malformed(conllu, doc_id):
    lines = conllu.split("\n")
    kind = doc_id % 4
    tok_idx = [i for i, ln in enumerate(lines) if "\t" in ln]
    if not tok_idx:
        return conllu
    i = tok_idx[doc_id % len(tok_idx)]
    if kind == 0:    # truncated line (< 10 cols)
        lines[i] = "\t".join(lines[i].split("\t")[:6])
    elif kind == 1:  # non-numeric id
        cols = lines[i].split("\t")
        cols[0] = "x" + cols[0]
        lines[i] = "\t".join(cols)
    elif kind == 2:  # stray non-tab text line mid-sentence
        lines.insert(i, "stray text line without tabs")
    else:            # doubled blank lines at a SENTENCE BOUNDARY
        blanks = [j for j, ln in enumerate(lines) if ln.strip() == ""]
        j = blanks[doc_id % len(blanks)] if blanks else len(lines)
        lines.insert(j, "")
        lines.insert(j, "")
    return "\n".join(lines)


def mutate_supertok(conllu, doc_id):
    lines = conllu.split("\n")
    tok_idx = [i for i, ln in enumerate(lines) if "\t" in ln]
    if len(tok_idx) < 2:
        return conllu
    i = tok_idx[0]
    cols = lines[i].split("\t")
    super_line = "\t".join(["1-2", cols[1] + "x", "_", "_", "_", "_",
                            "_", "_", "_", "_"])
    lines.insert(i, super_line)
    return "\n".join(lines)


def giant_doc(n_sentences, seed=0):
    blocks = []
    i = seed
    while True:
        blocks.extend(build_document(i)["conllu"].split("\n\n"))
        i += 1
        if len(blocks) >= n_sentences:
            break
    return "\n\n".join(blocks[:n_sentences])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    lex = load_lex(MODEL)
    failures = []

    classes = {
        "unicode": lambda d: (mutate_unicode(build_document(d)["conllu"], d), None),
        # doubled blank lines (kind 3) don't shift token offsets, so our
        # survivor output must equal the reference on the CLEAN doc
        "malformed": lambda d: (mutate_malformed(build_document(d)["conllu"], d),
                                build_document(d)["conllu"] if d % 4 == 3 else None),
        "supertok": lambda d: (mutate_supertok(build_document(d)["conllu"], d), None),
    }
    for name, make in classes.items():
        counts = {"ok": 0, "robust": 0, "fail": 0}
        for d in range(n):
            doc, clean = make(d)
            status, detail = compare_exact(doc, lex, clean_conllu=clean)
            counts[status] += 1
            if status == "fail" and counts["fail"] <= 3:
                print("%s doc %d FAIL: %s" % (name, d, detail))
        print("%-10s %d docs: %d identical, %d robust "
              "(reference crashes, our output verified sane), %d FAIL"
              % (name, n, counts["ok"], counts["robust"], counts["fail"]))
        if counts["fail"]:
            failures.append(name)

    emptyc = {"ok": 0, "robust": 0, "fail": 0}
    for conllu in ["", "\n\n\n", "# speaker=Mary\n\n# s_type=decl\n"]:
        status, detail = compare_exact(conllu, lex)
        emptyc[status] += 1
        if status == "fail":
            print("empty-doc FAIL: %r -> %s" % (conllu[:20], detail))
            failures.append("empty")
    print("%-10s 3 docs: %d identical, %d robust (reference raises "
          "FileNotFoundError treating short input as a path; we return 0 "
          "mentions), %d FAIL"
          % ("empty", emptyc["ok"], emptyc["robust"], emptyc["fail"]))

    # windowed bound: exact reference vs our windowed path on >500-sent
    # docs, including multi-window lengths (2-6 windows) so boundary
    # state seeding, retro-propagation, and cross-window group merging
    # are all exercised.  Gate: <=0.01% mention-field divergence (the
    # r4 bound was 0.3% / measured 0.027%; the r5 seeding + retro pass
    # measured 1 stable field — see COVERAGE.md "giant-document bound").
    # Tie-aware like fuzz_kernel/parity_sweep: the reference resolves
    # score-tied antecedents by iterating an address-hashed set(), so a
    # span's reading can flip across reference PROCESSES (measured: the
    # same doc-10 span diverges in some runs and matches in others).  A
    # divergent span only counts if a heap-perturbed reference re-run
    # never produces our reading.
    total_fields = diverged_fields = tie_tolerated = 0
    import random as _random
    lengths = [650, 650, 650, 650, 1100, 1100, 1100, 1100,
               1700, 1700, 2600, 2600]
    for i, n_sents in enumerate(lengths):
        doc = giant_doc(n_sents, seed=i * 997)
        theirs = ref_mentions(doc)
        mine = my_mentions(doc, lex, windowed=True, max_sentences=500)
        spans = set(theirs) | set(mine)
        total_fields += len(spans)
        bad = {s for s in spans if theirs.get(s) != mine.get(s)}
        if bad:
            pad_rng = _random.Random(i * 1_000_003)
            for _retry in range(4):
                if not bad:
                    break
                _pad = ["x" * pad_rng.randrange(16, 4096)
                        for _ in range(pad_rng.randrange(1, 64))]
                again = ref_mentions(doc)
                del _pad
                matched = {s for s in bad if again.get(s) == mine.get(s)}
                tie_tolerated += len(matched)
                bad -= matched
        for span in sorted(bad):
            diverged_fields += 1
            if diverged_fields <= 5:
                print("windowed DIVERGE doc=%d len=%d span=%s\n"
                      " ref : %s\n ours: %s"
                      % (i, n_sents, span, theirs.get(span),
                         mine.get(span)))
    rate = 100.0 * diverged_fields / max(total_fields, 1)
    print("windowed  %d docs (650-2600 sents): %d/%d mentions diverge "
          "(%.4f%%), %d tie-tolerated — overlap-stitched windows + seeded "
          "parse state + retro-propagation; residual = resolution state "
          "with unbounded lookback only" % (len(lengths), diverged_fields,
                                            total_fields, rate,
                                            tie_tolerated))
    if rate > 0.01:
        failures.append("windowed-bound")

    print("adversarial sweep:", "FAIL %s" % failures if failures else "ALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

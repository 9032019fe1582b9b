"""Oversized-document guard: sentence-window splitting keeps giant pages
from becoming stragglers while preserving document-global ids."""

from xrenner_spark import load_lex
from xrenner_spark.corpus import build_document
from xrenner_spark.kernel import analyze_document, analyze_document_windowed


def test_windowed_equals_exact_below_threshold():
    lex = load_lex()
    conllu = build_document(3)["conllu"]
    a = analyze_document("d", conllu, lex)
    b = analyze_document_windowed("d", conllu, lex, max_sentences=500)
    assert [m["mark_id"] for m in a.mentions] == [m["mark_id"] for m in b.mentions]


def test_windowed_giant_doc():
    lex = load_lex()
    parts = [build_document(i)["conllu"] for i in range(40)]
    giant = "\n\n".join(parts)
    res = analyze_document_windowed("giant", giant, lex, max_sentences=20)

    # token ids are document-global and strictly increasing
    tids = [t["tid"] for t in res.tokens]
    assert tids == sorted(tids) and len(set(tids)) == len(tids)
    assert res.n_tokens == len(res.tokens)

    # windowed mentions equal the union of exact per-window analyses
    blocks = [b for b in giant.split("\n\n") if b.strip()]
    n_exact = sum(
        len(analyze_document(str(w), "\n\n".join(blocks[w:w + 20]), lex).mentions)
        for w in range(0, len(blocks), 20))
    assert len(res.mentions) == n_exact
    assert len(res.mentions) > 100

    # antecedent spans resolve to mentions that exist after rebasing
    spans = {m["mark_id"] for m in res.mentions}
    for m in res.mentions:
        if m["antecedent"]:
            assert m["antecedent"] in spans

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


def test_windowed_stress_geometry_field_exact():
    """2-window stress at an aggressive geometry (120-sentence windows,
    100-sentence overlap): seeded parse state + retro-propagation +
    referenced-context emission make the stitched output FIELD-EXACT to
    the exact path on a 213-sentence doc (round 5; was >=99%)."""
    lex = load_lex()
    giant = "\n\n".join(build_document(i)["conllu"] for i in range(40))
    exact = analyze_document("giant", giant, lex)
    res = analyze_document_windowed("giant", giant, lex,
                                    max_sentences=120, overlap=100)

    def by_span(r):
        return {m["mark_id"]: (m["text"], m["entity"], m["subclass"],
                               m["agree"], m["form"], m["coref_type"],
                               m["infstat"], m["antecedent"])
                for m in r.mentions}
    mine, ref = by_span(res), by_span(exact)
    assert mine == ref


def test_windowed_giant_doc():
    lex = load_lex()
    parts = [build_document(i)["conllu"] for i in range(160)]
    giant = "\n\n".join(parts)
    # ~890 sentences / 7+ windows at the stress geometry (explicit
    # overlap: the adaptive default would grow the window past the doc)
    res = analyze_document_windowed("giant", giant, lex, max_sentences=120,
                                    overlap=100)

    # token ids are document-global and strictly increasing
    tids = [t["tid"] for t in res.tokens]
    assert tids == sorted(tids) and len(set(tids)) == len(tids)
    assert res.n_tokens == len(res.tokens)

    # overlap-stitched windows track the exact full-document analysis:
    # same spans, >=99.8% of mentions field-identical even at this
    # stress geometry (residual = the chain-linearization electorate,
    # COVERAGE.md "giant-document bound" class (f) — antecedent pointers
    # on chains whose window-local fragments only merge globally)
    exact = analyze_document("giant", giant, lex)

    def by_span(result):
        return {m["mark_id"]: (m["text"], m["entity"], m["agree"], m["form"],
                               m["coref_type"], m["infstat"], m["antecedent"])
                for m in result.mentions}
    mine, ref = by_span(res), by_span(exact)
    assert set(mine) == set(ref)
    agree = sum(1 for s in ref if mine[s] == ref[s])
    assert agree / len(ref) >= 0.998, "only %d/%d field-exact" % (agree, len(ref))
    assert len(res.mentions) > 100

    # chain groups stitch across window boundaries: group partitions of
    # the windowed result match the exact analysis on agreeing mentions
    exact_groups = {}
    for m in exact.mentions:
        exact_groups.setdefault(m["group_id"], set()).add(m["mark_id"])
    mine_groups = {}
    for m in res.mentions:
        mine_groups.setdefault(m["group_id"], set()).add(m["mark_id"])
    cross = [g for g in exact_groups.values() if len(g) > 1]
    assert cross, "corpus should produce multi-mention chains"
    mine_parts = {frozenset(v) for v in mine_groups.values()}
    matched = sum(1 for g in cross if frozenset(g) in mine_parts)
    assert matched / len(cross) >= 0.95, "%d/%d chains stitched" % (matched, len(cross))

    # antecedent spans resolve to mentions that exist after rebasing
    spans = {m["mark_id"] for m in res.mentions}
    for m in res.mentions:
        if m["antecedent"]:
            assert m["antecedent"] in spans

"""Triple-level parity: P/R >= 0.95 vs the reference-faithful oracle on the
synthetic web corpus (BASELINE.md headline correctness criterion).

The oracle fixture (goldens_corpus.json) holds the reference engine's
mentions per document; the SAME extractor (xrenner_spark.triples) runs
over both sides, so the comparison isolates kernel parity.
"""

import io
import json
import os

import pytest

from xrenner_spark import load_lex
from xrenner_spark.corpus import build_document, build_page, extract_conllu, extract_text
from xrenner_spark.kernel import analyze_document
from xrenner_spark.triples import extract_triples, parse_verbs, precision_recall

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "fixtures", "goldens_corpus.json")


@pytest.fixture(scope="module")
def lex():
    return load_lex()


def test_corpus_is_deterministic():
    a, b = build_page(7), build_page(7)
    assert a == b
    assert build_page(8)["url"] != a["url"]


def test_html_text_roundtrip_byte_identical():
    for doc_id in range(25):
        page = build_page(doc_id)
        assert extract_text(page["html"]) == page["text"]
        assert extract_conllu(page["html"]) == build_document(doc_id)["conllu"]


def test_corpus_mention_exactness(lex):
    """Mention-level parity on the corpus goldens — stricter than triple
    P/R (canonicalization can mask chain differences: a spurious merge of
    two same-text chains leaves triples unchanged)."""
    goldens = json.load(io.open(GOLDEN, encoding="utf8"))
    fields = ["start", "end", "text", "core_text", "entity", "subclass", "agree",
              "form", "definiteness", "cardinality", "coref_type", "antecedent",
              "infstat", "coordinate"]
    for doc_id, golden in goldens.items():
        conllu = build_document(int(doc_id))["conllu"]
        result = analyze_document(doc_id, conllu, lex)
        mine = {m["mark_id"]: m for m in result.mentions}
        theirs = {m["mark_id"]: m for m in golden["mentions"]}
        assert sorted(mine) == sorted(theirs), "doc %s spans differ" % doc_id
        for span, ref in theirs.items():
            for f in fields:
                key = f if f in mine[span] else f
                assert mine[span][f] == ref[f], (
                    "doc %s %s field %s: %r != %r"
                    % (doc_id, span, f, mine[span][f], ref[f]))
        # chain partitions
        def part(ms, key):
            g = {}
            for m in ms:
                g.setdefault(str(m.get(key, m.get("group"))), set()).add(m["mark_id"])
            return {frozenset(v) for v in g.values()}
        assert part(result.mentions, "group_id") == part(golden["mentions"], "group"), (
            "doc %s chain partitions differ" % doc_id)


def test_triple_precision_recall(lex):
    goldens = json.load(io.open(GOLDEN, encoding="utf8"))
    total_mine = total_ref = total_hit = 0
    worst = []
    for doc_id, golden in goldens.items():
        conllu = build_document(int(doc_id))["conllu"]
        verbs = parse_verbs(conllu)
        ref_triples = extract_triples(golden["mentions"], verbs)
        result = analyze_document(doc_id, conllu, lex)
        my_triples = extract_triples(result.mentions, verbs)
        p, r, n_mine, n_ref, n_hit = precision_recall(my_triples, ref_triples)
        total_mine += n_mine
        total_ref += n_ref
        total_hit += n_hit
        if p < 1.0 or r < 1.0:
            worst.append((doc_id, p, r))
    precision = total_hit / total_mine if total_mine else 1.0
    recall = total_hit / total_ref if total_ref else 1.0
    assert total_ref > 100, "oracle produced too few triples to be meaningful"
    assert precision >= 0.95 and recall >= 0.95, (
        "triple P/R below bar: P=%.4f R=%.4f (mine=%d ref=%d hit=%d); worst docs: %s"
        % (precision, recall, total_mine, total_ref, total_hit, worst[:10]))

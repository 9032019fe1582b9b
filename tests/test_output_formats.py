"""Serialization parity: SGML / CoNLL / OntoNotes / test-format output must
be byte-identical to the reference engine's serializers on every fixture
document (golden strings captured by scripts/make_goldens.py)."""

import glob
import io
import json
import os

import pytest

from xrenner_spark import load_lex
from xrenner_spark.kernel import analyze_document
from xrenner_spark.output import (output_conll, output_conll_sent,
                                  output_onto, output_sgml, output_testcase)

HERE = os.path.dirname(os.path.abspath(__file__))
DOCS = os.path.join(HERE, "fixtures", "docs")
GOLDENS = os.path.join(HERE, "fixtures", "goldens")


@pytest.fixture(scope="module")
def lex():
    return load_lex()


def cases():
    return sorted(glob.glob(os.path.join(GOLDENS, "*.json")))


@pytest.mark.parametrize("golden_path", cases(),
                         ids=[os.path.basename(p)[:-5] for p in cases()])
def test_serializations_match_reference(golden_path, lex):
    golden = json.load(io.open(golden_path, encoding="utf8"))
    if "formats" not in golden:
        pytest.skip("golden lacks format dumps")
    parse = io.open(os.path.join(DOCS, golden["doc"] + ".conllu"),
                    encoding="utf8").read()
    result = analyze_document(golden["doc"], parse, lex)

    assert output_sgml(result) == golden["formats"]["sgml"]
    assert output_conll(result, "untitled") == golden["formats"]["conll"]
    if "conll_sent" in golden["formats"]:
        assert output_conll_sent(result, "untitled") == \
            golden["formats"]["conll_sent"]
    assert output_onto(result, "untitled") == golden["formats"]["onto"]

    # the reference joins the split input lines back for the test format;
    # it embeds the parse AS CONSUMED by the engine, i.e. post-depedit
    # (xrenner_xrenner.py:108-109 rewrites before anything else)
    ref_parse = parse.replace("\r", "")
    if lex.depedit is not None:
        ref_parse = lex.depedit.run(ref_parse)
    mine = output_testcase(result, ref_parse, model=lex.model_dir)
    assert mine == golden["formats"]["unittest"]

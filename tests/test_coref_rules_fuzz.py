"""Pinned coref-rule differential-fuzz cases.

scripts/fuzz_coref_rules.py ran 5,000 random coref_rules.tab configs
(~7,500 random docs, 8 seeds + the fixture seed) against the reference
engine with 0 divergences; these 25 link-producing samples pin that
surface — random constraint mini-language programs (literal / quoted /
regex / anchored values, negation, $1-relative tests, same-family,
last[], mod / has_child_func, group-failure ``*``, directives, and the
reference's silent unknown-key quirks) — WITHOUT needing the reference
at test time.  Regenerate with
``python scripts/fuzz_coref_rules.py 1000 7 --fixture`` (sandbox-only).
"""

import json
import os
import shutil
import tempfile

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
MODEL = os.path.join(HERE, "..", "xrenner_spark", "models", "web")


def _fuzz_cases():
    path = os.path.join(HERE, "fixtures", "coref_rules_fuzz.json")
    with open(path, encoding="utf8") as fh:
        return sorted(json.load(fh).items())


def _mention_tuples(res):
    return sorted(
        [m["start"], m["end"], m["text"], m["entity"], m["subclass"],
         m["agree"], m["form"], m["definiteness"], float(m["cardinality"]),
         m["coref_type"], m["group_id"], m["sent_num"]]
        for m in res.mentions)


@pytest.mark.parametrize("name,case", _fuzz_cases(),
                         ids=[n for n, _ in _fuzz_cases()])
def test_rule_fuzz_cases_match_reference(name, case):
    from xrenner_spark import load_lex
    from xrenner_spark.kernel import analyze_document

    tmp = tempfile.mkdtemp(prefix="coreffuzzpin_")
    try:
        for fname in os.listdir(MODEL):
            if fname == "coref_rules.tab":
                continue
            os.symlink(os.path.join(MODEL, fname), os.path.join(tmp, fname))
        with open(os.path.join(tmp, "coref_rules.tab"), "w",
                  encoding="utf8") as fh:
            fh.write(case["rules"])
        lex = load_lex(tmp)
        ours = _mention_tuples(analyze_document("fuzz", case["input"], lex))
        expected = sorted([list(m) for m in case["mentions"]])
        assert ours == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

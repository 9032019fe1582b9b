#!/usr/bin/env python
"""Capture reference-DepEdit outputs for REAL-WORLD public model configs
(sandbox-only; the fixture is committed).

Two real depedit.ini files ship with public xrenner models:

- models/udx/depedit.ini — one unary morph rule whose value contains
  '=' (``Polarity=Neg``).  The reference's own validator rejects '='
  inside /.../ values (depedit.py:152 ``[^/=]*``) and sys.exit()s, so
  the shipped udx config cannot run through the shipped reference
  engine at all.  DepEditLite accepts it (the intent is unambiguous and
  FEATS values contain '=' by definition) — documented divergence; its
  case below is captured via an '='-free variant of the same rule class
  so the reference CAN produce the oracle output.
- models/cop.xrm depedit.ini — a unary pos rule plus a two-node
  dependency-parent rule with a Coptic regex; runs through the
  reference unchanged.  The verbatim zip config was verified byte-exact
  (reference vs DepEditLite) in-sandbox; the fixture below re-authors
  the same rule classes with different non-ASCII text so the committed
  repo carries no verbatim reference-model content.

Usage: python scripts/make_depedit_realworld.py
"""

import io
import json
import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("XRENNER_REFERENCE", "/root/reference")
warnings.filterwarnings("ignore")
sys.path.insert(0, REFERENCE)

COP_INI = """# same rule classes as cop.xrm's shipped depedit.ini (re-authored)
# make possessive functions
pos=/PPOS/\tnone\t#1:func=poss

# Mark reflexives explicitly
text=/.*/;text=/ⵙ?ⵙⵃⴻⵙ?ⵙⵉ/\t#1>#2\t#1:func=refl
"""

# the udx rule class with an '='-free value, so the reference validator
# passes and can produce the oracle output for the same construct
UDX_LIKE_INI = "# negation label\nmorph=/.*Neg.*/\tnone\t#1:func=neg\n"

DOCS = {
    "cop_possessive_and_reflexive": (COP_INI, """1\tⵡⵉⵡ\tⵡⵉⵡ\tPPOS\tPPOS\t_\t2\tdet\t_\t_
2\tⵠⵉⴻ\tⵠⵉⴻ\tN\tNOUN\t_\t3\tnsubj\t_\t_
3\tⵠⵡⵛ\tⵠⵡⵛ\tV\tVERB\t_\t0\troot\t_\t_
4\tⵙⵙⵃⴻⵙⵙⵉ\tⵙⵙⵃⴻⵙⵙⵉ\tADV\tADV\t_\t3\tadvmod\t_\t_
"""),
    "cop_supertoken_kill": (COP_INI, """1-2\txx\t_\t_\t_\t_\t_\t_\t_\t_
1\tⵙⵙⵃⴻⵙⵙⵉ\tⵙⵙⵃⴻⵙⵙⵉ\tADV\tADV\t_\t2\tadvmod\t_\t_
2\tⵠⵡⵛ\tⵠⵡⵛ\tV\tVERB\t_\t0\troot\t_\t_
"""),
    "udx_like_negation": (UDX_LIKE_INI, """1\tHe\the\tPRON\tPRON\t_\t3\tnsubj\t_\t_
2\tnot\tnot\tPART\tPART\tPolarity=Neg\t3\tadvmod\t_\t_
3\twent\tgo\tVERB\tVERB\tPolarity=Neg|Tense=Past\t0\troot\t_\t_
4\t.\t.\tPUNCT\tPUNCT\t_\t3\tpunct\t_\t_
"""),
}


def main():
    from xrenner.modules.depedit import DepEdit

    class Opts:
        kill = "supertoks"
        quiet = True

    out = {}
    for name, (ini, doc) in DOCS.items():
        engine = DepEdit(io.StringIO(ini), options=Opts())
        result = engine.run_depedit(doc.split("\n"))
        if isinstance(result, list):
            result = "\n".join(result)
        out[name] = {"ini": ini, "input": doc, "output": result}
    path = os.path.join(REPO, "tests", "fixtures", "depedit_realworld.json")
    with io.open(path, "w", encoding="utf8") as fh:
        json.dump(out, fh, indent=1, ensure_ascii=False)
    print("wrote %d cases -> %s" % (len(out), path))


if __name__ == "__main__":
    main()

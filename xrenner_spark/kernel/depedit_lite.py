"""DepEdit-compatible dependency-tree pre-rewriting (minimal subset).

xrenner models ship a ``depedit.ini`` whose rules rewrite the incoming
parse before mention detection (reference invocation
xrenner_xrenner.py:108-109; engine modules/depedit.py:294-939).  This is
a from-scratch implementation of the rule classes the public model
format actually uses, with observable behavior verified golden-exact
against the reference engine (the committed goldens are regenerated
through the reference with the same models/web/depedit.ini).

Supported (validated at load; anything else raises ValueError so a
model needing the full engine fails loudly instead of rewriting wrong):

- node definitions: ``&``-joined ``attr=/value/`` / ``attr!=/value/``
  criteria over text/pos/cpos/lemma/morph/func/head/head2/func2 (+ the
  conllu aliases form/upos/xpos/feats/deprel and ``position=/first|
  last|mid/``); values are implicitly anchored regexes, with the exact-
  string fast path when the value has no regex operators
  (reference depedit.py:181-233 DefinitionMatcher/Definition)
- relations: ``none`` (unary), ``#A.#B`` adjacency, ``#A.n#B`` /
  ``#A.n,m#B`` token-distance bands, ``#A>#B`` dependency parenthood
  (reference depedit.py:475-505 test_relation); one relation per rule
  (multi-relation chains and ``==`` field equality are not supported)
- actions: ``#N:attr=value`` attribute assignment with ``$n`` regex-
  group substitution, and ``#A>#B`` head reattachment
  (reference depedit.py:648-706 execute_action)

Processing mirrors the reference: rules run per sentence in file order,
all matches of a rule are collected before its actions run, actions
apply to every match tuple sequentially, and supertokens (``1-2`` ids)
are removed from the output (xrenner constructs DepEdit with
kill=supertoks, xrenner_xrenner.py:41).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

ALIASES = {"form": "text", "upostag": "pos", "xpostag": "cpos",
           "feats": "morph", "deprel": "func", "deps": "head2",
           "misc": "func2", "xpos": "cpos", "upos": "pos"}

_ATTRS = {"text", "pos", "cpos", "lemma", "morph", "func", "head",
          "head2", "func2", "position"}


class _Tok:
    __slots__ = ("id", "text", "lemma", "pos", "cpos", "morph", "head",
                 "func", "head2", "func2", "position", "is_super", "raw_id")

    def __init__(self, cols: List[str]):
        self.raw_id = cols[0]
        self.is_super = "-" in cols[0]
        self.id = 0.0 if self.is_super else float(cols[0])
        self.text, self.lemma, self.pos, self.cpos, self.morph = cols[1:6]
        self.head = "0" if cols[6] == "_" else cols[6]  # ref: unset head -> 0
        self.func = cols[7]
        self.head2 = cols[8] if len(cols) > 8 else cols[6]
        self.func2 = cols[9] if len(cols) > 8 else cols[7]
        self.position = "mid"

    def serialize(self, ten_col: bool) -> str:
        tid = self.raw_id if self.is_super else \
            ("%g" % self.id if self.id != int(self.id) else str(int(self.id)))
        head = self.head
        if not self.is_super and "." in tid:
            head = "_"
        fields = [tid, self.text, self.lemma, self.pos, self.cpos,
                  self.morph, head, self.func]
        if ten_col:
            fields += [self.head2, self.func2]
        return "\t".join(fields)


class _Criterion:
    def __init__(self, attr: str, value: str, negative: bool):
        attr = ALIASES.get(attr, attr)
        if attr not in _ATTRS:
            raise ValueError("depedit_lite: unsupported attribute %r" % attr)
        self.attr = attr
        self.negative = negative
        anchored = value
        if not anchored.startswith("^"):
            anchored = "^" + anchored
        if not anchored.endswith("$"):
            anchored += "$"
        # exact-string fast path exactly as the reference draws the line
        # (depedit.py:225-233): no regex metacharacters in the raw value
        if re.escape(value) == value and anchored == "^" + value + "$":
            self.exact: Optional[str] = value
            self.rx = None
        else:
            self.exact = None
            self.rx = re.compile(anchored)

    def match(self, tok: _Tok):
        """False, True (no groups), or a match object (groups exposed)."""
        val = getattr(tok, self.attr)
        if self.attr == "head":
            # sentence-local head id, integers without trailing .0
            val = val if val == "0" else ("%g" % float(val))
        if self.exact is not None:
            ok = (val == self.exact)
            return (not ok) if self.negative else ok
        m = self.rx.search(val)
        if self.negative:
            return m is None
        return m if m is not None else False


class _NodeDef:
    def __init__(self, text: str):
        self.criteria = []
        for item in text.split("&"):
            m = re.match(r"([a-z2]+)(!?)=/(.*)/$", item)
            if m is None:
                raise ValueError("depedit_lite: bad node definition %r" % item)
            self.criteria.append(_Criterion(m.group(1), m.group(3),
                                            m.group(2) == "!"))

    def match(self, tok: _Tok):
        """None if no match, else the list of captured group tuples."""
        groups = []
        for crit in self.criteria:
            res = crit.match(tok)
            if res is False or res is None:
                return None
            if res is not True:
                if res.groups():
                    groups.append(res.groups())
        return groups


class _Rule:
    def __init__(self, line: str, line_num: int):
        parts = line.split("\t")
        if len(parts) != 3:
            raise ValueError("depedit_lite line %d: need exactly 3 tab-"
                             "separated fields" % line_num)
        node_text, rel_text, action_text = parts
        self.nodes = [_NodeDef(n) for n in node_text.split(";")]
        self.relation = self._parse_relation(rel_text.strip(), line_num)
        self.actions = [self._parse_action(a.strip(), line_num)
                        for a in action_text.split(";")]

    def _parse_relation(self, text: str, line_num: int):
        if text == "none":
            if len(self.nodes) != 1:
                raise ValueError("depedit_lite line %d: 'none' needs exactly"
                                 " one node" % line_num)
            return None
        text = text.replace(".*", ".1,1000")
        m = re.match(r"#(\d+)(>|\.(?:\d+(?:,\d+)?)?)#(\d+)$", text)
        if m is None:
            raise ValueError("depedit_lite line %d: unsupported relation %r"
                             " (one binary relation per rule)" % (line_num, text))
        a, op, b = int(m.group(1)), m.group(2), int(m.group(3))
        if not (1 <= a <= len(self.nodes) and 1 <= b <= len(self.nodes)):
            raise ValueError("depedit_lite line %d: relation node out of"
                             " range" % line_num)
        if op == ">":
            return (a, ">", 0, 0, b)
        if op == ".":
            return (a, ".", 1, 1, b)
        dm = re.match(r"\.(\d+)(?:,(\d+))?$", op)
        lo = int(dm.group(1))
        hi = int(dm.group(2)) if dm.group(2) else lo
        return (a, ".", lo, hi, b)

    def _parse_action(self, text: str, line_num: int):
        m = re.match(r"#(\d+):([a-z2]+)=(.*)$", text)
        if m is not None:
            attr = ALIASES.get(m.group(2), m.group(2))
            if attr not in _ATTRS:
                raise ValueError("depedit_lite line %d: unsupported action"
                                 " attribute %r" % (line_num, m.group(2)))
            return ("set", int(m.group(1)), attr, m.group(3))
        m = re.match(r"#(\d+)>#(\d+)$", text)
        if m is not None:
            return ("attach", int(m.group(1)), int(m.group(2)))
        raise ValueError("depedit_lite line %d: unsupported action %r"
                         % (line_num, text))

    def apply(self, tokens: List[_Tok]):
        per_node = []
        for node in self.nodes:
            matched = []
            for tok in tokens:
                if tok.is_super:
                    continue
                groups = node.match(tok)
                if groups is not None:
                    matched.append((tok, groups))
            if not matched:
                return
            per_node.append(matched)
        results: List[Tuple] = []
        if self.relation is None:
            results = [((tok,), groups) for tok, groups in per_node[0]]
        else:
            a, op, lo, hi, b = self.relation
            for tok_a, g_a in per_node[a - 1]:
                for tok_b, g_b in per_node[b - 1]:
                    if op == ">":
                        ok = int(float(tok_b.head)) == int(tok_a.id)
                    else:
                        ok = lo <= int(tok_b.id) - int(tok_a.id) <= hi
                    if ok:
                        pair = {a: tok_a, b: tok_b}
                        groups = [g for _idx, gs in sorted(
                            [(a, g_a), (b, g_b)]) for g in gs]
                        results.append((tuple(pair[i + 1]
                                              for i in range(len(self.nodes))),
                                        groups))
        for toks, groups in results:
            flat = [g for tup in groups for g in tup]
            for action in self.actions:
                if action[0] == "set":
                    _kind, idx, attr, value = action
                    for gref in re.findall(r"\$(\d+)([LU]?)", value):
                        gval = flat[int(gref[0]) - 1]
                        if gref[1] == "L":
                            gval = gval.lower()
                        elif gref[1] == "U":
                            gval = gval.upper()
                        value = value.replace("$" + gref[0] + gref[1], gval)
                    setattr(toks[idx - 1], attr, value)
                else:
                    _kind, ia, ib = action
                    tok_a, tok_b = toks[ia - 1], toks[ib - 1]
                    if tok_a is not tok_b:
                        tok_b.head = ("%g" % tok_a.id)


class DepEditLite:
    """Parse a depedit.ini (sequence of lines) and rewrite conllu text."""

    def __init__(self, config_lines):
        self.rules = []
        for i, line in enumerate(config_lines, start=1):
            line = line.rstrip("\n").strip()
            if not line or line.startswith(";"):
                continue
            if line.startswith("#") and not line.startswith("#S:"):
                continue
            if line.startswith("{") or line.startswith("#S:"):
                raise ValueError("depedit_lite: variables/sentence"
                                 " annotations not supported (line %d)" % i)
            self.rules.append(_Rule(line, i))

    def run(self, conllu: str) -> str:
        out: List[str] = []
        sent: List[_Tok] = []
        ten_col = True

        def flush():
            if not sent:
                return
            for tok in sent:
                if not tok.is_super and tok.id == 1.0:
                    tok.position = "first"
            sent[-1].position = "last"  # after "first": ref order, so a
            # single-token sentence matches position=/last/
            for rule in self.rules:
                rule.apply(sent)
            for tok in sent:
                if tok.is_super:
                    continue  # kill=supertoks, as xrenner configures it
                out.append(tok.serialize(ten_col))
            del sent[:]

        for raw in conllu.split("\n"):
            line = raw.strip()
            if sent and "\t" not in line:
                flush()
            if line.startswith("#"):
                out.append(line)
            elif not line:
                out.append("")
            elif "\t" in line:
                cols = line.split("\t")
                if len(cols) <= 8:
                    ten_col = False
                sent.append(_Tok(cols))
        flush()
        # the reference restores the trailing whitespace of the NEWLINE-
        # JOINED input lines (depedit.py:863-866) — i.e. newlines
        # themselves never count as trailing whitespace
        trailing = re.match(r"\s*", conllu.replace("\n", "")[::-1]).group()
        return "\n".join(out).strip() + trailing

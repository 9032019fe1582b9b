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
  ``#A.n,m#B`` token-distance bands, ``#A>#B`` dependency parenthood,
  ``#A:field==#B`` field equality (reference depedit.py:385-505
  matches_relation/test_relation), and ``;``-joined MULTI-RELATION
  chains (e.g. ``#1>#2;#2>#3``, incl. the ``#1>#2>#3`` chain shorthand,
  depedit.py:124-132): each relation is matched in order
  against progressively pruned per-node candidates, pairs are merged
  into complete assignments exactly like the reference's bins
  (depedit.py:507-548 merge_sets: compatible-overlap merge that adopts
  the existing bin's token on conflict and appends one missing node per
  merge, plus the missing-relation patch for node pairs carrying
  several relations), and a rule with any hit-less relation is a no-op
  (matches_relation returning False clears result_sets)
- actions: ``#N:attr=value`` attribute assignment with ``$n`` regex-
  group substitution, ``#A>#B`` head reattachment, ``#S:key=val``
  sentence-annotation assignment, and ``last`` (stop this sentence's
  remaining rules — after the earlier actions ran over every result)
  (reference depedit.py:648-706 execute_action, :379-381)
- ``{var}=/value/`` variable definitions substituted into node
  definitions (reference depedit.py:93-99, 334-338; undefined
  variables raise instead of quit())
- ``#S:key=/val/`` sentence-annotation node definitions: read from
  ``# key=value`` input comments, shadowed by rule-set annotations,
  first matching token registers once, and the node DOMINATES any
  relation it is the left operand of; rule-ADDED annotations serialize
  as ``# key=val`` lines before the sentence's token block
  (reference depedit.py:59-83, 187-189, 365-368, 452, 657-660, 792)
- the ``num`` criterion (raw input token id string)

Processing mirrors the reference: rules run per sentence in file order,
all matches of a rule are collected before its actions run, actions
apply to every match tuple sequentially, and supertokens (``1-2`` ids)
are removed from the output (xrenner constructs DepEdit with
kill=supertoks, xrenner_xrenner.py:41).
"""

from __future__ import annotations

import re
from operator import attrgetter
from typing import List, Optional, Tuple

ALIASES = {"form": "text", "upostag": "pos", "xpostag": "cpos",
           "feats": "morph", "deprel": "func", "deps": "head2",
           "misc": "func2", "xpos": "cpos", "upos": "pos"}

_ATTRS = {"text", "pos", "cpos", "lemma", "morph", "func", "head",
          "head2", "func2", "position", "num"}


class _SentAnnos:
    """Per-sentence annotation state (reference depedit.py:71-83):
    ``input_annotations`` from ``# key=value`` comment lines, and
    ``annotations`` added by ``#S:`` rule actions (only the latter are
    serialized, before the token block, in insertion order)."""

    __slots__ = ("input_annotations", "annotations")

    def __init__(self):
        self.input_annotations = {}
        self.annotations = {}

    def lookup(self, key: str) -> str:
        # rule-set annotations shadow input ones (depedit.py:59-65)
        if key in self.annotations:
            return self.annotations[key]
        return self.input_annotations.get(key, "")


class _Tok:
    __slots__ = ("id", "text", "lemma", "pos", "cpos", "morph", "head",
                 "func", "head2", "func2", "position", "is_super", "raw_id",
                 "num", "sent")

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
        self.num = cols[0]  # raw input id string (reference .num)
        self.sent: Optional[_SentAnnos] = None

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
        if attr.startswith("#S:"):  # sentence-annotation criterion
            self.anno_key: Optional[str] = attr.split(":", 1)[1]
            attr = "#S"
        else:
            self.anno_key = None
            attr = ALIASES.get(attr, attr)
            if attr not in _ATTRS:
                raise ValueError("depedit_lite: unsupported attribute %r"
                                 % attr)
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

        # per-criterion specialized matcher: dispatch on anno/attr/head/
        # exact/negative is decided once here instead of per call — this
        # runs per (token, node, criterion), the depedit hot loop
        self.match = self._build_matcher()

    def _build_matcher(self):
        """Compile this criterion into a closure with the dispatch
        decided once.  Same contract as the generic path: False, True
        (no groups), or a match object (groups exposed)."""
        negative = self.negative
        exact = self.exact
        if self.anno_key is not None:
            key = self.anno_key

            def getval(tok, _k=key):
                return tok.sent.lookup(_k)
        elif self.attr == "head":
            def getval(tok):
                # sentence-local head id, integers without trailing .0
                v = tok.head
                return v if v == "0" else ("%g" % float(v))
        else:
            getval = attrgetter(self.attr)
        if exact is not None:
            if negative:
                return lambda tok: getval(tok) != exact
            return lambda tok: getval(tok) == exact
        search = self.rx.search
        # regex criteria run per (token, rule-node) over a heavily
        # repeating vocabulary (POS tags, functions, frequent words) —
        # memoize per value string, bounded like lex.CachedPattern (r6).
        # Match objects are immutable, so returning the memoized object
        # is transparent to group consumers.
        if negative:
            def neg_matcher(tok, _memo={}):
                v = getval(tok)
                try:
                    return _memo[v]
                except KeyError:
                    r = search(v) is None
                    if len(_memo) < 32768:
                        _memo[v] = r
                    return r
            return neg_matcher

        def matcher(tok, _memo={}):
            v = getval(tok)
            try:
                return _memo[v]
            except KeyError:
                m = search(v)
                r = m if m is not None else False
                if len(_memo) < 32768:
                    _memo[v] = r
                return r
        return matcher

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("match", None)  # closures don't pickle; rebuilt on load
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.match = self._build_matcher()


def _split_outside(text: str, sep: str) -> List[str]:
    """Split on ``sep`` only outside ``/../`` value borders — the
    reference masks in-value separators before splitting (depedit.py:
    30-38 escape(); same toggle-on-every-'/' behavior, quirks and all)."""
    parts, buf, inside = [], [], False
    for ch in text:
        if ch == "/":
            inside = not inside
        if ch == sep and not inside:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


class _NodeDef:
    def __init__(self, text: str):
        self.criteria = []
        # a definition whose TEXT starts with #S: is a sentence-annotation
        # node: only its first matching token registers, and it grants
        # relation dominance (reference depedit.py:187-189, 365-368, 452)
        self.sent_def = text.startswith("#S:")
        for item in _split_outside(text, "&"):
            m = re.match(r"([a-z2]+|#S:[A-Za-z_]+)(!?)=/(.*)/$", item)
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
    def __init__(self, line: str, line_num: int, variables=None):
        parts = line.split("\t")
        if len(parts) != 3:
            raise ValueError("depedit_lite line %d: need exactly 3 tab-"
                             "separated fields" % line_num)
        node_text, rel_text, action_text = parts
        # {var} substitution applies to the definition column only
        # (reference depedit.py:93-99; undefined variable quit()s there,
        # raises here)
        for var in re.findall(r"\{([^}]+)\}", node_text):
            if not variables or var not in variables:
                raise ValueError("depedit_lite line %d: undefined variable"
                                 " {%s}" % (line_num, var))
            node_text = node_text.replace("{" + var + "}", variables[var])
        # node defs split on ';' only OUTSIDE /../ values (reference
        # escape(), depedit.py:30-38 + :103-106)
        self.nodes = [_NodeDef(n) for n in _split_outside(node_text, ";")]
        rel_text = self._normalize_shorthand(rel_text.strip())
        if rel_text == "none":
            if len(self.nodes) != 1:
                raise ValueError("depedit_lite line %d: 'none' needs exactly"
                                 " one node" % line_num)
            self.relations = None
        else:
            self.relations = [self._parse_relation(r.strip(), line_num)
                              for r in rel_text.split(";")]
            # raw per-relation text: the reference books fulfilled
            # relations by STRING, so a config repeating the same
            # relation literally (e.g. "#1.#2;#1.#2") can never be
            # satisfied there — a quirk _solve mirrors
            self.relation_strings = [r.strip() for r in rel_text.split(";")]
        # the reference normalizes the ACTION column too (depedit.py:101)
        # — '#1>#2>#3' expands to two attach actions, and the '.*' ->
        # '.1,1000' replacement applies inside action values (quirk kept)
        action_text = self._normalize_shorthand(action_text.strip())
        self.actions = [self._parse_action(a.strip(), line_num)
                        for a in action_text.split(";")]

    @staticmethod
    def _normalize_shorthand(text: str) -> str:
        """``#1>#2>#3`` chain shorthand -> explicit ``#1>#2;#2>#3``
        relation lists, and ``.*`` -> the 1,1000 distance band, both at
        whole-column level (reference depedit.py:124-132)."""
        text = text.replace(".*", ".1,1000")
        prev = None
        while prev != text:
            prev = text
            text = re.sub(
                r"(#\d+)(>|\.(?:\d+(?:,\d+)?)?)(#\d+)"
                r"(>|\.(?:\d+(?:,\d+)?)?)",
                r"\1\2\3;\3\4", text)
        return text

    #: == fields the reference VALIDATOR accepts (depedit.py:167-168);
    #: the aliased conllu names PASS validation but evaluate through
    #: ParsedToken.__getattr__ which returns None for them — None ==
    #: None, so an aliased-field equality is ALWAYS TRUE in the
    #: reference (load-bearing quirk, mirrored with attr=None here)
    _EQ_REAL = {"text", "pos", "cpos", "lemma", "morph", "func",
                "head", "head2", "func2", "num"}
    _EQ_ALIASED = {"form", "upos", "upostag", "xpos", "xpostag", "feats",
                   "deprel", "deps", "misc"}

    def _parse_relation(self, text: str, line_num: int):
        m = re.match(r"#(\d+):([a-z2]+)==#(\d+)$", text)
        if m is not None:  # field equality (reference depedit.py:389-392)
            field = m.group(2)
            if field in self._EQ_REAL:
                attr = field
            elif field in self._EQ_ALIASED:
                attr = None  # always-equal (reference __getattr__ quirk)
            else:
                raise ValueError("depedit_lite line %d: equality field %r "
                                 "fails the reference validator"
                                 % (line_num, field))
            a, b = int(m.group(1)), int(m.group(3))
            if not (1 <= a <= len(self.nodes) and 1 <= b <= len(self.nodes)):
                raise ValueError("depedit_lite line %d: relation node out of"
                                 " range" % line_num)
            return (a, "==", attr, 0, b)
        m = re.match(r"#(\d+)(>|\.(?:\d+(?:,\d+)?)?)#(\d+)$", text)
        if m is None:
            raise ValueError("depedit_lite line %d: unsupported relation %r"
                             % (line_num, text))
        a, op, b = int(m.group(1)), m.group(2), int(m.group(3))
        if not (1 <= a <= len(self.nodes) and 1 <= b <= len(self.nodes)):
            raise ValueError("depedit_lite line %d: relation node out of"
                             " range" % line_num)
        if op == ">":
            return (a, ">", None, 0, b)
        if op == ".":
            return (a, ".", 1, 1, b)
        dm = re.match(r"\.(\d+)(?:,(\d+))?$", op)
        lo = int(dm.group(1))
        hi = int(dm.group(2)) if dm.group(2) else lo
        return (a, ".", lo, hi, b)

    def _parse_action(self, text: str, line_num: int):
        if text == "last":  # cease processing this sentence's rules
            return ("last",)
        m = re.match(r"#S:([A-Za-z_]+)=([A-Za-z_]+)$", text)
        if m is not None:  # sentence-annotation action (depedit.py:657-660;
            # the value charset is the reference validator's, :175)
            return ("sannot", m.group(1), m.group(2))
        m = re.match(r"#(\d+):([a-z2]+)=(.*)$", text)
        if m is not None:
            attr = ALIASES.get(m.group(2), m.group(2))
            # reference action validator (depedit.py:174): position is a
            # valid CRITERION but not a settable action attribute
            if attr not in _ATTRS or attr == "position":
                raise ValueError("depedit_lite line %d: unsupported action"
                                 " attribute %r" % (line_num, m.group(2)))
            return ("set", int(m.group(1)), attr, m.group(3))
        m = re.match(r"#(\d+)>#(\d+)$", text)
        if m is not None:
            return ("attach", int(m.group(1)), int(m.group(2)))
        raise ValueError("depedit_lite line %d: unsupported action %r"
                         % (line_num, text))

    def _rel_holds(self, rel, tok_a: _Tok, tok_b: _Tok) -> bool:
        _a, op, x, hi, _b = rel
        if op == ">":
            return int(float(tok_b.head)) == int(tok_a.id)
        if op == "==":
            if x is None:  # aliased field: reference compares None==None
                return True
            return getattr(tok_a, x) == getattr(tok_b, x)
        return x <= int(tok_b.id) - int(tok_a.id) <= hi

    def _solve(self, per_node):
        """Complete node assignments for a multi-relation rule, mirroring
        the reference's matches_relation + merge_sets pipeline
        (depedit.py:385-548): relations matched in order over
        progressively pruned candidates; pair sets merged into bins by
        compatible overlap (existing bin wins a conflicting node, one
        missing node adopted per merge); bins covering every node with
        every relation satisfied — directly or via the missing-relation
        patch for multiply-related node pairs — are the solutions."""
        n_nodes, n_rels = len(self.nodes), len(self.relations)
        cands = {i: [tok for tok, _g in per_node[i - 1]]
                 for i in range(1, n_nodes + 1)}
        sets: List[Tuple[int, int, int, _Tok, _Tok]] = []
        failed = False
        for ridx, rel in enumerate(self.relations):
            rel_s = self.relation_strings[ridx]
            a, b = rel[0], rel[4]
            # a sentence-annotation node as the LEFT operand dominates:
            # the relation always holds (reference depedit.py:452 checks
            # matcher1.sent_def only, and not in the == branch)
            dominate = self.nodes[a - 1].sent_def and rel[1] != "=="
            hit_a, hit_b = [], []
            for tok_a in cands[a]:
                for tok_b in cands[b]:
                    if dominate or self._rel_holds(rel, tok_a, tok_b):
                        sets.append((rel_s, a, b, tok_a, tok_b))
                        hit_a.append(tok_a)
                        hit_b.append(tok_b)
            if not hit_a:
                # reference: a hit-less relation clears result_sets, and
                # nothing downstream can recover the missing relation
                failed = True
            cands[a] = [t for t in cands[a] if t in hit_a]
            cands[b] = [t for t in cands[b] if t in hit_b]
        if failed:
            return []
        # Each bin = (node->tok assignment, rel ids, matcher map).  The
        # matcher map {node_idx: token-whose-regex-GROUPS-this-bin-uses}
        # replicates a load-bearing reference quirk: merge_bins MUTATES
        # the existing bin's matcher list in place (skipping def indexes
        # already present) and merged bins share it by shallow copy
        # (depedit.py:608-628), so when several pairs merge through one
        # bin, every resulting solution takes its $n capture groups from
        # the FIRST pair merged for that node — not from its own
        # assigned token.  Verified divergent-then-fixed against the
        # reference (round-4 review finding #1).
        bins: List[Tuple[dict, List[str], dict]] = []
        for rel_s, a, b, tok_a, tok_b in sets:
            nodes_s = {a: tok_a, b: tok_b}
            for nodes_b, rels_b, match_b in list(bins):
                shared_equal = any(k in nodes_b and nodes_b[k] is v
                                   for k, v in nodes_s.items())
                missing = [k for k in nodes_s if k not in nodes_b]
                if shared_equal and missing:
                    for k, v in nodes_s.items():  # in-place, skip present
                        if k not in match_b:
                            match_b[k] = v
                    merged = dict(nodes_b)
                    merged[missing[0]] = nodes_s[missing[0]]
                    bins.append((merged, rels_b + [rel_s], match_b))
            bins.append((nodes_s, [rel_s], dict(nodes_s)))
        solutions, seen = [], set()
        for nodes_b, rels_b, match_b in bins:
            if len(nodes_b) != n_nodes:
                continue
            # relations are booked by raw STRING like the reference's
            # rels lists (merge_sets): a literally-duplicated relation
            # can never reach rel_count, so such rules are no-ops there
            rels = list(rels_b)
            if len(rels) < n_rels:
                for rel_s, a, b, tok_a, tok_b in sets:
                    if (rel_s not in rels and nodes_b.get(a) is tok_a
                            and nodes_b.get(b) is tok_b):
                        rels.append(rel_s)
            if len(rels) != n_rels:
                continue
            key = tuple(id(nodes_b[i]) for i in range(1, n_nodes + 1))
            if key not in seen:
                seen.add(key)
                solutions.append((nodes_b, match_b))
        return solutions

    def apply(self, tokens: List[_Tok]) -> bool:
        """Run the rule over one sentence's tokens.  Returns True when a
        ``last`` action fired (stop processing further rules for this
        sentence, reference depedit.py:379-381)."""
        per_node = []
        for node in self.nodes:
            matched = []
            for tok in tokens:
                if tok.is_super:
                    continue
                groups = node.match(tok)
                if groups is not None:
                    matched.append((tok, groups))
                    if node.sent_def:
                        break  # only the first match registers
            if not matched:
                return False
            per_node.append(matched)
        groups_of = [{id(tok): g for tok, g in matched}
                     for matched in per_node]
        results: List[Tuple] = []
        if self.relations is None:
            results = [((tok,), groups) for tok, groups in per_node[0]]
        else:
            for nodes_b, match_b in self._solve(per_node):
                toks = tuple(nodes_b[i + 1] for i in range(len(self.nodes)))
                # $n groups come from the bin's MATCHER map, which (via
                # the reference's shared-mutation quirk) may name a
                # different token than the assignment for merged nodes
                groups = [g for i in range(len(self.nodes))
                          for g in groups_of[i][
                              id(match_b.get(i + 1, toks[i]))]]
                results.append((toks, groups))
        if not results:
            return False
        # action-outer / result-inner, like the reference's
        # process_sentence -> execute_action nesting: a 'last' action
        # fires after every earlier action ran over ALL results
        for action in self.actions:
            if action[0] == "last":
                return True
            for toks, groups in results:
                if action[0] == "sannot":
                    _kind, key, val = action
                    toks[0].sent.annotations[key] = val
                elif action[0] == "set":
                    _kind, idx, attr, value = action
                    flat = [g for tup in groups for g in tup]
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
        return False


class DepEditLite:
    """Parse a depedit.ini (sequence of lines) and rewrite conllu text."""

    def __init__(self, config_lines):
        self.rules = []
        self.variables = {}
        for i, line in enumerate(config_lines, start=1):
            line = line.rstrip("\n").strip()
            if not line or line.startswith(";"):
                continue
            m = re.match(r"\{([^}]+)\}=/([^\n]+)/$", line)
            if m is not None:  # variable definition (depedit.py:334-338)
                self.variables[m.group(1)] = m.group(2)
                continue
            if line.startswith("#") and not line.startswith("#S:"):
                continue  # comment; #S:-initial lines are rules (:340)
            self.rules.append(_Rule(line, i, self.variables))

    def run(self, conllu: str) -> str:
        out: List[str] = []
        sent: List[_Tok] = []
        ten_col = True
        cur = _SentAnnos()

        def flush():
            nonlocal cur
            if not sent:
                return
            for tok in sent:
                if not tok.is_super and tok.id == 1.0:
                    tok.position = "first"
            sent[-1].position = "last"  # after "first": ref order, so a
            # single-token sentence matches position=/last/
            for rule in self.rules:
                if rule.apply(sent):
                    break  # a 'last' action ends this sentence's rules
            # rule-added sentence annotations serialize before the token
            # block, in insertion order (reference depedit.py:82-83, 792)
            for key, val in cur.annotations.items():
                out.append("# %s=%s" % (key, val))
            for tok in sent:
                if tok.is_super:
                    continue  # kill=supertoks, as xrenner configures it
                out.append(tok.serialize(ten_col))
            del sent[:]
            cur = _SentAnnos()

        for raw in conllu.split("\n"):
            line = raw.strip()
            if sent and "\t" not in line:
                flush()
            if line.startswith("#"):
                out.append(line)
                if "=" in line:  # original comment annos (:815-817)
                    key, val = line[1:].split("=", 1)
                    cur.input_annotations[key.strip()] = val.strip()
            elif not line:
                out.append("")
            elif "\t" in line:
                cols = line.split("\t")
                if len(cols) <= 8:
                    ten_col = False
                tok = _Tok(cols)
                tok.sent = cur
                sent.append(tok)
        flush()
        # the reference restores the trailing whitespace of the NEWLINE-
        # JOINED input lines (depedit.py:863-866) — i.e. newlines
        # themselves never count as trailing whitespace
        trailing = re.match(r"\s*", conllu.replace("\n", "")[::-1]).group()
        return "\n".join(out).strip() + trailing

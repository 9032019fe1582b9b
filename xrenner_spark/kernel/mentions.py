"""Markable span construction and atomicity logic.

Semantics follow the reference's marker module (reference
xrenner/modules/xrenner_marker.py): span = head + dependency descendants,
extended by affix tokens and balanced punctuation, with core text derived
by stripping configured prefixes/suffixes/infixes to a fixpoint.
"""

from __future__ import annotations

import re
from typing import Dict, List

from .classes import DocState, Markable, Sentence, Token


# ----------------------------------------------------------------------
# core-text stripping helpers (xrenner_marker.py:62-115)
# ----------------------------------------------------------------------

def remove_prefix_tokens(marktext: str, lex) -> str:
    if lex.filters["core_prefixes"].match(marktext):
        return lex.filters["core_prefixes"].sub(" ", marktext)
    # a candidate prefix of k WORDS can only match a k-word affix key, so
    # the walk stops past the longest key (r6; identical return values).
    # The bound counts non-empty words, not split items — split(" ")
    # yields empty items on doubled spaces and they must not consume the
    # budget (r6 review fix)
    prefix = ""
    wc = 0
    max_words = lex.affix_max_words()
    for token in marktext.split(" "):
        prefix += token + " "
        if token:
            wc += 1
            if wc > max_words:
                break
        if prefix.strip() in lex.affix_tokens and lex.affix_tokens[prefix.strip()] == "prefix":
            return re.sub(r"^" + re.escape(prefix), "", marktext)
    return marktext


def remove_suffix_tokens(marktext: str, lex) -> str:
    if lex.filters["core_suffixes"].search(marktext):
        return lex.filters["core_suffixes"].sub(" ", marktext)
    suffix = ""
    wc = 0
    max_words = lex.affix_max_words()
    for token in reversed(marktext.split(" ")):
        suffix = token + " " + suffix
        if token:
            wc += 1
            if wc > max_words:
                break
        if suffix.strip() in lex.affix_tokens and lex.affix_tokens[suffix.strip()] == "prefix":
            return re.sub(re.escape(suffix) + r"$", "", marktext)
    return marktext


def remove_infix_tokens(marktext: str, lex) -> str:
    return lex.filters["core_infixes"].sub(" ", marktext)


def replace_head_with_lemma(mark: Markable) -> str:
    # the reference regex-substitutes an escaped (= literal) head text,
    # which is exactly str.replace (xrenner_marker.py same site)
    head_text = mark.head.text
    if head_text == mark.head.lemma or head_text not in mark.core_text:
        return mark.core_text.strip()
    return mark.core_text.replace(head_text, mark.head.lemma).strip()


# ----------------------------------------------------------------------
# predicates
# ----------------------------------------------------------------------

_POS_FUNC_CACHE: dict = {}


def pos_func_combo(pos: str, func: str, pos_func_heads: str) -> bool:
    """'POS!func' exception-list mini-language (xrenner_marker.py:698-711):
    POS+func whitelists a combo, POS!func blacklists it with the POS
    otherwise allowed.  The setting string is parsed once per distinct
    value (model-constant) instead of split per call in the
    head-candidate hot loop; results are identical by construction."""
    parsed = _POS_FUNC_CACHE.get(pos_func_heads)
    if parsed is None:
        entries = frozenset(pos_func_heads.split(";"))
        bang_pos = frozenset(e.split("!", 1)[0] for e in entries if "!" in e)
        parsed = (entries, bang_pos)
        if len(_POS_FUNC_CACHE) < 64:
            _POS_FUNC_CACHE[pos_func_heads] = parsed
    entries, bang_pos = parsed
    if pos + "+" + func in entries:
        return True
    if pos + "!" + func in entries:
        return False
    return pos in bang_pos


def markables_overlap(mark1: Markable, mark2: Markable, lex=None) -> bool:
    """Span intersection, tolerating possessive pronouns inside earlier
    spans (xrenner_marker.py:625-647).

    The pure-int span test runs first: the possessive exception can only
    turn a True into a False, so non-intersecting pairs (the common case
    in the antecedent scan) skip both regex probes entirely."""
    if not (mark2.end >= mark1.start >= mark2.start
            or mark2.end >= mark1.end >= mark2.start):
        return False
    if lex is not None:
        possessive_match = lex.filters["possessive_func"].match
        if (mark1.form == "pronoun" and mark1.start > mark2.start
                and possessive_match(mark1.head.func) is not None):
            return False
        if (mark2.form == "pronoun" and mark2.start > mark1.start
                and possessive_match(mark2.head.func) is not None):
            return False
    return True


def is_atomic(mark: Markable, lex) -> bool:
    """May this markable host nested markables? (xrenner_marker.py:17-59)"""
    atoms = lex.atoms
    marktext = mark.text.strip()
    if marktext in atoms or marktext.lower() in atoms:
        return True
    if remove_prefix_tokens(marktext, lex).strip() in atoms:
        return True
    if remove_suffix_tokens(marktext, lex).strip() in atoms:
        return True
    if remove_infix_tokens(marktext, lex).strip() in atoms:
        return True
    if mark.core_text in atoms:
        return True
    if replace_head_with_lemma(mark) in atoms:
        return True
    parts = marktext.split(" ")
    if 0 < marktext.count(" ") < 3 and parts[0] in lex.first_names and parts[-1] in lex.last_names:
        return True
    non_essential = [mod.text for mod in mark.head.modifiers
                     if lex.filters["non_essential_mod_func"].match(mod.func)]
    if non_essential:
        unmod = mark.core_text
        for mod in non_essential:
            unmod = unmod.replace(mod + " ", "")
        if unmod in atoms:
            return True
    return False


# ----------------------------------------------------------------------
# modifier-based entity recognition (used both for typing and atomicity)
# ----------------------------------------------------------------------

def get_mod_ordered_dict(mod: Token) -> "Dict[int, Token]":
    """A modifier and its recursive submodifiers ordered by position
    (xrenner_marker.py:596-610)."""
    out = {mod.tid: mod}
    if not mod.modifiers:
        return out
    for sub in mod.modifiers:
        out.update(get_mod_ordered_dict(sub))
    return dict(sorted(out.items()))


def recognize_entity_by_mod(mark: Markable, lex, mark_atoms: bool = False):
    """Entity guess from modifier strings; returns (entity, subclass_raw,
    atomic) or None (xrenner_marker.py:533-560)."""
    for mod in mark.head.modifiers:
        mod_tokens = [mod.text, _modifier_substring(mod)]
        while mod_tokens:
            substr = ""
            for token in mod_tokens:
                substr += token + " "
                for probe in (substr.strip(), substr.lower().strip()):
                    if probe in lex.entity_mods:
                        entity, subclass = lex.entity_mods[probe][0]
                        atomic = mark_atoms and probe in lex.mod_atoms
                        return entity, subclass, atomic
            mod_tokens.pop(0)
    return None


def _modifier_substring(modifier: Token) -> str:
    return " ".join(tok.text for tok in get_mod_ordered_dict(modifier).values()).strip()


def stoplist_prefix_tokens(mark: Markable, prefix_dict, keys_to_pop: List):
    """Suppress modifier tokens that begin a known entity-modifier prefix
    (xrenner_marker.py:577-593)."""
    substr = ""
    candidate_prefix = ""
    for mod in mark.head.modifiers:
        mod_dict = get_mod_ordered_dict(mod)
        for member in mod_dict.values():
            candidate_prefix += member.text + " "
        for token in candidate_prefix.strip().split(" "):
            substr += token + " "
            if substr.strip() in prefix_dict:
                affected = substr.count(" ")
                for i, mod_tid in enumerate(mod_dict):
                    if i < affected and mod_tid != mark.head.tid:
                        keys_to_pop.append(mod_tid)


# ----------------------------------------------------------------------
# span extension helpers
# ----------------------------------------------------------------------

def markable_extend_affixes(start: int, end: int, doc: DocState,
                            sent_start: int, upto: int) -> List[int]:
    """Find an adjacent affix-token window to absorb (xrenner_marker.py:650-669)."""
    lex = doc.lex
    # accumulation bounded by the longest affix key in WORDS (r6): a
    # candidate holding more words than the longest key can never match,
    # and the word count only grows.  The bound counts words, not
    # tokens — an empty-FORM token adjacent to the span consumes a loop
    # step without adding a word, so a token-window slice missed keys
    # sitting just past it (r6 review fix; reference walks unbounded)
    max_words = lex.affix_max_words()
    candidate = ""
    wc = 0
    for tok in reversed(doc.tokens[sent_start:start]):
        candidate = tok.text + " " + candidate
        wc += len(tok.text.split())
        if wc > max_words:
            break
        for probe in (candidate.lower().strip(), candidate.strip()):
            if probe in lex.affix_tokens:
                if lex.affix_tokens[probe] == "prefix":
                    return [tok.tid, tok.tid + candidate.count(" ")]
                break
    candidate = ""
    wc = 0
    for tok in doc.tokens[end + 1:upto + 1]:
        candidate += tok.text + " "
        wc += len(tok.text.split())
        if wc > max_words:
            break
        for probe in (candidate.lower().strip(), candidate.strip()):
            if probe in lex.affix_tokens:
                if lex.affix_tokens[probe] == "suffix":
                    return [tok.tid - candidate.strip().count(" "), tok.tid + 1]
                break
    return [0, 0]


def markable_extend_punctuation(marktext: str, adjacent: Token,
                                punct_dict: Dict[str, str], direction: str) -> bool:
    """Extend over a closing (or opening) bracket/quote when its partner is
    inside the span (xrenner_marker.py:613-622)."""
    # the adjacent-token equality is tested first: it's one pointer/str
    # compare vs substring scans of the span text, and almost no tokens
    # are partner punctuation (conjunction order has no side effects)
    adjacent_text = adjacent.text
    if direction == "trailing":
        for opener, closer in punct_dict.items():
            if adjacent_text == closer \
                    and ((" " + opener + " ") in marktext
                         or marktext.startswith(opener + " ")):
                return True
    else:
        for closer, opener in punct_dict.items():
            if adjacent_text == opener \
                    and ((" " + closer + " ") in marktext
                         or marktext.endswith(" " + closer)):
                return True
    return False


# ----------------------------------------------------------------------
# the span builder (xrenner_marker.py:720-810)
# ----------------------------------------------------------------------

def make_markable(tok: Token, doc: DocState, descendants: Dict[int, List[int]],
                  tokoffset: int, sentence: Sentence, keys_to_pop: List,
                  upto: int) -> Markable:
    lex = doc.lex
    toks = doc.tokens
    if tok.tid in descendants and lex.filters["non_extend_pos"].match(tok.pos) is None:
        span = sorted(descendants[tok.tid] + [tok.tid])
        start, end = min(span), max(span)
        marktext = "".join(t.text + " " for t in toks[start:end + 1]).strip()
    else:
        marktext = tok.text
        start = end = tok.tid

    # re-attach a trailing coordinating conjunct that the parser hung
    # outside the span
    if end < upto:
        coord = toks[end + 1]
        if lex.filters["cc_left_to_right"]:
            not_head_child = coord.head != tok.tid
        else:
            coord_grand_head = 0
            coord_parent = toks[coord.head]
            if coord_parent.head != 0:
                coord_grand_head = coord_parent.head
            not_head_child = (coord_parent.head != tok.tid
                              and coord_grand_head == tok.tid
                              and coord_parent.head != 0
                              and coord_parent.head > tok.tid)
        if lex.filters["coord_func"].match(coord.func) is not None \
                and not_head_child and coord.head >= start:
            conjunct1 = toks[toks[end + 1].head]
            for tok2 in toks[end + 1:upto + 1]:
                if (tok2.head == conjunct1.head and tok2.func == conjunct1.func) \
                        or tok2.head == coord.tid:
                    span = [tok2.tid, end]
                    if tok2.tid in descendants:
                        span += descendants[tok2.tid]
                    end = max(span)
                    marktext = "".join(t.text + " " for t in toks[start:end + 1])
                    break

    core_text = marktext.strip()

    # absorb adjacent affix tokens (not for pronouns / stop functions)
    if lex.filters["stop_func"].match(tok.func) is None \
            and lex.filters["pronoun_pos"].match(tok.pos) is None:
        lo, hi = markable_extend_affixes(start, end, doc, tokoffset + 1, upto)
        if lo != 0:
            if lo < start:
                prefix_text = ""
                for ptok in toks[lo:hi]:
                    prefix_text += ptok.text + " "
                    keys_to_pop.append(ptok.tid)
                    start -= 1
                marktext = prefix_text + marktext
            else:
                for stok in toks[lo:hi]:
                    keys_to_pop.append(stok.tid)
                    marktext += stok.text + " "
                    end += 1

    # balanced punctuation extension
    if end < upto:
        if markable_extend_punctuation(marktext, toks[end + 1],
                                       lex.open_close_punct, "trailing"):
            marktext += toks[end + 1].text + " "
            end += 1
    if start > 0:
        if markable_extend_punctuation(marktext, toks[start - 1],
                                       lex.open_close_punct_rev, "leading"):
            marktext = toks[start - 1].text + " " + marktext
            start -= 1

    mark = Markable(0, tok, "", "", start, end, core_text, core_text, "", "",
                    "", "new", "", sentence, None, "none", 0, [], [], [])
    # strip prefixes/suffixes/infixes to a fixpoint for the core text
    stripped = remove_infix_tokens(
        remove_suffix_tokens(remove_prefix_tokens(mark.core_text, lex), lex), lex)
    while stripped.strip() != core_text:
        core_text = stripped.strip()
        stripped = remove_infix_tokens(
            remove_suffix_tokens(remove_prefix_tokens(core_text, lex), lex), lex)
    mark.core_text = core_text if core_text != "" else marktext.strip()
    mark.text = marktext.strip()
    return mark

"""Antecedent search: the ordered rule cascade over previous markables.

Semantics follow the reference's coref module (reference
xrenner/modules/xrenner_coref.py:13-163): for each anaphor, the first rule
whose anaphor constraints match runs a backwards scan (forwards for
``lookahead``) bounded by the rule's sentence distance, filtering through
the match ladder; the candidate set is pruned and the best candidate wins.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

from .classes import DocState, Markable
from .compat import (acronym_match, agree_compatible, best_candidate,
                     cardinality_compatible, entities_compatible,
                     group_agree_compatible, isa, merge_entities,
                     modifiers_compatible, propagate_entity, speaker_compatible)
from .mentions import markables_overlap
from ..rules import rule_applies


def find_antecedent(markable: Markable, doc: DocState, lex,
                    restrict_rule: str = "") -> Tuple[Optional[Markable], Optional[str]]:
    """(reference xrenner_coref.py:13-38)"""
    candidate = None
    propagation = None
    for rule in doc.coref_rules:
        if restrict_rule == "" or restrict_rule in rule.ana_spec:
            if rule_applies(rule.ana_constraints, markable, lex, doc):
                candidate = search_prev_markables(markable, doc, lex, rule)
                if candidate is not None:
                    propagation = rule.propagation
                    break
    return candidate, propagation


def search_prev_markables(markable: Markable, doc: DocState, lex, rule) -> Optional[Markable]:
    """(reference xrenner_coref.py:41-163)"""
    f = lex.filters
    previous_markables = doc.markables
    ante_spec = rule.ante_spec
    max_dist = rule.max_distance
    lookahead = ante_spec.find("lookahead") > -1

    candidates = []  # insertion-ordered candidate set

    def add(cand):
        if cand not in candidates:
            candidates.append(cand)

    scan = previous_markables if lookahead else reversed(previous_markables)
    for candidate in scan:
        if markable.sentence.sent_num - candidate.sentence.sent_num <= max_dist:
            direction_ok = ((markable.head.tid > candidate.head.tid and not lookahead)
                            or (markable.head.tid < candidate.head.tid and lookahead))
            if not direction_ok:
                continue
            if candidate.group in markable.non_antecdent_groups:
                continue
            if not rule_applies(rule.ante_constraints, candidate, lex, doc, anaphor=markable):
                continue
            if not f["no_overlap"] or not markables_overlap(markable, candidate, lex):
                if markable.form == "pronoun":
                    if agree_compatible(markable, candidate, lex) or \
                            (ante_spec.find("anyagree") > -1
                             and group_agree_compatible(markable, candidate, previous_markables, lex)):
                        if entities_compatible(markable, candidate, lex) and \
                                cardinality_compatible(markable, candidate):
                            if speaker_compatible(markable, candidate, previous_markables):
                                add(candidate)
                elif markable.text == candidate.text or \
                        (len(markable.text) > 4 and candidate.text.lower() == markable.text.lower()):
                    add(candidate)
                elif markable.text + "|" + candidate.text in lex.coref and \
                        entities_compatible(markable, candidate, lex) and \
                        agree_compatible(markable, candidate, lex):
                    add(candidate)
                elif markable.core_text + "|" + candidate.core_text in lex.coref and \
                        entities_compatible(markable, candidate, lex) and \
                        agree_compatible(markable, candidate, lex):
                    add(candidate)
                elif markable.entity == candidate.entity and \
                        agree_compatible(markable, candidate, lex) and \
                        (markable.head.text == candidate.head.text
                         or (len(markable.head.text) > 3
                             and candidate.head.text.lower() == markable.head.text.lower())
                         or (markable.core_text.count(" ") > 2
                             and markable.core_text.lower() == candidate.core_text.lower())
                         or (markable.head.lemma == candidate.head.lemma
                             and f["lemma_match_pos"].match(markable.head.pos) is not None
                             and f["lemma_match_pos"].match(candidate.head.pos) is not None)):
                    if modifiers_compatible(markable, candidate, lex, doc) and \
                            modifiers_compatible(candidate, markable, lex, doc):
                        add(candidate)
                elif (markable.entity == candidate.entity
                      or len(set(markable.alt_entities) & set(candidate.alt_entities)) > 0) \
                        and isa(markable, candidate, lex, doc):
                    candidate.isa = True
                    add(candidate)
                elif agree_compatible(markable, candidate, lex) and \
                        (markable.head.text == candidate.head.text
                         or (markable.head.lemma == candidate.head.lemma
                             and f["lemma_match_pos"].match(markable.head.pos) is not None
                             and f["lemma_match_pos"].match(candidate.head.pos) is not None)):
                    if merge_entities(markable, candidate, previous_markables, lex, doc):
                        add(candidate)
                elif entities_compatible(markable, candidate, lex) and \
                        isa(markable, candidate, lex, doc):
                    if merge_entities(markable, candidate, previous_markables, lex, doc):
                        candidate.isa = True
                        add(candidate)
            elif (f["match_acronyms"] and markable.head.text.isupper()) \
                    or candidate.head.text.isupper():
                if acronym_match(markable, candidate, lex) or \
                        acronym_match(candidate, markable, lex):
                    if modifiers_compatible(markable, candidate, lex, doc) and \
                            modifiers_compatible(candidate, markable, lex, doc):
                        if merge_entities(markable, candidate, previous_markables, lex, doc):
                            add(candidate)
            # catch-all directive; note it is not gated by the overlap check
            if ante_spec.find("anytext") > -1:
                if (ante_spec.find("anyagree") > -1
                        and group_agree_compatible(markable, candidate, previous_markables, lex)) \
                        or agree_compatible(markable, candidate, lex):
                    if ante_spec.find("anycardinality") > -1 or \
                            cardinality_compatible(markable, candidate):
                        if ante_spec.find("anyentity") > -1 or \
                                entities_compatible(markable, candidate, lex):
                            add(candidate)
        elif not lookahead:
            break  # beyond max_dist, stop scanning backwards

    if not candidates:
        return None

    # prune by agreement->entity mapping and person/no_person_agree clashes
    # (reference xrenner_coref.py:124-137)
    person = f["person_def_entity"]
    to_remove = []
    last_pruned_iter = None
    for cand in candidates:
        last_pruned_iter = cand
        for agree, ent in f["agree_entity_mapping"].items():
            if markable.agree == agree and cand.entity != ent:
                to_remove.append(cand)
        if cand.entity == person and (cand.form != "pronoun"
                                      or markable.entity_certainty == "certain") \
                and f["no_person_agree"].match(markable.agree or "") is not None:
            to_remove.append(cand)
        elif markable.entity == person and (markable.form != "pronoun"
                                            or markable.entity_certainty == "certain") \
                and f["no_person_agree"].match(cand.agree or "") is not None:
            to_remove.append(cand)
    candidates = [c for c in candidates if c not in to_remove]
    if not candidates:
        return None

    take_first = ante_spec.find("takefirst") > -1
    best = best_candidate(markable, candidates, lex, doc, rule, take_first=take_first)
    if best is not None:
        if markable.text + "|" + best.text in lex.coref:
            markable.coref_type = lex.coref[markable.text + "|" + best.text]
            propagate_entity(markable, best, rule.propagation)
        elif markable.core_text + "|" + best.core_text in lex.coref:
            markable.coref_type = lex.coref[markable.core_text + "|" + best.core_text]
            # reference quirk kept: this branch propagates to the last
            # candidate iterated during pruning (xrenner_coref.py:148)
            propagate_entity(markable, last_pruned_iter)
        elif rule.propagation.startswith("propagate"):
            propagate_entity(markable, best, rule.propagation)
    if best is not None and best.isa:
        if best.isa_dir != "":
            if best.isa_dir == "markable":
                markable.isa_partner_head = best.head.lemma
            else:
                best.isa_partner_head = markable.head.lemma
            best.isa_dir = ""
        best.isa = False
    return best


_NO_ANTECEDENT_CACHE: dict = {}


def _compile_no_antecedent(setting: str):
    """Parse the no_antecedent mini-language once per setting string."""
    compiled = []
    for constraint in setting.split(";"):
        descs = []
        for token_description in constraint.split("&"):
            anchor = token_description[:1]
            if anchor not in ("^", "$", "@"):
                return None  # invalid description: prohibition never applies
            pos, word = token_description[1:].split("/")
            negative_pos = pos.startswith("!")
            if negative_pos:
                pos = pos[1:]
            negative_word = word.startswith("!")
            if negative_word:
                word = word[1:]
            descs.append((anchor, re.compile(pos), negative_pos,
                          re.compile(word), negative_word))
        compiled.append(descs)
    return compiled


def antecedent_prohibited(markable: Markable, doc: DocState, lex) -> bool:
    """no_antecedent pattern mini-language: ^initial / $final / @head token
    POS+text tests (reference xrenner_coref.py:182-230)."""
    setting = lex.filters["no_antecedent"]
    if not isinstance(setting, str) or "/" not in setting:
        return False
    if setting not in _NO_ANTECEDENT_CACHE:
        _NO_ANTECEDENT_CACHE[setting] = _compile_no_antecedent(setting)
    compiled = _NO_ANTECEDENT_CACHE[setting]
    if compiled is None:
        return False
    mismatch = True
    for descs in compiled:
        if not mismatch:
            return True
        mismatch = False
        for anchor, pos_re, negative_pos, word_re, negative_word in descs:
            if anchor == "^":
                test_token = doc.tokens[markable.start]
            elif anchor == "$":
                test_token = doc.tokens[markable.end]
            else:
                test_token = markable.head
            pos_hit = pos_re.match(test_token.pos) is not None
            word_hit = word_re.match(test_token.text) is not None
            if (not pos_hit and not negative_pos) or (pos_hit and negative_pos) or \
                    (not word_hit and not negative_word) or (word_hit and negative_word):
                mismatch = True
                break
    return not mismatch

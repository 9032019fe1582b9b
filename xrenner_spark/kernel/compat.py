"""Compatibility predicates, isa matching, group merging, candidate
scoring and feature propagation.

Semantics follow the reference's compatible/propagate modules (reference
xrenner/modules/xrenner_compatible.py, xrenner_propagate.py), including
their deliberate asymmetries (entity leniency applies to the anaphor's
pronoun form only) and mutation channels (agreement alternation rewrites
``agree`` on match; modifier/isa incompatibility is memoized per document).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Set

from .classes import DocState, Markable
from .mentions import markables_overlap, remove_suffix_tokens


# ----------------------------------------------------------------------
# pairwise predicates
# ----------------------------------------------------------------------

def entities_compatible(mark1: Markable, mark2: Markable, lex) -> bool:
    """(reference xrenner_compatible.py:14-40)"""
    if mark1.entity == mark2.entity:
        return True
    if mark1.entity is None or mark2.entity is None or mark1.entity == "" or mark2.entity == "":
        return True
    if mark1.form == "pronoun" and (
            not (mark1.entity == lex.filters["person_def_entity"]
                 and mark2.entity != lex.filters["person_def_entity"])
            or mark1.entity_certainty == ""):
        return True
    if mark1.entity in mark2.alt_entities and mark2.entity_certainty in ("uncertain", "propagated"):
        return True
    if mark2.entity in mark1.alt_entities and mark1.entity_certainty in ("uncertain", "propagated"):
        return True
    if mark2.entity == lex.filters["default_entity"] and \
            mark2.entity_certainty in ("", "propagated", "uncertain"):
        return True
    if mark1.entity == lex.filters["default_entity"] and \
            mark1.entity_certainty in ("", "propagated", "uncertain"):
        return True
    return False


def cardinality_compatible(mark1: Markable, mark2: Markable) -> bool:
    if mark1.cardinality != 0 and mark2.cardinality != 0:
        return mark1.cardinality == mark2.cardinality
    return True


def agree_compatible(mark1: Markable, mark2: Markable, lex) -> bool:
    """(reference xrenner_compatible.py:185-213; note the agree rewrite on
    alternate-agreement match)"""
    f = lex.filters
    if mark1.agree == mark2.agree:
        return True
    if f["no_person_agree"].match(mark1.agree or "") and \
            mark2.entity == f["person_def_entity"]:
        return False
    if f["no_person_agree"].match(mark2.agree or "") and \
            mark1.entity == f["person_def_entity"]:
        return False
    if mark1.agree in mark2.alt_agree:
        mark2.agree = mark1.agree
        _mark_retro(mark2, mark1)
        return True
    if mark2.agree in mark1.alt_agree:
        mark1.agree = mark2.agree
        _mark_retro(mark1, mark2)
        return True
    empty1 = mark1.agree is None or mark1.agree == ""
    empty2 = mark2.agree is None or mark2.agree == ""
    if empty1 and empty2:
        return True
    if (empty1 and f["agree_with_unknown"].match(mark2.agree) is not None) or \
            (empty2 and f["agree_with_unknown"].match(mark1.agree) is not None):
        return True
    return False


def never_agree(candidate: Markable, markable: Markable, lex) -> bool:
    pairs_setting = lex.filters["never_agree_pairs"]
    if "+" in pairs_setting:
        for pair in pairs_setting.split(";"):
            a, b = pair.split("+")
            if {markable.agree, candidate.agree} == {a, b} or \
                    (a == b and markable.agree == a and candidate.agree == a):
                return True
    return False


def group_agree_compatible(markable: Markable, candidate: Markable,
                           previous_markables, lex) -> bool:
    """No two never-agree classes across the union of both groups
    (reference xrenner_compatible.py:471-491)."""
    pairs_setting = lex.filters["never_agree_pairs"]
    if "+" not in pairs_setting:
        return True
    agreements = [m.agree for m in previous_markables
                  if m.group in (markable.group, candidate.group)]
    for pair in pairs_setting.split(";"):
        a, b = pair.split("+")
        if a in agreements and b in agreements:
            return False
    return True


def speaker_compatible(markable: Markable, candidate: Markable, previous_markables) -> bool:
    """1st/2nd-person pronoun speaker logic (reference xrenner_compatible.py:494-513)."""
    m_agree = markable.agree or ""
    c_agree = candidate.agree or ""
    if "1" in m_agree or "2" in m_agree or "1" in c_agree or "2" in c_agree:
        markable_speaker = candidate_speaker = ""
        if candidate.speaker != "" and "1" in c_agree:
            candidate_speaker = candidate.speaker
        for mark in previous_markables:
            if "1" in (mark.agree or "") and mark.speaker != "":
                markable_speaker = mark.speaker
                break
        if "1" in m_agree and markable.speaker != "":
            markable_speaker = markable.speaker
        if markable_speaker != candidate_speaker and markable_speaker != "" \
                and candidate_speaker != "":
            return False
        if ("2" in c_agree and "1" in m_agree) or ("1" in c_agree and "2" in m_agree):
            if markable_speaker == candidate_speaker and markable_speaker != "":
                return False
    return True


def modifiers_compatible(markable: Markable, candidate: Markable, lex,
                         doc: DocState, allow_force_proper_mod_match: bool = True) -> bool:
    """Modifier clash stack (reference xrenner_compatible.py:54-182)."""
    f = lex.filters
    if "%d|%d" % (markable.id, candidate.id) in doc.incompatible_mod_pairs:
        return False
    proper_mod_must_match = f["proper_mod_must_match"] if allow_force_proper_mod_match else False

    if not cardinality_compatible(markable, candidate):
        return False

    if f["no_new_modifiers"]:
        first_mark, second_mark = candidate, markable
        if markable.start < candidate.start:
            first_mark, second_mark = markable, candidate
        # reference-faithful: the earlier mention's modifier collection is a
        # one-shot generator, so each membership test consumes it
        # (xrenner_compatible.py:82-90)
        first_mods = iter([m.text for m in first_mark.head.modifiers])
        for mod in second_mark.head.modifiers:
            if f["det_func"].match(mod.func) is None and mod.text not in first_mods:
                if f["use_new_modifier_exceptions"]:
                    if mod.text not in lex.exceptional_new_modifiers:
                        return False
                else:
                    return False

    for mod in markable.head.modifiers:
        # antonymous modifiers forbid coreference ("good news" vs "bad news")
        if mod.text.lower() in lex.antonyms:
            for cand_mod in candidate.head.modifiers:
                if cand_mod.text.lower() in lex.antonyms[mod.text.lower()]:
                    markable.non_antecdent_groups.add(candidate.group)
                    return False
        elif mod.lemma.lower() in lex.antonyms:
            for cand_mod in candidate.head.modifiers:
                if cand_mod.lemma.lower() in lex.antonyms[mod.lemma.lower()]:
                    markable.non_antecdent_groups.add(candidate.group)
                    return False
        if proper_mod_must_match and f["proper_pos"].match(mod.pos):
            cand_proper = [m.text for m in candidate.head.modifiers
                           if f["proper_pos"].match(m.pos)]
            if cand_proper and mod.text not in cand_proper:
                return False

    # distinct place-name modifiers clash ("Georgetown U." vs "Boston U.")
    for mod in markable.head.modifiers:
        if mod.text in lex.entities and (mod.text.istitle() or not f["cap_names"]):
            if lex.entities[mod.text][0][0] == f["place_def_entity"]:
                for cand_mod in candidate.head.modifiers:
                    if cand_mod.text != mod.text and cand_mod.text in lex.entities \
                            and (cand_mod.text.istitle() or not f["cap_names"]):
                        if lex.entities[cand_mod.text][0][0] == f["place_def_entity"]:
                            markable.non_antecdent_groups.add(candidate.group)
                            return False

    # identical-function modifiers must be identical ("four children" / "five children")
    for mod in markable.head.modifiers:
        for cand_mod in candidate.head.modifiers:
            if f["ident_mod_func"].match(mod.func) is not None \
                    and f["ident_mod_func"].match(cand_mod.func) is not None \
                    and mod.text.lower() != cand_mod.text.lower():
                markable.non_antecdent_groups.add(candidate.group)
                return False

    # antonymous heads
    if markable.head.lemma in lex.antonyms:
        if candidate.head.lemma in lex.antonyms[markable.head.lemma]:
            return False
        if candidate.head.lemma.isupper() and \
                candidate.head.lemma.lower() in lex.antonyms[markable.head.lemma]:
            return False

    # conflicting proper names
    if markable.form == "proper" and candidate.form == "proper" and markable.text != candidate.text:
        if markable.text in lex.names and candidate.text in lex.names:
            return False
        if markable.text.count(" ") == 0 and candidate.text.count(" ") == 0:
            for name_set in (lex.first_names, lex.last_names):
                if markable.text in name_set and candidate.text in name_set:
                    isa_ok = (candidate.text.lower() in lex.isa.get(markable.text, [])
                              or markable.text.lower() in lex.isa.get(candidate.text, []))
                    if not isa_ok:
                        return False

    # the whole antecedent chain must stay compatible
    if isinstance(candidate.antecedent, Markable):
        if not modifiers_compatible(markable, candidate.antecedent, lex, doc):
            return False
    return True


# ----------------------------------------------------------------------
# group negotiation
# ----------------------------------------------------------------------

def merge_entities(mark1: Markable, mark2: Markable, previous_markables, lex,
                   doc: DocState) -> bool:
    """(reference xrenner_compatible.py:216-244)"""
    if mark1.entity == mark2.entity:
        return True
    src = max(mark1.start, mark2.start)  # the resolving (later) mention
    if mark1.entity in mark2.alt_entities:
        if update_group(mark2, mark1, previous_markables, lex, doc,
                        src_start=src):
            mark2.entity = mark1.entity
            mark2.subclass = mark1.subclass
            _mark_retro(mark2, mark1)
            return True
        return False
    if update_group(mark1, mark2, previous_markables, lex, doc,
                    src_start=src):
        mark1.entity = mark2.entity
        mark1.subclass = mark2.subclass
        _mark_retro(mark1, mark2)
        return True
    return False


def update_group(host: Markable, model: Markable, previous_markables, lex,
                 doc: DocState, src_start: int = -1) -> bool:
    """Whole-group veto then group-wide entity overwrite
    (reference xrenner_compatible.py:247-270)."""
    group = host.group
    for markable in previous_markables:
        if markable.group == group:
            if not modifiers_compatible(markable, model, lex, doc):
                return False
    for markable in previous_markables:
        if markable.group == group:
            markable.entity = model.entity
            markable.subclass = model.subclass
            if src_start > markable.retro_src:
                markable.retro_src = src_start
    return True


# ----------------------------------------------------------------------
# isa matching
# ----------------------------------------------------------------------

def isa(markable: Markable, candidate: Markable, lex, doc: DocState) -> bool:
    """Memoizing wrapper (reference xrenner_compatible.py:272-288)."""
    key = "%d|%d" % (markable.id, candidate.id)
    if key in doc.incompatible_isa_pairs:
        return False
    result = run_isa(markable, candidate, lex, doc)
    if not result:
        doc.incompatible_isa_pairs.add(key)
    return result


def run_isa(markable: Markable, candidate: Markable, lex, doc: DocState) -> bool:
    """The isa/hypernym ladder (reference xrenner_compatible.py:290-468)."""
    f = lex.filters
    if not f["allow_indef_anaphor"]:
        if markable.start > candidate.start:
            if markable.definiteness == "indef" and candidate.definiteness == "def":
                return False
            if markable.form == "proper" and candidate.definiteness == "indef":
                return False
        else:
            if markable.definiteness == "def" and candidate.definiteness == "indef":
                return False
            if markable.definiteness == "indef" and candidate.form == "proper":
                return False
    if not f["allow_indef_isa"]:
        if markable.start > candidate.start:
            if markable.definiteness == "indef":
                return False
        elif candidate.definiteness == "indef":
            return False

    if len(markable.head.modifiers) > 0:
        if not modifiers_compatible(markable, candidate, lex, doc):
            doc.incompatible_mod_pairs.add("%d|%d" % (markable.id, candidate.id))
            return False

    person = f["person_def_entity"]
    # first/last name + full-name-with-that-modifier match
    if markable.entity in ("", person) and candidate.entity in ("", person):
        for name_table in (lex.first_names, lex.last_names):
            if markable.head.text in name_table:
                if markable.head.text in (m.text for m in candidate.head.modifiers):
                    return True
            if candidate.head.text in name_table:
                if candidate.head.text in (m.text for m in markable.head.modifiers):
                    return True

    # subclass-based isa: candidate's subclass may match the markable
    # (unidirectional; the Guardian .. < .. the newspaper)
    for subclass in candidate.alt_subclasses + [candidate.subclass]:
        if subclass == markable.head.lemma:
            if agree_compatible(markable, candidate, lex) and \
                    not never_agree(markable, candidate, lex):
                if markable.isa_partner_head in ("", candidate.head.lemma):
                    candidate.isa_dir = "markable"
                    return True
                return False
        if subclass in lex.isa:
            subclass_isa = lex.isa[subclass]
            check_agree = f["isa_subclass_agreement"]
            if subclass_isa and subclass_isa[-1] == "*":
                subclass_isa = subclass_isa[:-1]
                check_agree = False
            if markable.head.lemma.lower() in subclass_isa:
                if markable.isa_partner_head in ("", candidate.head.lemma) \
                        or candidate.isa_partner_head == markable.head.lemma:
                    if (agree_compatible(markable, candidate, lex) or check_agree is False) \
                            and not never_agree(markable, candidate, lex):
                        candidate.isa_dir = "markable"
                        return True

    # exact text in isa table — no agreement check
    if markable.text in lex.isa and candidate.text in lex.isa[markable.text]:
        if candidate.isa_partner_head in ("", markable.head.lemma):
            candidate.isa_dir = "candidate"
            return True
    if candidate.text in lex.isa and markable.text in lex.isa[candidate.text]:
        if markable.isa_partner_head in ("", candidate.head.lemma):
            candidate.isa_dir = "markable"
            return True

    # core-text isa (unidirectional, with agreement)
    if markable.core_text in lex.isa:
        isa_list = lex.isa[markable.core_text]
        if candidate.core_text in isa_list or candidate.head.lemma in isa_list:
            if candidate.isa_partner_head in ("", markable.head.lemma):
                if agree_compatible(markable, candidate, lex) and \
                        not never_agree(markable, candidate, lex):
                    candidate.isa_dir = "candidate"
                    return True
        elif candidate.head.text in isa_list:
            if candidate.isa_partner_head in ("", markable.head.lemma):
                candidate.isa_dir = "candidate"
                return True
    elif markable.core_text.isupper() and markable.core_text.title() in lex.isa:
        isa_list = lex.isa[markable.core_text.title()]
        if candidate.core_text in isa_list or candidate.head.lemma in isa_list:
            if candidate.isa_partner_head in ("", markable.head.lemma):
                candidate.isa_dir = "candidate"
                return True

    # suffix-stripped variants ("New Zealand 's" -> "New Zealand")
    if remove_suffix_tokens(markable.text, lex) in lex.isa:
        if candidate.head.text in lex.isa[remove_suffix_tokens(markable.text, lex)]:
            if candidate.isa_partner_head in ("", markable.head.lemma):
                candidate.isa_dir = "candidate"
                return True
    elif remove_suffix_tokens(candidate.text, lex) in lex.isa:
        if markable.head.text in lex.isa[remove_suffix_tokens(candidate.text, lex)]:
            if markable.isa_partner_head in ("", candidate.head.lemma):
                candidate.isa_dir = "markable"
                return True

    # head-head isa — no agreement check
    if markable.head.text in lex.isa and candidate.head.text in lex.isa[markable.head.text]:
        if candidate.isa_partner_head in ("", markable.head.lemma):
            candidate.isa_dir = "candidate"
            return True
    if candidate.head.text in lex.isa and markable.head.text in lex.isa[candidate.head.text]:
        if markable.isa_partner_head in ("", candidate.head.lemma):
            candidate.isa_dir = "markable"
            return True

    # lemma-based isa — with agreement
    if markable.head.lemma in lex.isa:
        isa_list = lex.isa[markable.head.lemma]
        if candidate.head.lemma in isa_list or candidate.head.text in isa_list:
            if candidate.isa_partner_head in ("", markable.head.lemma):
                if agree_compatible(markable, candidate, lex):
                    candidate.isa_dir = "candidate"
                    return True
    if candidate.head.lemma in lex.isa:
        isa_list = lex.isa[candidate.head.lemma]
        if markable.head.lemma in isa_list or markable.head.text in isa_list:
            if markable.isa_partner_head in ("", candidate.head.lemma):
                if agree_compatible(markable, candidate, lex):
                    candidate.isa_dir = "markable"
                    return True
    return False


# ----------------------------------------------------------------------
# verbal-event stems and acronyms
# ----------------------------------------------------------------------

def stems_compatible(verb, noun, lex) -> bool:
    """(reference xrenner_compatible.py:662-670)"""
    verb_stem = lex.filters["stemmer_deletes"].sub("", verb.text)
    noun_stem = lex.filters["stemmer_deletes"].sub("", noun.text)
    if verb_stem == noun_stem and len(noun_stem) > 3:
        return True
    return noun.text in lex.nominalizations.get(verb.text, {})


def acronym_match(mark: Markable, candidate: Markable, lex) -> bool:
    """Initial-letters-of-Title-Case-words acronym matcher
    (reference xrenner_compatible.py:673-707)."""
    f = lex.filters
    position = 0
    calibration = 0
    candidate_string = candidate.core_text
    if "ignore_in_acronym" in f:
        candidate_string = f["ignore_in_acronym"].sub("", candidate_string)
        candidate_string = candidate_string.replace("  ", " ")
    if not (mark.head.text.isupper() and len(mark.head.text) > 2):
        return False
    for word in candidate_string.split(" "):
        if f["articles"].match(word):
            calibration = -1
        elif len(word) > 0:
            if len(mark.head.text) > position:
                if word[0].isupper() or word == "&":
                    if word[0] == mark.head.text[position]:
                        position += 1
                    else:
                        return False
            else:
                return False
    return position == len(candidate_string.strip().split(" ")) + calibration and position > 2


# ----------------------------------------------------------------------
# propagation (reference xrenner_propagate.py)
# ----------------------------------------------------------------------

def _mark_retro(target: Markable, source: Markable):
    """Record that ``source``'s resolution mutated ``target`` — consumed
    only by the giant-doc windowed stitcher (engine) to retro-apply
    backward propagation onto context mentions already emitted by a
    previous window."""
    if source.start > target.retro_src:
        target.retro_src = source.start


def propagate_agree(markable: Markable, candidate: Markable):
    if (candidate.agree in ("", None)) and markable.agree not in ("", None):
        candidate.agree = markable.agree
        _mark_retro(candidate, markable)
    else:
        markable.agree = candidate.agree
        _mark_retro(markable, candidate)


def propagate_entity(markable: Markable, candidate: Markable, direction: str = "propagate"):
    if direction == "propagate_forward":
        _mark_retro(markable, candidate)
        markable.entity = candidate.entity
        markable.subclass = candidate.subclass
        markable.entity_certainty = "propagated"
        propagate_agree(candidate, markable)
        return
    if direction == "propagate_back":
        _mark_retro(candidate, markable)
        candidate.entity = markable.entity
        candidate.subclass = markable.subclass
        candidate.entity_certainty = "propagated"
        propagate_agree(markable, candidate)
        return
    # default: flow from the more certain / nominal side
    if markable.form == "pronoun" and candidate.entity_certainty != "uncertain" \
            and candidate.form != "pronoun":
        _mark_retro(markable, candidate)
        markable.entity = candidate.entity
        markable.subclass = candidate.subclass
        propagate_agree(candidate, markable)
        markable.entity_certainty = "propagated"
    elif candidate.form == "pronoun" and markable.entity_certainty != "uncertain" \
            and markable.form != "pronoun":
        _mark_retro(candidate, markable)
        candidate.entity = markable.entity
        candidate.subclass = markable.subclass
        candidate.entity_certainty = "propagated"
        propagate_agree(markable, candidate)
    elif candidate.entity_certainty == "uncertain":
        _mark_retro(candidate, markable)
        candidate.entity = markable.entity
        candidate.subclass = markable.subclass
        candidate.entity_certainty = "propagated"
        propagate_agree(markable, candidate)
    elif markable.entity_certainty == "uncertain":
        _mark_retro(markable, candidate)
        markable.entity = candidate.entity
        markable.subclass = candidate.subclass
        markable.entity_certainty = "propagated"
        propagate_agree(candidate, markable)
    elif markable.entity != candidate.entity and markable.entity in candidate.alt_entities:
        _mark_retro(candidate, markable)
        candidate.entity = markable.entity
        candidate.subclass = markable.subclass
        candidate.entity_certainty = "certain"
        propagate_agree(markable, candidate)
    elif markable.entity != candidate.entity and candidate.entity in markable.alt_entities:
        _mark_retro(markable, candidate)
        markable.entity = candidate.entity
        markable.subclass = candidate.subclass
        markable.entity_certainty = "certain"
        propagate_agree(candidate, markable)
    else:
        _mark_retro(candidate, markable)
        candidate.entity = markable.entity
        candidate.subclass = markable.subclass
        candidate.entity_certainty = "propagated"
        propagate_agree(markable, candidate)


# ----------------------------------------------------------------------
# candidate scoring
# ----------------------------------------------------------------------

def score_match_heuristic(markable: Markable, candidate: Markable, lex,
                          doc: DocState) -> float:
    """Recency-based heuristic with pronoun-specific evidence boosts
    (reference xrenner_compatible.py:527-558)."""
    score = 0.0 - (markable.sentence.sent_num - candidate.sentence.sent_num)
    score -= (markable.start - candidate.end) * 0.00001 \
        + (markable.start - candidate.start) * 0.000001
    if markable.entity != candidate.entity:
        score -= 0.5
    if markable.form != "pronoun":
        return score
    score += markable.entity_dep_scores.get(candidate.entity, 0)
    if candidate.entity == lex.filters["person_def_entity"]:
        score += 0.1
    if candidate.entity == lex.filters["subject_func"]:
        score += 0.95
    if candidate.agree == markable.agree:
        score += 0.1
    score += _hasa_feature(markable, candidate, lex, doc)
    return score


def _hasa_feature(markable: Markable, candidate: Markable, lex, doc: DocState) -> int:
    """d_hasa feature (reference xrenner_classes.py:225-238)."""
    if lex.filters["possessive_func"].search(markable.head.func) is None:
        return 0
    anaphor_parent = markable.head.head_text
    for key in (candidate.head.text, candidate.head.lemma):
        possessed = doc.hasa_possessed(key)
        if possessed:
            return possessed.get(anaphor_parent, 0)
    return 0


def _dump_candidates(markable: Markable, candidate_set, lex, doc: DocState, rule):
    """Training-data dump rows for every candidate pair (reference
    xrenner_compatible.py:591-620): feature dict + the reciprocal-rank of
    the heuristic score (ascending sort — the reference's quirky ranking
    direction is kept) + the rule number, deduplicated by line text.
    Dedup state is doc-scoped (the reference's lex.dump_types lives for a
    whole worker process; goldens are generated engine-per-doc)."""
    scores = [(score_match_heuristic(markable, c, lex, doc), i)
              for i, c in enumerate(candidate_set)]
    ranking = {}
    for index, (_score, i) in enumerate(sorted(scores, key=lambda x: x[0])):
        ranking[i] = 1 / float(index + 1)
    for i, candidate in enumerate(candidate_set):
        features = markable.extract_features(lex, doc, candidate,
                                             candidate_set, dump_position=True)
        if not doc.dump_headers:
            doc.dump_headers = list(features) + ["heuristic_score", "rule_num"]
        dump_list = [str(v) for v in features.values()]
        dump_list.append(str(ranking[i]))
        outline = "\t".join(dump_list)
        if outline not in doc.dump_types:
            doc.dump_types.add(outline)
            doc.dump_rows.append(outline + "\t" + str(rule.rule_num))


def best_candidate(markable: Markable, candidate_set, lex, doc: DocState, rule,
                   take_first: bool = False) -> Optional[Markable]:
    """Pick the highest-scoring candidate and propagate
    (reference xrenner_compatible.py:561-659, rule-based mode)."""
    if not candidate_set:
        return None
    if lex.dump:
        _dump_candidates(markable, candidate_set, lex, doc, rule)
    if take_first:
        markable.matching_rule = rule.rule_num
        return min(candidate_set, key=lambda c: abs(markable.start - c.start))

    heuristic = not rule.use_clf
    best = None
    max_score = None
    if heuristic or lex.dump:
        # hot path: inline loop, no list materialization.  Dump mode
        # skips "accurate prediction for speed" but keeps the
        # classifier-mode threshold gate below — reference quirk
        # (xrenner_compatible.py:627-635: clf_input/preds only when
        # lex.dump is None, while `heuristic` stays False)
        for candidate in candidate_set:
            score = score_match_heuristic(markable, candidate, lex, doc)
            if max_score is None or score > max_score:
                max_score = score
                best = candidate
    else:
        # classifier mode (reference xrenner_compatible.py:624-638): one
        # feature matrix over the whole candidate set, probabilities
        # replace the heuristic scores; same first-wins tie handling
        candidates = list(candidate_set)
        scores = lex.classifiers[rule.clf_name].classify_many(
            markable, candidates, candidate_set, lex, doc)
        for candidate, score in zip(candidates, scores):
            if max_score is None or score > max_score:
                max_score = score
                best = candidate
    if not heuristic and max_score < rule.thresh:
        # below-threshold classifier verdict means "no antecedent"; the
        # heuristic path always selects from a non-empty set (reference
        # xrenner_compatible.py:648-652)
        return None
    if rule.propagation != "nopropagate":
        propagate_entity(markable, best, rule.propagation)
        propagate_agree(markable, best)
    markable.matching_rule = rule.rule_num
    return best

"""Chain postprocessing: group flattening, chain linearization, markable
removal policies, envelopes and chain-type homogenization.

Semantics follow the reference's postprocess module (reference
xrenner/modules/xrenner_postprocess.py:14-249).
"""

from __future__ import annotations

from typing import Dict, List

from .classes import DocState, Markable
from .mentions import markable_extend_punctuation, markables_overlap


def postprocess_coref(doc: DocState):
    lex = doc.lex
    f = lex.filters
    markables = doc.markables

    # collect groups, flattening antecedent group inheritance in order
    marks_by_group: Dict[int, List[Markable]] = {}
    for mark in markables:
        if mark.antecedent is not None:
            if mark.group != mark.antecedent.group:
                mark.group = mark.antecedent.group
        marks_by_group.setdefault(mark.group, []).append(mark)

    # rewire each non-cataphoric mention to the previous group member
    for group in marks_by_group:
        last_mark = None
        for mark in marks_by_group[group]:
            if mark.coref_type != "cata":
                if last_mark is not None:
                    mark.antecedent = last_mark
                last_mark = mark

    # removal policies -------------------------------------------------
    if len(f["remove_head_func"].pattern) > 0:
        for mark in markables:
            if f["remove_head_func"].match(mark.head.func) is not None and (
                    mark.form != "proper" or mark.entity == "abstract"
                    or (mark.text in ("U.S.", "US") and mark.head.func == "nn")
                    or (mark.text in lex.first_names
                        and mark.entity != f["time_def_entity"])):
                splice_out(mark, marks_by_group[mark.group])
    if len(f["remove_child_func"].pattern) > 0:
        for mark in markables:
            for child_func in mark.head.child_funcs:
                if f["remove_child_func"].match(child_func) is not None \
                        and mark.head.func != "cata":
                    splice_out(mark, marks_by_group[mark.group])
    if lex.rm_nested_entities:
        for mark in markables:
            if _remove_nested(mark, doc, lex):
                splice_out(mark, marks_by_group[mark.group])

    # no overlapping coreference within a group: splice the smaller span
    if f["no_overlap"]:
        for group in marks_by_group:
            for mark1 in marks_by_group[group]:
                for mark2 in marks_by_group[group]:
                    if mark1 is not mark2 and markables_overlap(mark1, mark2, None):
                        if (mark1.end - mark1.start) > (mark2.end - mark2.start):
                            splice_out(mark2, marks_by_group[group])
                        else:
                            splice_out(mark1, marks_by_group[group])

    if f["remove_cataphora"]:
        for mark in markables:
            if mark.coref_type == "cata":
                mark.killed = True
                if mark.antecedent is not None:
                    mark.antecedent.killed = True

    # wipe groups realized only as a single coordination text
    if f["remove_coordinate_envelopes"]:
        for group in marks_by_group:
            coordination_text = ""
            wipe_coord = False
            for mark in marks_by_group[group]:
                if mark.coordinate:
                    coordination_text = mark.core_text
                    wipe_coord = True
            if coordination_text != "":
                for mark in marks_by_group[group]:
                    if mark.core_text != coordination_text:
                        wipe_coord = False
            if wipe_coord:
                for mark in marks_by_group[group]:
                    mark.killed = True

    if f["remove_singletons"]:
        for group in marks_by_group:
            if len(marks_by_group[group]) < 2:
                for singleton in marks_by_group[group]:
                    singleton.killed = True
            else:
                if all(m.antecedent is None for m in marks_by_group[group]):
                    for singleton in marks_by_group[group]:
                        singleton.killed = True

    # apposition envelopes (reference xrenner_postprocess.py:108-148)
    if f["add_appos_envelopes"]:
        for group in marks_by_group:
            for i in reversed(range(1, len(marks_by_group[group]))):
                mark = marks_by_group[group][i]
                prev = mark.antecedent
                if prev is not None and prev.coref_type == "appos" \
                        and prev.antecedent is not None:
                    prevprev = prev.antecedent
                    envlop = _create_envelope(prevprev, prev, doc)
                    if envlop.end < len(doc.tokens) - 1:
                        next_tok = doc.tokens[envlop.end + 1]
                        punct = dict(lex.open_close_punct)
                        punct[","] = ","
                        if markable_extend_punctuation(envlop.text, next_tok,
                                                       punct, "trailing"):
                            envlop.text += next_tok.text + " "
                            envlop.end += 1
                        elif doc.tokens[envlop.end].text == "years" \
                                and next_tok.text == "old":
                            envlop.text += next_tok.text + " "
                            envlop.end += 1
                    markables.append(envlop)
                    doc.markstart.setdefault(envlop.start, []).append(envlop)
                    doc.markend.setdefault(envlop.end, []).append(envlop)
                    doc.markables_by_head["%d_%d" % (prevprev.head.tid, prev.head.tid)] = envlop
                    ab_group = 1000 + int(prevprev.group) + int(prev.group)
                    prevprev.group = ab_group
                    prev.group = ab_group
                    mark.antecedent = envlop
                    prevprev.antecedent = None

    # majority-vote entity per chain, default entity preferred on ties
    if f["force_single_type_chains"]:
        for group in marks_by_group:
            ent_counts: Dict[str, int] = {}
            for mark in marks_by_group[group]:
                ent_counts[mark.entity] = ent_counts.get(mark.entity, 0) + 1
            most_used, best_n = None, -1
            for ent, n in ent_counts.items():
                if n > best_n:
                    most_used, best_n = ent, n
            if ent_counts.get(f["default_entity"], None) == best_n:
                most_used = f["default_entity"]
            for mark in marks_by_group[group]:
                mark.entity = most_used

    _kill_zero_marks(doc)


def splice_out(mark: Markable, group: List[Markable]):
    """Remove a markable from its chain, reconnecting neighbours
    (reference xrenner_postprocess.py:189-205)."""
    for member in group:
        if member.antecedent is mark:
            member.antecedent = mark.antecedent
    mark.antecedent = None
    mark.group = mark.id  # spliced mark moves to its own group
    mark.killed = True


def _kill_zero_marks(doc: DocState):
    survivors = []
    for mark in doc.markables:
        if mark.killed:
            starts = doc.markstart.get(mark.start)
            if starts and mark in starts:
                starts.remove(mark)
                if not starts:
                    del doc.markstart[mark.start]
            ends = doc.markend.get(mark.end)
            if ends and mark in ends:
                ends.remove(mark)
        else:
            survivors.append(mark)
    doc.markables = survivors


def _remove_nested(mark: Markable, doc: DocState, lex) -> bool:
    for nested_entity, func, container_entity in lex.rm_nested_entities:
        if mark.head.func == func and mark.entity == nested_entity:
            container = doc.markables_by_head.get(str(mark.head.head))
            if container is not None and container.entity == container_entity:
                return True
    return False


def _create_envelope(first: Markable, second: Markable, doc: DocState) -> Markable:
    """(reference xrenner_postprocess.py:208-239)"""
    intermediate = ""
    if first.end + 1 < second.start:
        for tok in doc.tokens[first.end + 1:second.start]:
            intermediate += tok.text + " "
    text = first.text.strip() + " " + intermediate + second.text.strip()
    cardinality = 0
    if first.cardinality != 0 and first.cardinality == second.cardinality:
        cardinality = first.cardinality
    form = "proper" if (first.form == "proper" or second.form == "proper") else "common"
    envelope = Markable(
        -1, first.head, form, first.definiteness, first.start, second.end, text,
        text, second.entity, second.entity_certainty, first.subclass, first.infstat,
        first.agree, first.sentence, first.antecedent, first.coref_type, first.group,
        first.alt_entities, first.alt_subclasses, first.alt_agree, cardinality)
    return envelope

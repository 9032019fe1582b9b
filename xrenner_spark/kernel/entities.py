"""Entity classification: the gazetteer probe cascade, agreement and
cardinality resolution, and evidence combination.

This is the reference's "query engine" stage — an ordered sequence of
broadcast-dictionary probes with first-hit-wins semantics (reference
xrenner/modules/xrenner_marker.py:118-357 resolve_mark_entity /
resolve_entity_cascade; orchestration xrenner_xrenner.py:279-357).
Composite candidate strings keep the reference convention
``entity<TAB>subclass[/agree]`` so the final unpack ordering ("/" before
"\\t") is identical.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from .classes import DocState, Markable
from .mentions import (recognize_entity_by_mod, remove_prefix_tokens,
                       remove_suffix_tokens, replace_head_with_lemma)

_YEAR_OR_TIME = re.compile(r"^(1[456789][0-9][0-9]|20[0-9][0-9]|(2[0-3]|1?[0-9]):[0-5][0-9])$")
_PURE_NUMBER = re.compile(r"^(([0-9]{1,3}[.,]?)+)$")
_NUMERIC = re.compile(r"^(\d+(\.\d+)?|(\.\d+))$")
_FRACTION = re.compile(r"^(\d+)/(\d+)$")
_HAS_DIGIT = re.compile(r"\d")
_CAPS_LETTER = re.compile(r"[A-ZÄÖÜ]")


def analyze_markable(mark: Markable, doc: DocState):
    """Resolve form, definiteness, agreement, cardinality and entity for a
    provisional markable (reference xrenner_xrenner.py:279-341)."""
    lex = doc.lex
    f = lex.filters
    mark.text = mark.text.strip()
    mark.core_text = mark.core_text.strip()
    tok = mark.head

    if f["proper_pos"].match(tok.pos) is not None:
        mark.form = "proper"
        mark.definiteness = "def"
    elif f["pronoun_pos"].match(tok.pos) is not None:
        mark.form = "pronoun"
        mark.definiteness = "indef" if "indef" in tok.morph.lower() else "def"
    else:
        mark.form = "common"
        morph_lower = tok.morph.lower()
        if "def" in morph_lower and "indef" not in morph_lower:
            mark.definiteness = "def"
            tok.morph = tok.morph.replace("def", "_")  # don't leak into agreement
        else:
            article_candidates = [tok.text, mark.text.split(" ")[0]] + tok.child_strings
            has_def_article = any(f["definite_articles"].match(c) is not None
                                  for c in article_candidates)
            has_possessor = any(f["definite_possessive_func"].match(func) is not None
                                for func in tok.child_funcs)
            mark.definiteness = "def" if (has_def_article or has_possessor) else "indef"

    # agreement alternatives unless already set by coordination/cardinality.
    # NB: when resolve_mark_agree returns None its in-place appends to
    # alt_agree are discarded — kept reference-faithful
    # (xrenner_xrenner.py:322-327).
    if mark.cardinality == 0 or mark.agree == "":
        mark.alt_agree = resolve_mark_agree(mark, lex)
    if mark.alt_agree is not None and mark.agree == "" and len(mark.alt_agree) > 0:
        mark.agree = mark.alt_agree[0]
    elif mark.alt_agree is None:
        mark.alt_agree = []
    # explicit head morphology overrides gazetteer agreement
    if (mark.agree != tok.morph and tok.morph not in ("_", "--")
            and mark.agree != f["aggregate_agree"]):
        mark.agree = tok.morph
        mark.agree_certainty = "mark_head_morph"
        mark.alt_agree.append(tok.morph)

    if mark.cardinality == 0:
        mark.cardinality = resolve_cardinality(mark, lex)

    if mark.agree in f["agree_entity_mapping"]:
        mark.entity = f["agree_entity_mapping"][mark.agree]
    else:
        resolve_mark_entity(mark, doc)

    # external entity-oracle override: span-for-span entity replacement
    # keyed by sentence text + sentence-relative token span (reference
    # xrenner_xrenner.py:343-358).  Entity only — subclass keeps the
    # system resolution, as in the reference.  Hit counters are
    # doc-scoped (the reference keeps them on the shared lex).
    if lex.entity_oracle is not None:
        sent_text = mark.sentence.text
        doc.oracle_counters[2] += 1
        if sent_text in lex.entity_oracle:
            m_start = mark.start - mark.sentence.start_offset
            m_end = mark.end - mark.sentence.start_offset
            if (m_start, m_end) in lex.entity_oracle[sent_text]:
                doc.oracle_counters[0] += 1
                if mark.entity != lex.entity_oracle[sent_text][(m_start, m_end)]:
                    doc.oracle_counters[1] += 1
                mark.entity = lex.entity_oracle[sent_text][(m_start, m_end)]


def resolve_mark_agree(mark: Markable, lex) -> Optional[List[str]]:
    """Agreement class candidates (reference xrenner_marker.py:444-487)."""
    tok = mark.head
    if tok.morph not in ("", "_"):
        mark.agree_certainty = "head_morph"
        return [tok.morph]
    if mark.form == "pronoun":
        if mark.text in lex.pronouns:
            return list(lex.pronouns[mark.text])
        if mark.text.lower() in lex.pronouns:
            return list(lex.pronouns[mark.text.lower()])
    if mark.form == "proper":
        if mark.core_text in lex.names:
            return [lex.names[mark.core_text]]
        if (mark.core_text in lex.first_names
                and mark.core_text not in lex.entities
                and mark.core_text not in lex.entity_heads):
            return [lex.first_names[mark.core_text]]
    if tok.pos in lex.pos_agree_mappings:
        mark.agree_certainty = "pos_agree_mappings"
        return [lex.pos_agree_mappings[tok.pos]]
    entries = lex.entities.get(mark.core_text)
    if entries is not None:
        for _entity, subclass_raw, _freq in entries:
            if "/" in subclass_raw:
                agree = subclass_raw[subclass_raw.find("/") + 1:]
                if mark.agree == "":
                    mark.agree = agree
                mark.alt_agree.append(agree)
        return None
    entries = lex.entity_heads.get(tok.text)
    if entries is not None:
        for _entity, subclass_raw, _freq in entries:
            if "/" in subclass_raw:
                agree = subclass_raw[subclass_raw.find("/") + 1:]
                if mark.agree == "":
                    mark.agree = agree
                mark.alt_agree.append(agree)
    return None


def resolve_cardinality(mark: Markable, lex) -> float:
    """Numeric modifiers / number words to cardinality
    (reference xrenner_marker.py:490-530)."""
    numbers = lex.numbers
    filters = lex.filters

    def check_card(text: str):
        if text in numbers:
            return int(numbers[text][0])
        low = text.lower()
        if low in numbers:
            return int(numbers[low][0])
        # separator subs can't introduce digits, and _NUMERIC/_FRACTION
        # both require one — skip the regex funnel for wordlike text
        if _HAS_DIGIT.search(text) is None:
            return None
        thousand = filters["thousand_sep"]
        pure = re.sub(r"\." if thousand == "." else thousand, "", text)
        decimal = filters["decimal_sep"]
        if decimal != ".":
            pure = re.sub(decimal, ".", pure)
        if _NUMERIC.match(pure) is not None:
            return float(pure)
        frac = _FRACTION.match(pure)
        if frac is not None:
            return float(frac.group(1)) / float(frac.group(2))
        return None

    for mod in mark.head.modifiers:
        card = check_card(mod.text)
        if card is not None:
            return card
    card = check_card(mark.head.text)
    if card is not None:
        return card
    card = check_card(mark.head.lemma)
    if card is not None:
        return card
    return 0


def resolve_mark_entity(mark: Markable, doc: DocState):
    """The probe cascade (reference xrenner_marker.py:118-357)."""
    lex = doc.lex
    f = lex.filters
    tok = mark.head
    parent_text = tok.head_text
    entity = ""

    if mark.form == "pronoun":
        if re.search(r"[12]", mark.agree or ""):
            entity = f["person_def_entity"]
            mark.entity_certainty = "certain"
        elif mark.agree in ("male", "female"):
            entity = f["person_def_entity"]
            mark.entity_certainty = "uncertain"
        else:
            # sequencer fallback for other pronouns (reference
            # xrenner_marker.py:152-156): any non-"O" tag wins, no threshold
            if lex.sequencer is not None and tok.seq_pred[0] != "O":
                entity = tok.seq_pred[0]
                mark.entity_certainty = "sequencer"
            # literal dependency probe (kept reference-faithful: the func is
            # looked up inside the entity->freq dict, so this rarely fires)
            if entity == "" and parent_text in lex.entity_deps and \
                    tok.func in lex.entity_deps[parent_text].get(tok.func, {}):
                dep_ents = dict(lex.entity_deps[parent_text][tok.func])
                if f["no_person_agree"].match(mark.agree) is not None \
                        and f["person_def_entity"] in dep_ents:
                    del dep_ents[f["person_def_entity"]]
                if dep_ents:
                    entity = _argmax(dep_ents)
            if entity == "" and parent_text in lex.similar:
                for similar_head in lex.similar[parent_text]:
                    if similar_head in lex.entity_deps and \
                            tok.func in lex.entity_deps[similar_head]:
                        similar_dict = lex.entity_deps[similar_head][tok.func]
                        if f["no_person_agree"].match(mark.agree) is not None:
                            similar_dict = {k: v for k, v in similar_dict.items()
                                            if k != f["person_def_entity"]}
                        if similar_dict:
                            entity = _argmax(similar_dict)
                            break
            if entity == "":
                entity = f["default_entity"]
                mark.entity_certainty = "uncertain"
    elif mark.coordinate:
        # high-confidence sequencer override (reference
        # xrenner_marker.py:186-191 sits before the coordinate split; every
        # later probe here is entity==""-guarded, so seeding each branch is
        # equivalent)
        if lex.sequencer is not None and tok.seq_pred[0] != "O" \
                and tok.seq_pred[1] > lex.filters["sequencer_override_thresh"]:
            entity = tok.seq_pred[0]
            mark.entity_certainty = "sequencer"
        # constituents decide later via assign_coordinate_entity, unless the
        # whole coordination is a listed entity
        if entity == "":
            entity = resolve_entity_cascade(mark.text, mark, lex)
        if entity == "":
            entity = resolve_entity_cascade(mark.core_text, mark, lex)
    else:
        if lex.sequencer is not None and tok.seq_pred[0] != "O" \
                and tok.seq_pred[1] > lex.filters["sequencer_override_thresh"]:
            # see note on the coordinate branch above
            entity = tok.seq_pred[0]
            mark.entity_certainty = "sequencer"
        if entity == "" and _YEAR_OR_TIME.match(tok.text) is not None:
            entity = f["time_def_entity"]
            mark.entity_certainty = "uncertain"
            mark.subclass = "time-unit"
            mark.definiteness = "def"
            mark.form = "proper"
        if entity == "" and _PURE_NUMBER.match(mark.core_text) is not None:
            entity = f["quantity_def_entity"]
            mark.alt_entities.append(f["time_def_entity"])
            mark.entity_certainty = "uncertain"
        if entity == "":
            entity = resolve_entity_cascade(mark.text, mark, lex)
        if entity == "":
            entity = resolve_entity_cascade(replace_head_with_lemma(mark), mark, lex)
        if entity == "":
            entity = resolve_entity_cascade(remove_suffix_tokens(mark.text.strip(), lex), mark, lex)
        if entity == "":
            entity = resolve_entity_cascade(remove_prefix_tokens(mark.text.strip(), lex), mark, lex)
        if entity == "" and mark.core_text != mark.text:
            entity = resolve_entity_cascade(mark.core_text, mark, lex)
        if entity == "":
            mod_hit = recognize_entity_by_mod(mark, lex)
            if mod_hit is not None:
                entity = mod_hit[0] + "\t" + mod_hit[1]
        if entity == "" and tok.text.istitle():
            if tok.text in lex.last_names:
                any_article = any(f["articles"].match(mod.text) is not None
                                  for mod in tok.modifiers)
                any_first = any(mod.text in lex.first_names for mod in tok.modifiers)
                if any_first and not any_article:
                    entity = f["person_def_entity"]
        if entity == "" and tok.text.istitle():
            entity = resolve_entity_cascade(mark.core_text.lower(), mark, lex)
        if entity == "" and not tok.text.istitle():
            entity = resolve_entity_cascade(mark.core_text[:1].upper() + mark.core_text[1:], mark, lex)
        if entity == "":
            entity = resolve_entity_cascade(tok.text, mark, lex)
        if entity == "" and tok.text.istitle():
            entity = resolve_entity_cascade(tok.text.lower(), mark, lex)
        if entity == "" and tok.text.isupper():
            entity = resolve_entity_cascade(tok.text.lower(), mark, lex)
        if entity == "" and tok.text.isupper():
            entity = resolve_entity_cascade(tok.text.lower().title(), mark, lex)
        if entity == "" and tok.lemma != tok.text:
            entity = resolve_entity_cascade(tok.lemma, mark, lex)
        if entity == "":
            if tok.text.istitle() or not f["cap_names"]:
                if tok.text in lex.last_names or tok.text in lex.first_names:
                    any_def = any(f["definite_articles"].match(mod.text) is not None
                                  for mod in tok.modifiers)
                    any_article = any(f["articles"].match(mod.text) is not None
                                      for mod in tok.modifiers)
                    any_default_head = any(
                        lex.entity_heads[mod.text.strip().lower()][0][0] == f["default_entity"]
                        for mod in tok.modifiers
                        if mod.text.strip().lower() in lex.entity_heads)
                    if not (any_article or any_def or any_default_head):
                        entity = f["person_def_entity"]
        if entity == "" and lex.sequencer is not None \
                and tok.seq_pred[0] != "O":
            # last gazetteer-free probe before morphology: take any
            # non-"O" sequencer tag (reference xrenner_marker.py:253-259)
            entity = tok.seq_pred[0]
            mark.entity_certainty = "sequencer"
        if entity == "":
            # combine affix-morphology, dependency and similarity evidence
            head_text = tok.lemma if tok.lemma not in ("_", "") else tok.text
            morph_probs = get_entity_by_affix(head_text, lex)
            dep_probs: Dict[str, float] = {}
            if parent_text in lex.entity_deps:
                dep_probs.update(lex.entity_deps[parent_text].get(tok.func, {}))
            if not dep_probs and parent_text in lex.similar:
                for similar_head in lex.similar[parent_text]:
                    if similar_head in lex.entity_deps and tok.func in lex.entity_deps[similar_head]:
                        dep_probs.update(lex.entity_deps[similar_head][tok.func])
                        break
            sim_probs: Dict[str, int] = {}
            if tok.text in lex.similar:
                for similar_word in lex.similar[tok.text]:
                    for ent, _sub, _freq in lex.entity_heads.get(similar_word, []):
                        sim_probs[ent] = sim_probs.get(ent, 0) + 1
            total_deps = float(sum(dep_probs.values()))
            total_sims = float(sum(sim_probs.values()))
            joint: Dict[str, float] = {}
            for key, value in dep_probs.items():
                joint[key] = value / total_deps
            for key, value in morph_probs.items():
                joint[key] = joint.get(key, 0.0) + value
            for key, value in sim_probs.items():
                # reference adds the *unnormalized* similarity count here
                joint[key] = joint.get(key, 0.0) + value
            _ = total_sims  # normalization computed but unused, as in reference
            default = f["default_entity"]
            joint[default] = joint.get(default, 0.0) + 0.0000001
            entity = _argmax(joint)

    if entity != "":
        mark.entity = entity

    # unpack lexicalized agree ("/") then subclass ("\t") suffixes
    if "/" in mark.entity:
        if mark.agree == "" or mark.agree is None:
            mark.agree = mark.entity.split("/")[1]
        elif mark.agree_certainty == "":
            mark.alt_agree.append(mark.agree)
            mark.agree = mark.entity.split("/")[1]
        mark.entity = mark.entity.split("/")[0]
    elif (mark.entity == f["person_def_entity"] and mark.agree == f["default_agree"]
          and mark.form != "pronoun"):
        mark.agree = f["person_def_agree"]
        mark.agree_certainty = "uncertain"
    if "\t" in mark.entity:
        mark.subclass = mark.entity.split("\t")[1]
        mark.entity = mark.entity.split("\t")[0]
    if mark.entity == f["person_def_entity"] and mark.form != "pronoun":
        if mark.text in lex.names:
            mark.agree = lex.names[mark.text]
    if mark.entity == f["person_def_entity"] and mark.agree is None:
        no_affix = remove_suffix_tokens(remove_prefix_tokens(mark.text, lex), lex)
        if no_affix in lex.names:
            mark.agree = lex.names[no_affix]
    if mark.entity == f["person_def_entity"] and mark.agree is None:
        mark.agree = f["person_def_agree"]
        mark.agree_certainty = "uncertain"
    if (mark.entity == "" and mark.core_text.upper() == mark.core_text
            and _CAPS_LETTER.search(mark.core_text) is not None):
        mark.entity = f["all_caps_entity"]
        mark.entity_certainty = "uncertain"
    if mark.entity == "":
        mark.entity = f["default_entity"]
        mark.entity_certainty = "uncertain"
    if mark.subclass == "":
        mark.subclass = mark.entity
    if mark.head.func == "title":
        mark.entity = f["default_entity"]
    if mark.agree == "" and mark.entity == f["default_entity"]:
        mark.agree = f["default_agree"]


def resolve_entity_cascade(entity_text: str, mark: Markable, lex) -> str:
    """Probe one text fragment against entities/entity_heads/name lists
    (reference xrenner_marker.py:360-425)."""
    f = lex.filters
    options: Dict[str, tuple] = {}
    entity = ""
    person = f["person_def_entity"]

    for table, certainty in ((lex.entities, "entities_match"),
                             (lex.entity_heads, "entity_heads_match")):
        for ent, subclass_raw, _freq in table.get(entity_text, []):
            if ent not in mark.alt_entities:
                sub, agree = (subclass_raw.split("/", 1) + [""])[:2] \
                    if "/" in subclass_raw else (subclass_raw, "")
                mark.alt_entities.append(ent)
                mark.alt_subclasses.append(sub)
                options[ent] = (ent, sub, agree, certainty)

    # person candidate from name lists, only with strong dependency support
    if entity_text in lex.names or entity_text in lex.last_names or entity_text in lex.first_names:
        if (entity_text[:1].istitle() or not f["cap_names"]) and person not in mark.alt_entities:
            dep = lex.entity_deps.get(mark.head.head_text, {}).get(mark.head.func, {})
            if person in dep and dep[person] > 5 and len(dep) == 1:
                mark.alt_entities.append(person)
                mark.alt_subclasses.append(person)
                name_agree = ""
                if entity_text in lex.names:
                    name_agree = lex.names[entity_text]
                elif entity_text in lex.first_names and entity_text not in lex.last_names:
                    name_agree = lex.first_names[entity_text]
                options[person] = (person, person, name_agree, "names_match")
    if len(mark.alt_entities) < 1 and 0 < entity_text.count(" ") < 3 \
            and person not in mark.alt_entities:
        parts = entity_text.split(" ")
        if parts[0] in lex.first_names and parts[-1] in lex.last_names:
            if entity_text[:1].istitle() or not f["cap_names"]:
                if f["articles"].match(mark.text.split(" ")[0]) is None:
                    mark.alt_entities.append(person)
                    mark.alt_subclasses.append(person)
                    options[person] = (person, person, lex.first_names[parts[0]], "name_match")
    if person not in mark.alt_entities and \
            (mark.text in lex.first_names or mark.text in lex.last_names):
        mark.alt_entities.append(person)
        options[person] = (person, person, "", "name_match")

    if len(mark.alt_entities) > 1:
        entity = disambiguate_entity(mark, lex)
    elif len(mark.alt_entities) == 1:
        entity = mark.alt_entities[0]

    if entity != "":
        mark.entity, mark.subclass = options[entity][0:2]
        if options[entity][2] != "":
            mark.agree = options[entity][2]
        mark.entity_certainty = options[entity][3]

    return entity if options else ""


def disambiguate_entity(mark: Markable, lex) -> str:
    """Choose among alt_entities via dependency statistics, gazetteer
    frequencies, then global sums (reference xrenner_marker.py:856-927)."""
    f = lex.filters
    # prefer the sequencer tag when it is one of the gazetteer options
    # (reference xrenner_marker.py:869-873)
    if lex.sequencer is not None:
        seq_ent = mark.head.seq_pred[0]
        if seq_ent in mark.alt_entities:
            return seq_ent
    parent_text = mark.head.head_text
    scores: Dict[str, float] = {}
    if f["default_entity"] in mark.alt_entities:
        scores[f["default_entity"]] = 0.0001
    entity_freqs: Dict[str, float] = {}
    dep = lex.entity_deps.get(parent_text, {}).get(mark.head.func, {})
    for alt in mark.alt_entities:
        if alt in dep:
            entity_freqs[alt] = dep[alt]
    if not entity_freqs and parent_text in lex.similar:
        for similar_parent in lex.similar[parent_text]:
            sdep = lex.entity_deps.get(similar_parent, {}).get(mark.head.func, {})
            for alt in mark.alt_entities:
                if alt in sdep:
                    entity_freqs[alt] = sdep[alt]

    break_tie = False
    if entity_freqs:
        best_freq = max(entity_freqs.values())
        if len([v for v in entity_freqs.values() if v == best_freq]) > 1:
            break_tie = True
    if not entity_freqs or break_tie:
        for ent, _sub, freq in lex.entities.get(mark.text, []):
            if freq > 0:
                entity_freqs[ent] = entity_freqs.get(ent, 0) + freq
    if not entity_freqs or break_tie:
        for ent, _sub, freq in lex.entity_heads.get(mark.head.text, []):
            if freq > 0:
                entity_freqs[ent] = entity_freqs.get(ent, 0) + freq
    if not entity_freqs:
        entity_freqs = dict(lex.entity_sums)

    for ent in mark.alt_entities:
        scores[ent] = scores.get(ent, 0.0) + entity_freqs.get(ent, 0)
    return _argmax(scores)


def get_entity_by_affix(head_text: str, lex) -> Dict[str, float]:
    """Affix-morphology entity probabilities (reference
    xrenner_marker.py:672-695): probe progressively shorter suffixes, first
    informative suffix wins."""
    affix_max = int(lex.filters["max_suffix_length"])
    probs: Dict[str, float] = {}
    entity = ""
    for i in range(1, len(head_text) - 1):
        if i > affix_max:
            break
        if lex.filters["morph_direction"] == "prefix":
            substr = head_text[:i]
        else:
            substr = head_text[i:]
        candidates = 0
        if substr in lex.morph_index:
            for key, value in lex.morph_index[substr].items():
                candidates += value
                entity = key.split("/")[0]
                probs[entity] = float(value)
            for ent in probs:
                probs[ent] = probs[ent] / candidates
        if entity != "":
            return probs
    return probs


def assign_coordinate_entity(mark: Markable, markables_by_head: Dict[str, Markable]):
    """If all conjuncts agree on entity/subclass, the envelope inherits it
    (reference xrenner_marker.py:835-853)."""
    sub_entities = []
    sub_subclasses = []
    for tid in mark.submarks:
        key = str(tid)
        if key in markables_by_head:
            sub_entities.append(markables_by_head[key].entity)
            sub_subclasses.append(markables_by_head[key].subclass)
    if len(set(sub_entities)) == 1:
        mark.entity = sub_entities[0]
    if len(set(sub_subclasses)) == 1:
        mark.subclass = sub_subclasses[0]


def _argmax(scores: Dict) -> str:
    """First key with the maximum value in insertion order (matches the
    reference's max() over dict iteration)."""
    best_key, best_val = "", None
    for key, val in scores.items():
        if best_val is None or val > best_val:
            best_key, best_val = key, val
    return best_key

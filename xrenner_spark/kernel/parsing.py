"""CoNLL-U reading and sentence-level preprocessing for the kernel.

Reproduces the reference's document-ingest semantics (reference
xrenner/modules/xrenner_xrenner.py:112-232 and xrenner_preprocess.py):
token-line parsing with id rebasing, quote state tracking, question mood,
function substitution, child/func/string accumulation, conjunct function
inheritance, modifier attachment, dynamic hasa learning, stop-zone
detection and the per-sentence descendant closure.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from .classes import DocState, Sentence, Token

_NAME_INITIAL = re.compile(r"^[A-Z]\.$")


def read_document(conllu_text: str, lex, seed_state=None,
                  boundary_sent=None) -> DocState:
    """Parse a whole CoNLL-U document into tokens + sentences.

    ``seed_state``/``boundary_sent`` serve the giant-document windowed
    path (engine.analyze_document_windowed): cross-sentence PARSE state
    (open-quote flag, the use_speaker_rules latch, the dynamic-hasa
    overlay) is seeded from the previous window and captured at the next
    window's context-start sentence, so windows see exactly the state the
    exact path would have — see COVERAGE.md "giant-document bound"."""
    doc = DocState(lex)
    f = lex.filters
    clean = conllu_text.replace("\r", "")
    lines = clean.split("\n")

    sent_num = 1
    tokoffset = 0
    sentlength = 0
    quoted = False
    if seed_state is not None:
        quoted = seed_state["quoted"]
        doc.use_speaker_rules = seed_state["use_speaker_rules"]
        doc.hasa_overlay = {k: dict(v)
                            for k, v in seed_state["hasa"].items()}
    current = Sentence(sent_num, tokoffset)
    if boundary_sent == 1:  # degenerate: context starts at the window start
        doc._boundary_quoted = quoted
        doc._boundary_speaker = doc.use_speaker_rules
        doc._hasa_snap_tid = 1
    lemmas: List[str] = []
    s_texts: List[str] = []

    # memoized-regex matchers hoisted out of the per-line loop
    open_quote_match = f["open_quote"].match
    close_quote_match = f["close_quote"].match
    question_mark_match = f["question_mark"].match
    non_link_func_match = f["non_link_func"].match
    non_link_tok_match = f["non_link_tok"].match
    func_subs_fwd = lex.func_substitutes_forward
    func_subs_bwd = lex.func_substitutes_backward

    # ONE merged pass (r6: the former first pass re-iterated every line to
    # build sentence surface strings and a line->columns cache; the cache
    # cost two full-line string hashes per token line).  Sentence surface
    # strings align with "\n\n" BLOCKS, not with the sentence-boundary
    # branch below — a run of g consecutive empty lines splits into
    # (g+1)//2 block boundaries, i.e. (g+1)//2 - 1 EMPTY blocks, exactly
    # like str.split("\n\n") on the stripped text; sequencer predictions
    # (which need the surface strings) are assigned onto tokens after the
    # loop — nothing reads tok.seq_pred during parsing.
    token_count = 0
    words: List[str] = []
    block_started = False
    pending_gap = 0

    # emulate clean.strip(): fully-whitespace lines at the DOCUMENT EDGES
    # are removed (with their newlines) before the "\n\n" block split, so
    # they must not open blocks or count toward gaps — r6 review fix; a
    # whitespace-only line BETWEEN content lines survives strip() and
    # stays block content (the existing non-empty-line path).  Sentence
    # logic below still sees every original line, as before.
    n_lines = len(lines)
    first_content = 0
    while first_content < n_lines and (lines[first_content] == ""
                                       or lines[first_content].isspace()):
        first_content += 1
    last_content = n_lines - 1
    while last_content >= first_content and (lines[last_content] == ""
                                             or lines[last_content].isspace()):
        last_content -= 1

    # hot-loop local bindings (r6): the three per-token dict registrations
    # ran through setdefault, which allocates a fresh empty-list argument
    # per call; the get-or-create form below does not
    doc_tokens_append = doc.tokens.append
    children = doc.children
    child_funcs_acc = doc.child_funcs
    child_strings_acc = doc.child_strings

    for lineno, line in enumerate(lines):
        tabpos = line.find("\t")
        if line:
            if not line.startswith("#"):
                token_count += 1
            if first_content <= lineno <= last_content:
                if block_started and pending_gap:
                    s_texts.append(" ".join(words))
                    del words[:]
                    for _ in range(((pending_gap + 1) // 2) - 1):
                        s_texts.append("")
                pending_gap = 0
                block_started = True
                if tabpos >= 0:
                    # surface words / raw lemmas: every tab-bearing line
                    # with a non-range id contributes (incl. ellipsis ids
                    # and the degenerate leading-tab case, which is NOT a
                    # token line)
                    cols = line.split("\t")
                    if "-" not in cols[0]:
                        words.append(cols[1])
                        lemmas.append(cols[2])
        elif block_started and lineno <= last_content:
            pending_gap += 1
        if line.startswith("#") and "speaker" in line and "=" in line:
            current.speaker = line.split("=")[1].strip()
            doc.use_speaker_rules = True
        elif line.startswith("#") and "s_type" in line and "=" in line:
            current.s_type = line.split("=")[1].strip()
        elif tabpos > 0:
            if not (first_content <= lineno <= last_content):
                # whitespace-only edge line carrying a tab: the words
                # branch above did not run, so split here (the old code
                # fell back to the same split on a cache miss)
                cols = line.split("\t")
            current.token_count += 1
            if "." in cols[0] or "-" in cols[0]:  # multiword/ellipsis ids
                continue
            text = cols[1]
            if open_quote_match(text) is not None and quoted is False:
                quoted = True
            elif close_quote_match(text) is not None and quoted is True:
                quoted = False
            if question_mark_match(text) is not None:
                current.mood = "question"
            tok_func = cols[7]
            pos = cols[3]
            # one int conversion per column (was up to three each); a
            # non-numeric id/head column raises ValueError either way
            ihead = int(cols[6])
            itid = int(cols[0])
            if pos in func_subs_fwd and ihead > itid:
                sub = func_subs_fwd[pos]
                tok_func = re.sub(sub[0], sub[1], cols[7])
            elif pos in func_subs_bwd and ihead < itid:
                sub = func_subs_bwd[pos]
                tok_func = re.sub(sub[0], sub[1], cols[7])
            tid = itid + tokoffset
            head = 0 if cols[6] == "0" else ihead + tokoffset
            lemma = cols[2].strip()
            if lemma in ("_", "--"):
                lemma = lex.lemmatize(text.strip(), pos)
            morph = cols[5]
            if morph not in ("_", "--", ""):
                morph = lex.process_morph(morph)
            tok = Token(tid, text, lemma, pos, morph, head, tok_func, current,
                        quoted, cols[8], cols[9])
            doc_tokens_append(tok)
            sentlength += 1
            # children only via span-linking functions (markable propagation)
            if not (non_link_func_match(tok_func) is not None
                    or non_link_tok_match(text) is not None):
                if cols[6] != "0":
                    lst = children.get(head)
                    if lst is None:
                        children[head] = [tid]
                    else:
                        lst.append(tid)
            # func/string accumulation keys on raw head+offset, like the
            # reference (root funcs land on the offset token — kept as-is)
            raw_head_key = ihead + tokoffset
            lst = child_funcs_acc.get(raw_head_key)
            if lst is None:
                child_funcs_acc[raw_head_key] = [tok_func]
            else:
                lst.append(tok_func)
            lst = child_strings_acc.get(raw_head_key)
            if lst is None:
                child_strings_acc[raw_head_key] = [text]
            else:
                lst.append(text)
        elif sentlength > 0:
            sent_num += 1
            tokoffset += sentlength
            current.length = sentlength
            doc.sentences.append(current)
            current = Sentence(sent_num, tokoffset)
            sentlength = 0
            if sent_num == boundary_sent:
                # state as of the start of this sentence, BEFORE its own
                # comments/tokens — exactly what a window whose context
                # begins here must be seeded with
                doc._boundary_quoted = quoted
                doc._boundary_speaker = doc.use_speaker_rules
                doc._hasa_snap_tid = tokoffset + 1

    if sentlength > 0:
        current.length = sentlength
        doc.sentences.append(current)
    if block_started:
        s_texts.append(" ".join(words))

    doc.token_count = token_count  # non-comment lines (incl. skipped ids)

    # sequence-label all tokens (reference xrenner_xrenner.py:159-163;
    # flat list indexed by global id - 1).  Assigned after the parse loop
    # — nothing reads tok.seq_pred during parsing, so this is equivalent
    # to the former predict-first ordering.
    if lex.sequencer is not None:
        seq_preds = lex.sequencer.predict_proba(s_texts)
        for tok in doc.tokens[1:]:
            tok.seq_pred = seq_preds[tok.tid - 1]

    # per-document lemma frequencies over the raw lemma column
    token_total = float(len(lemmas))
    counts: Dict[str, int] = {}
    for lemma in lemmas:
        counts[lemma] = counts.get(lemma, 0) + 1
    doc.lemma_freqs = counts
    doc.lemma_total = token_total
    for tok in doc.tokens:
        tok.lemma_freq = counts.get(tok.lemma, 0)
    for snum, sentence in enumerate(doc.sentences):
        if snum < len(s_texts):
            sentence.text = s_texts[snum]
    return doc


# ----------------------------------------------------------------------
# sentence-scope preprocessing, run before markable construction
# ----------------------------------------------------------------------

def add_child_info(doc: DocState, upto: int):
    """Attach accumulated child funcs/strings to each head token and set
    negation flags (reference xrenner_preprocess.py:27-46).

    The reference rescans every id <= upto each sentence; because the
    child_funcs/child_strings dicts are fully built at read time and the
    per-id processing is idempotent (append-dedup + a monotone negated
    flag), ids at or below the previous call's upto are already in their
    final state — the frontier skip below only removes redundant rescans
    (the quadratic-in-sentences term), never changes output."""
    neg_re = doc.lex.filters["neg_func"]
    frontier = doc.child_info_frontier
    if upto <= frontier:
        return
    doc.child_info_frontier = upto
    # iterate the NEW id range directly instead of scanning the whole
    # child_funcs dict each sentence (r6 — the dict holds every id in the
    # document, so the former scan was quadratic in sentence count; ids
    # outside (frontier, upto] were skipped there, exactly this range,
    # and per-id processing is independent so order cannot matter)
    child_funcs_map = doc.child_funcs
    child_strings_map = doc.child_strings
    toks = doc.tokens
    for child_id in range(frontier + 1, upto + 1):
        funcs = child_funcs_map.get(child_id)
        if funcs is None:
            continue
        tok = toks[child_id]
        for func in funcs:
            if func not in tok.child_funcs:
                tok.child_funcs.append(func)
                if neg_re.match(func):
                    tok.negated = True
        for text in child_strings_map.get(child_id, []):
            if text not in tok.child_strings:
                tok.child_strings.append(text)


def add_negated_parents(doc: DocState, tokoffset: int, upto: int):
    for tok in doc.tokens[tokoffset:upto + 1]:
        if tok.head > 0 and doc.tokens[tok.head].negated:
            tok.neg_parent = True


def set_positions(doc: DocState, tokoffset: int, upto: int, sentence: Sentence):
    """Relative positions and parent text/POS caching (reference
    xrenner_xrenner.py:432-437)."""
    for tok in doc.tokens[tokoffset + 1:upto + 1]:
        tok.sent_position = float(tok.tid - tokoffset) / sentence.token_count
        tok.doc_position = float(tok.tid) / doc.token_count
        parent = doc.tokens[tok.head]
        tok.head_text = parent.text
        tok.head_pos = parent.pos


def replace_conj_func(doc: DocState, tokoffset: int, upto: int):
    """Conjunct tokens inherit their parent's function and head and are
    flagged coordinate (reference xrenner_preprocess.py:107-127)."""
    conj_re = doc.lex.filters["conjunct_func"]
    for tok in doc.tokens[tokoffset:upto + 1]:
        if conj_re.match(tok.func) is not None:
            parent = doc.tokens[tok.head]
            for child_func in parent.child_funcs:
                tok.child_funcs.append(child_func)
            tok.func = parent.func
            tok.head = parent.head
            tok.coordinate = True


def attach_modifiers_and_learn_hasa(doc: DocState, tokoffset: int, upto: int):
    """Modifier attachment + dynamic possession learning (reference
    xrenner_xrenner.py:446-463).  The reference mutates the shared lexicon's
    hasa table; we keep the counts in the document-scoped overlay."""
    if doc._hasa_snap_tid is not None and doc._hasa_snap is None \
            and tokoffset + 1 >= doc._hasa_snap_tid:
        # per-sentence calls arrive in order, so the first range starting
        # at/after the boundary sentence carries the overlay state the
        # next window's seed needs (contributions from sentences < it)
        doc._hasa_snap = {k: dict(v) for k, v in doc.hasa_overlay.items()}
    f = doc.lex.filters
    mod_re = f["mod_func"]
    poss_re = f["possessive_func"]
    pron_re = f["pronoun_pos"]
    for tok in doc.tokens[tokoffset:upto + 1]:
        for child_id in doc.children.get(tok.tid, []):
            child = doc.tokens[child_id]
            if mod_re.match(child.func) is not None:
                tok.modifiers.append(child)
        head_tok = doc.tokens[tok.head] if tok.head >= 0 else doc.tokens[0]
        tok.head_text = head_tok.text
        if poss_re.match(tok.func) is not None:
            if pron_re.match(tok.pos) is None and pron_re.match(head_tok.pos) is None:
                doc.hasa_add(tok.text, head_tok.text, 2)
                doc.hasa_add(tok.lemma, head_tok.text, 1)
        if tok.func2 != "_" and poss_re.match(tok.func2) is not None:
            try:
                head2 = doc.tokens[int(tok.head2) + tokoffset]
            except (ValueError, IndexError):
                continue
            if pron_re.match(tok.pos) is None and pron_re.match(head2.pos) is None:
                doc.hasa_add(tok.text, head2.text, 2)
                doc.hasa_add(tok.lemma, head2.text, 1)


def lookup_has_entity(text: str, lemma: str, entity: str, lex) -> bool:
    """Check whether a token's text or lemma carries ``entity`` in the
    entities / entity_heads gazetteers (reference xrenner_marker.py:813-832).

    The reference stores each gazetteer row as the tab-joined string
    "entity\\tsubclass\\tfreq" and runs ``re.search(entity + "\\t", row)``
    — an unanchored search, so a subclass exactly equal to ``entity`` (or
    an entity whose *suffix* is ``entity``) also matches.  We rebuild the
    joined string from our tuple rows to keep that quirk bit-for-bit."""
    pat = entity + "\t"

    def hit(entries):
        return any(
            re.search(pat, "%s\t%s\t%s" % (ent, sub, freq)) is not None
            for ent, sub, freq in entries)

    if text in lex.entities:
        return hit(lex.entities[text])
    if lemma in lex.entities:
        return hit(lex.entities[lemma])
    if text in lex.entity_heads:
        return hit(lex.entity_heads[text])
    if lemma in lex.entity_heads:
        return hit(lex.entity_heads[lemma])
    return False


def postprocess_parser(doc: DocState, tokoffset: int, upto: int,
                       stop_ids: Dict[int, bool]):
    """Entity-list-driven parse repair, run only when the model sets
    ``postprocess_parser=True`` (reference xrenner_preprocess.py:49-104):
    -LSB-/-RSB- bracket fixes, re-heading of tokens inside known
    multi-token entities, two apposition-misparse fixes (MaltParser name
    appositions and Stanford city-,-state appositions) and removal of
    children projecting beyond an apposition.

    Mutates token pos/func/head, ``doc.children`` and ``stop_ids`` in
    place, in the reference's exact iteration order — including its
    quirks (e.g. the -LSB- fix does not detach the token from its old
    head's child list)."""
    lex = doc.lex
    f = lex.filters
    toks = doc.tokens
    children = doc.children
    mark_head_re = f["mark_head_pos"]
    appos_re = f["apposition_func"]
    proper_re = f["proper_pos"]
    non_link_re = f["non_link_func"]

    for tok1 in toks[tokoffset + 1:upto + 1]:
        if tok1.text == "-LSB-" or tok1.text == "-RSB-":
            tok1.pos = tok1.text
            tok1.func = "punct"
            tok1.head = 0

        # re-head tokens inside known multi-token entities whose rightmost
        # token attaches outside the entity (xrenner_preprocess.py:54-75)
        if mark_head_re.match(tok1.pos) is not None:
            entity_candidate = tok1.text + " "
            for tok2 in toks[tok1.tid + 1:upto + 1]:
                if mark_head_re.match(tok2.pos) is not None:
                    entity_candidate += tok2.text + " "
                    if entity_candidate.strip() in lex.entities:
                        for tok3 in toks[tok1.tid:tok2.tid]:
                            # rightmost token's head must be outside entity
                            if tok2.head > tok2.tid or tok2.head < tok1.tid:
                                if (tok3.head < tok1.tid or tok3.head > tok2.tid) \
                                        and tok3.tid in children.get(tok3.head, []):
                                    children[tok3.head].remove(tok3.tid)
                                    tok3.head = tok2.tid
                                    children.setdefault(tok3.head, []).append(tok3.tid)
                                    break
                else:
                    break

        # apposition pointing back to the immediately preceding proper
        # noun — typical MaltParser name behavior (preprocess.py:77-83)
        if appos_re.match(tok1.func) is not None and tok1.tid != 1:
            if proper_re.match(toks[tok1.tid - 1].pos) is not None \
                    and toks[tok1.tid - 1].tid == tok1.head:
                tok1.func = "xrenner_fix"
                children.setdefault(tok1.tid - 1, []).append(tok1.tid)
                stop_ids[tok1.tid] = True

        # [city], [state/country] apposition — typical Stanford parser
        # behavior (preprocess.py:85-99); entity label "place" is a literal
        # in the reference, not the place_def_entity filter
        if appos_re.match(tok1.func) is not None and not tok1.tid < 3:
            if toks[tok1.tid - 1].text.strip() == ",":
                tok_minus2 = toks[tok1.tid - 2]
                tok1_head = toks[tok1.head]
                if proper_re.match(tok_minus2.pos) is not None:
                    if (tok_minus2.tid == tok1.head and
                            (lookup_has_entity(tok1.text, tok1.lemma, "place", lex)
                             and not lookup_has_entity(tok_minus2.text, tok_minus2.lemma, "place", lex)
                             or lookup_has_entity(tok_minus2.text, tok_minus2.lemma, "place", lex))) or \
                            not lookup_has_entity(tok1_head.text, tok1_head.lemma, "place", lex) \
                            and lookup_has_entity(tok1.text, tok1.lemma, "place", lex):
                        tok1.func = "xrenner_fix"
                        if tok1.tid not in children.get(tok_minus2.tid, []):
                            if tok_minus2.head != tok1.tid:  # avoid a cycle
                                children.setdefault(tok_minus2.tid, []).append(tok1.tid)

        # markable projecting beyond an apposition to itself: drop the
        # violating children (preprocess.py:101-104)
        if appos_re.match(tok1.func) is not None and tok1.tid != 1:
            for tok2 in toks[tok1.tid + 1:upto + 1]:
                if tok2.head == tok1.head and non_link_re.match(tok2.func) is None \
                        and tok2.tid in children.get(tok2.head, []):
                    children[tok2.head].remove(tok2.tid)


def _affix_stop_reroute(doc: DocState, tok1, tokoffset: int, upto: int,
                        stop_ids: Dict[int, bool]):
    """Affix tokens can't be markable heads: flag them stopped and promote
    the rightmost eligible child to head in their place, rewiring heads,
    children, funcs and modifiers (reference xrenner_xrenner.py:476-518,
    active only under postprocess_parser).

    Reference quirks preserved deliberately: children are scanned in
    *string*-descending id order (ids are strings there), and the inner
    redistribution loop removes elements from the list it is iterating,
    skipping every other entry — both affect which edges survive."""
    from .mentions import pos_func_combo

    lex = doc.lex
    f = lex.filters
    toks = doc.tokens
    children = doc.children
    mark_head_re = f["mark_head_pos"]
    forbidden_re = f["mark_forbidden_func"]
    combos = f["pos_func_heads"]
    mod_re = f["mod_func"]

    def head_candidate(tok):
        return ((mark_head_re.match(tok.pos) is not None
                 and forbidden_re.match(tok.func) is None)
                or pos_func_combo(tok.pos, tok.func, combos))

    if not (head_candidate(tok1) and not stop_ids[tok1.tid]):
        return
    if tok1.text.strip() not in lex.affix_tokens:
        return
    stop_ids[tok1.tid] = True
    for child_id in sorted(children.get(tok1.tid, []), key=str, reverse=True):
        child = toks[child_id]
        if head_candidate(child) and not stop_ids[child.tid]:
            child.head = tok1.head
            tok1.head = child.tid
            # make the new head the head of all children of the affix
            # token (live-list mutation during iteration kept verbatim)
            for child_id2 in children[tok1.tid]:
                if child_id2 != child_id:
                    toks[child_id2].head = child.tid
                    children[tok1.tid].remove(child_id2)
                    children.setdefault(child.tid, []).append(child_id2)
            # swap the functions of affix head and new head
            temp_func = child.func
            child.func = tok1.func
            tok1.func = temp_func
            children[tok1.tid].remove(child.tid)
            children.setdefault(child.tid, []).append(tok1.tid)
            if child in tok1.modifiers:
                tok1.modifiers.remove(child)
                child.modifiers.append(tok1)
            # re-route any other non-link parents to the new head
            for tok_to_rewire in toks[tokoffset + 1:upto + 1]:
                if tok_to_rewire.original_head == tok1.tid \
                        and tok_to_rewire.head != child.tid \
                        and tok_to_rewire.tid != child.tid:
                    tok_to_rewire.head = child.tid
                    if tok_to_rewire.func not in child.child_funcs:
                        child.child_funcs.append(tok_to_rewire.func)
                    if tok_to_rewire not in child.modifiers \
                            and mod_re.match(tok_to_rewire.func) is not None:
                        child.modifiers.append(tok_to_rewire)
                    if child in tok_to_rewire.modifiers:
                        tok_to_rewire.modifiers.remove(child)
            # only the first subordinate head, traversing right to left
            break


def find_stop_zones(doc: DocState, tokoffset: int, upto: int,
                    stop_ids: Optional[Dict[int, bool]] = None) -> Dict[int, bool]:
    """Tokens that cannot head markables: affix-token rewiring (under
    postprocess_parser), stop-list n-grams and first+last name pairs
    (reference xrenner_xrenner.py:466-542).  ``stop_ids`` may arrive
    pre-seeded by :func:`postprocess_parser` (the reference initializes it
    before the postprocess hook and threads it through)."""
    lex = doc.lex
    toks = doc.tokens
    if stop_ids is None:
        stop_ids = {}
    for tok in toks[tokoffset + 1:upto + 1]:
        stop_ids.setdefault(tok.tid, False)
    postprocess = bool(lex.filters["postprocess_parser"])

    # one pass per token: affix rewiring (if enabled) then the stop-list
    # n-gram window of up to 4 tokens — interleaved exactly as in the
    # reference's dead-areas loop, because the rewiring reads stop flags
    # set by earlier iterations
    use_sequencer = lex.sequencer is not None
    stop_first = lex.stop_first_words()
    stop_list = lex.stop_list
    for tok1 in toks[tokoffset + 1:upto + 1]:
        if use_sequencer:
            # confident "O" prediction on an eligible POS suppresses the
            # token as a markable head, unless a forbidden child func
            # hangs off it (reference xrenner_xrenner.py:471-474; runs
            # BEFORE the affix rewiring, which reads these flags)
            if tok1.seq_pred[0] == "O" \
                    and tok1.seq_pred[1] > lex.filters["sequencer_nonref_thresh"] \
                    and lex.filters["sequencer_nonref_pos"].match(tok1.pos) is not None:
                if not any(lex.filters["sequencer_nonref_forbidden_childfunc"]
                           .match(cf) is not None for cf in tok1.child_funcs):
                    stop_ids[tok1.tid] = True
        if postprocess:
            _affix_stop_reroute(doc, tok1, tokoffset, upto, stop_ids)
        # a candidate n-gram starting at tok1 begins with tok1's FIRST
        # WORD (a token FORM may legally contain internal spaces in
        # CoNLL-U), so tokens whose first word is outside the stop
        # list's first-word index can't open a stop zone; empty-text
        # tokens shift the first word and take the full path.  The
        # split only runs on the rare space-carrying tokens (r5 advice:
        # gating the whole multi-word text against the first-word index
        # silently skipped entries like 'new york times')
        t1_text = tok1.text
        if t1_text:
            first = t1_text.lower()
            if " " in first:
                first = first.split(" ", 1)[0]
            if first not in stop_first:
                continue
        candidate = ""
        for tok2 in toks[tok1.tid:min(upto + 1, tok1.tid + 4)]:
            candidate += tok2.text + " "
            if candidate.strip().lower() in stop_list:
                for tok3 in toks[tok1.tid:tok2.tid + 1]:
                    stop_ids[tok3.tid] = True

    cap_names = lex.filters["cap_names"]

    def titled(text):
        return text.title() if text.isupper() else text

    first_names = lex.first_names
    last_names = lex.last_names
    # adjacent first+last name pairs: the first name can't stand alone.
    # Conditions evaluate lazily (first-name gate before touching tok2)
    # — pure reordering of a side-effect-free conjunction
    for tok1 in toks[tokoffset + 1:upto]:
        first_cand = titled(tok1.text)
        if cap_names and not first_cand[:1].isupper():
            continue
        if first_cand not in first_names:
            continue
        tok2 = toks[tok1.tid + 1]
        last_cand = titled(tok2.text)
        if cap_names and not last_cand[:1].isupper():
            continue
        if last_cand in last_names and tok1.head == tok2.tid:
            stop_ids[tok1.tid] = True
    # same with one intervening token (middle name or initial)
    for tok1 in toks[tokoffset + 1:upto - 1]:
        first_cand = titled(tok1.text)
        if cap_names and not first_cand[:1].isupper():
            continue
        if first_cand not in first_names:
            continue
        tok2 = toks[tok1.tid + 2]
        last_cand = titled(tok2.text)
        if cap_names and not last_cand[:1].isupper():
            continue
        if last_cand in last_names and tok1.head == tok2.tid:
            middle = toks[tok1.tid + 1].text
            middle_cand = middle.title() if tok1.text.isupper() else middle
            if _NAME_INITIAL.match(middle_cand) or middle_cand in first_names:
                stop_ids[tok1.tid] = True
    return stop_ids


def build_descendants(doc: DocState, tokoffset: int, upto: int):
    """Transitive closure of child edges for heads in this sentence
    (reference xrenner_classes.py:305-320)."""
    for parent in list(doc.children):
        if tokoffset < parent <= upto:
            doc.descendants[parent] = _descend(parent, doc.children, set())


def _descend(parent: int, children: Dict[int, List[int]], seen) -> List[int]:
    out: List[int] = []
    for child in children.get(parent, []):
        if child in seen:
            raise ValueError("cycle detected in dependency tree at token %d" % child)
        seen.add(child)
        out.append(child)
    for child in children.get(parent, []):
        if child in children:
            out.extend(_descend(child, children, seen))
    return out

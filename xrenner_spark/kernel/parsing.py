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
from typing import Dict, List

from .classes import DocState, Sentence, Token

_NAME_INITIAL = re.compile(r"^[A-Z]\.$")


def read_document(conllu_text: str, lex) -> DocState:
    """Parse a whole CoNLL-U document into tokens + sentences."""
    doc = DocState(lex)
    f = lex.filters
    lines = conllu_text.replace("\r", "").split("\n")

    doc.token_count = len([ln for ln in lines if not (ln.startswith("#") or len(ln) == 0)])

    sent_num = 1
    tokoffset = 0
    sentlength = 0
    quoted = False
    current = Sentence(sent_num, tokoffset)
    lemmas: List[str] = []
    s_texts: List[str] = []

    # sentence surface strings (used for speaker/oracle contexts)
    for block in "\n".join(lines).strip().split("\n\n"):
        tablines = [ln.split("\t") for ln in block.split("\n") if "\t" in ln]
        words = [cols[1] for cols in tablines if "-" not in cols[0]]
        lemmas += [cols[2] for cols in tablines if "-" not in cols[0]]
        s_texts.append(" ".join(words))

    for line in lines:
        if line.startswith("#") and "speaker" in line and "=" in line:
            current.speaker = line.split("=")[1].strip()
            doc.use_speaker_rules = True
        elif line.startswith("#") and "s_type" in line and "=" in line:
            current.s_type = line.split("=")[1].strip()
        elif line.find("\t") > 0:
            current.token_count += 1
            cols = line.split("\t")
            if "." in cols[0] or "-" in cols[0]:  # multiword/ellipsis ids
                continue
            text = cols[1]
            if f["open_quote"].match(text) is not None and quoted is False:
                quoted = True
            elif f["close_quote"].match(text) is not None and quoted is True:
                quoted = False
            if f["question_mark"].match(text) is not None:
                current.mood = "question"
            tok_func = cols[7]
            pos = cols[3]
            if pos in lex.func_substitutes_forward and int(cols[6]) > int(cols[0]):
                sub = lex.func_substitutes_forward[pos]
                tok_func = re.sub(sub[0], sub[1], cols[7])
            elif pos in lex.func_substitutes_backward and int(cols[6]) < int(cols[0]):
                sub = lex.func_substitutes_backward[pos]
                tok_func = re.sub(sub[0], sub[1], cols[7])
            tid = int(cols[0]) + tokoffset
            head = 0 if cols[6] == "0" else int(cols[6]) + tokoffset
            lemma = cols[2].strip()
            if lemma in ("_", "--"):
                lemma = lex.lemmatize(text.strip(), pos)
            morph = cols[5]
            if morph not in ("_", "--", ""):
                morph = lex.process_morph(morph)
            tok = Token(tid, text, lemma, pos, morph, head, tok_func, current,
                        quoted, cols[8], cols[9])
            doc.tokens.append(tok)
            sentlength += 1
            # children only via span-linking functions (markable propagation)
            if not (f["non_link_func"].match(tok_func) is not None
                    or f["non_link_tok"].match(text) is not None):
                if cols[6] != "0":
                    doc.children.setdefault(head, []).append(tid)
            # func/string accumulation keys on raw head+offset, like the
            # reference (root funcs land on the offset token — kept as-is)
            raw_head_key = int(cols[6]) + tokoffset
            doc.child_funcs.setdefault(raw_head_key, []).append(tok_func)
            doc.child_strings.setdefault(raw_head_key, []).append(text)
        elif sentlength > 0:
            sent_num += 1
            tokoffset += sentlength
            current.length = sentlength
            doc.sentences.append(current)
            current = Sentence(sent_num, tokoffset)
            sentlength = 0

    if sentlength > 0:
        current.length = sentlength
        doc.sentences.append(current)

    # per-document lemma frequencies over the raw lemma column
    token_total = float(len(lemmas))
    doc.token_count = doc.token_count  # total non-comment lines (incl. skipped ids)
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
    negation flags (reference xrenner_preprocess.py:27-46)."""
    neg_re = doc.lex.filters["neg_func"]
    for child_id, funcs in doc.child_funcs.items():
        if child_id > upto:
            continue
        tok = doc.tokens[child_id]
        for func in funcs:
            if func not in tok.child_funcs:
                tok.child_funcs.append(func)
                if neg_re.match(func):
                    tok.negated = True
        for text in doc.child_strings.get(child_id, []):
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


def find_stop_zones(doc: DocState, tokoffset: int, upto: int) -> Dict[int, bool]:
    """Tokens that cannot head markables: stop-list n-grams and
    first+last name pairs (reference xrenner_xrenner.py:466-542)."""
    lex = doc.lex
    stop_ids: Dict[int, bool] = {}
    toks = doc.tokens
    for tok in toks[tokoffset + 1:upto + 1]:
        stop_ids[tok.tid] = False

    # stop-list n-grams, window of up to 4 tokens from each start
    for tok1 in toks[tokoffset + 1:upto + 1]:
        candidate = ""
        for tok2 in toks[tok1.tid:min(upto + 1, tok1.tid + 4)]:
            candidate += tok2.text + " "
            if candidate.strip().lower() in lex.stop_list:
                for tok3 in toks[tok1.tid:tok2.tid + 1]:
                    stop_ids[tok3.tid] = True

    cap_names = lex.filters["cap_names"]

    def titled(text):
        return text.title() if text.isupper() else text

    # adjacent first+last name pairs: the first name can't stand alone
    for tok1 in toks[tokoffset + 1:upto]:
        tok2 = toks[tok1.tid + 1]
        first_cand, last_cand = titled(tok1.text), titled(tok2.text)
        if not cap_names or (first_cand[:1].isupper() and last_cand[:1].isupper()):
            if (first_cand in lex.first_names and last_cand in lex.last_names
                    and tok1.head == tok2.tid):
                stop_ids[tok1.tid] = True
    # same with one intervening token (middle name or initial)
    for tok1 in toks[tokoffset + 1:upto - 1]:
        tok2 = toks[tok1.tid + 2]
        first_cand, last_cand = titled(tok1.text), titled(tok2.text)
        middle = toks[tok1.tid + 1].text
        middle_cand = middle.title() if tok1.text.isupper() else middle
        if not cap_names or (first_cand[:1].isupper() and last_cand[:1].isupper()):
            if (first_cand in lex.first_names and last_cand in lex.last_names
                    and tok1.head == tok2.tid
                    and (_NAME_INITIAL.match(middle_cand) or middle_cand in lex.first_names)):
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

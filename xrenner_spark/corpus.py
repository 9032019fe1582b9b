"""Deterministic synthetic Common-Crawl-style web-page corpus.

Each page is a pure function of its integer doc_id (md5-keyed PRNG — no
global random state), so generation distributes embarrassingly over Spark
executors and is reproducible across runs and machines.  Pages carry
their dependency parses embedded in the HTML (exactly as the reference's
test corpus embeds parses in tests.dat), so no external parser dependency
exists; `text` is the detokenized parse and the html→text extraction is
byte-identical by construction — the pipeline re-checks that invariant
per row (BASELINE.md "per-row invariant").

Schema matches BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
"""

from __future__ import annotations

import datetime
import hashlib
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------
# deterministic PRNG
# ---------------------------------------------------------------------

_md5 = hashlib.md5
_from_bytes = int.from_bytes


def _h(*parts) -> int:
    return _from_bytes(
        _md5("\x1f".join(map(str, parts)).encode("utf8")).digest()[:8], "big")


def _pick(seq, *salts):
    return seq[_h(*salts) % len(seq)]


# ---------------------------------------------------------------------
# lexicon-aligned inventories (these surface forms exist in models/web)
# ---------------------------------------------------------------------

PERSONS = [("Ada", "Lovelace", "Fem"), ("Grace", "Hopper", "Fem"),
           ("Marie", "Curie", "Fem"), ("Mary", "Shelley", "Fem"),
           ("Barbara", "Liskov", "Fem"), ("Rosalind", "Franklin", "Fem"),
           ("Alan", "Turing", "Masc"), ("John", "McCarthy", "Masc"),
           ("Nikola", "Tesla", "Masc"), ("Albert", "Einstein", "Masc"),
           ("Linus", "Torvalds", "Masc"), ("Claude", "Shannon", "Masc")]

# multiword proper entities: (tokens, head noun kind for later isa mentions)
ORGS = [(["the", "United", "Nations"], "organization"),
        (["the", "World", "Bank"], "organization"),
        (["Acme", "Corporation"], "company"),
        (["Globex", "Corporation"], "company"),
        (["the", "European", "Union"], "organization")]
PLACES = [(["New", "Zealand"], "country"),
          (["San", "Francisco"], "city"),
          (["the", "United", "States"], "country"),
          (["the", "Pacific", "Ocean"], "ocean"),
          (["Mount", "Everest"], "mountain")]

COMMONS = ["report", "treaty", "proposal", "decision", "flag", "telescope",
           "bridge", "meeting", "election"]
ROLES = ["scientist", "engineer", "professor", "author", "researcher", "president"]
TRANS_VERBS = [("published", "publish"), ("signed", "sign"), ("announced", "announce"),
               ("praised", "praise"), ("won", "win"), ("proposed", "propose")]
INTRANS_VERBS = [("arrived", "arrive"), ("smiled", "smile"), ("succeeded", "succeed"),
                 ("failed", "fail")]
POSSESSEDS = ["profits", "campus", "coach", "budget"]
NUM_WORDS = [("Two", "two"), ("Three", "three"), ("Five", "five"), ("Ten", "ten")]


# ---------------------------------------------------------------------
# token-row helpers: (text, lemma, pos, morph, head_local, func)
# ---------------------------------------------------------------------

Row = Tuple[str, str, str, str, int, str]


def _np_person(first: str, last: str, gender: str, head_at: int = 0) -> List[Row]:
    return [(first, first, "PROPN", "Gender=%s" % gender, 1, "compound"),
            (last, last, "PROPN", "Gender=%s" % gender, head_at, None)]


def _np_multiword(tokens: List[str], head_at: int) -> List[Row]:
    rows: List[Row] = []
    n = len(tokens)
    for i, tok in enumerate(tokens):
        if i == n - 1:
            rows.append((tok, tok, "PROPN", "_", head_at, None))
        elif tok == "the":
            rows.append((tok, "the", "DET", "_", n - i - 1, "det"))
        else:
            rows.append((tok, tok, "PROPN", "_", n - i - 1, "compound"))
    return rows


def _np_common(det: str, noun: str, head_at: int, num: Optional[str] = None,
               adj: Optional[str] = None) -> List[Row]:
    rows: List[Row] = [(det, det.lower(), "DET", "_", 0, "det")]
    if num:
        rows.append((num, num.lower(), "NUM", "_", 0, "nummod"))
    if adj:
        rows.append((adj, adj, "ADJ", "_", 0, "amod"))
    rows.append((noun, _lemma_of(noun), "NOUN",
                 "Number=Plur" if noun.endswith("s") and noun not in ("process",) else "_",
                 head_at, None))
    n = len(rows)
    fixed = []
    for i, r in enumerate(rows):
        if i < n - 1:
            fixed.append((r[0], r[1], r[2], r[3], n - i - 1, r[5]))
        else:
            fixed.append(r)
    return fixed


_LEMMAS = {"profits": "profit", "ships": "ship", "reporters": "reporter",
           "leaders": "leader", "members": "member"}


def _lemma_of(noun: str) -> str:
    return _LEMMAS.get(noun, noun)


class _SentBuilder:
    """Assemble one sentence; head offsets are resolved to local 1-based ids."""

    def __init__(self):
        self.rows: List[List] = []

    def add(self, text, lemma, pos, morph, head, func):
        self.rows.append([text, lemma, pos, morph, head, func])
        return len(self.rows)  # local id

    def add_np(self, np_rows: List[Row], func: str, verb_slot: str = "@VERB"):
        """Add an NP; relative heads inside the NP point forward to its own
        head; the NP head attaches to verb_slot (patched later)."""
        base = len(self.rows)
        head_local = base + len(np_rows)  # NP head is last row
        for i, (text, lemma, pos, morph, rel, f) in enumerate(np_rows):
            if f is None:  # the NP head itself
                self.rows.append([text, lemma, pos, morph, verb_slot, func])
            else:
                self.rows.append([text, lemma, pos, morph, head_local, f])
        return head_local

    def patch(self, slot: str, local_id: int):
        for row in self.rows:
            if row[4] == slot:
                row[4] = local_id

    def conllu(self) -> str:
        lines = []
        for i, (text, lemma, pos, morph, head, func) in enumerate(self.rows, start=1):
            lines.append("\t".join([str(i), text, lemma, pos, pos, morph,
                                    str(head), func, "_", "_"]))
        return "\n".join(lines)

    def words(self) -> List[str]:
        return [r[0] for r in self.rows]


def _finish(sb: _SentBuilder, verb_local: int):
    sb.patch("@VERB", verb_local)
    sb.add(".", ".", "PUNCT", "_", verb_local, "punct")


# ---------------------------------------------------------------------
# sentence templates; each returns a rendered (conllu, text) pair
# ---------------------------------------------------------------------
# r6: each template's rendered output is fully determined by a handful of
# small-cardinality picks (every inventory above is <= 12 entries), so the
# row building + conllu/text string assembly is memoized per worker on the
# pick key — same pattern as lex.CachedPattern ("each worker re-warms its
# own memo").  The _h draws are untouched (md5 is stateless; each draw
# depends only on its own key parts), so every pick — and therefore every
# emitted byte — is identical to the unmemoized form; the differential
# gate is test_corpus_render_memo + scripts/diff harness (500k doc_ids,
# byte-equal).  Total key space is < 10k short strings.

_RENDER_MEMO: Dict[tuple, Tuple[str, str]] = {}


def _rendered(key, build) -> Tuple[str, str]:
    r = _RENDER_MEMO.get(key)
    if r is None:
        sb = build()
        r = (sb.conllu(), " ".join(sb.words()))
        _RENDER_MEMO[key] = r
    return r


def _sent_person_intro(state, seed) -> Tuple[str, str]:
    person = _pick(PERSONS, seed, "p")
    verb, vlemma = _pick(TRANS_VERBS, seed, "v")
    common = _pick(COMMONS, seed, "c")
    state["person"] = person
    state["common"] = common
    state["verb"] = (verb, vlemma)

    def build():
        sb = _SentBuilder()
        sb.add_np(_np_person(*person), "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        sb.add_np(_np_common("a", common, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("pi", person, verb, common), build)


def _sent_org_intro(state, seed) -> Tuple[str, str]:
    oi = _h(seed, "o") % len(ORGS)
    org, kind = ORGS[oi]
    verb, vlemma = _pick(TRANS_VERBS, seed, "v2")
    common = _pick(COMMONS, seed, "c2")
    state["org"] = (org, kind)
    state["common2"] = common
    state["verb2"] = (verb, vlemma)

    def build():
        sb = _SentBuilder()
        sb.add_np(_np_multiword(org, 0), "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        sb.add_np(_np_common("a", common, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("oi", oi, verb, common), build)


def _sent_place_visit(state, seed) -> Tuple[str, str]:
    pli = _h(seed, "pl") % len(PLACES)
    place, kind = PLACES[pli]
    person = state.get("person") or _pick(PERSONS, seed, "p2")
    state["person"] = person
    state["place"] = (place, kind)

    def build():
        sb = _SentBuilder()
        sb.add_np(_np_person(*person), "nsubj")
        v = sb.add("visited", "visit", "VERB", "_", 0, "root")
        sb.add_np(_np_multiword(place, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("pv", person, pli), build)


def _sent_pronoun_def(state, seed) -> Tuple[str, str]:
    """Pronoun subject (matching last person/org) + definite re-mention."""
    verb, vlemma = _pick(TRANS_VERBS, seed, "v3")
    if state.get("person") is not None and _h(seed, "who") % 2 == 0:
        pron = "She" if state["person"][2] == "Fem" else "He"
        plemma = pron.lower()
    else:
        pron, plemma = "It", "it"
    common = state.get("common") or state.get("common2") or _pick(COMMONS, seed, "c3")

    def build():
        sb = _SentBuilder()
        sb.add(pron, plemma, "PRON", "_", "@VERB", "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        sb.add_np(_np_common("the", common, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("pd", pron, verb, common), build)


def _sent_isa_mention(state, seed) -> Tuple[str, str]:
    """Definite common noun matching the subclass of an introduced entity."""
    kind = None
    if state.get("place") is not None:
        kind = state["place"][1]
    elif state.get("org") is not None:
        kind = state["org"][1]
    noun = kind if kind in ("city", "country", "company", "organization") else \
        _pick(COMMONS, seed, "c4")
    verb, vlemma = _pick(INTRANS_VERBS, seed, "v4")

    def build():
        sb = _SentBuilder()
        sb.add_np(_np_common("The", noun, 0), "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        _finish(sb, v)
        return sb
    return _rendered(("isa", noun, verb), build)


def _sent_possessive(state, seed) -> Tuple[str, str]:
    if state.get("person") is not None and _h(seed, "pg") % 2 == 0:
        pron = "Her" if state["person"][2] == "Fem" else "His"
        plemma = pron.lower()
    else:
        pron, plemma = "Its", "its"
    possessed = _pick(POSSESSEDS, seed, "ps")
    verb, vlemma = _pick(INTRANS_VERBS, seed, "v5")

    def build():
        sb = _SentBuilder()
        sb.add(pron, plemma, "PRON", "_", 2, "nmod:poss")
        sb.add(possessed, _lemma_of(possessed), "NOUN",
               "Number=Plur" if possessed.endswith("s") else "_", "@VERB", "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        _finish(sb, v)
        return sb
    return _rendered(("poss", pron, possessed, verb), build)


def _sent_apposition(state, seed) -> Tuple[str, str]:
    person = _pick(PERSONS, seed, "p3")
    role = _pick(ROLES, seed, "r")
    verb, vlemma = _pick(TRANS_VERBS, seed, "v6")
    common = _pick(COMMONS, seed, "c5")
    state["person"] = person
    state["role"] = role

    def build():
        sb = _SentBuilder()
        head = sb.add_np(_np_person(*person), "nsubj")
        sb.add(",", ",", "PUNCT", "_", head, "punct")
        appos_base = len(sb.rows)
        sb.add("a", "a", "DET", "_", appos_base + 2, "det")
        sb.add(role, role, "NOUN", "_", head, "appos")
        sb.add(",", ",", "PUNCT", "_", appos_base + 2, "punct")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        sb.add_np(_np_common("the", common, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("ap", person, role, verb, common), build)


_COORD_N1 = ["company", "university", "team", "government"]
_COORD_N2 = ["committee", "bank", "city", "country"]


def _sent_coordination(state, seed) -> Tuple[str, str]:
    n1 = _pick(_COORD_N1, seed, "n1")
    n2 = _pick(_COORD_N2, seed, "n2")
    verb, vlemma = _pick(TRANS_VERBS, seed, "v7")
    common = _pick(COMMONS, seed, "c6")
    state["common2"] = common
    state["plural_subject"] = True

    def build():
        sb = _SentBuilder()
        sb.add("The", "the", "DET", "_", 2, "det")
        h1 = sb.add(n1, n1, "NOUN", "_", "@VERB", "nsubj")
        sb.add("and", "and", "CCONJ", "_", 5, "cc")
        sb.add("the", "the", "DET", "_", 5, "det")
        sb.add(n2, n2, "NOUN", "_", h1, "conj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        sb.add_np(_np_common("a", common, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("co", n1, n2, verb, common), build)


def _sent_they(state, seed) -> Tuple[str, str]:
    verb, vlemma = _pick(TRANS_VERBS, seed, "v8")
    common = state.get("common2") or _pick(COMMONS, seed, "c7")

    def build():
        sb = _SentBuilder()
        sb.add("They", "they", "PRON", "_", "@VERB", "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        sb.add_np(_np_common("the", common, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("th", verb, common), build)


_NOMINALIZATIONS = {"announce": "announcement", "win": "victory",
                    "propose": "proposal", "sign": "decision"}


def _sent_nominalization(state, seed) -> Tuple[str, str]:
    """'announced …' then 'The announcement …' (verbal-event antecedent)."""
    noun = _NOMINALIZATIONS.get(state.get("verb2", ("", ""))[1], "announcement")
    verb, vlemma = _pick(INTRANS_VERBS, seed, "v9")

    def build():
        sb = _SentBuilder()
        sb.add("The", "the", "DET", "_", 2, "det")
        sb.add(noun, noun, "NOUN", "_", "@VERB", "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        _finish(sb, v)
        return sb
    return _rendered(("nom", noun, verb), build)


def _sent_quantity(state, seed) -> Tuple[str, str]:
    num_t, num_l = _pick(NUM_WORDS, seed, "q")
    pli = _h(seed, "pl2") % len(PLACES)
    place, kind = PLACES[pli]
    state["num"] = (num_t, num_l)

    def build():
        sb = _SentBuilder()
        sb.add(num_t, num_l, "NUM", "_", 2, "nummod")
        sb.add("ships", "ship", "NOUN", "Number=Plur", "@VERB", "nsubj")
        v = sb.add("crossed", "cross", "VERB", "_", 0, "root")
        sb.add_np(_np_multiword(place, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("q", num_t, pli), build)


def _sent_us_intro(state, seed) -> Tuple[str, str]:
    """Introduce 'the United States' so a later mention can hit the
    hard-wired coref table ('the US|the United States')."""
    common = _pick(COMMONS, seed, "c8")
    state["us_intro"] = True

    def build():
        sb = _SentBuilder()
        sb.add_np(_np_common("The", common, 0), "nsubj")
        v = sb.add("pleased", "please", "VERB", "_", 0, "root")
        sb.add_np(_np_multiword(["the", "United", "States"], 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("usi", common), build)


def _sent_us_coref(state, seed) -> Tuple[str, str]:
    if not state.get("us_intro"):
        return _sent_pronoun_def(state, seed)

    def build():
        sb = _SentBuilder()
        sb.add("Many", "many", "ADJ", "_", 2, "amod")
        sb.add("leaders", "leader", "NOUN", "Number=Plur", "@VERB", "nsubj")
        v = sb.add("praised", "praise", "VERB", "_", 0, "root")
        sb.add_np(_np_multiword(["the", "US"], 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("usc",), build)


def _sent_reflexive(state, seed) -> Tuple[str, str]:
    """Reflexive object binding to the clause subject (rule 2)."""
    person = state.get("person") or _pick(PERSONS, seed, "p4")
    state["person"] = person

    def build():
        sb = _SentBuilder()
        refl = "herself" if person[2] == "Fem" else "himself"
        sb.add_np(_np_person(*person), "nsubj")
        v = sb.add("praised", "praise", "VERB", "_", 0, "root")
        sb.add(refl, refl, "PRON", "_", v, "obj")
        _finish(sb, v)
        return sb
    return _rendered(("rf", person), build)


def _sent_cataphoric_pronoun(state, seed) -> Tuple[str, str]:
    """Sentence-initial pronoun whose referent only appears later
    (exercises the lookahead/cataphora rule)."""
    person = _pick(PERSONS, seed, "p5")
    pron = "She" if person[2] == "Fem" else "He"
    verb, vlemma = _pick(INTRANS_VERBS, seed, "v11")
    state["person"] = person
    state["need_person_intro"] = True

    def build():
        sb = _SentBuilder()
        sb.add(pron, pron.lower(), "PRON", "_", "@VERB", "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        _finish(sb, v)
        return sb
    return _rendered(("ca", pron, verb), build)


_OPENERS = [_sent_person_intro, _sent_org_intro, _sent_place_visit,
            _sent_apposition, _sent_coordination, _sent_quantity,
            _sent_us_intro, _sent_cataphoric_pronoun]
_FOLLOWERS = [_sent_pronoun_def, _sent_isa_mention, _sent_possessive,
              _sent_they, _sent_nominalization, _sent_place_visit,
              _sent_org_intro, _sent_pronoun_def, _sent_us_coref,
              _sent_reflexive]


def _sent_first_person(state, seed) -> Tuple[str, str]:
    verb, vlemma = _pick(TRANS_VERBS, seed, "v10")
    common = _pick(COMMONS, seed, "c9")

    def build():
        sb = _SentBuilder()
        sb.add("I", "I", "PRON", "_", "@VERB", "nsubj")
        v = sb.add(verb, vlemma, "VERB", "_", 0, "root")
        sb.add_np(_np_common("the", common, 0), "obj")
        _finish(sb, v)
        return sb
    return _rendered(("fp", verb, common), build)


def build_document(doc_id: int) -> Dict[str, str]:
    """One document: 3-8 sentences, conllu + detokenized text.  One in
    eight documents is a dialogue with ``# speaker=`` annotations (the
    engine switches to the speaker-aware rule cascade for those)."""
    state: Dict = {}
    n_sents = 3 + _h(doc_id, "n") % 6
    dialogue = _h(doc_id, "dlg") % 8 == 0
    speakers = ["Mary", "Tom"]
    parses: List[str] = []
    texts: List[str] = []

    def emit(rendered: Tuple[str, str], i: int):
        parse, text = rendered
        if dialogue:
            speaker = speakers[_h(doc_id, "spk", i) % 3 % 2]  # Mary-biased
            parse = "# speaker=%s\n" % speaker + parse
        parses.append(parse)
        texts.append(text)

    opener = _pick(_OPENERS, doc_id, "open")
    emit(opener(state, _h(doc_id, 0)), 0)
    for i in range(1, n_sents):
        if state.pop("need_person_intro", False):
            template = _sent_place_visit  # introduces state["person"] by name
        elif dialogue and _h(doc_id, "fp", i) % 2 == 0:
            template = _sent_first_person
        else:
            template = _pick(_FOLLOWERS, doc_id, "tpl", i)
        emit(template(state, _h(doc_id, i)), i)
    return {"conllu": "\n\n".join(parses), "text": "\n".join(texts)}


# ---------------------------------------------------------------------
# page assembly + extraction (the html→text invariant)
# ---------------------------------------------------------------------

_HTML_HEAD = ("<html><head><meta charset=\"utf-8\"><title>doc %d</title></head>"
              "<body><article>")
_HTML_MID = "</article>\n<!--@conllu\n"
_HTML_TAIL = "\n-->\n</body></html>"


def build_page(doc_id: int) -> Dict:
    doc = build_document(doc_id)
    html = (_HTML_HEAD % doc_id) + doc["text"] + _HTML_MID + doc["conllu"] + _HTML_TAIL
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
        days=_h(doc_id, "d") % 365, seconds=_h(doc_id, "s") % 86400)
    return {
        "url": "https://web.example.org/%02d/doc%08d.html" % (_h(doc_id, "h") % 64, doc_id),
        "warc_ts": ts,
        "html": html.encode("utf8"),
        "text": doc["text"],
        "lang": "en",
    }


def extract_text(html: bytes) -> str:
    """Byte-identical text extraction from the page html."""
    s = html.decode("utf8")
    start = s.index("<article>") + len("<article>")
    end = s.index("</article>")
    return s[start:end]


def extract_conllu(html: bytes) -> str:
    s = html.decode("utf8")
    start = s.index("<!--@conllu\n") + len("<!--@conllu\n")
    end = s.index("\n-->")
    return s[start:end]

"""Core data types for the per-document kernel: Token, Sentence, Markable
and the mutable per-document state bundle.

Field semantics mirror the reference data model (reference
xrenner/modules/xrenner_classes.py:11-302) so that parity oracles can be
compared span-for-span; the representation (int ids, explicit DocState
instead of engine-instance attributes) is our own.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set


class Sentence:
    __slots__ = ("sent_num", "start_offset", "mood", "speaker", "token_count",
                 "s_type", "length", "text")

    def __init__(self, sent_num: int, start_offset: int):
        self.sent_num = sent_num
        self.start_offset = start_offset
        self.mood = ""
        self.speaker = ""
        self.token_count = 0
        self.s_type = "_"
        self.length = 0
        self.text = ""


class Token:
    """One dependency-parsed token. ``tid``/``head`` are document-global
    integer ids; id 0 is the artificial ROOT."""

    __slots__ = ("tid", "text", "text_lower", "lemma", "pos", "morph", "head",
                 "original_head", "func", "head2", "func2", "sentence",
                 "modifiers", "child_funcs", "child_strings", "quoted",
                 "coordinate", "head_text", "head_pos", "lemma_freq",
                 "negated", "neg_parent", "sent_position", "doc_position",
                 "seq_pred")

    def __init__(self, tid: int, text: str, lemma: str, pos: str, morph: str,
                 head: int, func: str, sentence: Sentence, quoted: bool = False,
                 head2: str = "_", func2: str = "_"):
        self.tid = tid
        self.text = text.strip()
        self.text_lower = text.lower()
        self.lemma = lemma
        self.pos = pos
        self.morph = morph
        self.head = head
        self.original_head = head
        self.func = func
        self.head2 = head2
        self.func2 = func2
        self.sentence = sentence
        self.modifiers: List[Token] = []
        self.child_funcs: List[str] = []
        self.child_strings: List[str] = []
        self.quoted = quoted
        self.coordinate = False
        self.head_text = ""
        self.head_pos = ""
        self.lemma_freq = 0
        self.negated = False
        self.neg_parent = False
        self.sent_position = 0.0
        self.doc_position = 0.0
        # (tag, proba) set by read_document when a sequencer is active
        # (reference sets the attribute dynamically, xrenner_xrenner.py:191-192)
        self.seq_pred = None

    def __repr__(self):  # pragma: no cover
        return f"{self.text}({self.pos}/{self.func}<-{self.head})"


class Markable:
    """A mention span plus its entity/agreement/coref attributes.

    __slots__ keeps the per-document hot loop allocation-light (the kernel
    constructs two Markables per mention); the reference's dynamic
    ``isa``/``isa_dir`` attributes are explicit fields here with the same
    lingering semantics (set during the candidate ladder, cleared only when
    a markable is selected as best candidate)."""

    __slots__ = ("id", "head", "form", "definiteness", "start", "end", "text",
                 "core_text", "first", "last", "entity", "subclass", "infstat",
                 "agree", "agree_certainty", "sentence", "antecedent",
                 "coref_type", "group", "non_antecdent_groups",
                 "entity_certainty", "isa_partner_head", "alt_agree",
                 "alt_entities", "alt_subclasses", "cardinality", "submarks",
                 "coordinate", "length", "mod_count", "killed", "matching_rule",
                 "entity_dep_scores", "entity_sim_dep_scores", "lex_dep_scores",
                 "lex_sim_dep_scores", "_child_func_string", "isa", "isa_dir",
                 "retro_src")

    def __init__(self, mark_id: int, head: Token, form: str, definiteness: str,
                 start: int, end: int, text: str, core_text: str, entity: str,
                 entity_certainty: str, subclass: str, infstat: str, agree: str,
                 sentence: Sentence, antecedent: Optional["Markable"],
                 coref_type: str, group: int, alt_entities: List[str],
                 alt_subclasses: List[str], alt_agree: List[str],
                 cardinality: float = 0, submarks: Optional[List[int]] = None,
                 coordinate: bool = False, agree_certainty: str = ""):
        self.id = mark_id
        self.head = head
        self.form = form
        self.definiteness = definiteness
        self.start = start
        self.end = end
        self.text = text.strip()
        core = core_text.strip()
        self.core_text = core
        self.first = core.partition(" ")[0]
        self.last = core.rpartition(" ")[2]
        self.entity = entity
        self.subclass = subclass
        self.infstat = infstat
        self.agree = agree
        self.agree_certainty = agree_certainty
        self.sentence = sentence
        self.antecedent = antecedent  # Markable or None
        self.coref_type = coref_type
        self.group = group
        self.non_antecdent_groups: Set[int] = set()
        self.entity_certainty = entity_certainty
        self.isa_partner_head = ""
        self.alt_agree = alt_agree
        self.alt_entities = alt_entities
        self.alt_subclasses = alt_subclasses
        self.cardinality = cardinality
        self.submarks: List[int] = submarks if submarks is not None else []
        self.coordinate = coordinate
        self.length = self.text.count(" ") + 1
        self.mod_count = len(self.head.modifiers)
        self.killed = False  # postprocessing removal flag (reference id="0")
        # giant-doc windowing: highest start position of a mention whose
        # propagation MUTATED this markable's entity/subclass/agree after
        # resolution (-1 = never) — lets the windowed stitcher retro-apply
        # backward propagation onto already-emitted context mentions
        self.retro_src = -1
        self.matching_rule: Optional[int] = None
        # dependency / similarity score maps filled by fill_dep_scores()
        self.entity_dep_scores: Dict[str, int] = {}
        self.entity_sim_dep_scores: Dict[str, int] = {}
        self.lex_dep_scores: Dict[str, int] = {}
        self.lex_sim_dep_scores: Dict[str, int] = {}
        self._child_func_string: Optional[str] = None
        self.isa = False       # transient candidate-ladder flag
        self.isa_dir = ""      # transient isa-direction marker

    # -- delegated properties (reference xrenner_classes.py:266-287) ----
    @property
    def lemma(self):
        return self.head.lemma

    @property
    def pos(self):
        return self.head.pos

    @property
    def func(self):
        return self.head.func

    @property
    def quoted(self):
        return self.head.quoted

    @property
    def head_text(self):
        return self.head.head_text

    @property
    def morph(self):
        return self.head.morph

    @property
    def modifiers(self):
        return self.head.modifiers

    @property
    def child_funcs(self):
        return self.head.child_funcs

    @property
    def negated(self):
        return self.head.negated

    @property
    def neg_parent(self):
        return self.head.neg_parent

    @property
    def head_pos(self):
        return self.head.head_pos

    @property
    def doc_position(self):
        return self.head.doc_position

    @property
    def sent_position(self):
        return self.head.sent_position

    @property
    def lemma_freq(self):
        return self.head.lemma_freq

    @property
    def s_type(self):
        return self.sentence.s_type

    @property
    def text_lower(self):
        if self.coordinate:
            return self.core_text.lower()
        return self.head.text_lower

    @property
    def mood(self):
        return self.sentence.mood

    @property
    def speaker(self):
        return self.sentence.speaker

    @property
    def sent_num(self):
        return self.sentence.sent_num

    @property
    def child_func_string(self) -> str:
        """';'-delimited child functions of the head, '_' when <2 children."""
        if self._child_func_string is None:
            if len(self.head.child_funcs) > 1:
                self._child_func_string = ";" + ";".join(self.head.child_funcs) + ";"
            else:
                self._child_func_string = "_"
        return self._child_func_string

    def fill_dep_scores(self, lex, doc):
        """Populate dependency/similarity evidence maps for scoring
        (reference xrenner_classes.py:100-138, including its quirk of
        writing lex-dep similarity scores into entity_sim_dep_scores)."""
        parent = self.head.head_text
        func = self.head.func
        if parent in lex.entity_deps and func in lex.entity_deps[parent]:
            self.entity_dep_scores.update(lex.entity_deps[parent][func])
        if parent in lex.similar:
            for sim in lex.similar[parent]:
                if sim in lex.entity_deps and func in lex.entity_deps[sim]:
                    self.entity_sim_dep_scores.update(lex.entity_deps[sim][func])
                    break
        if parent in lex.lex_deps and func in lex.lex_deps[parent]:
            self.lex_dep_scores.update(lex.lex_deps[parent][func])
        if parent in lex.similar:
            for sim in lex.similar[parent]:
                if sim in lex.lex_deps and func in lex.lex_deps[sim]:
                    self.entity_sim_dep_scores.update(lex.lex_deps[sim][func])

    #: anaphor/antecedent property list for feature extraction
    #: (reference xrenner_classes.py:181-185)
    _FEATURE_PROPS = ["lemma", "func", "head_text", "form", "pos", "agree",
                      "start", "end", "lemma_freq", "cardinality",
                      "definiteness", "entity", "subclass", "infstat",
                      "coordinate", "length", "mod_count", "doc_position",
                      "sent_position", "quoted", "negated", "neg_parent",
                      "s_type"]
    _BOOL_PROPS = {"coordinate", "quoted", "negated", "neg_parent"}

    def extract_features(self, lex, doc, antecedent=None, candidate_list=(),
                         dump_position=False):
        """Feature representation of a markable / markable-antecedent pair
        for the training-data dump sink (reference
        xrenner_classes.py:148-263, rule-based mode: f_threshold fixed at
        0 so the lexical-frequency fallback branches stay dead, exactly
        as shipped).  Doc-scoped inputs the reference reads off the
        shared lex (docname, token count, dynamic hasa) come from
        ``doc``."""
        docname = doc.docname
        out = {}
        if dump_position:
            out["position"] = "%d-%d;%d-%d" % (self.start, self.end,
                                               antecedent.start, antecedent.end)
        out["docname"] = docname
        if docname.startswith("GUM_") or docname.lower().startswith("autogum_") \
                or docname.lower().startswith("amalgum_"):
            out["genre"] = docname.split("_")[1]
        elif len(docname) > 4:
            out["genre"] = docname[:4]
        else:
            out["genre"] = "_"

        f_threshold = 0
        anaphor_parent = self.head.head_text
        for prefix, mark in (("n_", self),) + ((("t_", antecedent),)
                                               if antecedent is not None else ()):
            for prop in self._FEATURE_PROPS:
                val = getattr(mark, prop)
                if prop in self._BOOL_PROPS:
                    val = int(val)
                elif prop == "lemma":
                    if lex.freqs.get(val, 0) < f_threshold:
                        val = mark.pos
                elif prop == "head_text":
                    if lex.freqs.get(val, 0) < f_threshold:
                        val = mark.head_pos
                out[prefix + prop] = val if val != "" else "_"

        if antecedent is not None:
            out["d_sent"] = self.sent_num - antecedent.sent_num
            out["d_tok"] = self.start - antecedent.end
            out["d_agr"] = int(self.agree == antecedent.agree)
            out["d_intervene"] = abs(self.id - antecedent.id)
            out["d_cohort"] = len(candidate_list)
            out["d_modcount"] = self.mod_count - antecedent.mod_count
            out["d_samemods"] = len(set(m.lemma for m in self.head.modifiers)
                                    & set(m.lemma for m in antecedent.head.modifiers))
            hasa = 0
            if lex.filters["possessive_func"].search(self.func) is not None:
                for key in (antecedent.head.text, antecedent.head.lemma):
                    possessed = doc.hasa_possessed(key)
                    if possessed:
                        hasa = possessed.get(anaphor_parent, 0)
                        break
            out["d_hasa"] = hasa
            out["d_entidep"] = self.entity_dep_scores.get(antecedent.entity, 0)
            out["d_entisimdep"] = self.entity_sim_dep_scores.get(antecedent.entity, 0)
            out["d_lexdep"] = self.lex_dep_scores.get(antecedent.head.text, 0)
            out["d_lexsimdep"] = self.lex_sim_dep_scores.get(antecedent.head.text, 0)
            out["d_sametext"] = int(self.text == antecedent.text)
            out["d_samelemma"] = int(self.lemma == antecedent.lemma)
            out["d_doclen"] = int(doc.lemma_total)
            if antecedent.head.head == self.head.tid:
                out["d_parent"] = 1
            elif self.head.head == antecedent.head.tid:
                out["d_parent"] = -1
            else:
                out["d_parent"] = 0
            if self.speaker == "" and antecedent.speaker == "":
                out["d_speaker"] = 0
            elif self.speaker == antecedent.speaker:
                out["d_speaker"] = 1
            else:
                out["d_speaker"] = -1
        return out

    def __repr__(self):  # pragma: no cover
        return f"{self.entity}: \"{self.text}\" [{self.start}-{self.end}] g{self.group}"


class DocState:
    """All mutable per-document state.  Everything the reference keeps on
    the engine instance or (leakily) on the shared lexicon lives here so a
    document's analysis is a pure function of (conllu, lex)."""

    def __init__(self, lex):
        self.lex = lex
        root_sentence = Sentence(1, 0)
        root = Token(0, "ROOT", "--", "XX", "", -1, "NONE", root_sentence)
        self.tokens: List[Token] = [root]
        self.sentences: List[Sentence] = []
        self.children: Dict[int, List[int]] = {}
        self.child_funcs: Dict[int, List[str]] = {}
        self.child_strings: Dict[int, List[str]] = {}
        self.child_info_frontier = 0  # highest id add_child_info processed
        self.descendants: Dict[int, List[int]] = {}
        self.markables: List[Markable] = []
        self.markables_by_head: Dict[str, Markable] = {}
        self.markstart: Dict[int, List[Markable]] = {}
        self.markend: Dict[int, List[Markable]] = {}
        self.markcounter = 1
        self.groupcounter = 1
        self.token_count = 0  # non-comment, non-empty input lines
        self.lemma_freqs: Dict[str, int] = {}
        self.use_speaker_rules = False
        # document-scoped registers the reference keeps on lex
        self.last: Dict[str, Markable] = {}           # xrenner_xrenner.py:701-702
        self.hasa_overlay: Dict[str, Dict[str, int]] = {}  # dynamic hasa, doc-scoped
        self.incompatible_mod_pairs: Set[str] = set()
        self.incompatible_isa_pairs: Set[str] = set()
        # entity-oracle hit counters [overridden, changed, seen]
        # (reference keeps these on the shared lex, xrenner_lex.py:55)
        self.oracle_counters = [0, 0, 0]
        # training-data dump sink state (reference keeps these on the
        # shared lex: dump/dump_headers/dump_types, xrenner_lex.py:50-52;
        # doc-scoped here like hasa, so the distributed run is
        # order-independent — matches the fresh-engine-per-doc golden
        # methodology)
        self.docname = "untitled"
        self.dump_rows: List[str] = []
        self.dump_headers: List[str] = []
        self.dump_types: Set[str] = set()
        self.lemma_total = 0.0
        # giant-doc window seeding (engine.analyze_document_windowed):
        # parse-time state captured at the NEXT window's context-start
        # sentence so it can be carried forward exactly
        self._hasa_snap_tid = None       # first token id of the boundary sentence
        self._hasa_snap = None           # hasa_overlay copy at that boundary
        self._boundary_quoted = None     # open-quote flag at that boundary
        self._boundary_speaker = None    # use_speaker_rules latch at it

    # -- dynamic hasa: read-through overlay over the broadcast base -----
    def hasa_possessed(self, possessor: str) -> Dict[str, int]:
        base = self.lex.hasa.get(possessor)
        over = self.hasa_overlay.get(possessor)
        if not over:
            return base if base is not None else {}
        merged = dict(base) if base else {}
        for possessed, n in over.items():
            merged[possessed] = merged.get(possessed, 0) + n
        return merged

    def hasa_add(self, possessor: str, possessed: str, n: int):
        self.hasa_overlay.setdefault(possessor, {})
        self.hasa_overlay[possessor][possessed] = \
            self.hasa_overlay[possessor].get(possessed, 0) + n

    @property
    def coref_rules(self):
        return self.lex.speaker_rules if self.use_speaker_rules else self.lex.non_speaker_rules

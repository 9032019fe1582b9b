"""Sequence-tagger integration (dependency-free).

The reference optionally runs a neural sequence tagger over every
sentence before markable detection (reference xrenner_sequence.py:
155-267: flair BiLSTM or a dill-pickled CRFSuite model, loaded when
config.ini sets ``sequencer=<file>``, xrenner_lex.py:165-177) and
threads per-token ``(tag, proba)`` predictions into four decision
points:

1. "O"-suppression of markable heads (xrenner_xrenner.py:471-474),
2. pronoun-entity fallback (xrenner_marker.py:152-156),
3. non-pronoun entity override above ``sequencer_override_thresh``
   (xrenner_marker.py:186-191) and the late entity=="" probe
   (xrenner_marker.py:253-259),
4. disambiguation preference for the sequencer tag when it is among
   the gazetteer alternatives (xrenner_marker.py:868-873).

flair/torch/dill are absent from this container (and from any lean
Spark executor image), so the heavy runtimes stay out; what this module
provides is

* the **predict_proba contract** the kernel consumes — a flat
  ``[(tag, proba), ...]`` over all tokens of the document, indexed by
  global token id - 1, built from space-tokenized sentence strings —
  identical to the reference's Sequencer surface;
* ``LexiconSequencer``, a deterministic portable-JSON tagger (token ->
  (tag, proba) lookup with a default class) that makes every
  integration point real and testable.  Gazetteer taggers are a
  legitimate production choice; for neural models, run them OUTSIDE the
  kernel (tag offline, or export to a lexicon at the fidelity you need)
  — at 100 TB you want the expensive tagger as its own batched stage
  anyway, not buried inside the coref kernel;
* a loud failure for ``.pt`` / ``.crf`` model files naming runtimes
  that are not installed (same honest posture as multimodal's decode
  stub and the depedit unsupported-construct gate).

Model format (``<name>.json`` in the model dir, named by config.ini's
``sequencer=`` entry)::

    {"format": "xrenner-portable-sequencer-v1",
     "case_sensitive": false,
     "default": ["O", 0.9],
     "tags": {"paris": ["place", 0.95], ...}}

A sequencer-enabled model must also ship ``sequencer_nonref_thresh``,
``sequencer_nonref_pos`` and ``sequencer_nonref_forbidden_childfunc``
in config.ini for the "O"-suppression pass — the reference reads these
filters unconditionally at xrenner_xrenner.py:472-473 and has no
defaults for them either.  ``sequencer_override_thresh`` defaults to
1.0 (reference xrenner_lex.py:175-176: prefer KB entries).
"""

from __future__ import annotations

import io
import json
import os
from typing import List, Sequence, Tuple

FORMAT_TAG = "xrenner-portable-sequencer-v1"


class LexiconSequencer:
    """Deterministic token->tag lookup with the reference Sequencer's
    predict_proba surface."""

    model_type = "lexicon"

    def __init__(self, spec: dict, name: str = "<inline>"):
        if spec.get("format") != FORMAT_TAG:
            raise ValueError("sequencer %s: unsupported format %r (want %r)"
                             % (name, spec.get("format"), FORMAT_TAG))
        self.name = name
        self.case_sensitive = bool(spec.get("case_sensitive", False))
        default = spec.get("default", ["O", 1.0])
        self.default: Tuple[str, float] = (str(default[0]), float(default[1]))
        tags = spec.get("tags", {})
        if not self.case_sensitive:
            tags = {k.lower(): v for k, v in tags.items()}
        self.tags = {k: (str(v[0]), float(v[1])) for k, v in tags.items()}

    @classmethod
    def load(cls, path: str) -> "LexiconSequencer":
        with io.open(path, encoding="utf8") as fh:
            return cls(json.load(fh), name=os.path.basename(path))

    def predict_proba(self, sentences: Sequence[str]
                      ) -> List[Tuple[str, float]]:
        """One (tag, proba) per whitespace token across all sentences —
        the flat document-global list the kernel indexes by token id - 1
        (reference xrenner_xrenner.py:191-192)."""
        out: List[Tuple[str, float]] = []
        for sent in sentences:
            for token in sent.split():
                key = token if self.case_sensitive else token.lower()
                out.append(self.tags.get(key, self.default))
        return out


def load_sequencer(model_dir: str, filters):
    """Resolve config.ini's ``sequencer=`` entry (reference
    xrenner_lex.py:165-177).  Portable ``.json`` lexicons load here;
    neural model files fail loudly naming the missing runtime."""
    name = filters["sequencer"]
    if not name:
        return None
    path = os.path.join(model_dir, name)
    if name.endswith(".json"):
        if not os.path.isfile(path):
            raise IOError("config.ini names sequencer %r but %s is missing"
                          % (name, path))
        return LexiconSequencer.load(path)
    if name.endswith(".crf"):
        raise ImportError(
            "sequencer %r is a CRFSuite pickle; the dill/crfsuite runtime "
            "is not installed here — tag offline or export a portable "
            "lexicon (.json) instead" % name)
    raise ImportError(
        "sequencer %r requires the flair/torch runtime, which is not "
        "installed here — tag offline or export a portable lexicon "
        "(.json) instead" % name)

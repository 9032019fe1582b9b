"""Serialization sinks for kernel output: CWB SGML, CoNLL coref (scorer
compatible), OntoNotes XML and the reference test format.

Byte-compatible with the reference's output module (reference
xrenner/modules/xrenner_out.py:30-133, xrenner_test.py:19-76), verified by
golden comparison in tests/test_output_formats.py.  Operates on the
kernel's DocResult rows; in the Spark pipeline these run per document
inside the same mapInPandas batches when an export column is requested.
"""

from __future__ import annotations

import re
from typing import Dict, List


def _spans(mentions: List[dict]):
    """markstart/markend maps keyed by token id, in mention creation order."""
    markstart: Dict[int, List[dict]] = {}
    markend: Dict[int, List[dict]] = {}
    for m in mentions:
        markstart.setdefault(m["start"], []).append(m)
        markend.setdefault(m["end"], []).append(m)
    return markstart, markend


def output_sgml(result) -> str:
    """CWB SGML with nested <referent> tags, one token per line
    (reference xrenner_out.py:61-85)."""
    markstart, markend = _spans(result.mentions)
    out = []
    for tok in result.tokens:
        tid = tok["tid"]
        for m in sorted(markstart.get(tid, []), key=lambda m: m["end"], reverse=True):
            attrs = '<referent id="%s" entity="%s" group="%s' % (
                m["ref_id"], m["entity"], m["group_id"])
            if m["antecedent_ref"] != "none":
                attrs += '" antecedent="%s" type="%s' % (m["antecedent_ref"],
                                                         m["coref_type"])
            out.append(attrs + '">')
        out.append(tok["text"])
        for _m in markend.get(tid, []):
            out.append("</referent>")
    return "\n".join(out) + "\n" if out else ""


def output_conll(result, docname: str, output_infstat: bool = False) -> str:
    """CoNLL coref bracket notation, scorer compatible
    (reference xrenner_out.py:88-133)."""
    markstart, markend = _spans(result.mentions)
    lines = ["# begin document " + docname]
    for i, tok in enumerate(result.tokens):
        tid = tok["tid"]
        coref_col = ""
        infstat_col = "_\t" if output_infstat else ""
        ends_here = list(markend.get(tid, []))
        starts_here = markstart.get(tid, [])
        for m in sorted(starts_here, key=lambda m: m["end"], reverse=True):
            coref_col += "(" + str(m["group_id"])
            if output_infstat:
                infstat_col = m["infstat"] + "\t"
            if m in ends_here:
                coref_col += ")"
                ends_here.remove(m)
        for m in ends_here:
            if m in starts_here:
                coref_col += ")"
            else:
                if coref_col and coref_col[-1].isdigit():
                    coref_col += "|"
                coref_col += str(m["group_id"]) + ")"
        if tid not in markstart and tid not in markend:
            coref_col = "_"
        lines.append("%d\t%s\t%s%s" % (i, tok["text"], infstat_col, coref_col))
    lines.append("# end document")
    return "\n".join(lines) + "\n\n"


def output_conll_sent(result, docname: str, output_infstat: bool = True,
                      output_entity: bool = True) -> str:
    """CoNLL bracket notation with per-sentence token renumbering and a
    blank line before every sentence (reference xrenner_out.py:136-193;
    the engine dispatches it with output_infstat=True,
    xrenner_xrenner.py:385-386).  Reference quirks preserved: the
    infstat column is empty (not '_') on non-start tokens, and the
    ``(1|2`` pipe separator is only inserted after a bare digit, so with
    entity suffixes adjacent groups concatenate directly."""
    markstart, markend = _spans(result.mentions)
    out = "# begin document " + docname + "\n"
    current_sent = None
    i = 0
    for tok in result.tokens:
        tid = tok["tid"]
        if current_sent != tok["sent_num"]:
            current_sent = tok["sent_num"]
            out += "\n"
            i = 0
        i += 1
        coref_col = ""
        infstat_col = ""
        ends_here = list(markend.get(tid, []))
        starts_here = markstart.get(tid, [])
        for m in sorted(starts_here, key=lambda m: m["end"], reverse=True):
            coref_col += "(" + str(m["group_id"])
            if output_entity:
                coref_col += "-" + m["entity"]
            if output_infstat:
                infstat_col = m["infstat"]
            if m in ends_here:
                coref_col += ")"
                ends_here.remove(m)
        for m in ends_here:
            if m in starts_here:
                coref_col += ")"
            else:
                if coref_col and coref_col[-1].isdigit():
                    coref_col += "|"
                coref_col += str(m["group_id"])
                if output_entity:
                    coref_col += "-" + m["entity"]
                coref_col += ")"
        if tid not in markstart and tid not in markend:
            coref_col = "_"
        if coref_col == "":
            coref_col = "_"
        out += "%d\t%s\t%s\t%s\n" % (i, tok["text"], infstat_col, coref_col)
    out += "# end document\n\n"
    return out


def output_onto(result, docname: str) -> str:
    """OntoNotes .coref XML (reference xrenner_out.py:30-58)."""
    markstart, markend = _spans(result.mentions)
    out = '<DOC DOCNO="%s">\n<TEXT PARTNO="000">\n' % docname
    for tok in result.tokens:
        tid = tok["tid"]
        for m in sorted(markstart.get(tid, []), key=lambda m: m["end"], reverse=True):
            out += '<COREF ID="%s" ENTITY="%s" INFSTAT="%s' % (
                m["group_id"], m["entity"], m["infstat"])
            if m["antecedent_ref"] != "none":
                out += '" TYPE="' + m["coref_type"]
            out += '">'
        text = tok["text"]
        out += re.sub("&", "&amp;", text) if ";" not in text else text
        for _m in markend.get(tid, []):
            out += "</COREF>"
        out += " "
    return out + "\n</TEXT>\n</DOC>\n"


def output_testcase(result, parse: str, model: str = "web", name: str = "test") -> str:
    """The reference's unit-test golden format: counts + chains in
    ``start_end < start_end`` notation (reference xrenner_test.py:19-76).

    ``parse`` must be the text the engine actually consumed: when the
    model ships a depedit.ini, pass ``lex.depedit.run(raw_parse)`` — the
    reference embeds the post-rewrite parse."""
    marks_by_group: Dict[str, List[dict]] = {}
    for m in result.mentions:
        marks_by_group.setdefault(str(m["group_id"]), []).append(m)

    chains = []
    snippets = []
    for group in sorted(marks_by_group, key=lambda g: int(g)):
        chain = sorted(marks_by_group[group], key=lambda m: m["start"])
        chain_ids = ["%d_%d" % (m["start"], m["end"]) for m in chain]
        text = chain[0]["text"]
        snippets.append(text[:20] + "..." if len(text) > 20 else text)
        chains.append("  " + " < ".join(chain_ids))
    order = sorted(range(len(chains)), key=lambda i: int(chains[i][2:chains[i].find("_")]))
    out = ["name:" + name, "model:" + model,
           "toks:%d # %s..." % (result.n_tokens + 1,
                                " ".join(t["text"] for t in result.tokens[:3])),
           "marks:%d" % len(result.mentions),
           "groups:%d" % len(marks_by_group), "chains:"]
    for i in order:
        out.append("  # " + snippets[i])
        out.append(chains[i])
    out.append("input_data:")
    out.append(parse)
    out.append("-" * 5)
    return "\n".join(out) + "\n"

"""Drop-in command line: ``python -m xrenner_spark [options] file``.

Mirrors the reference CLI (reference xrenner.py:155-169 argument
surface; :100-147 per-file worker behavior): glob input, one output
format per run, stdout for a single file / ``<docname>.<ext>`` files
for many, ``-r`` rule-based mode, ``--noseq``, ``--oracle``, ``-d``
training dump with merged header line, ``-v`` run stats.

The parallelism story is the one reference divergence: the reference
forks ``-p`` OS processes (xrenner.py:201-209); here ``-p`` >= 2 runs
the same per-document function through Spark ``local[p]`` with the
model broadcast once — identical output files, and the path a cluster
deployment would take (the distributed serialize_stage in pipeline.py
is this same dispatch over a DataFrame of pages).
"""

from __future__ import annotations

import argparse
import glob
import io
import os
import sys
import time

from . import output as out_mod

VERSION = "xrenner_spark 3.0"

#: format -> (serializer, file extension); serializer(result, docname)
_EXT = {"sgml": "sgml", "conll": "conll", "conll_sent": "conll",
        "onto": "xml", "html": "html", "webanno": "xmi",
        "webannotsv": "tsv", "unittest": "tab", "none": None,
        "paula": None}




def _docname(path: str) -> str:
    docname = os.path.basename(path)
    for ext in (".conllu", ".conll10", ".conll", ".txt"):
        if docname.endswith(ext):
            return docname[: -len(ext)]
    return docname


def process_file(path: str, lex, fmt: str, model_name: str):
    """One document end-to-end: returns (docname, payload-or-paula-dict,
    dump_rows, dump_headers, n_tokens, n_sentences)."""
    from .kernel import analyze_document
    with io.open(path, encoding="utf8") as fh:
        parse = fh.read()
    docname = _docname(path)
    result = analyze_document(docname, parse, lex)
    payload = out_mod.serialize_result(result, docname, fmt, parse=parse,
                                       model=model_name)
    return (docname, payload, list(result.dump_rows),
            list(result.dump_headers), result.n_tokens, result.n_sentences)


def _emit(docname: str, fmt: str, payload, single: bool, outdir: str = "."):
    if fmt == "none" or payload is None:
        return
    if fmt == "paula":  # multi-file standoff: one directory per doc
        doc_dir = os.path.join(outdir, docname)
        os.makedirs(doc_dir, exist_ok=True)
        for fn, data in payload.items():
            with io.open(os.path.join(doc_dir, fn), "w", encoding="utf8",
                         newline="\n") as fh:
                fh.write(data)
        return
    if single:
        sys.stdout.buffer.write(payload.encode("utf8"))
    else:
        with io.open(os.path.join(outdir, docname + "." + _EXT[fmt]), "w",
                     encoding="utf8", newline="\n") as fh:
            fh.write(payload)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="xrenner_spark")
    ap.add_argument("-o", "--output", dest="format", default="sgml",
                    choices=sorted(_EXT),
                    help="output format, default: sgml")
    ap.add_argument("-m", "--model", default="web",
                    help="model name in xrenner_spark/models/, a model "
                         "directory path, or a zip .xrm")
    ap.add_argument("-x", "--override", default=None,
                    help="section in the model's override.ini with "
                         "alternative settings")
    ap.add_argument("-r", "--rulebased", action="store_true",
                    help="run model without machine learning classifiers")
    ap.add_argument("--noseq", action="store_true",
                    help="do not use a sequence tagger for entity "
                         "classification")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="output run time and summary")
    ap.add_argument("-p", "--procs", type=int, default=1,
                    help="parallelism; >=2 dispatches files through Spark "
                         "local[p]")
    ap.add_argument("-d", "--dump", default=None,
                    help="file to dump training analyses into")
    ap.add_argument("--output-dir", default=".",
                    help="directory for per-document output files "
                         "(multi-file runs; default: current directory). "
                         "With -p >= 2 the files are written executor-side")
    ap.add_argument("--oracle", default=None,
                    help="file with oracle entity predictions")
    ap.add_argument("--version", action="version", version=VERSION)
    ap.add_argument("file", help="input file or glob")
    opts = ap.parse_args(argv)

    from .lex import load_lex
    t0 = time.time()
    model_dir = opts.model
    if os.sep not in model_dir and not os.path.exists(model_dir):
        model_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "models", opts.model)
    lex = load_lex(model_dir, rule_based=opts.rulebased, no_seq=opts.noseq,
                   override=opts.override)
    if opts.oracle:
        lex.read_oracle(opts.oracle)
    if opts.dump:
        lex.dump = True
        if "." not in os.path.basename(opts.dump):
            opts.dump += ".tab"

    files = sorted(glob.glob(opts.file))
    if not files:
        sys.stderr.write("Can't find input at %s\nAborting\n" % opts.file)
        return 2
    single = len(files) == 1

    total_toks = total_sents = 0
    dump_rows, dump_headers = [], []

    outdir = os.path.abspath(opts.output_dir)
    if not single and opts.format != "none":
        os.makedirs(outdir, exist_ok=True)

    if opts.procs >= 2 and len(files) > 1:
        from .session import get_spark
        spark = get_spark("xrenner-cli", cores=opts.procs,
                          shuffle_partitions=opts.procs)
        spark.sparkContext.setLogLevel("ERROR")
        bcast = spark.sparkContext.broadcast(lex)
        fmt, model_name = opts.format, opts.model
        sc = spark.sparkContext
        # Executor-side output: each task serializes AND writes its own
        # documents, so payloads never accumulate on the driver (at 50k+
        # files the collected SGML/HTML bodies would be the only
        # driver-memory-bound surface in the repo).  Only the bounded
        # per-doc metadata (dump rows, token counts) comes back.  stdout
        # mode (single file) never takes this branch.
        write_here = not single and fmt != "none"
        # two inputs sharing a docname would write the same output path
        # from two executors concurrently (racy survivor).  The
        # sequential loop iterates sorted files, so the LAST path per
        # docname wins deterministically — reproduce that: only the
        # winning path writes; the others still contribute dump rows
        # and counts exactly as they do sequentially.
        last_for_docname = {_docname(p): p for p in files}

        def work(path):
            r = process_file(path, bcast.value, fmt, model_name)
            if write_here:
                if last_for_docname[r[0]] == path:
                    _emit(r[0], fmt, r[1], False, outdir)
                return (r[0], None) + r[2:]
            return r

        results = (sc.parallelize(files, min(opts.procs, len(files)))
                   .map(work)
                   .collect())
    else:
        results = [process_file(p, lex, opts.format, opts.model)
                   for p in files]

    seen = set()
    for docname, payload, rows, headers, n_toks, n_sents in results:
        _emit(docname, opts.format, payload, single, outdir)
        total_toks += n_toks
        total_sents += n_sents
        for row in rows:
            # cross-document dedup keys on the feature outline WITHOUT
            # the trailing rule_num, like the reference's process-global
            # lex.dump_types (xrenner_compatible.py:612-616: the outline
            # is deduplicated before rule_num is appended)
            outline = row.rsplit("\t", 1)[0]
            if outline not in seen:
                seen.add(outline)
                dump_rows.append(row)
        if not dump_headers:
            dump_headers = headers

    if opts.dump and dump_rows:
        with io.open(opts.dump, "w", encoding="utf8", newline="\n") as fh:
            fh.write("\t".join(dump_headers) + "\n")
            for row in dump_rows:
                fh.write(row + "\n")

    if opts.verbose:
        sys.stderr.write("=" * 40 + "\n")
        sys.stderr.write("Processed %d tokens in %d sentences (%d docs, "
                         "%.1fs)\n" % (total_toks, total_sents, len(files),
                                       time.time() - t0))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())

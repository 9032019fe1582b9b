"""The Spark KG-construction pipeline.

Stage graph (SURVEY.md §3.4):

    pages (url, warc_ts, html, text, lang)
      │  salted repartition by xxhash64(url)            [defeats url skew]
      ▼
    stage 1  extract: mapInPandas html→(text, conllu); byte-identity check
      │  checkpoint: table stage_extract + _lineage_extract
      ▼
    stage 2  kernel: mapInPandas per-document mention/entity/coref kernel
      │  one row per doc: mentions array + verbs array + kernel_ms
      │  checkpoint: table stage_kernel + _lineage_kernel
      ▼
    stage 3  SQL: explode → mentions/verbs; chains groupBy(url, group_id)
             with canonicalization agg; verb-argument join → triples
      ▼
    triples table (+ chains table)

Every stage is resumable: if its checkpoint table exists (same run_dir),
it is read back instead of recomputed, so a killed job restarted with the
same warehouse continues where it left off and produces byte-identical
triples (verified in tests/test_pipeline_spark.py).

All per-row Python lives inside mapInPandas batch loops (Arrow in/out);
the rule/gazetteer bundle is broadcast once per executor.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Iterator, Optional

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import Catalog
from .kernel import analyze_document, analyze_document_windowed
from .lex import load_lex
from .triples import parse_verbs

# ---------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

EXTRACT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("lang", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("conllu", T.StringType()),
    T.StructField("text_sha256", T.StringType()),
    T.StructField("byte_identical", T.BooleanType()),
    T.StructField("part_id", T.IntegerType()),
])

MENTION_STRUCT = T.StructType([
    T.StructField("mark_id", T.StringType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("core_text", T.StringType()),
    T.StructField("entity", T.StringType()),
    T.StructField("subclass", T.StringType()),
    T.StructField("agree", T.StringType()),
    T.StructField("form", T.StringType()),
    T.StructField("definiteness", T.StringType()),
    T.StructField("cardinality", T.DoubleType()),
    T.StructField("group_id", T.LongType()),
    T.StructField("coref_type", T.StringType()),
    T.StructField("antecedent", T.StringType()),
    T.StructField("infstat", T.StringType()),
    T.StructField("head_id", T.IntegerType()),
    T.StructField("head_func", T.StringType()),
    T.StructField("head_lemma", T.StringType()),
    T.StructField("head_parent", T.IntegerType()),
    T.StructField("sent_num", T.IntegerType()),
    T.StructField("coordinate", T.BooleanType()),
])

VERB_STRUCT = T.StructType([
    T.StructField("tid", T.IntegerType()),
    T.StructField("lemma", T.StringType()),
])

# The kernel stage emits LONG format: one flat row per document ('d',
# carrying the metrics/lineage fields), per mention ('m') and per verb
# ('v').  A nested array<struct> checkpoint was measured 4.3x slower to
# consume (the triples stage re-decodes every 21-field mention struct on
# each of its three scans, and nested cells defeat column pruning);
# long-format parquet keeps each field a prunable column and the
# checkpoint remains ONE table for resume.
KERNEL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("row_type", T.StringType()),  # 'd' | 'm' | 'v'
        T.StructField("text_sha256", T.StringType()),
        T.StructField("n_sentences", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("kernel_ms", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
    + list(MENTION_STRUCT.fields)
    + [
        T.StructField("verb_id", T.IntegerType()),
        T.StructField("verb_lemma", T.StringType()),
    ])

_MENTION_FIELDS = [f.name for f in MENTION_STRUCT.fields]
_KERNEL_COLS = [f.name for f in KERNEL_SCHEMA.fields]
_EMPTY_MENTION = {k: None for k in _MENTION_FIELDS}


def _kernel_rows(url, warc_ts, lang, part_id, sha, n_sent, n_tok,
                 kernel_ms, error, mentions, verbs):
    """Long-format rows for one document (dicts in _KERNEL_COLS order)."""
    base = {"url": url, "warc_ts": warc_ts, "lang": lang,
            "part_id": part_id, "verb_id": None, "verb_lemma": None,
            "text_sha256": None, "n_sentences": None, "n_tokens": None,
            "kernel_ms": None, "error": None}
    doc = dict(base, row_type="d", text_sha256=sha, n_sentences=n_sent,
               n_tokens=n_tok, kernel_ms=kernel_ms, error=error,
               **_EMPTY_MENTION)
    rows = [doc]
    for m in mentions:
        rows.append(dict(base, row_type="m",
                         **{k: m[k] for k in _MENTION_FIELDS}))
    for tid, lemma in verbs:
        rows.append(dict(base, row_type="v", verb_id=tid, verb_lemma=lemma,
                         **_EMPTY_MENTION))
    return rows


# ---------------------------------------------------------------------
# page generation (synthetic Common-Crawl-style input)
# ---------------------------------------------------------------------

def generate_pages(spark: SparkSession, n_docs: int, partitions: int = None) -> DataFrame:
    """Distributed deterministic corpus: each task builds its own pages
    from doc ids — no driver-side materialization."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def build(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .corpus import build_page
        for pdf in iterator:
            pages = [build_page(int(doc_id)) for doc_id in pdf["id"]]
            yield pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"])

    return (spark.range(0, n_docs, numPartitions=partitions)
            .mapInPandas(build, schema=PAGES_SCHEMA))


def salt_by_url(df: DataFrame, partitions: int) -> DataFrame:
    """Repartition on the url hash so giant-host key runs cannot pile onto
    one task (north rule: explicit skew handling).

    NB: hash-partitioning on ``pmod(xxhash64(url), partitions)`` is a trap:
    it yields only ``partitions`` distinct key values, which land in bins
    like balls-into-bins (measured: 3 of 8 partitions empty, one carrying
    38% of rows).  Partitioning on the full-width hash keeps placement
    deterministic by url while spreading uniformly."""
    return df.repartition(partitions, F.xxhash64("url"))


# ---------------------------------------------------------------------
# stage 1: html -> text/conllu extraction
# ---------------------------------------------------------------------

def extract_stage(pages: DataFrame) -> DataFrame:
    def extract(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .corpus import extract_conllu, extract_text
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in iterator:
            texts, conllus, shas, ok = [], [], [], []
            for html, text in zip(pdf["html"], pdf["text"]):
                try:
                    extracted = extract_text(html)
                    conllu = extract_conllu(html)
                except Exception:
                    extracted, conllu = "", ""
                texts.append(extracted)
                conllus.append(conllu)
                shas.append(hashlib.sha256(extracted.encode("utf8")).hexdigest())
                # the per-row invariant: extraction is byte-identical to the
                # table's text column
                ok.append(extracted == text)
            out = pd.DataFrame({
                "url": pdf["url"], "warc_ts": pdf["warc_ts"], "lang": pdf["lang"],
                "text": texts, "conllu": conllus, "text_sha256": shas,
                "byte_identical": ok, "part_id": part_id,
            })
            yield out

    return pages.mapInPandas(extract, schema=EXTRACT_SCHEMA)


TOKENS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("tid", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("lemma", T.StringType()),
    T.StructField("pos", T.StringType()),
    T.StructField("head", T.IntegerType()),
    T.StructField("func", T.StringType()),
    T.StructField("sent_num", T.IntegerType()),
])


def tokens_stage(extracted_or_pages: DataFrame) -> DataFrame:
    """Long-format token table (url, tid, text, lemma, pos, head, func,
    sent_num) for SQL-side corpus analytics; accepts either the extract
    stage output (has conllu) or raw pages (has html)."""
    has_conllu = "conllu" in extracted_or_pages.columns

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .corpus import extract_conllu
        for pdf in iterator:
            rows = []
            for rec in pdf.itertuples(index=False):
                conllu = rec.conllu if has_conllu else extract_conllu(rec.html)
                offset = 0
                in_sentence = 0
                sent_num = 1
                for line in conllu.split("\n"):
                    if "\t" not in line:
                        if in_sentence:
                            offset += in_sentence
                            sent_num += 1
                            in_sentence = 0
                        continue
                    cols = line.split("\t")
                    if "." in cols[0] or "-" in cols[0]:
                        continue
                    in_sentence += 1
                    head = 0 if cols[6] == "0" else int(cols[6]) + offset
                    rows.append({"url": rec.url, "tid": int(cols[0]) + offset,
                                 "text": cols[1], "lemma": cols[2], "pos": cols[3],
                                 "head": head, "func": cols[7], "sent_num": sent_num})
            yield pd.DataFrame(rows, columns=[f.name for f in TOKENS_SCHEMA.fields])

    return extracted_or_pages.mapInPandas(run, schema=TOKENS_SCHEMA)


def child_info_sql(tokens: DataFrame) -> DataFrame:
    """SQL analogue of the kernel's child-info aggregation (reference
    xrenner_preprocess.py:27-46 as a self-join + sorted collect,
    SURVEY.md §2.2)."""
    child = tokens.select(F.col("url").alias("c_url"),
                          F.col("head").alias("c_head"),
                          F.col("func").alias("c_func"),
                          F.col("text").alias("c_text"))
    return (tokens.join(child, (tokens.url == child.c_url)
                        & (tokens.tid == child.c_head), "inner")
            .groupBy("url", "tid")
            .agg(F.concat_ws(";", F.sort_array(F.collect_list("c_func")))
                 .alias("child_funcs"),
                 F.concat_ws(";", F.sort_array(F.collect_list("c_text")))
                 .alias("child_strings"),
                 F.count("*").alias("n_children")))


_DESC_VIEW_SEQ = 0


def descendants_closure_sql(tokens: DataFrame, max_depth: int = 12) -> DataFrame:
    """Transitive closure of the dependency child relation as ONE
    declarative ``WITH RECURSIVE`` query (the SQL analogue of reference
    xrenner_classes.py:305-320; SURVEY.md §2.7) — Spark 4.1's native
    recursive CTE executes the fixpoint inside the engine (UnionLoop),
    replacing the round-3 driver-paced frontier loop and its per-level
    persist/isEmpty probes entirely.

    Dependency edges form a FOREST (one parent per node), so every
    (ancestor, descendant) pair is derived along exactly one path and
    UNION ALL never duplicates — no distinct needed.  Iteration count
    is bounded by tree depth (~12 for natural-language parses), not by
    corpus size.

    CONTRACT (round-5 advice): ``max_depth`` is a hard recursion cap —
    unlike the round-3 frontier loop (which silently truncated) and the
    DuckDB oracle twin (which has no cap), Spark RAISES
    ``RECURSION_LEVEL_LIMIT_EXCEEDED`` when a tree is deeper than
    ``max_depth`` or the input contains a head cycle.  That throw is
    deliberate: a silent truncation would return an incomplete closure
    that hashes differently from the oracle, and cyclic input is
    malformed (the kernel's in-memory closure rejects it too).  Callers
    with legitimately deeper trees pass a larger ``max_depth``; the
    default 12 covers natural-language parses with slack.  The
    production path remains the kernel's per-document in-memory
    closure; this operator exists for SQL-side tree analytics and is
    oracle-checked against a DuckDB WITH RECURSIVE twin."""
    spark = tokens.sparkSession
    # per-call unique view name: a fixed name is session-global state
    # that concurrent callers (or a caller's own later query) would
    # silently rebind mid-plan
    global _DESC_VIEW_SEQ
    _DESC_VIEW_SEQ += 1
    view = "_descendants_tokens_%d" % _DESC_VIEW_SEQ
    tokens.createOrReplaceTempView(view)
    return spark.sql("""
        WITH RECURSIVE closure(url, ancestor, descendant)
        MAX RECURSION LEVEL {max_level} AS (
            SELECT url, head AS ancestor, tid AS descendant
            FROM {view} WHERE head > 0
            UNION ALL
            SELECT c.url, c.ancestor, e.tid AS descendant
            FROM closure c JOIN {view} e
              ON c.url = e.url AND c.descendant = e.head
        )
        SELECT url, ancestor, descendant FROM closure
    """.format(max_level=max_depth + 1, view=view))


# ---------------------------------------------------------------------
# stage 2: the per-document kernel
# ---------------------------------------------------------------------

def kernel_stage(extracted: DataFrame, lex_broadcast) -> DataFrame:
    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = lex_broadcast.value
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in iterator:
            rows = []
            for rec in pdf.itertuples(index=False):
                t0 = time.perf_counter()
                try:
                    conllu = rec.conllu
                    if lex.depedit is not None:  # rewrite once for both consumers
                        conllu = lex.depedit.run(conllu)
                    result = analyze_document_windowed(rec.url, conllu, lex,
                                                       pre_rewritten=True)
                    mentions = result.mentions
                    verbs = sorted(parse_verbs(conllu).items())
                    n_sent, n_tok = result.n_sentences, result.n_tokens
                    error = ""
                except Exception as exc:  # per-doc isolation: one bad page
                    mentions, verbs = [], []          # must not kill the job
                    n_sent = n_tok = 0
                    error = repr(exc)[:500]
                rows.extend(_kernel_rows(
                    rec.url, rec.warc_ts, rec.lang, part_id, rec.text_sha256,
                    n_sent, n_tok, (time.perf_counter() - t0) * 1000.0,
                    error, mentions, verbs))
            yield pd.DataFrame(rows, columns=_KERNEL_COLS)

    return extracted.mapInPandas(run, schema=KERNEL_SCHEMA)


def dedup_kernel_stage(extracted: DataFrame, lex_broadcast) -> DataFrame:
    """Run the kernel ONCE per distinct page payload and join the rows
    back to every copy — the classic web-corpus lever (real crawls are
    commonly 30-60% exact-duplicate pages; the reference recomputes per
    file, no equivalent).

    Shape at scale: one full-payload shuffle (the row_number window on
    payload_key) REPLACES kernel compute on every duplicate; the
    join-back moves only long-format kernel rows (~tens per doc), keyed
    by payload_key, so a viral page with millions of copies is an AQE
    skew-join case, not a compute cliff.  Output rows carry the COPY's
    url/warc_ts/lang and the representative's kernel results; they are
    value-identical to the non-dedup path for every mention/verb/doc
    field except the lineage metrics (part_id, kernel_ms — computed
    once, on the representative) and the docname embedded in per-doc
    ``error`` strings (the payload key itself — deterministic, and
    unique even when one url appears with two different payloads, the
    re-crawled-page case that a url-keyed join-back would cross-match;
    r5 advice).  Covered by test_pipeline_spark.
    """
    from pyspark.sql import Window

    # key on the exact kernel input: extracted text AND conllu payload
    keyed = extracted.withColumn(
        "payload_key",
        F.sha2(F.concat(F.col("text_sha256"), F.sha2(F.col("conllu"), 256)),
               256))
    w = Window.partitionBy("payload_key").orderBy("url")
    reps = (keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
    # the kernel runs with payload_key AS the docname: the join-back is
    # then keyed on payload_key directly (unique per representative by
    # construction) instead of the representative's url, which is NOT
    # unique across payload groups when a url re-appears with changed
    # content
    rep_in = reps.withColumn("url", F.col("payload_key")).drop("payload_key")
    rep_rows = kernel_stage(rep_in, lex_broadcast)
    rep_rows_keyed = (rep_rows.withColumnRenamed("url", "payload_key")
                      .drop("warc_ts", "lang"))
    copies = keyed.select("payload_key", "url", "warc_ts", "lang")
    return (rep_rows_keyed.join(copies, "payload_key")
            .select(*_KERNEL_COLS))


def fused_extract_kernel_stage_pandas(pages: DataFrame, lex_broadcast) -> DataFrame:
    """Extraction + kernel in ONE python position (mapInPandas variant).

    Chaining two mapInPandas evaluations inside a single Spark stage runs
    two python workers per task back-to-back, which measured ~10x slower
    than a single fused worker on this pipeline; the staged variant is
    only used when a checkpoint write separates the stages anyway
    (run_pipeline).  Semantics are identical — covered by tests.

    Kept as the measured A/B twin of the mapInArrow default (row-exact
    equal output, test_pipeline_spark); see BENCH/BASELINE.md
    "Arrow-serde experiment" for why the default switched."""

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .corpus import extract_conllu, extract_text
        lex = lex_broadcast.value
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in iterator:
            rows = []
            for rec in pdf.itertuples(index=False):
                t0 = time.perf_counter()
                try:
                    extracted = extract_text(rec.html)
                    if extracted != rec.text:
                        raise ValueError("byte-identity violation for " + rec.url)
                    conllu = extract_conllu(rec.html)
                    if lex.depedit is not None:  # rewrite once for both consumers
                        conllu = lex.depedit.run(conllu)
                    result = analyze_document_windowed(rec.url, conllu, lex,
                                                       pre_rewritten=True)
                    mentions = result.mentions
                    verbs = sorted(parse_verbs(conllu).items())
                    sha = hashlib.sha256(extracted.encode("utf8")).hexdigest()
                    n_sent, n_tok = result.n_sentences, result.n_tokens
                    error = ""
                except Exception as exc:
                    mentions, verbs, sha = [], [], ""
                    n_sent = n_tok = 0
                    error = repr(exc)[:500]
                rows.extend(_kernel_rows(
                    rec.url, rec.warc_ts, rec.lang, part_id, sha,
                    n_sent, n_tok, (time.perf_counter() - t0) * 1000.0,
                    error, mentions, verbs))
            yield pd.DataFrame(rows, columns=_KERNEL_COLS)

    return pages.mapInPandas(run, schema=KERNEL_SCHEMA)


def fused_extract_kernel_stage_arrow(pages: DataFrame, lex_broadcast) -> DataFrame:
    """The fused stage over ``mapInArrow``: identical semantics to
    fused_extract_kernel_stage, but the output side skips pandas
    entirely — per-column Python lists are assembled with bulk
    list.extend (constant-per-doc columns as repeated slices, mention
    columns as comprehensions) and handed to Arrow as one RecordBatch
    per input batch.  The pandas path builds a dict per output row and
    lets DataFrame(list-of-dicts) re-infer 33 object columns, which is
    the serde overhead the round-2 profile attributed the remaining
    kernel-stage gap to (CLAUDE.md: ~0.8 of the raw-multiprocessing
    ceiling)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    out_schema = to_arrow_schema(KERNEL_SCHEMA)
    mention_fields = _MENTION_FIELDS

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from .corpus import extract_conllu, extract_text
        lex = lex_broadcast.value
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for batch in batches:
            names = batch.schema.names
            col = {n: batch.column(i) for i, n in enumerate(names)}
            urls = col["url"].to_pylist()
            htmls = col["html"].to_pylist()
            texts = col["text"].to_pylist()
            langs = col["lang"].to_pylist()
            ts_type = batch.schema.field("warc_ts").type
            tss = col["warc_ts"].to_pylist()

            out = {name: [] for name in _KERNEL_COLS}
            for url, ts, html, text, lang in zip(urls, tss, htmls, texts, langs):
                t0 = time.perf_counter()
                try:
                    extracted = extract_text(html)
                    if extracted != text:
                        raise ValueError("byte-identity violation for " + url)
                    conllu = extract_conllu(html)
                    if lex.depedit is not None:
                        conllu = lex.depedit.run(conllu)
                    result = analyze_document_windowed(url, conllu, lex,
                                                       pre_rewritten=True)
                    mentions = result.mentions
                    verbs = sorted(parse_verbs(conllu).items())
                    sha = hashlib.sha256(extracted.encode("utf8")).hexdigest()
                    n_sent, n_tok = result.n_sentences, result.n_tokens
                    error = ""
                except Exception as exc:
                    mentions, verbs, sha = [], [], ""
                    n_sent = n_tok = 0
                    error = repr(exc)[:500]
                kernel_ms = (time.perf_counter() - t0) * 1000.0
                n_m, n_v = len(mentions), len(verbs)
                n = 1 + n_m + n_v
                # constant-per-doc columns: one bulk extend each
                out["url"].extend([url] * n)
                out["warc_ts"].extend([ts] * n)
                out["lang"].extend([lang] * n)
                out["part_id"].extend([part_id] * n)
                out["row_type"].append("d")
                out["row_type"].extend(["m"] * n_m)
                out["row_type"].extend(["v"] * n_v)
                # doc-row-only metrics columns
                pad = [None] * (n_m + n_v)
                out["text_sha256"].append(sha); out["text_sha256"].extend(pad)
                out["n_sentences"].append(n_sent); out["n_sentences"].extend(pad)
                out["n_tokens"].append(n_tok); out["n_tokens"].extend(pad)
                out["kernel_ms"].append(kernel_ms); out["kernel_ms"].extend(pad)
                out["error"].append(error); out["error"].extend(pad)
                # mention columns: null for 'd', values, null for 'v'
                v_pad = [None] * n_v
                for k in mention_fields:
                    o = out[k]
                    o.append(None)
                    o.extend([m[k] for m in mentions])
                    o.extend(v_pad)
                # verb columns
                out["verb_id"].extend([None] * (1 + n_m))
                out["verb_id"].extend([tid for tid, _ in verbs])
                out["verb_lemma"].extend([None] * (1 + n_m))
                out["verb_lemma"].extend([lemma for _, lemma in verbs])

            arrays = []
            for field in out_schema:
                typ = ts_type if field.name == "warc_ts" else field.type
                arrays.append(pa.array(out[field.name], type=typ))
            yield pa.RecordBatch.from_arrays(arrays, names=[f.name for f in out_schema])

    return pages.mapInArrow(run, schema=KERNEL_SCHEMA)


#: default fused stage: the mapInArrow variant — measured equal-to-better
#: vs mapInPandas on every quiet-window rep (kernel-stage-only A/B, 20k
#: docs local[32]) and it drops pandas from the hot path entirely; the
#: remaining gap to the raw-multiprocessing ceiling is input-side Arrow
#: IPC + task scheduling, not output assembly (BENCH/BASELINE.md r3).
#: XRENNER_FUSED_IMPL=pandas flips back for A/B measurement.
fused_extract_kernel_stage = (
    fused_extract_kernel_stage_pandas
    if os.environ.get("XRENNER_FUSED_IMPL") == "pandas"
    else fused_extract_kernel_stage_arrow)


SERIALIZE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("filename", T.StringType()),   # PAULA is multi-file; else ""
    T.StructField("payload", T.StringType()),
])

#: formats serialize_stage accepts -> output.py serializer
_SERIALIZERS = ("sgml", "conll", "conll_sent", "onto", "html",
                "webanno", "webannotsv", "paula")


def serialize_stage(pages: DataFrame, lex_broadcast,
                    formats=("sgml",)) -> DataFrame:
    """Distributed serialization sink: extract -> kernel -> the
    byte-exact reference serializers (output.py), all in ONE python
    position, emitting one (url, fmt, filename, payload) row per
    document per format (per file for PAULA's multi-file standoff).
    Documents are independent, so this scales exactly like the kernel
    stage; payloads stream straight to any writer (parquet/text sink).
    The driver oracle for the sgml path is a committed reference-engine
    export (scripts/make_ref_serialized.py), same pattern as
    kg_mentions."""
    from . import output as out_mod

    unknown = set(formats) - set(_SERIALIZERS)
    if unknown:
        raise ValueError("unknown serialization formats: %s" % sorted(unknown))

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .corpus import extract_conllu
        lex = lex_broadcast.value
        for pdf in iterator:
            rows = []
            for rec in pdf.itertuples(index=False):
                try:
                    conllu = extract_conllu(rec.html)
                    if lex.depedit is not None:
                        conllu = lex.depedit.run(conllu)
                    result = analyze_document_windowed(rec.url, conllu, lex,
                                                       pre_rewritten=True)
                except Exception as exc:  # per-doc isolation: one bad page
                    rows.append((rec.url, "error", "", repr(exc)[:500]))
                    continue
                docname = rec.url.rsplit("/", 1)[-1]
                for fmt in formats:
                    payload = out_mod.serialize_result(result, docname, fmt)
                    if fmt == "paula":
                        for fn, data in payload.items():
                            rows.append((rec.url, fmt, fn, data))
                    else:
                        rows.append((rec.url, fmt, "", payload))
            yield pd.DataFrame(rows, columns=["url", "fmt", "filename", "payload"])

    return pages.mapInPandas(run, schema=SERIALIZE_SCHEMA)


DUMP_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("line", T.StringType()),
])


def training_dump_stage(pages: DataFrame, lex_broadcast) -> DataFrame:
    """Training-data dump sink, distributed: one row per candidate-pair
    feature line (reference lex.dump file sink, xrenner_compatible.py:
    591-620), keyed by url.  The broadcast lex must carry ``dump=True``;
    headers are fixed by the feature schema (DocResult.dump_headers).
    Line content is deterministic; within-doc order is not meaningful
    (see make_dump_goldens.py) so a parquet/TSV writer downstream is
    free to partition however it likes."""
    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .corpus import extract_conllu
        lex = lex_broadcast.value
        for pdf in iterator:
            rows = []
            for rec in pdf.itertuples(index=False):
                try:
                    conllu = extract_conllu(rec.html)
                    if lex.depedit is not None:
                        conllu = lex.depedit.run(conllu)
                    result = analyze_document_windowed(rec.url, conllu, lex,
                                                       pre_rewritten=True)
                except Exception:  # per-doc isolation: skip bad pages
                    continue
                rows.extend((rec.url, line) for line in result.dump_rows)
            yield pd.DataFrame(rows, columns=["url", "line"])

    return pages.mapInPandas(run, schema=DUMP_SCHEMA)


def lineage_of(stage_df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage/metrics rows (north rule)."""
    if "row_type" in stage_df.columns:  # long-format kernel output
        aggs = [
            F.sum(F.when(F.col("row_type") == "d", 1).otherwise(0))
            .alias("rows_out"),
            F.min("url").alias("url_min"),
            F.max("url").alias("url_max"),
            F.sum("kernel_ms").alias("wall_ms"),
            F.sum(F.when(F.col("row_type") == "m", 1).otherwise(0))
            .alias("mentions_out"),
            F.sum(F.when(F.col("error") != "", 1).otherwise(0)).alias("errors"),
        ]
        return (stage_df.groupBy("part_id").agg(*aggs)
                .withColumn("stage", F.lit(stage)))
    aggs = [
        F.count("*").alias("rows_out"),
        F.min("url").alias("url_min"),
        F.max("url").alias("url_max"),
    ]
    if "byte_identical" in stage_df.columns:
        aggs += [F.sum(F.when(~F.col("byte_identical"), 1).otherwise(0))
                 .alias("invariant_violations")]
    return (stage_df.groupBy("part_id")
            .agg(*aggs)
            .withColumn("stage", F.lit(stage)))


# ---------------------------------------------------------------------
# stage 3: chains + triples as Spark SQL dataflow
# ---------------------------------------------------------------------

def chains_stage(kernel_out: DataFrame) -> DataFrame:
    """Chain aggregation with canonicalization (groupBy + min_by/max_by;
    same rules as triples.canonical_mentions)."""
    return chains_from_mentions(mentions_view(kernel_out))


def chains_from_mentions(mentions: DataFrame) -> DataFrame:
    """chains_stage over an already-exploded mentions table (also the
    driver-oracle entry point: the DuckDB twin recomputes this aggregation
    over the exported mentions parquet).  Orderings are total — the -end
    tiebreak makes max_by deterministic when two spans share length and
    start — so Spark and DuckDB pick identical canonical strings."""
    return (
        mentions.groupBy("url", "group_id").agg(
            F.expr("min_by(core_text, struct(start, end)) "
                   "FILTER (WHERE form = 'proper')").alias("proper_first"),
            F.expr("max_by(core_text, struct(length(core_text), -start, -end)) "
                   "FILTER (WHERE form != 'pronoun')").alias("longest_nominal"),
            F.expr("min_by(core_text, struct(start, end))").alias("first_any"),
            F.count("*").alias("n_mentions"),
            F.expr("min_by(entity, struct(start, end))").alias("entity"),
            F.collect_list("mark_id").alias("mention_ids"),
        )
        .withColumn("canonical_text",
                    F.coalesce("proper_first", "longest_nominal", "first_any"))
        .drop("proper_first", "longest_nominal", "first_any")
    )


def mentions_view(kernel_out: DataFrame) -> DataFrame:
    """One row per mention (filter + prune of the long-format table —
    only the referenced columns reach the checkpoint scan)."""
    return (kernel_out.filter(F.col("row_type") == "m")
            .select("url", "warc_ts", *_MENTION_FIELDS))


def verbs_view(kernel_out: DataFrame) -> DataFrame:
    return (kernel_out.filter(F.col("row_type") == "v")
            .select("url", "verb_id", "verb_lemma"))


def docs_view(kernel_out: DataFrame) -> DataFrame:
    """One row per document: the metrics/lineage/error fields."""
    return (kernel_out.filter(F.col("row_type") == "d")
            .select("url", "warc_ts", "lang", "part_id", "text_sha256",
                    "n_sentences", "n_tokens", "kernel_ms", "error"))


def triples_stage(kernel_out: DataFrame, subject_func: str = "^[nc]subj",
                  object_func: str = "^(obj|dobj|iobj|obl|nmod)$") -> DataFrame:
    """(subj, pred, obj) emission: role-tagged verb arguments joined back
    to chain-canonical strings.  All joins are co-keyed on url, so with the
    upstream url-hash partitioning they stay within the same shuffle
    partitioning (AQE coalesces post-shuffle)."""
    return triples_from_views(mentions_view(kernel_out), verbs_view(kernel_out),
                              subject_func, object_func)


def triples_from_views(mentions: DataFrame, verbs: DataFrame,
                       subject_func: str = "^[nc]subj",
                       object_func: str = "^(obj|dobj|iobj|obl|nmod)$") -> DataFrame:
    """triples_stage over already-exploded mentions/verbs views (the
    driver-oracle entry point — same dataflow, input read back from the
    exported parquet instead of the live kernel)."""
    canon = chains_from_mentions(mentions).select(
        "url", "group_id", "canonical_text", F.col("entity").alias("chain_entity"))

    args = (mentions
            .withColumn("role",
                        F.when(F.regexp_like("head_func", F.lit(subject_func)), "subj")
                        .when(F.regexp_like("head_func", F.lit(object_func)), "obj"))
            .filter(F.col("role").isNotNull())
            .join(verbs, (mentions.url == verbs.url)
                  & (mentions.head_parent == verbs.verb_id), "inner")
            .drop(verbs.url)
            .join(canon, ["url", "group_id"], "left"))

    subj = args.filter(F.col("role") == "subj").select(
        "url", "warc_ts", "verb_id", "verb_lemma",
        F.col("canonical_text").alias("subj"),
        F.col("group_id").alias("subj_group"),
        F.col("chain_entity").alias("subj_entity"),
        F.col("sent_num").alias("sent_num"),
        F.col("mark_id").alias("subj_mark"))
    obj = args.filter(F.col("role") == "obj").select(
        "url", "verb_id",
        F.col("canonical_text").alias("obj"),
        F.col("group_id").alias("obj_group"),
        F.col("chain_entity").alias("obj_entity"),
        F.col("mark_id").alias("obj_mark"))

    return (subj.join(obj, ["url", "verb_id"], "inner")
            .filter(F.col("subj_mark") != F.col("obj_mark"))
            .select("url", "warc_ts", "subj", F.col("verb_lemma").alias("pred"),
                    "obj", "subj_group", "obj_group", "subj_entity", "obj_entity",
                    "sent_num", "verb_id"))


# ---------------------------------------------------------------------
# orchestration with checkpoint/resume
# ---------------------------------------------------------------------

def run_pipeline(spark: SparkSession, pages: DataFrame, warehouse: str,
                 partitions: int = None, lex_dir: Optional[str] = None,
                 resume: bool = True, rule_based: bool = False,
                 no_seq: bool = False,
                 override: Optional[str] = None,
                 dedup_kernel_inputs: bool = False) -> DataFrame:
    """Full run: returns the triples DataFrame (already persisted).

    With ``resume=True``, stages whose checkpoint tables exist in the
    warehouse are skipped and read back — kill/rerun produces identical
    output without recomputing finished stages.

    ``dedup_kernel_inputs=True`` computes the kernel once per distinct
    page payload and joins results back to every copy (see
    dedup_kernel_stage for the scale rationale and the two documented
    lineage-metric differences).
    """
    cat = Catalog(spark, warehouse)
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    if resume and cat.exists("stage_extract"):
        extracted = cat.read("stage_extract")
    else:
        extracted = extract_stage(salt_by_url(pages, partitions))
        cat.write(extracted, "stage_extract")
        extracted = cat.read("stage_extract")
        cat.append_lineage("extract", lineage_of(extracted, "extract"))

    if resume and cat.exists("stage_kernel"):
        if rule_based or no_seq or override:
            import sys
            sys.stderr.write(
                "WARNING: stage_kernel checkpoint exists; rule_based/"
                "no_seq/override have NO effect on resumed output — "
                "pass resume=False (run_kg --no-resume) to recompute "
                "under the requested model mode\n")
        kernel_out = cat.read("stage_kernel")
    else:
        lex = load_lex(lex_dir, rule_based=rule_based,
                       no_seq=no_seq, override=override)
        bcast = spark.sparkContext.broadcast(lex)
        kernel_out = (dedup_kernel_stage(extracted, bcast)
                      if dedup_kernel_inputs
                      else kernel_stage(extracted, bcast))
        cat.write(kernel_out, "stage_kernel")
        kernel_out = cat.read("stage_kernel")
        cat.append_lineage("kernel", lineage_of(kernel_out, "kernel"))

    if resume and cat.exists("triples"):
        return cat.read("triples")
    triples = triples_stage(kernel_out)
    cat.write(triples, "triples")
    cat.write(chains_stage(kernel_out), "chains")
    return cat.read("triples")

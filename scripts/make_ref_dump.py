#!/usr/bin/env python
"""Export the REFERENCE engine's training-data dump lines for the
synthetic corpus as a committed parquet fixture — the hard oracle for
the driver's kg_training_dump query (sandbox-only generator; the
driver's value-hash is row-order-insensitive, which absorbs the
reference's hash-incidental set iteration order).

Usage: python scripts/make_ref_dump.py [n_docs] [out.parquet]
"""

import io
import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("XRENNER_REFERENCE", "/root/reference")
MODEL = os.path.join(REPO, "xrenner_spark", "models", "web")
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
        REPO, "tests", "fixtures", "ref_dump_500.parquet")

    urls, lines = [], []
    for i in range(n_docs):
        url = build_page(i)["url"]
        conllu = build_document(i)["conllu"]
        ref = Xrenner(model=MODEL, rule_based=True, no_seq=True)
        ref.lex.dump = io.StringIO()
        ref.lex.dump_types = set()
        ref.lex.dump_headers = []
        ref.set_doc_name(url)
        ref.analyze(conllu, "none")
        for line in ref.lex.dump.getvalue().split("\n"):
            if line:
                urls.append(url)
                lines.append(line)

    table = pa.table({"url": pa.array(urls, pa.string()),
                      "line": pa.array(lines, pa.string())})
    pq.write_table(table, out_path, compression="zstd")
    print("wrote %d dump lines for %d docs -> %s (%d bytes)"
          % (len(lines), n_docs, out_path, os.path.getsize(out_path)))


if __name__ == "__main__":
    main()

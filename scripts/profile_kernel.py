#!/usr/bin/env python
"""Profile the per-document kernel (the ~86% cost at the 1M-doc
plateau, BENCH/BASELINE.md round-4 section): cProfile over corpus docs,
cumulative hotspots.

Usage: python scripts/profile_kernel.py [n_docs]
"""

import cProfile
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from xrenner_spark.corpus import build_document
    from xrenner_spark.kernel import analyze_document
    from xrenner_spark.lex import load_lex

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    lex = load_lex()
    docs = [(str(i), build_document(i)["conllu"]) for i in range(n)]

    # untimed warmup (lex lazy caches)
    analyze_document("w", docs[0][1], lex)

    t0 = time.time()
    for name, c in docs:
        analyze_document(name, c, lex)
    wall = time.time() - t0
    print("plain: %d docs in %.2fs = %.0f docs/s" % (n, wall, n / wall))

    prof = cProfile.Profile()
    prof.enable()
    for name, c in docs:
        analyze_document(name, c, lex)
    prof.disable()
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(30)
    st.sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's N->4N criterion.

Runs bench.py at local[8] and local[32] on the SAME input (fresh JVM per
run), computes throughput scaling efficiency, optionally measures the
reference engine's single-process throughput, and writes
BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [doc_mult]
"""

import io
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_MULT = sys.argv[1] if len(sys.argv) > 1 else "40"


def run_bench(cores: str) -> dict:
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_CPUS": cores, "SPARK_GRAFT_SF_DIR": SF_DIR,
                "SPARK_GRAFT_DOC_MULT": DOC_MULT})
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.strip().split("\n") if ln.startswith("{")][-1]
    return json.loads(line)


def reference_throughput(n_docs: int = 200):
    """Single-process reference engine throughput on the same corpus
    (sandbox-only; needs /root/reference)."""
    ref = os.environ.get("XRENNER_REFERENCE", "/root/reference")
    if not os.path.isdir(ref):
        return None
    sys.path.insert(0, ref)
    sys.path.insert(0, REPO)
    import warnings
    warnings.filterwarnings("ignore")
    from xrenner import Xrenner
    from xrenner_spark.corpus import build_document
    engine = Xrenner(model=os.path.join(REPO, "xrenner_spark/models/web"),
                     rule_based=True, no_seq=True)
    docs = [build_document(i)["conllu"] for i in range(n_docs)]
    n_tokens = sum(d.count("\n") + 1 for d in docs)
    t0 = time.perf_counter()
    for d in docs:
        engine.analyze(d, "none")
    wall = time.perf_counter() - t0
    return {"docs_per_sec": n_docs / wall, "tokens_per_sec": n_tokens / wall,
            "n_docs": n_docs}


def main():
    import multiprocessing
    ref = reference_throughput()
    r8 = run_bench("8")
    r32 = run_bench("32")

    def eff(metric):
        t8, t32 = r8[metric], r32[metric]
        return t32 / (4.0 * t8)

    kg_eff = eff("docs_per_sec")
    triple_eff = eff("triples_per_sec")

    md = io.StringIO()
    md.write("# BENCH baseline — measured\n\n")
    md.write("Host: %d cpus, Spark local mode, input %s, kg corpus = %s x "
             "documents rows.\nEvidence for the N->4N executor criterion per "
             "driver instruction: identical job at local[8] vs local[32].\n\n"
             % (multiprocessing.cpu_count(), SF_DIR, DOC_MULT))
    md.write("| metric | local[8] | local[32] | scaling efficiency |\n")
    md.write("|---|---|---|---|\n")
    md.write("| KG pipeline docs/sec | %.0f | %.0f | **%.2f** |\n"
             % (r8["docs_per_sec"], r32["docs_per_sec"], kg_eff))
    md.write("| KG pipeline triples/sec | %.0f | %.0f | **%.2f** |\n"
             % (r8["triples_per_sec"], r32["triples_per_sec"], triple_eff))
    md.write("| KG pipeline wall (s) | %.1f | %.1f | |\n"
             % (r8["queries"]["kg_pipeline"], r32["queries"]["kg_pipeline"]))
    md.write("| full bench wall (s) | %.1f | %.1f | |\n\n"
             % (r8["value"], r32["value"]))
    if ref:
        md.write("Reference engine (single process, same model + corpus): "
                 "%.0f docs/sec, %.0f tokens/sec over %d docs.\n"
                 % (ref["docs_per_sec"], ref["tokens_per_sec"], ref["n_docs"]))
        md.write("Spark pipeline at local[32]: %.0f docs/sec -> **%.1fx** the "
                 "reference's single-process throughput (and %.2fx per core at "
                 "local[8]).\n\n"
                 % (r32["docs_per_sec"], r32["docs_per_sec"] / ref["docs_per_sec"],
                    (r8["docs_per_sec"] / 8) / ref["docs_per_sec"]))
    md.write("Per-query wall seconds:\n\n| query | local[8] | local[32] |\n|---|---|---|\n")
    for name in r8["queries"]:
        md.write("| %s | %.2f | %.2f |\n" % (name, r8["queries"][name],
                                             r32["queries"].get(name, float("nan"))))
    md.write("\nRaw JSON:\n\n```\nlocal[8]:  %s\nlocal[32]: %s\n```\n"
             % (json.dumps(r8), json.dumps(r32)))

    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with io.open(out_path, "w", encoding="utf8") as fh:
        fh.write(md.getvalue())
    print(md.getvalue())


if __name__ == "__main__":
    main()

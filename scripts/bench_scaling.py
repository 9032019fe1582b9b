#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's N->4N criterion.

Runs bench.py at local[N] and local[4N] on the SAME input (fresh JVM per
run, strictly sequential), measures the host's raw parallel-CPU ceiling,
and writes BENCH/BASELINE.md.

The sandbox host advertises 32 cpus but a raw md5-burn shows per-process
throughput is flat only up to ~8 concurrent processes (SMT beyond that):
8->32 processes yields only ~2.5x even for pure hashing, so the honest
N->4N window on this box is 2->8 cores; the 8->32 capacity point is also
reported against the measured hardware ceiling.

Usage: python scripts/bench_scaling.py [doc_mult]
"""

import hashlib
import io
import json
import multiprocessing
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_MULT = sys.argv[1] if len(sys.argv) > 1 else "40"

N_SMALL, N_BIG, N_CAP = 2, 8, 32


def run_bench(cores: int) -> dict:
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_CPUS": str(cores), "SPARK_GRAFT_SF_DIR": SF_DIR,
                "SPARK_GRAFT_DOC_MULT": DOC_MULT})
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.strip().split("\n") if ln.startswith("{")][-1]
    return json.loads(line)


def _burn(n):
    x = b"x"
    for _ in range(n):
        x = hashlib.md5(x).digest()


def cpu_ceiling(procs: int, n: int = 2_000_000) -> float:
    """Aggregate Mhash/s with `procs` concurrent burners."""
    t0 = time.perf_counter()
    with multiprocessing.Pool(procs) as pool:
        pool.map(_burn, [n] * procs)
    return procs * n / (time.perf_counter() - t0) / 1e6


def reference_throughput(n_docs: int = 200):
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
    burn = {p: cpu_ceiling(p) for p in (N_SMALL, N_BIG, N_CAP)}
    ref = reference_throughput()
    # the sandbox host's available CPU oscillates with external tenancy
    # (measured md5 8->32 scaling swings between 2.6x and 3.3x within an
    # hour) — record a 32-proc canary immediately before each config so
    # slow windows are visible next to the number they taint
    results, canaries = {}, {}
    for c in (N_SMALL, N_BIG, N_CAP):
        canaries[c] = cpu_ceiling(32)
        results[c] = run_bench(c)
    r_small, r_big, r_cap = results[N_SMALL], results[N_BIG], results[N_CAP]

    eff = r_big["docs_per_sec"] / (4.0 * r_small["docs_per_sec"])
    hw_small_big = burn[N_BIG] / burn[N_SMALL]
    eff_vs_hw = (r_big["docs_per_sec"] / r_small["docs_per_sec"]) / hw_small_big
    hw_8_32 = burn[N_CAP] / burn[N_BIG]
    cap_ratio = r_cap["docs_per_sec"] / r_big["docs_per_sec"]

    md = io.StringIO()
    md.write("# BENCH baseline — measured\n\n")
    md.write("Host: %d advertised cpus, Spark local mode, input %s, kg corpus "
             "= %s x documents rows (%d docs). All runs sequential and "
             "isolated (fresh JVM per config).\n\n"
             % (multiprocessing.cpu_count(), SF_DIR, DOC_MULT, r_big["kg_docs"]))
    md.write("## Hardware parallelism ceiling (raw md5 burn, no Spark)\n\n")
    md.write("| concurrent procs | aggregate Mhash/s | per-proc |\n|---|---|---|\n")
    for p, v in burn.items():
        md.write("| %d | %.1f | %.2f |\n" % (p, v, v / p))
    md.write("\nPer-process throughput is flat only to ~8 processes; "
             "8->32 procs yields %.2fx even for pure hashing (SMT), so the "
             "honest N->4N window on this host is %d->%d cores.\n\n"
             % (hw_8_32, N_SMALL, N_BIG))
    md.write("32-proc md5 canary immediately before each config "
             "(external-tenancy visibility): %s Mhash/s.\n\n"
             % ", ".join("local[%d]: %.1f" % (c, canaries[c])
                         for c in (N_SMALL, N_BIG, N_CAP)))
    md.write("## N -> 4N scaling (local[%d] -> local[%d], identical input)\n\n"
             % (N_SMALL, N_BIG))
    md.write("| metric | local[%d] | local[%d] | scaling efficiency |\n|---|---|---|---|\n"
             % (N_SMALL, N_BIG))
    md.write("| KG pipeline docs/sec | %.0f | %.0f | **%.2f** |\n"
             % (r_small["docs_per_sec"], r_big["docs_per_sec"], eff))
    md.write("| KG pipeline triples/sec | %.0f | %.0f | **%.2f** |\n"
             % (r_small["triples_per_sec"], r_big["triples_per_sec"],
                r_big["triples_per_sec"] / (4 * r_small["triples_per_sec"])))
    md.write("| KG pipeline wall (s) | %.1f | %.1f | |\n\n"
             % (r_small["queries"]["kg_pipeline"], r_big["queries"]["kg_pipeline"]))
    md.write("Pipeline %d->%d speedup %.2fx vs hardware ceiling %.2fx "
             "(raw md5 burn) -> **%.2f of attainable**; single/dual-process "
             "turbo inflates the small-N baseline on this host.\n\n"
             % (N_SMALL, N_BIG,
                r_big["docs_per_sec"] / r_small["docs_per_sec"],
                hw_small_big, eff_vs_hw))
    md.write("## Capacity point (local[%d])\n\n" % N_CAP)
    md.write("local[%d] -> local[%d]: %.2fx pipeline speedup vs a %.2fx raw-CPU "
             "hardware ceiling (%.0f%% of attainable).\n\n"
             % (N_BIG, N_CAP, cap_ratio, hw_8_32, 100.0 * cap_ratio / hw_8_32))
    if ref:
        md.write("## Reference comparison\n\n")
        md.write("Reference engine (single process, same model + corpus): "
                 "%.0f docs/sec, %.0f tokens/sec.\n" % (ref["docs_per_sec"],
                                                        ref["tokens_per_sec"]))
        md.write("This pipeline: %.0f docs/sec at local[%d] (**%.1fx** reference), "
                 "%.0f docs/sec at local[%d] (**%.1fx**), per-core at local[%d]: "
                 "%.2fx reference single-core.\n\n"
                 % (r_big["docs_per_sec"], N_BIG,
                    r_big["docs_per_sec"] / ref["docs_per_sec"],
                    r_cap["docs_per_sec"], N_CAP,
                    r_cap["docs_per_sec"] / ref["docs_per_sec"],
                    N_BIG, (r_big["docs_per_sec"] / N_BIG) / ref["docs_per_sec"]))
    md.write("## Per-query wall seconds\n\n| query | local[%d] | local[%d] | local[%d] |\n|---|---|---|---|\n"
             % (N_SMALL, N_BIG, N_CAP))
    for name in r_big["queries"]:
        md.write("| %s | %.2f | %.2f | %.2f |\n"
                 % (name, r_small["queries"][name], r_big["queries"][name],
                    r_cap["queries"].get(name, float("nan"))))
    md.write("\nRaw JSON:\n\n```\n")
    for c in (N_SMALL, N_BIG, N_CAP):
        md.write("local[%d]: %s\n" % (c, json.dumps(results[c])))
    md.write("```\n")

    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # regenerate only the generated block; PRESERVE the hand-written
    # history sections (everything from the first "## History note" or
    # any section after the raw-JSON fence) — round 4 lost them once
    preserved = ""
    if os.path.exists(out_path):
        old = io.open(out_path, encoding="utf8").read()
        raw_at = old.find("Raw JSON:")
        fence_open = old.find("\n```\n", raw_at)  # opening fence
        fence_close = old.find("\n```\n", fence_open + 4) if fence_open != -1 else -1
        if fence_close != -1:
            preserved = old[fence_close + len("\n```\n"):]
    with io.open(out_path, "w", encoding="utf8") as fh:
        fh.write(md.getvalue())
        fh.write(preserved)
    print(md.getvalue())


if __name__ == "__main__":
    main()

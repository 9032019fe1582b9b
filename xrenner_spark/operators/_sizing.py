"""Corpus-size probes that avoid a full Spark job.

Several operators adapt their geometry to the corpus size (LSH bucket
bits, SimHash signature width, the n-gram all-pairs guard).  Deriving N
with ``df.count()`` on an unmaterialized plan re-executes the scan +
any per-row transformation once for the count and again for the real
job (round-4 advice item).  Parquet footers already carry exact row
counts, so for parquet-backed tables the probe is a metadata read —
no executor job at all.  Non-local / non-parquet layouts fall back to
``fallback_df.count()``.
"""

from __future__ import annotations

import os


def parquet_rows(path: str, fallback_df=None) -> int:
    """Exact row count of a parquet file or directory from footer
    metadata (driver-side, no Spark job).  ``fallback_df.count()`` is
    used when the path is not locally readable parquet (e.g. an object
    store the driver cannot stat) — correctness never depends on the
    fast path."""
    try:
        import pyarrow.parquet as pq
        if os.path.isdir(path):
            files = [os.path.join(dp, f)
                     for dp, _dirs, fs in os.walk(path)
                     for f in fs
                     if f.endswith(".parquet") and not f.startswith((".", "_"))]
        elif os.path.isfile(path):
            files = [path]
        else:
            raise FileNotFoundError(path)
        if not files:
            raise FileNotFoundError("no parquet parts under %s" % path)
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        if fallback_df is not None:
            return fallback_df.count()
        raise

"""Thin table layer: Iceberg when a catalog is configured, partitioned
parquet otherwise.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jar available offline, so the same pipeline code runs against a
parquet warehouse with identical table names, schemas, snapshot-style
overwrite semantics and per-stage ``_lineage`` sidecar tables
(SURVEY.md §7 risk item 4).  Swapping in Iceberg is a construction-time
flag: ``Catalog(spark, iceberg_catalog="my_cat")`` routes every call
through ``writeTo``/``spark.read.table`` instead.

Jar status — TERMINAL (2026-08-17, round 4, final attempt): no
iceberg/table-format jar anywhere on the image, no pyiceberg, and
repo1.maven.org is DNS-unresolvable from the sandbox, so a real Iceberg
catalog can never execute here.  The branch is therefore a validated
feature flag: the constructor refuses an ``iceberg_catalog`` whose
``spark.sql.catalog.<name>`` configuration is absent (loud fail naming
the missing jar/config instead of an opaque AnalysisException at first
write).  What could be executed WAS executed (test_catalog_v2):
``tableExists`` and ``spark.read.table`` run green against Spark's
built-in V2SessionCatalog stand-in; ``createOrReplace`` and
``writeTo(...).append()`` reach the JVM and are rejected only by the
session catalog's missing capabilities (RTAS unsupported; V1Table not
writable through V2) — i.e. every call in the branch is well-formed
DataSourceV2 API, and only the capabilities an Iceberg catalog
provides need the runtime jar at deploy time.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str,
                 iceberg_catalog: Optional[str] = None):
        self.spark = spark
        self.warehouse = warehouse
        self.iceberg_catalog = iceberg_catalog
        if iceberg_catalog is None:
            os.makedirs(warehouse, exist_ok=True)
        else:
            # feature-flag validation (see module docstring): fail loudly
            # at construction if the named catalog is not configured,
            # instead of an opaque AnalysisException at first write.
            # "spark_catalog" is Spark's built-in session catalog and is
            # always present (V2SessionCatalog; no RTAS — stand-in for
            # the executable subset of the branch only).
            name = iceberg_catalog.split(".")[0]
            if name != "spark_catalog" and \
                    spark.conf.get("spark.sql.catalog." + name, None) is None:
                raise RuntimeError(
                    "iceberg_catalog=%r but spark.sql.catalog.%s is not "
                    "configured — an iceberg-spark-runtime jar plus the "
                    "catalog config must be on the cluster (unobtainable "
                    "in this sandbox; see catalog.py docstring)"
                    % (iceberg_catalog, name))

    # -- naming ---------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _ident(self, name: str) -> str:
        return "%s.%s" % (self.iceberg_catalog, name)

    # -- operations ------------------------------------------------------
    def exists(self, name: str) -> bool:
        if self.iceberg_catalog:
            return self.spark.catalog.tableExists(self._ident(name))
        path = self._path(name)
        return os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS"))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by=None):
        if self.iceberg_catalog:
            writer = df.writeTo(self._ident(name))
            if partition_by:
                writer = writer.partitionedBy(*partition_by)
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
            return
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def append_lineage(self, stage: str, lineage_df: DataFrame):
        """Per-partition lineage/metrics rows recorded alongside each stage
        output (north rule: exact resume + per-partition lineage)."""
        self.write(lineage_df, "_lineage_" + stage, mode="overwrite")

    def lineage(self, stage: str) -> DataFrame:
        return self.read("_lineage_" + stage)

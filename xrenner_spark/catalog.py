"""Thin table layer: Iceberg when a catalog is configured, partitioned
parquet otherwise.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jar available offline, so the same pipeline code runs against a
parquet warehouse with identical table names, schemas, snapshot-style
overwrite semantics and per-stage ``_lineage`` sidecar tables
(SURVEY.md §7 risk item 4).  Swapping in Iceberg is a construction-time
flag: ``Catalog(spark, iceberg_catalog="my_cat")`` routes every call
through ``writeTo``/``spark.read.table`` instead.

Jar status: retried 2026-08-16 (round 3) — no iceberg-spark-runtime jar
anywhere on the image (/opt/spark/jars has no table-format jars) and
repo1.maven.org is unreachable from the sandbox, so the Iceberg branch
remains untested here; the parquet branch carries the tested semantics.
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

"""Table IO abstraction: Iceberg when the runtime has it, parquet
directories otherwise.

The production design (north_rule) is an Iceberg catalog: atomic
snapshot commits give exactly-once stage checkpoints, partition specs
give pruning on (block_bucket, lang), and time travel gives resume
audit. The Iceberg runtime jar is NOT in this container, so the same
interface is implemented over plain parquet dirs with an atomic
_SUCCESS-style commit marker; the Iceberg path is exercised only when
`spark.sql.catalog.*` confs are present (import-try gated, per repo
environment rules).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableIO:
    """write/read/exists over a warehouse root.

    Parquet mode: each table is `<root>/<name>/` with a `_COMMITTED`
    marker written AFTER the parquet job succeeds — a crash mid-write
    leaves no marker, so resume re-runs the stage (write-then-commit,
    the same contract an Iceberg snapshot commit gives atomically).
    """

    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.catalog = catalog if (catalog and iceberg_available(spark)) else None

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _marker(self, name: str) -> str:
        return os.path.join(self._path(name), "_COMMITTED")

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None):
        if self.catalog:
            writer = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
            writer.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))
        with open(self._marker(name), "w") as f:
            f.write("ok\n")

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(self._marker(name))

    def append(self, name: str, df: DataFrame):
        if self.catalog:
            df.writeTo(f"{self.catalog}.{name}").append()
            return
        df.write.mode("append").parquet(self._path(name))
        with open(self._marker(name), "w") as f:
            f.write("ok\n")

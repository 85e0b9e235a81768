"""Minimal table catalog: Iceberg-shaped API over parquet directories.

The north rule targets Iceberg tables; this sandbox has no Iceberg catalog
jars, so the catalog wraps parquet directories with the same call shapes
(``read / append / overwrite / exists``) behind one seam. On a real cluster,
swap ``_fmt`` for ``"iceberg"`` + table identifiers and everything above this
module is unchanged. Atomicity note: Iceberg gives snapshot-atomic appends;
parquet append is directory-level (new files land last). Our resume protocol
only trusts a partition after its lineage row exists in ``extract_metrics``
(the delete-source-on-commit analog, ref ``/root/reference/src/services/
imap_service.py:212-235``), so a torn data write without a metrics row is
re-processed and deduplicated — the same at-least-once + idempotence contract
as the reference (spec NFR-008).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        return any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self.path(table))

    def drop(self, table: str) -> None:
        import shutil

        shutil.rmtree(self.path(table), ignore_errors=True)

"""Thin table-store abstraction: Iceberg when a catalog is configured,
parquet directories otherwise (no Iceberg jar in the sandbox — SURVEY.md §7
hard part 4).

Replaces the reference's embedded-Neo4j store handle
(VariantDatabase.java:84-93 startDatabase / Main.java:47-55 destructive
re-create): ``overwrite`` == the reference's ``-n`` recreate path, ``append``
== its re-run upsert path.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _have_iceberg(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.kg", None))
    except Exception:
        return False


class TableStore:
    """Named tables under a root directory (or an Iceberg catalog namespace)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.iceberg = _have_iceberg(spark)
        if not self.iceberg:
            os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"kg.db.{name}")
        p = self.path(name)
        return os.path.isdir(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS")) or any(
                f.endswith(".parquet") for f in os.listdir(p)
            )
        )

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(f"kg.db.{name}")
        return self.spark.read.parquet(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        if self.iceberg:
            w = df.writeTo(f"kg.db.{name}")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def drop(self, name: str) -> None:
        if self.iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS kg.db.{name}")
            return
        shutil.rmtree(self.path(name), ignore_errors=True)

    # --------------------------------------------------------------- markers
    def marker_path(self, name: str) -> str:
        return os.path.join(self.root, f"_{name}.COMPLETE.json")

    def write_marker(self, name: str, payload: dict) -> None:
        with open(self.marker_path(name), "w") as fh:
            json.dump(payload, fh, sort_keys=True)

    def read_marker(self, name: str) -> dict | None:
        p = self.marker_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def clear_marker(self, name: str) -> None:
        p = self.marker_path(name)
        if os.path.exists(p):
            os.remove(p)

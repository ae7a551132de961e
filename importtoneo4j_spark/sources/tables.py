"""Thin table-store abstraction: Iceberg when a catalog is configured,
parquet directories otherwise (no Iceberg jar in the sandbox — SURVEY.md §7
hard part 4).

Replaces the reference's embedded-Neo4j store handle
(VariantDatabase.java:84-93 startDatabase / Main.java:47-55 destructive
re-create): ``overwrite`` == the reference's ``-n`` recreate path, ``append``
== its re-run upsert path.

All filesystem access goes through the Hadoop FileSystem API resolved from
the path's scheme (file://, hdfs://, s3a://, ...) — never ``os.*`` — so the
same store works against local disks in tests and object stores on a
cluster. Markers are small JSON objects written through FSDataOutputStream.
"""

from __future__ import annotations

import json
import posixpath

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
            fs, hp = self._fs(root)
            fs.mkdirs(hp)

    # ------------------------------------------------------------- hadoop fs
    def _fs(self, path: str):
        """(FileSystem, Path) for ``path``, resolved by scheme — the
        cluster-safe replacement for os.path/os.listdir (VERDICT r1 §wrong 4:
        local-fs-only ``exists`` breaks under hdfs:///s3:// the moment the
        parquet fallback runs on a cluster)."""
        jvm = self.spark._jvm
        hp = jvm.org.apache.hadoop.fs.Path(path)
        fs = hp.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, hp

    def path(self, name: str) -> str:
        return posixpath.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"kg.db.{name}")
        fs, hp = self._fs(self.path(name))
        if not fs.exists(hp) or not fs.getFileStatus(hp).isDirectory():
            return False
        if fs.exists(self._fs(posixpath.join(self.path(name), "_SUCCESS"))[1]):
            return True
        for st in fs.listStatus(hp):
            if st.getPath().getName().endswith(".parquet"):
                return True
        return False

    def has_partition_dirs(self, name: str, col: str) -> bool:
        """True if the table directory contains ``col=...`` partition
        subdirectories — the fallback layout probe for markers written
        before the ``triples_layout`` key existed (ADVICE r3 medium): a
        legacy marker must never default to a pred-partitioned append onto
        what might be a flat/bucketed directory (silent mixed layout)."""
        if self.iceberg:
            return False
        fs, hp = self._fs(self.path(name))
        if not fs.exists(hp):
            return False
        prefix = f"{col}="
        for st in fs.listStatus(hp):
            if st.isDirectory() and st.getPath().getName().startswith(prefix):
                return True
        return False

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
                if partition_by:
                    from pyspark.sql.functions import col

                    w = w.partitionedBy(*[col(c) for c in partition_by])
                w.createOrReplace()
            else:
                # append inherits the existing table's partition spec; the
                # pipeline only appends to tables it has already created
                w.append()
            return
        if mode == "overwrite":
            # a plain overwrite invalidates any bucketed catalog entry for
            # this name (external table: metadata only, files are ours)
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog_name(name)}")
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def drop(self, name: str) -> None:
        if self.iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS kg.db.{name}")
            return
        self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog_name(name)}")
        fs, hp = self._fs(self.path(name))
        fs.delete(hp, True)

    def promote(self, src: str, dst: str) -> None:
        """Install a staged sibling table as ``dst`` by DIRECTORY RENAME
        instead of a second full write (round 6): the old read-modify-rewrite
        staging paid the table's bytes twice per update AND could tear the
        destination if the process died mid-rewrite (ADVICE r5 medium: a
        torn 'extracted' still passed exists() and a resumed append silently
        dropped rows). Rename is atomic on HDFS and local filesystems; if a
        crash lands between delete and rename the destination is MISSING —
        a loud failure the resume path falls back from — never torn. (On
        object stores without atomic rename, S3A implements rename as
        copy+delete; the loud-failure property still holds because the
        destination only appears after the copy completes.)"""
        if self.iceberg:
            # Iceberg staging is redundant (REPLACE TABLE is atomic); callers
            # use promote only on the parquet fallback. Mirror the semantics.
            self.spark.sql(
                f"CREATE OR REPLACE TABLE kg.db.{dst} AS SELECT * FROM kg.db.{src}"
            )
            self.spark.sql(f"DROP TABLE IF EXISTS kg.db.{src}")
            return
        self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog_name(dst)}")
        self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog_name(src)}")
        fs, dst_hp = self._fs(self.path(dst))
        fs.delete(dst_hp, True)
        _, src_hp = self._fs(self.path(src))
        if not fs.rename(src_hp, dst_hp):
            raise IOError(f"promote: rename {src} -> {dst} failed")

    def overwrite_partitions(
        self, df: DataFrame, name: str, partition_by: list[str]
    ) -> None:
        """Partition-scoped upsert (round 6, VERDICT r5 #4): rewrite ONLY the
        partition directories present in ``df``; untouched partitions keep
        their files byte-identical (contract-tested). Parquet: Spark's
        dynamic partitionOverwriteMode stages the job output and swaps just
        the matched partition dirs at commit. Iceberg: overwritePartitions.
        The caller must ensure ``df``'s lineage does not scan ``name``
        itself (checkpoint first) — V1 rejects overwriting a read path."""
        if self.iceberg:
            df.writeTo(f"kg.db.{name}").overwritePartitions()
            return
        conf = self.spark.conf
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = conf.get(key, "static")
        conf.set(key, "dynamic")
        try:
            w = df.write.mode("overwrite").partitionBy(*partition_by)
            w.parquet(self.path(name))
        finally:
            conf.set(key, prev)

    # ------------------------------------------------------------- bucketing
    def catalog_name(self, name: str) -> str:
        """Session-catalog table name for this store's root (bucket metadata
        lives in the catalog, not in parquet files)."""
        import hashlib

        tag = hashlib.md5(self.root.encode()).hexdigest()[:8]
        return f"kg_{tag}_{name}"

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sort_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> None:
        """Hash-bucketed table layout — the co-located-join analog of the
        reference's index-before-load (Main.java:69): two tables bucketed on
        the same key with the same bucket count join with NO shuffle on
        either side (asserted in tests/test_plans.py). Parquet directories
        cannot carry bucket metadata, so the table registers in the session
        catalog (Iceberg: bucket partition transform instead)."""
        if self.iceberg:
            # the contract tests caught the first drift here already:
            # functions.bucket moved to functions.partitioning in Spark 4
            from pyspark.sql.functions import col

            try:
                from pyspark.sql.functions.partitioning import bucket
            except ImportError:  # pre-4.0 location
                from pyspark.sql.functions import bucket

            w = df.writeTo(f"kg.db.{name}").partitionedBy(
                bucket(n_buckets, col(bucket_cols[0]))
            )
            w.createOrReplace()
            return
        w = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            w = w.sortBy(*sort_cols)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.option("path", self.path(name)).saveAsTable(self.catalog_name(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(f"kg.db.{name}")
        # prefer the catalog entry when one exists: that is where bucket
        # metadata lives (a path read of the same files works but loses the
        # shuffle-free join property)
        if self.spark.catalog.tableExists(self.catalog_name(name)):
            return self.spark.table(self.catalog_name(name))
        return self.spark.read.parquet(self.path(name))

    # --------------------------------------------------------------- markers
    def marker_path(self, name: str) -> str:
        return posixpath.join(self.root, f"_{name}.COMPLETE.json")

    def write_marker(self, name: str, payload: dict) -> None:
        fs, hp = self._fs(self.marker_path(name))
        out = fs.create(hp, True)
        try:
            out.write(bytearray(json.dumps(payload, sort_keys=True).encode("utf-8")))
        finally:
            out.close()

    def read_marker(self, name: str) -> dict | None:
        fs, hp = self._fs(self.marker_path(name))
        if not fs.exists(hp):
            return None
        jvm = self.spark._jvm
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(fs.open(hp), "UTF-8")
        )
        try:
            chunks = []
            while True:
                line = reader.readLine()
                if line is None:
                    break
                chunks.append(line)
        finally:
            reader.close()
        return json.loads("\n".join(chunks))

    def clear_marker(self, name: str) -> None:
        fs, hp = self._fs(self.marker_path(name))
        fs.delete(hp, False)

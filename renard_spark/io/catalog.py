"""Catalog abstraction: named stage tables.

On a production cluster this is an Iceberg catalog
(``spark.sql.catalog.<name>`` + ``df.writeTo(...).append()`` with
partition transforms on bucket(doc_id)); the sandbox has no Iceberg
jars, so the default implementation is parquet directories with the
identical API surface. Every stage table is written partitioned and can
be re-read by name — the checkpoint primitive behind stage resume.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              bucket_by: str | None = None, num_buckets: int = 0) -> None:
        w = df.write.mode(mode)
        # parquet-dir stand-in for Iceberg bucket(doc_id) partitioning:
        # repartition by the bucket key so file layout co-locates docs.
        if bucket_by and num_buckets:
            df = df.repartition(num_buckets, bucket_by)
            w = df.write.mode(mode)
        w.parquet(self.path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.exists(p):
            shutil.rmtree(p)


def get_catalog(spark: SparkSession, root: str) -> ParquetCatalog:
    """Future: return an IcebergCatalog when the session has one
    configured; parquet-dirs otherwise."""
    return ParquetCatalog(spark, root)

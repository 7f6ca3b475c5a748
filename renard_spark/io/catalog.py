"""Catalog abstraction: named stage tables.

Two implementations behind one API surface (write/read/exists/drop):

- ``IcebergCatalog`` — the production path (north_star names Iceberg):
  ``df.writeTo("catalog.db.table")`` with a ``bucket(N, doc_id)``
  partition transform, so stage tables are co-located by document and
  downstream doc-keyed joins prune to matching buckets. Selected when
  the session has a ``spark.sql.catalog.<name>`` configured (the
  sandbox has no Iceberg jars, so this branch is exercised only on a
  real cluster; its API parity with the fallback is unit-tested via
  the shared contract below).
- ``ParquetCatalog`` — parquet directories with the identical surface;
  ``bucket(doc_id)`` approximated by repartition on the bucket key.

Every stage table is written under a name and re-read by name — the
checkpoint primitive behind stage resume (reference ``rerun_from``,
core.py:737-780).
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


class BucketedCatalog:
    """Session-catalog stage tables written with TRUE Spark bucketing
    (``bucketBy(N, key).sortBy(key).saveAsTable``) — unlike the
    parquet-dir stand-in, the bucket metadata survives the write, so a
    downstream join or aggregation of two stage tables bucketed on the
    same key with the same bucket count runs with ZERO Exchange (plan-
    guarded in test_bucketed_catalog_join_has_no_exchange). This is the
    local-mode equivalent of Iceberg's ``bucket(N, doc_id)`` partition
    transform: co-location decided at write time, shuffles eliminated
    at read time.

    Tables are EXTERNAL: data lives under the workdir (``root``), the
    session catalog holds only metadata. Because the sandbox's
    in-memory catalog forgets metadata when the session ends, every
    write drops a ``_bucketspec.json`` sidecar (schema DDL + bucket
    spec) next to the data, and ``exists`` re-registers an orphaned
    table from it — so cross-session resume keeps BOTH the data and
    the zero-Exchange bucketing (re-registration is a metadata-only
    CREATE TABLE ... CLUSTERED BY ... LOCATION). ``prefix`` namespaces
    the session-catalog table names so concurrent runs don't collide.
    """

    def __init__(self, spark: SparkSession, root: str,
                 default_buckets: int = 8):
        self.spark = spark
        # root doubles as the StageRunner manifest directory
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.prefix = "".join(
            ch if ch.isalnum() else "_" for ch in root
        ).strip("_")
        self.default_buckets = default_buckets

    def path(self, name: str) -> str:
        return f"{self.prefix}__{name}"

    def _loc(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        import json

        if self.spark.catalog.tableExists(self.path(name)):
            return True
        loc = self._loc(name)
        spec_p = os.path.join(loc, "_bucketspec.json")
        if not (
            os.path.exists(spec_p)
            and os.path.exists(os.path.join(loc, "_SUCCESS"))
        ):
            return False
        # orphaned table from a previous session: metadata-only
        # re-registration, bucketing declared so joins stay
        # Exchange-free
        with open(spec_p) as f:
            spec = json.load(f)
        cluster = (
            f"CLUSTERED BY ({spec['key']}) SORTED BY ({spec['key']})"
            f" INTO {spec['n']} BUCKETS "
            if spec.get("key")
            else ""
        )
        self.spark.sql(
            f"CREATE TABLE {self.path(name)} ({spec['ddl']})"
            f" USING parquet {cluster}LOCATION '{loc}'"
        )
        return True

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              bucket_by: str | None = None, num_buckets: int = 0) -> None:
        import json
        import shutil as _sh

        ident = self.path(name)
        loc = self._loc(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {ident}")
        _sh.rmtree(loc, ignore_errors=True)
        key = bucket_by or ("doc_id" if "doc_id" in df.columns else None)
        n = num_buckets or self.default_buckets
        w = df.write.mode(mode).format("parquet")
        if key:
            w = w.bucketBy(n, key).sortBy(key)
        w.option("path", loc).saveAsTable(ident)
        ddl = df._jdf.schema().toDDL()
        with open(os.path.join(loc, "_bucketspec.json"), "w") as f:
            json.dump({"ddl": ddl, "key": key, "n": n}, f)

    def read(self, name: str) -> DataFrame:
        return self.spark.table(self.path(name))

    def drop(self, name: str) -> None:
        import shutil as _sh

        self.spark.sql(f"DROP TABLE IF EXISTS {self.path(name)}")
        _sh.rmtree(self._loc(name), ignore_errors=True)


class IcebergCatalog:
    """Iceberg-backed stage tables: same contract as ParquetCatalog.

    ``root`` is a namespace path ``catalog.db`` (e.g. ``stage.kg``);
    table identity is ``catalog.db.name``. Writes use the DataFrameV2
    API — ``createOrReplace`` for overwrite, ``append`` otherwise —
    with a ``bucket(num_buckets, bucket_by)`` partition transform when
    requested, which is the real co-location the parquet fallback only
    approximates.
    """

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = namespace
        catalog = namespace.split(".", 1)[0]
        db = namespace.split(".", 1)[1] if "." in namespace else "default"
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{db}")

    def path(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self.path(name))

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              bucket_by: str | None = None, num_buckets: int = 0) -> None:
        ident = self.path(name)
        w = df.writeTo(ident).using("iceberg")
        if bucket_by and num_buckets:
            from pyspark.sql import functions as F

            w = w.partitionedBy(F.bucket(num_buckets, bucket_by))
        if mode == "overwrite" or not self.exists(name):
            w.createOrReplace()
        else:
            df.writeTo(ident).append()

    def read(self, name: str) -> DataFrame:
        return self.spark.read.table(self.path(name))

    def drop(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.path(name)}")

    # -- streaming sink: idempotent per-micro-batch append ------------
    # Iceberg's snapshot model makes replay-safety a two-commit recipe:
    # DELETE any rows a previous (failed / replayed) attempt of this
    # batch wrote, then append the batch with its batch_id column —
    # both single atomic snapshot commits, so a crash between them
    # re-runs cleanly and rows are never duplicated. The three _raw
    # seams exist so the contract is unit-testable without Iceberg jars
    # (tests substitute a recording store; a real cluster hits Spark).

    def write_batch(self, name: str, df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        df = df.withColumn("batch_id", F.lit(int(batch_id)))
        if self.exists(name):
            self._raw_sql(
                f"DELETE FROM {self.path(name)}"
                f" WHERE batch_id = {int(batch_id)}"
            )
            self._raw_append(name, df)
        else:
            self._raw_create(name, df)

    def _raw_sql(self, q: str) -> None:
        self.spark.sql(q)

    def _raw_append(self, name: str, df: DataFrame) -> None:
        df.writeTo(self.path(name)).append()

    def _raw_create(self, name: str, df: DataFrame) -> None:
        df.writeTo(self.path(name)).using("iceberg").createOrReplace()


def get_catalog(
    spark: SparkSession, root: str
) -> ParquetCatalog | BucketedCatalog | IcebergCatalog:
    """Dispatch on the session config: a ``root`` of the form
    ``catalog.db`` whose catalog has a ``spark.sql.catalog.<catalog>``
    implementation configured gets the Iceberg catalog; a
    ``bucketed:/path`` root gets the true-bucketing session-catalog
    backend (shuffle-free doc_id joins between stage tables);
    filesystem paths (or unconfigured names) fall back to parquet
    directories with the identical API."""
    if root.startswith("bucketed:"):
        return BucketedCatalog(spark, root.split(":", 1)[1])
    if "/" not in root and not root.startswith("."):
        cat = root.split(".", 1)[0]
        impl = spark.conf.get(f"spark.sql.catalog.{cat}", None)
        if impl:
            return IcebergCatalog(spark, root)
    return ParquetCatalog(spark, root)

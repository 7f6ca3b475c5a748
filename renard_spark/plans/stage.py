"""Stage registry: dataflow validation, checkpointed materialization,
resume, per-partition metrics.

The Spark analog of the reference's pipeline framework:
- ``check_valid`` — needs/production dataflow check before running
  (reference core.py:643-693), here against the set of materialized /
  to-be-produced table names;
- stage boundary = a persisted catalog table + a manifest entry with a
  config hash (reference ``rerun_from``, core.py:737-780: the engine
  resumes from the last stage whose manifest entry is still valid);
- per-partition metrics (north_rule): after each materialization, a
  metrics table rows (stage, partition_id, rows, docs, wall_ms) is
  appended, computed on the *written* table so it reflects the real
  physical layout.

No driver-side document loops anywhere: a "stage" is one DataFrame
expression; the runner only sequences materializations.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from renard_spark.io.catalog import ParquetCatalog


@dataclass
class Stage:
    name: str
    needs: list[str]
    fn: Callable[..., DataFrame]  # (spark, catalog-tables...) -> DataFrame
    config: dict = field(default_factory=dict)

    def config_hash(self) -> str:
        payload = json.dumps(
            {"name": self.name, "needs": self.needs, "config": self.config},
            sort_keys=True,
        )
        return hashlib.md5(payload.encode()).hexdigest()


class StageRunner:
    METRICS_TABLE = "_metrics"

    def __init__(self, spark: SparkSession, catalog: ParquetCatalog,
                 inputs: dict[str, DataFrame] | None = None):
        self.spark = spark
        self.catalog = catalog
        self.inputs = inputs or {}
        self.stages: list[Stage] = []

    # -- registry ---------------------------------------------------
    def add(self, name: str, needs: list[str], fn: Callable,
            config: dict | None = None) -> None:
        self.stages.append(Stage(name, list(needs), fn, config or {}))

    def check_valid(self) -> None:
        """Dataflow check: every stage's needs must be produced by an
        earlier stage or supplied as an input (reference check_valid,
        core.py:643-693)."""
        available = set(self.inputs)
        for st in self.stages:
            missing = [n for n in st.needs if n not in available]
            if missing:
                raise ValueError(
                    f"stage '{st.name}' needs {missing}; available: "
                    f"{sorted(available)}"
                )
            available.add(st.name)

    # -- manifest ---------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.catalog.root, "_manifest.json")

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {}

    def _save_manifest(self, m: dict) -> None:
        with open(self._manifest_path, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)

    # -- execution --------------------------------------------------
    def _resolve(self, name: str) -> DataFrame:
        if self.catalog.exists(name):
            return self.catalog.read(name)
        if name in self.inputs:
            return self.inputs[name]
        raise KeyError(name)

    def _write_metrics(self, stage: str, wall_ms: float) -> None:
        df = self.catalog.read(stage)
        doc_col = "doc_id" if "doc_id" in df.columns else None
        agg = [F.count(F.lit(1)).alias("rows")]
        if doc_col:
            agg.append(F.approx_count_distinct(doc_col).alias("docs"))
        else:
            agg.append(F.lit(None).cast("long").alias("docs"))
        metrics = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(*agg)
            .select(
                F.lit(stage).alias("stage"),
                "partition_id",
                "rows",
                "docs",
                F.lit(float(wall_ms)).alias("wall_ms"),
            )
        )
        mode = "append" if self.catalog.exists(self.METRICS_TABLE) else "overwrite"
        self.catalog.write(self.METRICS_TABLE, metrics, mode=mode)

    def run(self, rerun_from: str | None = None,
            force: bool = False,
            ignored_stages: set[str] | None = None) -> dict[str, DataFrame]:
        """Materialize every stage in order. A stage is SKIPPED (read
        from its checkpoint) when its table exists and its manifest
        config-hash matches — unless it appears at/after ``rerun_from``
        or ``force``. ``ignored_stages`` drops stages entirely (the
        reference's ignored_steps, core.py:608-641) — downstream stages
        must not need them (check_valid enforces it). Returns
        {stage: DataFrame(read back)}."""
        if ignored_stages:
            self.stages = [s for s in self.stages if s.name not in ignored_stages]
        self.check_valid()
        manifest = self._load_manifest()
        out: dict[str, DataFrame] = {}
        invalidated = force
        for st in self.stages:
            if rerun_from is not None and st.name == rerun_from:
                invalidated = True
            h = st.config_hash()
            entry = manifest.get(st.name)
            fresh = (
                not invalidated
                and entry is not None
                and entry.get("config_hash") == h
                and self.catalog.exists(st.name)
            )
            if fresh:
                out[st.name] = self.catalog.read(st.name)
                continue
            # stale stage invalidates everything downstream
            invalidated = True
            deps = [out[n] if n in out else self._resolve(n) for n in st.needs]
            t0 = time.perf_counter()
            # config is hash-only metadata; stage fns close over params
            df = st.fn(self.spark, *deps)
            # bucketed-by-doc layout (Iceberg bucket(doc_id) analog):
            # downstream per-doc stages co-locate on read
            if "doc_id" in df.columns:
                self.catalog.write(
                    st.name, df, bucket_by="doc_id",
                    num_buckets=self.spark.sparkContext.defaultParallelism,
                )
            else:
                self.catalog.write(st.name, df)
            wall_ms = (time.perf_counter() - t0) * 1000
            self._write_metrics(st.name, wall_ms)
            manifest[st.name] = {
                "config_hash": h,
                "wall_ms": round(wall_ms, 1),
                "finished_at": time.time(),
            }
            self._save_manifest(manifest)
            out[st.name] = self.catalog.read(st.name)
        return out

    def metrics(self) -> DataFrame:
        return self.catalog.read(self.METRICS_TABLE)


def salted_repartition(df: DataFrame, key: str, num_partitions: int,
                       salt_buckets: int = 8) -> DataFrame:
    """Explicit skew taming (north_rule): spread hot keys over
    ``salt_buckets`` partitions for map-side stages. Use before heavy
    narrow transforms keyed by doc when a few giant documents dominate;
    aggregations must re-shuffle on the bare key afterwards."""
    return df.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    ).repartition(num_partitions, F.col(key), F.col("_salt")).drop("_salt")

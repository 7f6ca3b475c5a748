"""Incremental document ingest — Structured Streaming → stage tables.

The reference has no streaming semantics (SURVEY §2.9); its "dynamic
networks" are positional batch windows. What *is* genuinely streaming
at 10^12-doc scale is ingest: new interleaved documents appended to the
input table should flow through the per-document pipeline without
recomputing the corpus. Because every KG stage is doc-local (tokens,
entities, unification, edges, triples are all keyed by doc_id), a
``foreachBatch`` append of each micro-batch's stage outputs is exactly
equivalent to a batch run over the union — no watermark or cross-batch
state is needed. Cross-document stages (global entity tables via
operators.unify_scale) are periodic batch jobs over the accumulated
stage tables, not stream operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from renard_spark.corpus import DOCUMENTS_SCHEMA
from renard_spark.io.catalog import get_catalog


def stream_documents(
    spark: SparkSession, input_path: str, schema=DOCUMENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_path)


def run_incremental(
    stream_df: DataFrame,
    workdir: str,
    checkpoint: str,
    gazetteer: list[str] | None = None,
    dist: tuple[int, str] = (1, "sentences"),
    available_now: bool = True,
    tables: tuple[str, ...] = ("tokens", "entities", "unified_mentions",
                               "edges", "triples", "lineage"),
):
    """Start the incremental pipeline; returns the StreamingQuery.

    Each micro-batch runs the full doc-local pipeline and APPENDS its
    stage outputs to the catalog tables (the same tables the batch
    StageRunner writes), so batch and streaming runs are
    interchangeable consumers.
    """
    from renard_spark.pipeline import character_graph_pipeline

    spark = stream_df.sparkSession
    catalog = get_catalog(spark, workdir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = character_graph_pipeline(
            batch_df, gazetteer=gazetteer, dist=dist, persist=False
        )
        for name in tables:
            mode = "append" if catalog.exists(name) else "overwrite"
            catalog.write(name, out[name], mode=mode)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Incremental dedup-index maintenance over micro-batches.

``streaming/events.stream_exact_dedup`` passes FIRST-SEEN documents
through (order-dependent — correct as an online filter, but its
survivor set depends on batch arrival order). This module maintains
the dedup INDEX itself as versioned state with a commutative-monoid
merge — (min keep_id, sum n) per fingerprint — so the final state
version equals the batch dedup of the full corpus REGARDLESS of how
the stream was split into micro-batches. That order-independence is
what lets the streaming run sit behind the same value-hash gate as
the batch ``exact_dedup`` oracle (q:stream_dedup).

State layout: ``<workdir>/state/version=N`` parquet per micro-batch,
idempotent (overwrite + ``_SUCCESS`` skip — a replayed batch recomputes
the identical state from version N-1). At 10^12-doc scale the state is
a fingerprint-bucketed Iceberg table and the merge is one fp-keyed
groupBy per batch — never a scan of prior document text.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_fingerprints(
    batch_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fp, keep_id, n) for ONE micro-batch — min id and count per
    md5 fingerprint (the monoid elements)."""
    return (
        batch_df.select(
            F.md5(F.col(text_col)).alias("fp"),
            F.col(id_col).cast("long").alias("keep_id"),
        )
        .groupBy("fp")
        .agg(
            F.min("keep_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def merge_dedup_state(prev: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Monoid merge: min(keep_id), sum(n) per fp — commutative and
    associative, so any batch split/order yields the same fixpoint."""
    if prev is None:
        return batch
    return (
        prev.unionByName(batch)
        .groupBy("fp")
        .agg(F.min("keep_id").alias("keep_id"), F.sum("n").alias("n"))
    )


def run_incremental_dedup(
    spark,
    stream_df: DataFrame,
    workdir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    await_sec: int = 300,
) -> DataFrame:
    """Drive ``stream_df`` through foreachBatch, maintaining the
    versioned dedup state; returns the FINAL state (fp, keep_id, n)."""
    state_dir = os.path.join(workdir, "state")
    ckpt = os.path.join(workdir, "ckpt")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = os.path.join(state_dir, f"version={batch_id}")
        if os.path.exists(os.path.join(part, "_SUCCESS")):
            return
        prev_part = os.path.join(state_dir, f"version={batch_id - 1}")
        prev = (
            spark.read.parquet(prev_part)
            if os.path.exists(os.path.join(prev_part, "_SUCCESS"))
            else None
        )
        merged = merge_dedup_state(
            prev, batch_fingerprints(batch_df, id_col, text_col)
        )
        merged.write.mode("overwrite").parquet(part)

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_sec):
        # timeout with the query still running: reading state now
        # would return a partial version — fail loudly instead
        q.stop()
        raise TimeoutError(
            f"incremental dedup still running after {await_sec}s"
        )
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("version=")
    ]
    return spark.read.parquet(
        os.path.join(state_dir, f"version={max(versions)}")
    )

"""Table-maintenance planning — the lakehouse operations a
10^12-document Iceberg corpus needs continuously: small-file
compaction grouping (the OPTIMIZE planner's core), computed as plain
DataFrame arithmetic over the file-metadata table (file metadata is
~10^6 rows per partition even at 100 TB — window-sized, never
data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_groups(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part_key",
    id_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """Assign every file to a compaction group per partition →
    (part_col, id_col, size_col, group_id): next-fit sequential
    packing in file-id order — a file joins the group where its
    cumulative start offset falls, so groups approximate
    ``target_bytes`` and the assignment is a pure function of the
    table (deterministic across layouts/engines, unlike greedy
    first-fit-decreasing whose bins depend on iteration order).

    ONE partition-keyed window cumsum over file *metadata* rows.
    Oversized single files get a group of their own by construction
    (their start offset opens a fresh bin for the next file).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(size_col).over(w)
    return files.select(
        part_col, id_col, size_col,
        F.floor((cum - F.col(size_col)) / F.lit(target_bytes))
        .cast("long")
        .alias("group_id"),
    )


def skew_stats(
    df: DataFrame,
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """Join-key skew diagnostic → the top-``k`` hottest keys as
    (key_val, n, share): the table you read before deciding to salt or
    broadcast. One groupBy on the key (map-side combined — the whole
    point is that hot keys partially aggregate before the shuffle), a
    1-row total broadcast-crossed in, then a deterministic
    orderBy(n desc, key).limit(k) — Spark executes sort+limit as
    distributed per-partition top-k merged on the driver (TakeOrdered),
    so there is NO single-partition global window even with billions of
    distinct keys. The key surfaces as a string so the diagnostic works
    over any key type; consumers read rank off the sort order.
    """
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key_val")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key_val", "n",
            (F.col("n").cast("double") / F.col("_tot")).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col("key_val").asc())
        .limit(k)
    )

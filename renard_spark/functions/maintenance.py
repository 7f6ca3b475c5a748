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


def zorder_key(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 16,
    out: str = "zkey",
) -> DataFrame:
    """Add a Z-order (Morton) interleaved key over two non-negative
    integer dimensions → the multi-dimensional clustering key for
    lakehouse data skipping (Iceberg/Delta OPTIMIZE ZORDER BY —
    public technique; Morton 1966): sorting by ``zkey`` co-locates
    rows close in BOTH dimensions, so min/max file statistics prune
    scans filtered on either one.

    Fully narrow, pure integer arithmetic: bit i of x lands at
    position 2i, bit i of y at 2i+1, computed as a sum of
    ``(x div 2^i mod 2) * 4^i`` terms with the powers inlined as
    Python-side literal constants — no bit-shift builtins, so the
    expression is portable to any ANSI engine (the DuckDB oracle uses
    the same generated arithmetic) and every value is exact (bits <=
    31 keeps 2*bits within long range). Inputs must already be
    clamped to [0, 2^bits); values outside corrupt the interleave and
    raise at runtime via the CASE guard.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    lim = 1 << bits
    x, y = F.col(xcol).cast("long"), F.col(ycol).cast("long")
    terms = []
    for i in range(bits):
        p2, p4 = 1 << i, 1 << (2 * i)
        terms.append((x / F.lit(p2)).cast("long") % 2 * F.lit(p4))
        terms.append((y / F.lit(p2)).cast("long") % 2 * F.lit(2 * p4))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    guard = (
        (x >= 0) & (x < lim) & (y >= 0) & (y < lim)
    )
    return df.withColumn(
        out,
        F.when(guard, z).otherwise(
            F.raise_error(
                F.lit(f"zorder_key input outside [0, {lim})")
            ).cast("long")
        ),
    )


def zorder_key_sql(xexpr: str, yexpr: str, bits: int = 16) -> str:
    """The SAME generated Morton arithmetic as a SQL expression string
    — shared by the DuckDB oracle so both engines compute the key
    from one code path."""
    terms = []
    for i in range(bits):
        p2, p4 = 1 << i, 1 << (2 * i)
        terms.append(f"(({xexpr}) // {p2} % 2) * {p4}")
        terms.append(f"(({yexpr}) // {p2} % 2) * {2 * p4}")
    return " + ".join(terms)

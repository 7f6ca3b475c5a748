"""Column profiling — the data-quality summary table warehouses run
before trusting a new drop: per-column row count, null count, exact
distinct count, and min/max rendered as strings.

One aggregation pass produces every statistic: the multi-distinct agg
compiles to Spark's Expand operator (one shuffle carrying a
column-tagged replica per distinct spec — map-side partials intact),
then a zero-shuffle ``stack`` unpivots the single stats row into one
row per column. Nothing touches the driver but the final tiny table.

min/max are cast to string AFTER the typed aggregation, so numeric
columns order numerically, and engine-specific float formatting only
matters if a profiled column is floating-point (callers gating a
cross-engine comparison should profile integral/string columns, or
drop the min/max fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """→ (column, n, n_null, n_distinct, min_val, max_val), one row per
    profiled column. ``n`` is the table row count (repeated per row so
    each profile row is self-contained), ``n_distinct`` is exact and
    excludes NULLs (COUNT(DISTINCT col) semantics on every engine)."""
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"_nn_{i}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"_nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{i}"),
        ]
    stats = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col(f"_nn_{i}"),
            F.col(f"_nd_{i}"),
            F.col(f"_mn_{i}"),
            F.col(f"_mx_{i}"),
        ]
    return stats.select(
        "_n",
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("col_name", "n_notnull", "n_distinct", "min_val", "max_val"),
    ).select(
        "col_name",
        F.col("_n").alias("n"),
        (F.col("_n") - F.col("n_notnull")).cast("long").alias("n_null"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def dq_summary(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    accepted: dict[str, list] | None = None,
    ranges: dict[str, tuple] | None = None,
) -> DataFrame:
    """dbt-style data-quality expectations → (check, col_name, n_bad),
    one row per declared rule with its violation count — the gate
    table a pipeline asserts on (all n_bad == 0) before publishing.

    Checks: ``not_null`` (NULL rows), ``unique`` (excess rows beyond
    one per distinct non-NULL value — exact, COUNT(col) −
    COUNT(DISTINCT col)), ``accepted`` (non-NULL values outside the
    allowed list), ``ranges`` (non-NULL values outside [lo, hi]).

    Every rule is ONE conditional aggregate in a single pass over the
    table (the distinct counts ride Spark's Expand, partials map-side),
    unpivoted with stack — same zero-driver shape as profile_table.
    """
    rules = []  # (check, col, agg_expr)
    for c in not_null or []:
        rules.append(
            ("not_null", c,
             F.count_if(F.col(c).isNull()).cast("long"))
        )
    for c in unique or []:
        rules.append(
            ("unique", c,
             (F.count(F.col(c)) - F.count_distinct(F.col(c)))
             .cast("long"))
        )
    for c, vals in (accepted or {}).items():
        rules.append(
            ("accepted_values", c,
             F.count_if(
                 F.col(c).isNotNull() & ~F.col(c).isin(list(vals))
             ).cast("long"))
        )
    for c, (lo, hi) in (ranges or {}).items():
        rules.append(
            ("range", c,
             F.count_if(
                 F.col(c).isNotNull()
                 & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)))
             ).cast("long"))
        )
    if not rules:
        raise ValueError("no rules declared")
    missing = [c for _, c, _ in rules if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    stats = df.agg(
        *[e.alias(f"_r{i}") for i, (_, _, e) in enumerate(rules)]
    )
    args = []
    for i, (check, c, _) in enumerate(rules):
        args += [F.lit(check), F.lit(c), F.col(f"_r{i}")]
    return stats.select(
        F.stack(F.lit(len(rules)), *args).alias(
            "check", "col_name", "n_bad"
        )
    )


def profile_diff(
    old: DataFrame, new: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Snapshot drift report → one row per column present in either
    profile: (col_name, then each profile stat as _old/_new pairs,
    drifted flag). The schema-drift / stats-drift gate between two
    drops of the same table — NULL on one side means the column
    appeared or vanished (always drifted). Composes two
    ``profile_table`` passes + one tiny full-outer join on col_name.
    """
    po = profile_table(old, columns)
    pn = profile_table(new, columns)
    stats = ["n", "n_null", "n_distinct", "min_val", "max_val"]
    po = po.select(
        "col_name", *[F.col(s).alias(f"{s}_old") for s in stats]
    )
    pn = pn.select(
        "col_name", *[F.col(s).alias(f"{s}_new") for s in stats]
    )
    j = po.join(pn, "col_name", "full_outer")
    drift = F.lit(False)
    for s in stats:
        drift = drift | ~F.col(f"{s}_old").eqNullSafe(F.col(f"{s}_new"))
    cols = ["col_name"]
    for s in stats:
        cols += [f"{s}_old", f"{s}_new"]
    return j.select(*cols, drift.alias("drifted"))


def k_anonymity(
    df: DataFrame,
    quasi: list[str],
    sensitive: str | None = None,
) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney IJUFKS 2002; Machanavajjhala
    et al. ICDE 2006) over a quasi-identifier column set — the privacy
    gate a curation pipeline runs before releasing a table: every row
    must be indistinguishable from >= k-1 others on the quasi columns,
    and (l-diversity) each equivalence class must contain >= l distinct
    values of the sensitive attribute.

    → one row per equivalence class: the quasi columns, ``k`` (class
    size), ``l`` (distinct sensitive values in the class; 0 when no
    sensitive column is given), and ``risk`` = round(1/k, 6) — the
    worst-case re-identification probability for rows in the class.

    Scale shape: ONE hash aggregation on the quasi keys (count +
    count distinct are both partial-aggregable), no windows, no joins.
    The output is one row per CLASS, not per input row — at 10^12 rows
    the audit table is as small as the generalization is coarse, and a
    `min(k)` over it is the single number the release gate checks.
    """
    if not quasi:
        raise ValueError("k_anonymity needs >= 1 quasi-identifier column")
    aggs = [F.count(F.lit(1)).alias("k")]
    if sensitive is not None:
        aggs.append(F.countDistinct(F.col(sensitive)).alias("l"))
    out = df.groupBy(*[F.col(c) for c in quasi]).agg(*aggs)
    if sensitive is None:
        out = out.withColumn("l", F.lit(0).cast("long"))
    return out.select(
        *quasi, "k", "l",
        F.round(F.lit(1.0) / F.col("k"), 6).alias("risk"),
    )

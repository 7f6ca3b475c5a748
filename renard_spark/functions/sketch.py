"""Mergeable frequency/cardinality sketches, deterministic across
engines.

Both sketches hash with md5 (not Spark's internal xxhash / DuckDB's
internal HLL), so every register value is reproducible bit-for-bit in
ANY engine — the property that makes the driver's DuckDB value-hash
gate possible, and that production systems want anyway when sketches
are persisted and merged across jobs written in different stacks.

Scale shape: both are one explode + one groupBy over bounded register
space (d·w cells / m registers per group) — the classic
sublinear-state summaries for 100 TB streams. Registers are plain
rows, so merging two corpora's sketches is a union + max/sum groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from renard_spark.operators.tokenize import TOKEN_RE


def _toks(text_col: str):
    return F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0)


def _h(prefix, col, mod: int):
    """Deterministic hash → [0, mod): first 8 md5 hex chars of
    '<prefix>:<value>' as an integer. Identical in DuckDB:
    conv-free — both engines parse hex via their conv/from_hex."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws(":", prefix, col)), 1, 8), 16, 10)
        .cast("long") % mod
    )


def count_min(
    docs: DataFrame, d: int = 4, w: int = 256, text_col: str = "text",
) -> DataFrame:
    """Count-min sketch of corpus token frequencies → the (row, col,
    c) register table, d rows × w columns. One explode + ONE groupBy
    over ≤ d·w cells; estimates come from ``cms_estimate``."""
    toks = docs.select(F.explode(_toks(text_col)).alias("tok")).select(
        F.lower("tok").alias("tok")
    )
    rows = toks.select(
        "tok",
        F.explode(
            F.array(*[F.lit(i) for i in range(d)])
        ).alias("row"),
    )
    return (
        rows.select("row", _h(F.col("row").cast("string"), F.col("tok"), w).alias("col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, d: int = 4, w: int = 256,
    token_col: str = "token",
) -> DataFrame:
    """Point-query the count-min register table for each probe token →
    (token, cms_est). est = min over the d rows of the addressed cell
    (the standard upward-biased CM estimate; cells never collide to
    undercount). Probe table joins the ≤ d·w register table — the
    register side is broadcastable by construction."""
    probe_cells = probes.select(
        token_col,
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row"),
    ).select(
        token_col,
        "row",
        _h(F.col("row").cast("string"), F.lower(F.col(token_col)), w).alias(
            "col"
        ),
    )
    j = probe_cells.join(F.broadcast(cms), ["row", "col"], "left").select(
        token_col, F.coalesce("c", F.lit(0)).alias("c")
    )
    return j.groupBy(token_col).agg(F.min("c").alias("cms_est"))


def hll_registers(
    docs: DataFrame, p: int = 8, group_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic HyperLogLog registers over distinct tokens →
    (grp?, bucket, rho): bucket = md5-hash mod m (m = 2^p), rho =
    leading-zero count + 1 of a second 32-bit md5-derived hash,
    computed EXACTLY via integer binary-string length (length(bin(v))
    = floor(log2 v)+1 — no float log, no engine drift)."""
    m = 1 << p
    toks = docs.select(
        *([F.col(group_col).alias("grp")] if group_col else []),
        F.explode(_toks(text_col)).alias("tok"),
    ).select(
        *(["grp"] if group_col else []), F.lower("tok").alias("tok")
    )
    v = (
        F.conv(F.substring(F.md5(F.concat(F.lit("hllv:"), F.col("tok"))), 1, 8), 16, 10)
        .cast("long")
    )
    # rho: leading zeros in the 32-bit value, +1. length(bin(v)) is the
    # exact bit length; v == 0 (prob 2^-32) pins rho to 33.
    rho = F.when(v == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(v, 10, 2))
    )
    reg = toks.select(
        *(["grp"] if group_col else []),
        _h(F.lit("hllb"), F.col("tok"), m).alias("bucket"),
        rho.alias("rho"),
    )
    keys = (["grp"] if group_col else []) + ["bucket"]
    return reg.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, p: int = 8, group_col: str | None = None,
) -> DataFrame:
    """Cardinality estimate from HLL registers → (grp?, hll_est):
    alpha·m²/Σ2^(-rho) with empty buckets contributing 2^0 and the
    standard linear-counting small-range correction (both branches
    deterministic — the register table is identical across engines)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    keys = [F.col("grp")] if group_col else []
    agg = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
        F.count("*").alias("nb"),
    )
    s_full = F.col("s") + (F.lit(m) - F.col("nb"))  # absent buckets: 2^0
    raw = F.lit(alpha * m * m) / s_full
    zeros = F.lit(m) - F.col("nb")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *(["grp"] if group_col else []), est.alias("hll_est")
    )


def bloom_bits(
    keys: DataFrame, m: int = 4096, k: int = 3, key_col: str = "key",
) -> DataFrame:
    """Bloom-filter register table over a key set → (pos) distinct set
    bit positions, pos = md5('<i>:<key>') mod m for i in 0..k-1.

    The mergeable seen-set summary an ingest pipeline keeps per
    partition/day: merging two corpora's filters is union+distinct of
    ≤ m rows each; membership never false-negatives, false-positives
    at the standard (1−e^{−kn/m})^k rate. Rows (not a packed bitmap)
    so the table unions/joins like every other sketch here and the
    DuckDB oracle reproduces it bit-for-bit."""
    h = keys.select(
        F.col(key_col).alias("_k"),
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
    )
    return h.select(
        _h(F.col("i").cast("string"), F.col("_k"), m).alias("pos")
    ).distinct()


def bloom_contains(
    bits: DataFrame, probes: DataFrame, m: int = 4096, k: int = 3,
    key_col: str = "key",
) -> DataFrame:
    """Membership probe → (<key_col>, in_bloom): 1 iff ALL k positions
    of the key are set. The ≤ m-row register side broadcasts; the probe
    side stays partitioned — one equi-join + one groupBy, never a scan
    of the filter per probe."""
    pc = probes.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
    ).select(
        key_col,
        _h(F.col("i").cast("string"), F.col(key_col), m).alias("pos"),
    )
    j = pc.join(
        F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left"
    )
    return j.groupBy(key_col).agg(
        F.min(F.coalesce("_hit", F.lit(0))).cast("long").alias("in_bloom")
    )


def hist_registers(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed-width histogram sketch → (*group_cols, bin, c) register
    table, the quantile member of the register-row sketch family
    (count-min / HLL / Bloom): one groupBy over ≤ nbins cells per
    group, mergeable by union + sum, every register reproducible
    bit-for-bit in any engine (plain float arithmetic, no internal
    hash). Values outside [lo, hi) clamp to the edge bins — the
    declared-range tradeoff that keeps state bounded on 100 TB
    streams."""
    width = (hi - lo) / nbins
    b = (
        F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(nbins - 1),
        )
        .cast("int")
        .alias("bin")
    )
    return df.groupBy(*group_cols, b).agg(F.count("*").alias("c"))


def hist_quantiles(
    registers: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantile estimates from a histogram register table:
    est(q) = upper edge of the first bin whose cumulative count
    reaches q·N (conservative: exact value ≤ est, error ≤ one bin
    width). → (*group_cols, q, est, n). One cumulative window per
    group (bin-ordered, ≤ nbins rows per group) + one aggregation —
    never a per-value sort, which is the point of the sketch at
    corpus scale."""
    from pyspark.sql import Window

    width = (hi - lo) / nbins
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = registers.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy(*group_cols))
    )
    qlit = F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
    qq = cum.select(*group_cols, "bin", "cum", "n", qlit)
    return (
        qq.groupBy(*group_cols, "q")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.col("q") * F.col("n"), F.col("bin")
                )
            ).alias("_b"),
            F.max("n").alias("n"),
        )
        .select(
            *group_cols,
            "q",
            (F.lit(lo) + (F.col("_b") + 1) * F.lit(width)).alias("est"),
            F.col("n").cast("long").alias("n"),
        )
    )

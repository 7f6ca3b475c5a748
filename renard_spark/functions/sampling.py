"""Deterministic sampling over document tables — training-data ops.

A 10^12-doc pipeline subsamples constantly (ablation corpora, eval
holdouts, per-language/per-source mixing quotas). ``df.sample`` is the
wrong tool at that scale: its RNG draw depends on partition layout, so
the SAME table sampled on two cluster sizes (or re-read after
compaction) yields DIFFERENT rows. Hash-based sampling keys the
decision to row identity alone:

- ``sample_by_hash``: Bernoulli(frac) by the md5 of (salt, key) —
  narrow (zero shuffle, pipelineable into the scan), reproducible on
  any cluster, and exactly mirrorable in any engine with md5. The
  fixed-width lowercase-hex prefix compares lexicographically exactly
  as its numeric value, so the filter is a plain string comparison —
  no 64-bit hex-to-int conversion quirks between engines.
- ``stratified_quota``: at most n rows per group, chosen by hash rank
  (one shuffle keyed by the group column — AQE handles group skew);
  the per-(salt,group) quota is a deterministic function of the table,
  so mixing recipes are replayable bit-for-bit.

Salts partition the hash space: disjoint uses (sample vs holdout)
must use different salts, the same use must reuse one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from renard_spark.operators.tokenize import TOKEN_RE as _TOKEN_RE_LIT

HEX_W = 8  # 32 bits of hash — plenty for a sampling decision


def hash_frac_bound(frac: float) -> str:
    """The HEX_W-digit lowercase-hex bound b such that
    P[md5-prefix < b] == frac (up to 2^-32)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    return format(min(int(frac * 16**HEX_W), 16**HEX_W - 1), f"0{HEX_W}x")


def _key_hash(key_col: str, salt: str):
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        1, HEX_W,
    )


def sample_by_hash(
    df: DataFrame, frac: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(frac) sample: keep rows whose hash
    prefix falls below the frac bound. Narrow — survives any
    repartition/cluster-size change with an identical result set."""
    return df.filter(_key_hash(key_col, salt) < F.lit(hash_frac_bound(frac)))


def stratified_quota(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """At most ``n`` rows per ``group_col`` value, selected by hash
    rank (ties broken by the key itself, so the pick is total-ordered
    and engine-independent). One shuffle keyed by the group column."""
    w = Window.partitionBy(group_col).orderBy("_h", key_col)
    return (
        df.withColumn("_h", _key_hash(key_col, salt))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n)
        .drop("_h", "_r")
    )


def hash_split(
    df: DataFrame,
    fracs: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint-and-exhaustive split assignment →
    ``df`` + ``out_col`` label column (the train/val/test partitioner
    of a training pipeline). Labels are assigned by consecutive hash
    ranges in the given dict order, so every row lands in exactly one
    split, membership is a pure function of (salt, key) — stable
    across cluster sizes, repartitions, and engines — and fractions
    are honored to 2^-32. The last label absorbs the remainder, so
    fracs must sum to 1 (±1e-9). Narrow: zero shuffle."""
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fracs must sum to 1, got {total}")
    labels = list(fracs)
    h = _key_hash(key_col, salt)
    expr = F.lit(labels[-1])
    cum = 0.0
    bounds = []
    for name in labels[:-1]:
        cum += fracs[name]
        bounds.append((name, hash_frac_bound(cum)))
    for name, bound in reversed(bounds):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def apply_mixture(
    docs: DataFrame,
    rates: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    rate_col: str = "rate",
    salt: str = "",
) -> DataFrame:
    """Materialize per-group mixture rates as a deterministic
    downsample: keep each group's rows with probability ``rate``
    (hash-Bernoulli keyed to row identity — partition-layout- and
    engine-invariant like :func:`sample_by_hash`). ``rates``:
    (group_col, rate in [0, 1]), slice-count-sized → broadcast join.
    The decision compares the 32-bit md5 integer against
    floor(round(rate, 6) · 2³²) — an INTEGER bound, so the keep set is
    bit-stable across engines given the same 6-decimal rate."""
    bound = F.floor(
        F.round(F.col(rate_col), 6) * F.lit(float(1 << 32))
    ).cast("long")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
                1, HEX_W,
            ),
            16, 10,
        ).cast("long")
    )
    return (
        docs.join(F.broadcast(rates), group_col)
        .filter(h < bound)
        .drop(rate_col)
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    group_col: str | None = None,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement — priority
    sampling (Duffield, Lund, Thorup, JACM 2007): each row draws a
    md5-keyed uniform u ∈ (0,1] and gets priority w/u; the top-n
    priorities (per ``group_col`` when given) are the sample.
    Heavy rows are near-certain picks (w ≥ threshold ⇒ kept),
    light rows enter with probability ∝ w — the standard primitive
    for quality- or length-weighted corpus subsetting with unbiased
    subset-sum estimates.

    Exactness contract: u = (h+1)/2³² with h the 8-hex md5 prefix —
    both the sum and the power-of-two division are EXACT in doubles —
    and priority = w/u is ONE correctly-rounded IEEE division, so
    priorities are bit-identical in Spark, Python, and DuckDB (no
    ln/pow, whose libm implementations differ in final ulps). Ties
    (only possible via md5-prefix collisions) break by the key.
    Grouped: one shuffle on ``group_col``. Ungrouped: TakeOrdered
    (per-partition top-n, merged at the driver — n rows, never a
    single-partition global window).

    → input rows + ``priority``, at most n per group (or n total).
    """
    u = (
        F.conv(_key_hash(key_col, salt), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(16**HEX_W))
    scored = df.withColumn(
        "priority", F.col(weight_col).cast("double") / u
    )
    if group_col is None:
        return scored.orderBy(
            F.col("priority").desc(), F.col(key_col).asc()
        ).limit(n)
    w = Window.partitionBy(group_col).orderBy(
        F.col("priority").desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n)
        .drop("_r")
    )


def epoch_order(
    df: DataFrame,
    epochs: int = 1,
    key_col: str = "doc_id",
    salt: str = "ep",
) -> DataFrame:
    """Deterministic per-epoch global shuffle order for training-data
    delivery → (key_col, epoch, ord): epoch e ranks every row by the
    md5 of (salt, e, key), giving an independent full permutation per
    epoch with ord ∈ [0, n). Trainers replay the exact token stream of
    any run (curriculum debugging, loss-spike forensics) because the
    order is a pure function of (salt, epoch, key) — identical on any
    cluster size, partition layout, or engine.

    Scale shape: a global permutation needs a TOTAL ORDER, which must
    not mean a single-partition window — the rank rides the two-phase
    global rank (range repartition by (epoch, hash) → per-partition
    window → broadcast per-partition offsets), so every data-sized
    stage is parallel and epochs stay in distinct key ranges of ONE
    ranking pass instead of ``epochs`` separate jobs. The fixed-width
    hex hash prefix compares lexicographically as its numeric value
    (same contract as ``sample_by_hash``).
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    from renard_spark.operators.utils import global_running_total

    n = df.count()
    keyed = (
        df.select(key_col)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.lit(epochs - 1)))
        )
        .withColumn(
            "_h",
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("epoch").cast("string"),
                        F.col(key_col).cast("string"),
                    )
                ),
                1, HEX_W,
            ),
        )
        .withColumn("_one", F.lit(1))
        # the range partitioner samples its input — truncate lineage
        .localCheckpoint(eager=True)
    )
    ranked = global_running_total(
        keyed, "_one", ["epoch", "_h", key_col], out_col="_grk"
    )
    return ranked.select(
        key_col,
        F.col("epoch").cast("int").alias("epoch"),
        (F.col("_grk") - F.col("epoch") * F.lit(n)).cast("long").alias("ord"),
    )


def dsir_weights(
    docs: DataFrame, is_target_col: str = "is_target",
    n_buckets: int = 64, text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling") → (doc_id, n_feats, dsir_logweight): per document the
    hashed-bigram log-likelihood ratio between a TARGET distribution
    (rows where ``is_target_col`` is true — e.g. the wiki-like or
    in-domain slice) and the RAW corpus distribution. High weight =
    the document's n-gram profile looks like the target; sampling
    ∝ exp(weight) is the paper's importance-resampling step (pair
    with ``priority_sample``).

    Features are md5-hashed bigram buckets (the paper's hashed n-gram
    generative model): both unigram models are add-one-smoothed over
    ``n_buckets`` buckets, log w(d) = Σ_b m_b(d) · [ln(ct_b + 1) −
    ln(Nt + B) − ln(cr_b + 1) + ln(Nr + B)].

    Scale shape: one narrow bigram transform + ONE (doc, bucket)
    count shuffle (lineage-truncated — it feeds the two model
    aggregations AND the final scoring join); both models are
    B-bounded aggregate tables joined back on the bucket key; the two
    totals are driver scalars. The per-doc sum adds doubles, so the
    last-ulp order caveat applies (report rounded).
    """
    tl = F.transform(
        F.regexp_extract_all(text_col, F.lit(_TOKEN_RE_LIT), 0),
        lambda t: F.lower(t),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.col("bg.w1"), F.lit(" "), F.col("bg.w2"))),
            1, HEX_W,
        ),
        16, 10,
    ).cast("long") % n_buckets
    big = (
        docs.select("doc_id", F.col(is_target_col).alias("_t"),
                    tl.alias("tl"))
        .filter(F.size("tl") >= 2)
        .select(
            "doc_id", "_t",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tl") - 2),
                    lambda i: F.struct(
                        F.element_at("tl", i + 1).alias("w1"),
                        F.element_at("tl", i + 2).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "_t", bucket.alias("b"))
        .groupBy("doc_id", "_t", "b")
        .agg(F.count("*").alias("m"))
        .localCheckpoint(eager=False)
    )
    raw = big.groupBy("b").agg(F.sum("m").alias("cr"))
    tgt = big.filter("_t").groupBy("b").agg(F.sum("m").alias("ct"))
    stats = raw.join(tgt, "b", "left").select(
        "b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")
    ).localCheckpoint(eager=True)
    tot = stats.agg(F.sum("cr"), F.sum("ct")).first()
    nr, nt = int(tot[0] or 0), int(tot[1] or 0)
    llr = (
        F.log(F.col("ct") + 1.0) - F.log(F.lit(float(nt + n_buckets)))
        - F.log(F.col("cr") + 1.0) + F.log(F.lit(float(nr + n_buckets)))
    )
    return (
        big.join(stats, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_feats"),
            F.sum(F.col("m") * llr).alias("dsir_logweight"),
        )
    )

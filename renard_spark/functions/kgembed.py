"""KG-embedding scoring — the serving side of a TransE-family
KG-completion model (Bordes et al., NeurIPS'13) over the engine's
triple tables.

Training embeddings is out of scope (same boundary as the reference's
HF-trainer utilities); SCORING a trained model is a query capability:
rank candidate triples, validate KG edits, pick link-prediction
answers. Embeddings are injectable as (name, vec) tables — broadcast
dimension joins, one per role — with a deterministic md5
hash-projection fallback used by the oracle gates (the same
injectable-seam pattern as the NER/coref model factories: the compute
shape is real, the learned weights plug in on a cluster that has
them).

Everything is JVM-side array arithmetic (``transform`` / ``zip_with``
/ ``aggregate``) — no UDFs, no shuffle beyond the optional broadcast
joins. Hash-mode components are dyadic rationals (k / 2^32 − 1/2), so
every score is EXACTLY representable in float64 and bit-identical on
any engine and any partitioning; ``score_fp`` exposes the score as
2^-32 fixed-point for hash-gated comparisons with zero formatting
risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 4294967296.0  # 2^32


def hash_embedding(name: Column | str, dim: int, namespace: str) -> Column:
    """Deterministic unit-scale embedding: component i is the first 32
    md5 bits of ``namespace || name || ':' || i`` mapped to
    [-0.5, 0.5). A hash projection, not a trained vector — the gate /
    smoke fallback."""
    col = F.col(name) if isinstance(name, str) else name
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat(F.lit(namespace), col, F.lit(":"), i.cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double") / F.lit(_SCALE) - F.lit(0.5),
    )


def transe_score(h: Column, r: Column, t: Column) -> Column:
    """L1 TransE energy ||h + r - t||_1 over three equal-length
    array<double> columns. Lower = more plausible."""
    diff = F.zip_with(
        F.zip_with(h, r, lambda a, b: a + b), t, lambda x, c: x - c
    )
    return F.aggregate(
        diff, F.lit(0.0), lambda acc, x: acc + F.abs(x)
    )


def _fp(x: Column) -> Column:
    """Round a float64 score term to 2^-32 fixed-point BIGINT.

    Rounding each PRODUCT term before summation (not the final sum)
    is what makes the multiplicative scorers below engine-exact: every
    hash-mode component is a ≤32-bit dyadic rational (exactly
    representable), so each IEEE-754 multiply is correctly rounded and
    bit-identical on any compliant engine, and Spark's HALF_UP round
    on doubles equals DuckDB's round-half-away-from-zero for every
    representable input. After per-term rounding the remaining
    arithmetic is integer — immune to summation order."""
    return F.round(x * F.lit(_SCALE)).cast("long")


def distmult_score_fp(h: Column, r: Column, t: Column) -> Column:
    """DistMult bilinear-diagonal score <h, r, t> = Σᵢ hᵢ·rᵢ·tᵢ
    (Yang et al., ICLR'15) over three equal-length array<double>
    columns, emitted directly as the per-term-rounded 2^-32
    fixed-point BIGINT (see ``_fp``; higher = more plausible).
    Products are grouped ((h·r)·t) — the SQL left-assoc order — so
    the oracle expression is literally the same float sequence."""
    prod = F.zip_with(
        F.zip_with(h, r, lambda a, b: a * b), t, lambda x, c: x * c
    )
    return F.aggregate(
        prod, F.lit(0).cast("long"), lambda acc, x: acc + _fp(x)
    )


def complex_score_fp(h: Column, r: Column, t: Column, dim: int) -> Column:
    """ComplEx score Re(<h, r, t̄>) (Trouillon et al., ICML'16): the
    first ``dim/2`` array slots are real parts, the last ``dim/2``
    imaginary. Per half-dimension i the four real-arithmetic products

        Re(h)Re(r)Re(t) + Im(h)Re(r)Im(t)
      + Re(h)Im(r)Im(t) − Im(h)Im(r)Re(t)

    are each rounded to 2^-32 fixed-point and summed as BIGINTs
    (higher = more plausible) — the asymmetric-relation upgrade of
    DistMult, with the same engine-exactness argument as ``_fp``."""
    if dim % 2:
        raise ValueError("ComplEx needs an even dim (re/im halves)")
    half = dim // 2

    def el(vec: Column, i: Column) -> Column:
        return F.element_at(vec, i + 1)

    terms = F.transform(
        F.sequence(F.lit(0), F.lit(half - 1)),
        lambda i: (
            _fp(el(h, i) * el(r, i) * el(t, i))
            + _fp(el(h, i + half) * el(r, i) * el(t, i + half))
            + _fp(el(h, i) * el(r, i + half) * el(t, i + half))
            - _fp(el(h, i + half) * el(r, i + half) * el(t, i))
        ),
    )
    return F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def score_triples(
    triples: DataFrame,
    dim: int = 8,
    entity_embeddings: DataFrame | None = None,
    relation_embeddings: DataFrame | None = None,
    model: str = "transe",
) -> DataFrame:
    """Score (subj, pred, obj) triples with TransE. With embedding
    tables (``name``, ``vec array<double>``): three broadcast joins —
    the embedding tables are model-sized dimensions, the triple table
    never shuffles. Without: the md5 hash projection (namespaces
    ``e:`` / ``r:`` so an entity and a relation with the same surface
    never collide). Adds ``transe_score`` (float64, exact in hash
    mode) and ``score_fp`` (the same score in 2^-32 fixed-point,
    BIGINT — the hash-gate column).

    Table-embedding mode uses INNER joins: a triple whose subj/pred/obj
    has no embedding row is DROPPED from the output (coverage loss is
    the caller's contract to check — ``link_prediction_ranks`` does,
    raising on missing entities; count a left-join's nulls if you need
    the drop tally).

    ``model`` selects the scoring family over the same join/hash
    plumbing: ``"transe"`` (L1 energy, lower = better),
    ``"distmult"`` (bilinear diagonal, higher = better) or
    ``"complex"`` (Re(<h, r, t̄>), higher = better). The score
    column is named ``<model>_score``; ``score_fp`` is always the
    2^-32 fixed-point BIGINT gate column (per-term-rounded for the
    multiplicative models — see ``_fp``)."""
    if model not in ("transe", "distmult", "complex"):
        raise ValueError("model must be transe, distmult or complex")
    if (entity_embeddings is None) != (relation_embeddings is None):
        raise ValueError(
            "supply both entity_embeddings and relation_embeddings, "
            "or neither"
        )
    if entity_embeddings is not None:
        ee = F.broadcast(entity_embeddings.select("name", "vec"))
        re_ = F.broadcast(relation_embeddings.select("name", "vec"))
        out = (
            triples
            .join(ee.select(F.col("name").alias("subj"),
                            F.col("vec").alias("_h")), "subj")
            .join(re_.select(F.col("name").alias("pred"),
                             F.col("vec").alias("_r")), "pred")
            .join(ee.select(F.col("name").alias("obj"),
                            F.col("vec").alias("_t")), "obj")
        )
        h, r, t = F.col("_h"), F.col("_r"), F.col("_t")
    else:
        out = triples
        h = hash_embedding(F.col("subj"), dim, "e:")
        r = hash_embedding(F.col("pred"), dim, "r:")
        t = hash_embedding(F.col("obj"), dim, "e:")
    if model == "transe":
        out = out.withColumn("transe_score", transe_score(h, r, t))
        out = out.withColumn(
            "score_fp",
            F.round(F.col("transe_score") * F.lit(_SCALE)).cast("long"),
        )
    else:
        fp = (
            distmult_score_fp(h, r, t)
            if model == "distmult"
            else complex_score_fp(h, r, t, dim)
        )
        out = out.withColumn("score_fp", fp).withColumn(
            f"{model}_score", F.col("score_fp") / F.lit(_SCALE)
        )
    return out.drop("_h", "_r", "_t")


def link_prediction_ranks(
    triples: DataFrame,
    dim: int = 8,
    entity_embeddings: DataFrame | None = None,
    relation_embeddings: DataFrame | None = None,
) -> DataFrame:
    """Object-side link-prediction evaluation (the standard raw-setting
    protocol of the TransE family): for every true (subj, pred, obj),
    score (subj, pred, o') for EVERY entity o' in the graph's entity
    set and report the true object's 1-based rank — the per-triple
    table behind MRR / hits@k (one further groupBy:
    ``avg(1.0/rank)``, ``avg(rank <= k)``).

    Candidates depend only on (subj, pred), so scoring is done once
    per distinct pair × entity-vocabulary. That product is the
    PROTOCOL (every entity is a candidate for every test pair); both
    factors are unified-vocabulary dimensions — never corpus rows — so
    it is an explicit broadcast cross join of the same class as the
    IVF-codebook joins, |pairs| × |entities| rows total. Ranks come
    from one window over the (subj, pred) partition ordered by
    ``(score_fp, obj)`` — the deterministic tie-break that makes the
    rank table hashable cross-engine.

    Both standard protocol settings are emitted: ``rank`` is the RAW
    rank (other true objects of the same (subj, pred) stay in the
    candidate list) and ``filtered_rank`` is the FILTERED rank
    (Bordes et al.: every OTHER true object is removed from the
    candidate list before ranking). The filtered rank needs no second
    scoring pass: among the true objects of a (subj, pred), the one
    ranked k-th best raw has exactly k−1 better-scoring true objects
    to discount, so ``filtered_rank = rank − (row_number among true
    objects by rank − 1)`` — one extra window over the TRUE rows only.

    Input is treated as a triple SET: duplicate (subj, pred, obj) rows
    are dropped up front (a duplicate would otherwise join the same
    ranked row twice and double-discount the filtered rank). In
    table-embedding mode every subj/pred/obj must have an embedding
    row — missing names raise rather than silently shrinking the
    candidate vocabulary and skewing ranks/n_cands (see
    ``score_triples``).
    """
    triples = triples.select("subj", "pred", "obj").distinct()
    if entity_embeddings is not None:
        known = entity_embeddings.select(F.col("name").alias("cand"))
        missing = (
            triples.select(F.col("subj").alias("cand"))
            .unionByName(triples.select(F.col("obj").alias("cand")))
            .distinct()
            .join(F.broadcast(known), "cand", "left_anti")
            .limit(1)
            .collect()
        )
        if missing:
            raise ValueError(
                "entity %r in triples has no embedding row — ranks "
                "would silently exclude it from the candidate "
                "vocabulary" % missing[0][0]
            )
    vocab = (
        triples.select(F.col("obj").alias("cand"))
        .unionByName(triples.select(F.col("subj").alias("cand")))
        .distinct()
    )
    pairs = triples.select("subj", "pred").distinct()
    cands = pairs.crossJoin(F.broadcast(vocab)).select(
        "subj", "pred", F.col("cand").alias("obj")
    )
    scored = score_triples(
        cands, dim=dim,
        entity_embeddings=entity_embeddings,
        relation_embeddings=relation_embeddings,
    )
    w = Window.partitionBy("subj", "pred")
    ranked = (
        scored.withColumn(
            "rank",
            F.row_number().over(w.orderBy("score_fp", "obj")),
        )
        .withColumn("n_cands", F.count(F.lit(1)).over(w))
    )
    true_ranked = triples.join(ranked, ["subj", "pred", "obj"])
    return true_ranked.withColumn(
        "filtered_rank",
        F.col("rank")
        - (F.row_number().over(w.orderBy("rank")) - F.lit(1)),
    ).select(
        "subj", "pred", "obj",
        F.col("rank").cast("long").alias("rank"),
        F.col("filtered_rank").cast("long").alias("filtered_rank"),
        F.col("n_cands").cast("long").alias("n_cands"),
    )


def link_prediction_ranks_ann(
    triples: DataFrame,
    dim: int = 8,
    band_bits: int = 2,
    entity_embeddings: DataFrame | None = None,
    relation_embeddings: DataFrame | None = None,
) -> DataFrame:
    """ANN-prefiltered link prediction — the 100M-entity version of
    ``link_prediction_ranks``. The exact protocol's |test pairs| ×
    |entity vocabulary| product is fine for model-sized vocabularies
    but not for a production KG with 10^8 entities; here the candidate
    list per (subj, pred) query comes from a sign-bit LSH index
    instead, and only the survivors are exactly scored and ranked
    (the standard ANN-rerank serving layout, Johnson et al. '17).

    Index: each entity embedding t is keyed by the SIGN BITS of its
    components, split into ``ceil(dim / band_bits)`` bands (banded
    SimHash/SRP with axis-aligned hyperplanes — deterministic, no
    sampled projections, so the candidate set is reproducible
    cross-engine). A query (subj, pred) with vector q = h + r probes
    the same index; every entity sharing AT LEAST ONE full band with
    q is a candidate. Smaller ``band_bits`` → higher recall, more
    candidates (band collision prob for a random direction is
    2^-band_bits per band).

    Plan shape: band explode on both sides (n_bands rows per entity /
    per query) → one EQUI-join on (band, bits) → distinct → exact
    scoring of candidates only → one rank window per (subj, pred).
    No cross join anywhere; per-band bucket sizes bound the fanout
    exactly like the MinHash/SimHash dedup paths.

    Output: one row per TRUE triple — ``ann_rank`` is the true
    object's 1-based rank among the retrieved candidates (NULL when
    the index missed it: that is the recall cost of ANN, measured by
    ``retrieved``), ``n_cands_ann`` the retrieved-candidate count
    (vs ``n_cands`` = whole vocabulary in the exact protocol).
    ``avg(retrieved)`` over this table is the index's recall@index
    against the exact protocol.

    Embedding tables are injectable as in ``score_triples``; hash
    mode (the oracle gate) derives both sides from md5 projections.
    """
    triples = triples.select("subj", "pred", "obj").distinct()
    n_bands = -(-dim // band_bits)

    if (entity_embeddings is None) != (relation_embeddings is None):
        raise ValueError(
            "supply both entity_embeddings and relation_embeddings, "
            "or neither"
        )

    vocab = (
        triples.select(F.col("obj").alias("cand"))
        .unionByName(triples.select(F.col("subj").alias("cand")))
        .distinct()
    )
    pairs = triples.select("subj", "pred").distinct()
    if entity_embeddings is not None:
        ee = F.broadcast(entity_embeddings.select("name", "vec"))
        re_ = F.broadcast(relation_embeddings.select("name", "vec"))
        vocab = vocab.join(
            ee.select(F.col("name").alias("cand"), F.col("vec").alias("tvec")),
            "cand",
        )
        pairs = (
            pairs.join(
                ee.select(F.col("name").alias("subj"), F.col("vec").alias("_h")),
                "subj",
            )
            .join(
                re_.select(F.col("name").alias("pred"), F.col("vec").alias("_r")),
                "pred",
            )
            .withColumn("qvec", F.zip_with("_h", "_r", lambda a, b: a + b))
            .drop("_h", "_r")
        )
    else:
        vocab = vocab.withColumn(
            "tvec", hash_embedding(F.col("cand"), dim, "e:")
        )
        pairs = pairs.withColumn(
            "qvec",
            F.zip_with(
                hash_embedding(F.col("subj"), dim, "e:"),
                hash_embedding(F.col("pred"), dim, "r:"),
                lambda a, b: a + b,
            ),
        )

    def _bands(vec: Column) -> Column:
        bits = F.transform(
            vec, lambda x: F.when(x > 0, F.lit("1")).otherwise(F.lit("0"))
        )
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.array_join(
                    F.slice(bits, b * band_bits + 1, band_bits), ""
                ).alias("bits"),
            ),
        )

    ix = vocab.select(
        "cand", F.explode(_bands(F.col("tvec"))).alias("bk")
    ).select("cand", F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"))
    probes = pairs.select(
        "subj", "pred", F.explode(_bands(F.col("qvec"))).alias("bk")
    ).select(
        "subj", "pred",
        F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"),
    )
    cands = (
        probes.join(ix, ["band", "bits"])
        .select("subj", "pred", "cand")
        .distinct()
    )

    scored = score_triples(
        cands.select("subj", "pred", F.col("cand").alias("obj")),
        dim=dim,
        entity_embeddings=entity_embeddings,
        relation_embeddings=relation_embeddings,
    )
    w = Window.partitionBy("subj", "pred")
    ranked = scored.withColumn(
        "ann_rank", F.row_number().over(w.orderBy("score_fp", "obj"))
    ).select("subj", "pred", "obj", "ann_rank")
    counts = cands.groupBy("subj", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_cands_ann")
    )
    return (
        triples.join(ranked, ["subj", "pred", "obj"], "left")
        .join(counts, ["subj", "pred"], "left")
        .select(
            "subj", "pred", "obj",
            F.col("ann_rank").cast("long").alias("ann_rank"),
            F.coalesce(F.col("n_cands_ann"), F.lit(0)).cast("long").alias(
                "n_cands_ann"
            ),
            F.col("ann_rank").isNotNull().alias("retrieved"),
        )
    )


def rank_fusion(
    triples: DataFrame, dim: int = 8, k: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of the three
    scoring families over one triple table → (subj, pred, obj,
    rank_transe, rank_distmult, rank_complex, rrf_fp): each model
    ranks the distinct triples WITHIN their predicate group (TransE
    ascending — lower energy is better; DistMult/ComplEx descending),
    and the fused score Σₘ 1/(k + rankₘ) orders candidate facts for
    KG-curation review by model consensus.

    Hash mode computes all three scores in ONE narrow pass over the
    triple table (no joins — the scorers share the md5 projections),
    then one shuffle on the predicate for the three rank windows
    (same partition key → Catalyst reuses the exchange). ``rrf_fp``
    is Σₘ round(2^32 / (k + rankₘ)) as BIGINT — per-term-rounded
    integer arithmetic, engine-exact like the score gates. Ties
    within a model break on (subj, obj) so ranks are deterministic.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    h = hash_embedding(F.col("subj"), dim, "e:")
    r = hash_embedding(F.col("pred"), dim, "r:")
    tt = hash_embedding(F.col("obj"), dim, "e:")
    sc = t.select(
        "subj", "pred", "obj",
        F.round(transe_score(h, r, tt) * F.lit(_SCALE)).cast("long")
        .alias("_ft"),
        distmult_score_fp(h, r, tt).alias("_fd"),
        complex_score_fp(h, r, tt, dim).alias("_fc"),
    )
    w = Window.partitionBy("pred")
    ranked = sc.select(
        "subj", "pred", "obj",
        F.row_number().over(w.orderBy("_ft", "subj", "obj"))
        .cast("long").alias("rank_transe"),
        F.row_number().over(
            w.orderBy(F.col("_fd").desc(), "subj", "obj")
        ).cast("long").alias("rank_distmult"),
        F.row_number().over(
            w.orderBy(F.col("_fc").desc(), "subj", "obj")
        ).cast("long").alias("rank_complex"),
    )

    def _rr(c: str):
        return F.round(
            F.lit(_SCALE) / (F.lit(float(k)) + F.col(c))
        ).cast("long")

    return ranked.withColumn(
        "rrf_fp",
        _rr("rank_transe") + _rr("rank_distmult") + _rr("rank_complex"),
    )

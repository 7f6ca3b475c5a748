"""SPARQL-style basic-graph-pattern matching over triple tables.

The reference materializes its extracted networks as in-memory
``networkx`` graphs and leaves querying to the caller; at KG scale the
triples live in a TABLE and the natural query primitive is the SPARQL
basic graph pattern (BGP): a conjunction of (subj, pred, obj) patterns
whose variables must bind consistently. This module compiles a BGP to
a chain of DataFrame equi-joins — Catalyst then reorders/broadcasts as
the statistics dictate, which is exactly the worst-case-optimal-join
literature's baseline strategy for sparse patterns.

No UDFs, no iteration: a k-pattern BGP is k scans of the triple table
(each with its constant filters pushed down) and k-1 equi-joins on the
shared variables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]


def _is_var(term: str) -> bool:
    return term.startswith("?")


def bgp_match(
    triples: DataFrame,
    patterns: list[Pattern],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Match a basic graph pattern against a (subj, pred, obj) triple
    table → one column per distinct variable (named without the ``?``),
    one row per consistent binding (set semantics follow the input:
    a distinct triple table yields distinct bindings).

    Each pattern term is either a variable (``"?x"``) or a constant.
    Constants become pushed-down filters on that pattern's scan;
    repeated variables WITHIN a pattern become an equality filter;
    variables shared ACROSS patterns become inner equi-join keys.
    Patterns with no variable in common with the accumulated prefix
    cross-join (a disconnected BGP is a cartesian product by
    definition — keep BGPs connected at scale).

    The join ORDER is the pattern order as written; selective patterns
    (more constants) first is the classic heuristic, and AQE's runtime
    re-planning + broadcast thresholds handle the rest. For a
    predicate-partitioned triple store the constant-``pred`` filter
    prunes partitions before the scan.
    """
    if not patterns:
        raise ValueError("bgp_match needs >= 1 pattern")
    acc: DataFrame | None = None
    bound: set[str] = set()
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be a (s, p, o) triple: {pat!r}")
        cols = {}
        flt = []
        for term, col in zip(pat, (subj, pred, obj)):
            if _is_var(term):
                name = term[1:]
                if not name:
                    raise ValueError("empty variable name '?'")
                if name in cols:
                    # repeated variable within one pattern: equality
                    flt.append(F.col(col) == F.col(cols[name]))
                else:
                    cols[name] = col
            else:
                flt.append(F.col(col) == F.lit(term))
        scan = triples
        for f in flt:
            scan = scan.filter(f)
        scan = scan.select(
            *[F.col(c).alias(v) for v, c in sorted(cols.items())]
        )
        if acc is None:
            acc = scan
        else:
            keys = sorted(bound & set(cols))
            if keys:
                acc = acc.join(scan, keys)
            else:
                acc = acc.crossJoin(scan)
        bound |= set(cols)
    assert acc is not None
    return acc.select(*sorted(bound))
